package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.core.Tables

/** The delegated-SQL surface (SURVEY §0/§2 tier D): the reference is
  * parameterized by arbitrary SELECT text shipped to MySQL/BigQuery
  * (export_table.py:15, variables.tf:72-75); here the engine executing
  * that text is Spark SQL itself. `run` registers the corpus tables as
  * temp views and hands the query to Catalyst — pushdown, join
  * reordering, AQE all apply exactly as for the DataFrame API.
  */
object QueryRunner {

  /** Register every testdata table under its bare name (idempotent). */
  def registerViews(spark: SparkSession, sfDir: String): Unit =
    Tables.all.foreach { t =>
      Tables(spark, sfDir, t).createOrReplaceTempView(t)
    }

  /** Execute arbitrary SQL over the registered corpus. */
  def run(spark: SparkSession, sfDir: String, sql: String): DataFrame = {
    registerViews(spark, sfDir)
    spark.sql(sql)
  }
}
