package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Test-data table loader: one parquet per table under a scale-factor dir
  * (TESTDATA.md). Parquet scans get predicate pushdown + column pruning
  * from Catalyst for free; at cluster scale the same call fans out over
  * file splits with no driver involvement.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Note on local parallelism: the driver-generated test parquet has ONE
    * row group per file, so the scan stage runs as a single task (parquet
    * cannot split below row-group granularity). Measured here, inserting a
    * repartition to spread the work costs more than the single-task scan
    * saves at these sizes — so we keep the plan clean. Real multi-file /
    * multi-row-group data splits at the source and parallelizes natively.
    */
  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = apply(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame    = apply(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
