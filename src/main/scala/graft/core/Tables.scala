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

}
