package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.Sessions

/** Runnable demo of streaming dedup-on-ingest ([[DedupStream]]): replays
  * a testdata `documents` table as a file stream in >=2 micro-batches,
  * maintaining the LSH band index as state, and prints the deduped
  * candidate-pair count plus the strongest pairs — the emission set
  * DedupStreamSpec proves equal to the batch minhashPairs join.
  *
  * Usage: runMain graft.streaming.DedupStreamMain [sfDir]
  */
object DedupStreamMain {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption
      .orElse(sys.env.get("SPARK_GRAFT_SF_DIR"))
      .getOrElse("/root/testdata/sf0.001")
    val spark = Sessions.build("graft-dedup-stream")
    spark.conf.set(
      "spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val root = Files.createTempDirectory("dedup-stream-demo").toString
      val docs = spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), col("text"))
      docs.filter(col("doc_id") % 2 === 0).repartition(1)
        .write.mode("append").parquet(s"$root/in")
      docs.filter(col("doc_id") % 2 =!= 0).repartition(1)
        .write.mode("append").parquet(s"$root/in")
      val schema = StructType(Seq(
        StructField("doc_id", LongType), StructField("text", StringType)))
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(s"$root/in")
      val q = DedupStream.pairs(spark, stream)
        .writeStream.format("parquet").outputMode("append")
        .option("path", s"$root/out").option("checkpointLocation", s"$root/ck")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      val raw = spark.read.parquet(s"$root/out")
      // the operational signal: overflow markers mean the corpus needs
      // the batch exact-dedup-first pass before LSH ingest
      println(s"[dedup-stream] bucket_overflows=${
        raw.filter(col("a_id") === DedupStream.OverflowId).count()}")
      val deduped = raw.filter(col("a_id") =!= DedupStream.OverflowId).distinct()
      println(s"[dedup-stream] candidate_pairs=${deduped.count()}")
      deduped.orderBy(col("est_jaccard").desc, col("a_id"), col("b_id")).limit(5)
        .collect().foreach { r =>
          println(
            s"[dedup-stream] pair=(${r.getAs[Long]("a_id")}, ${r.getAs[Long]("b_id")}) " +
              f"est_jaccard=${r.getAs[Double]("est_jaccard")}%.3f")
        }
    } finally spark.stop()
  }
}
