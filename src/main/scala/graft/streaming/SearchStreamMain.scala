package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.Sessions

/** Runnable demo of the streaming BM25 leaderboard ([[SearchStream]]):
  * replays a testdata `documents` table as a file stream (one parquet
  * file per micro-batch via maxFilesPerTrigger) and prints each query's
  * final board — the stream-end state SearchStreamSpec proves equal to
  * the batch q_bm25 top-5.
  *
  * Usage: runMain graft.streaming.SearchStreamMain [sfDir] [k]
  * (defaults: SPARK_GRAFT_SF_DIR or /root/testdata/sf0.001, k=5)
  */
object SearchStreamMain {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption
      .orElse(sys.env.get("SPARK_GRAFT_SF_DIR"))
      .getOrElse("/root/testdata/sf0.001")
    val k = args.lift(1).map(_.toInt).getOrElse(5)
    val spark = Sessions.build("graft-search-stream")
    spark.conf.set(
      "spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    import spark.implicits._
    try {
      // stage the corpus as a multi-file stream input: two disjoint halves
      // so AvailableNow + maxFilesPerTrigger=1 replays it in >=2 batches
      val root = Files.createTempDirectory("search-stream-demo").toString
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
        .as[(Long, String)]
      val q = SearchStream.leaderboard(spark, stream, k)
        .writeStream.format("parquet").outputMode("append")
        .option("path", s"$root/out").option("checkpointLocation", s"$root/ck")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      val hits = spark.read.parquet(s"$root/out")
      val finals = hits
        .join(
          hits.groupBy("query_id").agg(max("upd").as("upd")),
          Seq("query_id", "upd"))
        .orderBy("query_id", "rank")
        .collect()
      finals.foreach { r =>
        println(
          s"[search-stream] query=${r.getAs[Int]("query_id")} rank=${r.getAs[Int]("rank")} " +
            s"doc=${r.getAs[Long]("doc_id")} score_fp=${r.getAs[Long]("score_fp")} " +
            s"(after ${r.getAs[Long]("upd")} docs)")
      }
    } finally spark.stop()
  }
}
