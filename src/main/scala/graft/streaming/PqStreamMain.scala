package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.Sessions
import graft.ext.{Ivf, Pq}

/** Runnable demo of the streaming IVF×PQ serving-layout ingest
  * ([[PqStream]]): replays a testdata `embeddings` table as a file stream
  * into the cell-partitioned code table, then serves a query batch from
  * the stream-built layout — the add+search lifecycle PqStreamSpec gates
  * against the batch-built table.
  *
  * Usage: runMain graft.streaming.PqStreamMain [sfDir]
  */
object PqStreamMain {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption
      .orElse(sys.env.get("SPARK_GRAFT_SF_DIR"))
      .getOrElse("/root/testdata/sf0.001")
    val spark = Sessions.build("graft-pq-stream")
    try {
      val root = Files.createTempDirectory("pq-stream-demo").toString
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
        .select(col("vec_id"), col("embedding"))
      val coarse = Ivf.train(spark, emb, k = 16)
      val books = Pq.train(spark, emb, m = 8, k = 16, iters = 2)
      emb.filter(col("vec_id") % 2 === 0).repartition(1)
        .write.mode("append").parquet(s"$root/in")
      emb.filter(col("vec_id") % 2 =!= 0).repartition(1)
        .write.mode("append").parquet(s"$root/in")
      PqStream.ingest(spark, s"$root/in", emb.schema, books, coarse,
        s"$root/out", s"$root/ck").awaitTermination()
      val table = spark.read.parquet(s"$root/out")
      val cells = table.select(col("bucket")).distinct().count()
      println(s"[pq-stream] code rows=${table.count()} cells=$cells " +
        s"vectors=${table.select(col("vec_id")).distinct().count()}")
      val served = Pq.adcRerankTopKIvf(
        emb.filter(col("vec_id") < 3), table, books, coarse, emb,
        k = 3, shortlist = 32, nprobe = 4)
        .orderBy("q_id", "rank").collect()
      served.foreach { r =>
        println(s"[pq-stream] q=${r.getAs[Long]("q_id")} rank=${r.getAs[Int]("rank")} " +
          s"hit=${r.getAs[Long]("vec_id")} d2=${r.getAs[Double]("d2")}")
      }
    } finally spark.stop()
  }
}
