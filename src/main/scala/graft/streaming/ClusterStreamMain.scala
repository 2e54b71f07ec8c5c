package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.Sessions
import graft.ext.Ivf

/** Runnable demo of streaming IVF centroid-statistics maintenance
  * ([[ClusterStream]]): replays a testdata `embeddings` table as a file
  * stream in >=2 micro-batches against a stored coarse quantizer and
  * prints the final cell occupancies — the state ClusterStreamSpec
  * proves equal to the batch aggregation.
  *
  * Usage: runMain graft.streaming.ClusterStreamMain [sfDir]
  */
object ClusterStreamMain {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption
      .orElse(sys.env.get("SPARK_GRAFT_SF_DIR"))
      .getOrElse("/root/testdata/sf0.001")
    val spark = Sessions.build("graft-cluster-stream")
    spark.conf.set(
      "spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val root = Files.createTempDirectory("cluster-stream-demo").toString
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
        .select(col("vec_id"), col("embedding"))
      val centroids = Ivf.train(spark, emb, k = 16)
      emb.filter(col("vec_id") % 2 === 0).repartition(1)
        .write.mode("append").parquet(s"$root/in")
      emb.filter(col("vec_id") % 2 =!= 0).repartition(1)
        .write.mode("append").parquet(s"$root/in")
      val stream = spark.readStream.schema(emb.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(s"$root/in")
      val q = ClusterStream.cells(spark, stream, centroids)
        .writeStream.format("parquet").outputMode("append")
        .option("path", s"$root/out").option("checkpointLocation", s"$root/ck")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      val rows = spark.read.parquet(s"$root/out")
      val finals = rows
        .join(rows.groupBy("bucket").agg(max("upd").as("upd")), Seq("bucket", "upd"))
        .orderBy(col("n").desc, col("bucket"))
        .collect()
      val total = finals.map(_.getAs[Long]("n")).sum
      println(s"[cluster-stream] cells=${finals.length} vectors=$total emissions=${rows.count()}")
      // the retrain trigger from the same state: ingest ≡ corpus here, so
      // drift_cos ~ 1 and no retrain fires — the live wiring is the point
      val cellRows = finals.map(r => ClusterStream.CellRow(
        r.getAs[Int]("bucket"), r.getAs[Long]("upd"), r.getAs[Long]("n"),
        r.getAs[collection.Seq[Long]]("means").toSeq,
        r.getAs[collection.Seq[Long]]("sums4").toSeq)).toSeq
      val drift = ClusterStream
        .driftFromCells(spark, cellRows, ClusterStream.davgCentroid(emb))
        .collect().head
      println(
        s"[cluster-stream] drift_cos=${drift.getAs[Double]("drift_cos")} " +
          s"retrain_needed=${drift.getAs[Boolean]("retrain_needed")}")
      finals.take(5).foreach { r =>
        println(
          s"[cluster-stream] bucket=${r.getAs[Int]("bucket")} n=${r.getAs[Long]("n")} " +
            s"mean[0..3]=${r.getAs[collection.Seq[Long]]("means").take(4).mkString(",")}")
      }
    } finally spark.stop()
  }
}
