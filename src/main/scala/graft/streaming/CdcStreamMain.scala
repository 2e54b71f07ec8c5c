package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.Sessions

/** Runnable demo of the streaming CDC apply ([[CdcStream]]): replays the
  * q_merge_apply fixture feed (base snapshot + change log) out of order
  * and prints the live upsert view's summary — the table CdcStreamSpec
  * proves equal to the batch MERGE under any delivery order.
  *
  * Usage: runMain graft.streaming.CdcStreamMain [sfDir]
  */
object CdcStreamMain {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption
      .orElse(sys.env.get("SPARK_GRAFT_SF_DIR"))
      .getOrElse("/root/testdata/sf0.001")
    val spark = Sessions.build("graft-cdc-stream")
    spark.conf.set(
      "spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val root = Files.createTempDirectory("cdc-stream-demo").toString
      val feed = CdcStream.fixtureFeed(spark, dir)
      // deliberately scrambled delivery: changes before the base snapshot
      feed.filter(col("seq") >= 3).repartition(1).write.mode("append").parquet(s"$root/in")
      feed.filter(col("seq").isin(1, 2)).repartition(1).write.mode("append").parquet(s"$root/in")
      feed.filter(col("seq") === 0).repartition(1).write.mode("append").parquet(s"$root/in")
      val stream = spark.readStream.schema(feed.schema)
        .option("maxFilesPerTrigger", 1).parquet(s"$root/in")
      CdcStream.view(spark, stream)
        .writeStream.format("parquet").outputMode("append")
        .option("path", s"$root/out").option("checkpointLocation", s"$root/ck")
        .trigger(Trigger.AvailableNow()).start()
        .awaitTermination()
      val rows = spark.read.parquet(s"$root/out")
      val finals = rows
        .join(rows.groupBy("k").agg(max("upd").as("upd")), Seq("k", "upd"))
      val live = finals.filter(col("present"))
      println(s"[cdc-stream] events=${rows.count()} keys=${finals.count()} " +
        s"live=${live.count()} tombstones=${finals.count() - live.count()}")
      live.groupBy(col("status")).agg(count(lit(1)).as("n"), sum(col("price")).as("total"))
        .orderBy("status").collect()
        .foreach(r => println(s"[cdc-stream] status=${r.getAs[String]("status")} " +
          s"n=${r.getAs[Long]("n")} total=${r.getAs[Double]("total")}"))

      // the AGED variant: same feed time-ordered plus heartbeats — the
      // seq low-watermark clears every tombstone and marks it visibly
      val aroot = Files.createTempDirectory("cdc-age-demo").toString
      feed.filter(col("seq") <= 2).repartition(1).write.mode("append").parquet(s"$aroot/in")
      feed.filter(col("seq") >= 3).repartition(1).write.mode("append").parquet(s"$aroot/in")
      CdcStream.heartbeats(spark, Seq(100L)).repartition(1)
        .write.mode("append").parquet(s"$aroot/in")
      CdcStream.heartbeats(spark, Seq(101L)).repartition(1)
        .write.mode("append").parquet(s"$aroot/in")
      val astream = spark.readStream.schema(feed.schema)
        .option("maxFilesPerTrigger", 1).parquet(s"$aroot/in")
      CdcStream.agedView(spark, astream, watermarkDelay = "5 seconds")
        .writeStream.format("parquet").outputMode("append")
        .option("path", s"$aroot/out").option("checkpointLocation", s"$aroot/ck")
        .trigger(Trigger.AvailableNow()).start()
        .awaitTermination()
      val arows = spark.read.parquet(s"$aroot/out")
      println(s"[cdc-stream] aged view: events=${arows.count()} " +
        s"tombstones_aged=${arows.filter(col("aged")).count()}")
    } finally spark.stop()
  }
}
