package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.Sessions

/** Runnable demo of the built-in streaming windows ([[SessionStream]]):
  * replays a testdata `events` table as a time-ordered file stream with
  * a flush sentinel and prints session and tumbling-window counts — the
  * outputs SessionStreamSpec proves bit-equal to q_session_window /
  * q_tumbling_window.
  *
  * Usage: runMain graft.streaming.SessionStreamMain [sfDir]
  */
object SessionStreamMain {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption
      .orElse(sys.env.get("SPARK_GRAFT_SF_DIR"))
      .getOrElse("/root/testdata/sf0.001")
    val spark = Sessions.build("graft-session-stream")
    spark.conf.set(
      "spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    import spark.implicits._
    try {
      val root = Files.createTempDirectory("session-stream-demo").toString
      val ev = graft.queries.Events.events(spark, dir)
        .select(col("user_id"), col("ts"), col("value"))
      val (tMin, tMax) = ev.agg(min(col("ts")), max(col("ts")))
        .as[(Timestamp, Timestamp)].collect().head
      val tMid = new Timestamp(tMin.getTime + (tMax.getTime - tMin.getTime) / 2)
      ev.filter(col("ts") < lit(tMid)).repartition(1).write.mode("append").parquet(s"$root/in")
      ev.filter(col("ts") >= lit(tMid)).repartition(1).write.mode("append").parquet(s"$root/in")
      // flush sentinel: drains every real session past the watermark
      Seq((-1L, new Timestamp(tMax.getTime + 2 * 3600 * 1000L), 0.0))
        .toDF("user_id", "ts", "value").repartition(1).write.mode("append").parquet(s"$root/in")
      val stream = spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(s"$root/in")
      val q = SessionStream.sessions(spark, stream, watermarkDelay = "1 second")
        .writeStream.format("parquet").outputMode("append")
        .option("path", s"$root/out").option("checkpointLocation", s"$root/ck")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      val sessions = spark.read.parquet(s"$root/out").filter(col("user_id") =!= -1L)
      println(
        s"[session-stream] sessions=${sessions.count()} " +
          s"users=${sessions.select("user_id").distinct().count()}")
      sessions.orderBy(col("n_events").desc, col("user_id")).limit(5).collect().foreach { r =>
        println(
          s"[session-stream] user=${r.getAs[Long]("user_id")} " +
            s"start=${r.getAs[Any]("session_start")} n=${r.getAs[Long]("n_events")} " +
            s"value=${r.getAs[Double]("total_value")}")
      }
    } finally spark.stop()
  }
}
