package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.Sessions

/** Runnable demo of timer-drained sessionization
  * ([[SessionTimerStream]]): replays a testdata `events` table as a
  * time-ordered file stream with NO flush sentinel — closed sessions
  * emit when their event-time timer fires under the advancing
  * watermark, and sessions still open at the horizon are withheld
  * (printed as the withheld count). Contrast with
  * [[SessionStreamMain]], whose built-in twin needs the sentinel to
  * drain.
  *
  * Usage: runMain graft.streaming.SessionTimerStreamMain [sfDir]
  */
object SessionTimerStreamMain {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption
      .orElse(sys.env.get("SPARK_GRAFT_SF_DIR"))
      .getOrElse("/root/testdata/sf0.001")
    val spark = Sessions.build("graft-session-timer-stream")
    spark.conf.set(
      "spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    import spark.implicits._
    try {
      val root = Files.createTempDirectory("session-timer-demo").toString
      val ev = graft.queries.Events.events(spark, dir)
        .select(col("user_id"), col("ts").cast("timestamp").as("ts"), col("value"))
      val (tMin, tMax) = ev.agg(min(col("ts")), max(col("ts")))
        .as[(Timestamp, Timestamp)].collect().head
      val tMid = new Timestamp(tMin.getTime + (tMax.getTime - tMin.getTime) / 2)
      ev.filter(col("ts") < lit(tMid)).repartition(1).write.mode("append").parquet(s"$root/in")
      ev.filter(col("ts") >= lit(tMid)).repartition(1).write.mode("append").parquet(s"$root/in")
      val stream = spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(s"$root/in")
      val q = SessionTimerStream.sessions(spark, stream, watermarkDelay = "1 second")
        .writeStream.format("parquet").outputMode("append")
        .option("path", s"$root/out").option("checkpointLocation", s"$root/ck")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      val sessions = spark.read.parquet(s"$root/out")
      val batchTotal = ev
        .groupBy(session_window(col("ts"), graft.queries.Events.SessionGap), col("user_id"))
        .count().count()
      println(
        s"[session-timer] drained=${sessions.count()} " +
          s"withheld_open=${batchTotal - sessions.count()} (no sentinel)")
      sessions.orderBy(col("n_events").desc, col("user_id")).limit(5).collect().foreach { r =>
        println(
          s"[session-timer] user=${r.getAs[Long]("user_id")} " +
            s"start=${r.getAs[Any]("session_start")} n=${r.getAs[Long]("n_events")} " +
            s"value=${r.getAs[Double]("total_value")}")
      }
    } finally spark.stop()
  }
}
