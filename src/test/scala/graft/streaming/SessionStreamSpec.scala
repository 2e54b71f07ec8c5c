package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.{Registry, SparkSpec}

/** The built-in-operator twin gate: streaming session_window + watermark
  * over a time-ordered replay of the fixture events must emit exactly
  * the batch q_session_window rows (bit-equal doubles), with a flush
  * sentinel closing the final sessions.
  */
class SessionStreamSpec extends SparkSpec {

  private def withRocksDb[A](body: => A): A = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(
      key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("streaming sessions equal q_session_window bit-for-bit under a flush sentinel") {
    import spark.implicits._
    withRocksDb {
      val dir = sf()
      val root = Files.createTempDirectory("session-stream").toString
      val in = s"$root/in"; val out = s"$root/out"; val ck = s"$root/ck"
      // normalized µs timestamps (events.parquet stores TIMESTAMP(NANOS) —
      // never readStream it bare); thin to the aggregate's columns
      val ev = graft.queries.Events.events(spark, dir)
        .select(col("user_id"), col("ts"), col("value"))
      val (tMin, tMax) = ev.agg(min(col("ts")), max(col("ts")))
        .as[(Timestamp, Timestamp)].collect().head
      val span = tMax.getTime - tMin.getTime
      val t1 = new Timestamp(tMin.getTime + span / 3)
      val t2 = new Timestamp(tMin.getTime + 2 * span / 3)

      def runPass(): Unit = {
        val stream = spark.readStream.schema(ev.schema)
          .option("maxFilesPerTrigger", 1)
          .parquet(in)
        val q = SessionStream.sessions(spark, stream, watermarkDelay = "1 second")
          .writeStream.format("parquet").outputMode("append")
          .option("path", out).option("checkpointLocation", ck)
          .trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
      }
      // time-ordered replay: three disjoint time ranges, one run each so
      // the watermark only ever advances between batches (no late drops)
      ev.filter(col("ts") < lit(t1)).repartition(1).write.mode("append").parquet(in)
      runPass()
      ev.filter(col("ts") >= lit(t1) && col("ts") < lit(t2)).repartition(1)
        .write.mode("append").parquet(in)
      runPass()
      ev.filter(col("ts") >= lit(t2)).repartition(1).write.mode("append").parquet(in)
      runPass()
      // flush sentinel: reserved user −1, 2 h past the horizon — its
      // arrival pushes the watermark over every real session's close
      Seq((-1L, new Timestamp(tMax.getTime + 2 * 3600 * 1000L), 0.0))
        .toDF("user_id", "ts", "value").repartition(1).write.mode("append").parquet(in)
      runPass()

      val got = spark.read.parquet(out)
        .filter(col("user_id") =!= -1L)
        .collect()
        .map(r => (
          r.getAs[Long]("user_id"), String.valueOf(r.getAs[Any]("session_start")),
          r.getAs[Long]("n_events"), r.getAs[Double]("total_value")))
        .sortBy(t => (t._1, t._2)).toSeq
      val want = Registry.byName("q_session_window").run(spark, dir).collect()
        .map(r => (
          r.getAs[Long]("user_id"), String.valueOf(r.getAs[Any]("session_start")),
          r.getAs[Long]("n_events"), r.getAs[Double]("total_value")))
        .sortBy(t => (t._1, t._2)).toSeq
      assert(want.nonEmpty)
      assert(got.size == want.size, s"session counts diverge: ${got.size} vs ${want.size}")
      assert(got == want, {
        val diff = got.zip(want).filter { case (a, b) => a != b }.take(5)
        s"sessions diverge (first diffs): $diff"
      })
    }
  }

  test("streaming tumbling windows equal q_tumbling_window bit-for-bit") {
    import spark.implicits._
    withRocksDb {
      val dir = sf()
      val root = Files.createTempDirectory("tumbling-stream").toString
      val in = s"$root/in"; val out = s"$root/out"; val ck = s"$root/ck"
      val ev = graft.queries.Events.events(spark, dir)
        .select(col("event_type"), col("ts"), col("value"))
      val (tMin, tMax) = ev.agg(min(col("ts")), max(col("ts")))
        .as[(Timestamp, Timestamp)].collect().head
      val tMid = new Timestamp(tMin.getTime + (tMax.getTime - tMin.getTime) / 2)

      def runPass(): Unit = {
        val stream = spark.readStream.schema(ev.schema)
          .option("maxFilesPerTrigger", 1)
          .parquet(in)
        val q = SessionStream.tumbling(spark, stream, watermarkDelay = "1 second")
          .writeStream.format("parquet").outputMode("append")
          .option("path", out).option("checkpointLocation", ck)
          .trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
      }
      ev.filter(col("ts") < lit(tMid)).repartition(1).write.mode("append").parquet(in)
      runPass()
      ev.filter(col("ts") >= lit(tMid)).repartition(1).write.mode("append").parquet(in)
      runPass()
      Seq(("__sentinel", new Timestamp(tMax.getTime + 2 * 3600 * 1000L), 0.0))
        .toDF("event_type", "ts", "value").repartition(1).write.mode("append").parquet(in)
      runPass()

      val got = spark.read.parquet(out)
        .filter(col("event_type") =!= "__sentinel")
        .collect()
        .map(r => (
          String.valueOf(r.getAs[Any]("hour_start")), r.getAs[String]("event_type"),
          r.getAs[Long]("cnt"), r.getAs[Double]("sum_value")))
        .sortBy(t => (t._1, t._2)).toSeq
      val want = Registry.byName("q_tumbling_window").run(spark, dir).collect()
        .map(r => (
          String.valueOf(r.getAs[Any]("hour_start")), r.getAs[String]("event_type"),
          r.getAs[Long]("cnt"), r.getAs[Double]("sum_value")))
        .sortBy(t => (t._1, t._2)).toSeq
      assert(want.nonEmpty)
      assert(got == want, {
        val diff = (got.toSet -- want.toSet) ++ (want.toSet -- got.toSet)
        s"tumbling windows diverge: ${diff.take(5)}"
      })
    }
  }

  test("streaming sliding windows equal q_sliding_window bit-for-bit") {
    import spark.implicits._
    withRocksDb {
      val dir = sf()
      val root = Files.createTempDirectory("sliding-stream").toString
      val in = s"$root/in"; val out = s"$root/out"; val ck = s"$root/ck"
      val ev = graft.queries.Events.events(spark, dir)
        .select(col("ts"), col("value"))
      val (tMin, tMax) = ev.agg(min(col("ts")), max(col("ts")))
        .as[(Timestamp, Timestamp)].collect().head
      val tMid = new Timestamp(tMin.getTime + (tMax.getTime - tMin.getTime) / 2)

      def runPass(): Unit = {
        val stream = spark.readStream.schema(ev.schema)
          .option("maxFilesPerTrigger", 1)
          .parquet(in)
        val q = SessionStream.sliding(spark, stream, watermarkDelay = "1 second")
          .writeStream.format("parquet").outputMode("append")
          .option("path", out).option("checkpointLocation", ck)
          .trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
      }
      ev.filter(col("ts") < lit(tMid)).repartition(1).write.mode("append").parquet(in)
      runPass()
      ev.filter(col("ts") >= lit(tMid)).repartition(1).write.mode("append").parquet(in)
      runPass()
      // sentinel rows never survive to the comparison: their two windows
      // sit past the real horizon and stay open (withheld) forever
      Seq((new Timestamp(tMax.getTime + 2 * 3600 * 1000L), 0.0))
        .toDF("ts", "value").repartition(1).write.mode("append").parquet(in)
      runPass()

      val got = spark.read.parquet(out)
        .collect()
        .map(r => (
          String.valueOf(r.getAs[Any]("win_start")),
          r.getAs[Long]("cnt"), r.getAs[Double]("sum_value")))
        .sortBy(_._1).toSeq
      val want = Registry.byName("q_sliding_window").run(spark, dir).collect()
        .map(r => (
          String.valueOf(r.getAs[Any]("win_start")),
          r.getAs[Long]("cnt"), r.getAs[Double]("sum_value")))
        .sortBy(_._1).toSeq
      assert(want.nonEmpty)
      assert(got == want, {
        val diff = (got.toSet -- want.toSet) ++ (want.toSet -- got.toSet)
        s"sliding windows diverge: ${diff.take(5)}"
      })
    }
  }
}
