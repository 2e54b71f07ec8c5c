package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec

/** The sentinel-free drain gate (round-12 verdict #4): the timer-based
  * sessionization twin must emit — WITHOUT any flush sentinel — exactly
  * the batch sessions whose close the final watermark passed, withhold
  * exactly the rest, and agree with the built-in sentinel-drained twin
  * where both emit. Doubles are bit-equal (shared dsum fixed-point
  * recipe).
  */
class SessionTimerStreamSpec extends SparkSpec {

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

  test("timers drain closed sessions with NO sentinel: emitted ≡ batch ∩ closed, withheld ≡ open") {
    import spark.implicits._
    withRocksDb {
      val dir = sf()
      val root = Files.createTempDirectory("session-timer").toString
      val in = s"$root/in"; val out = s"$root/out"; val ck = s"$root/ck"
      val base = graft.queries.Events.events(spark, dir)
        .select(col("user_id"), col("ts").cast("timestamp").as("ts"), col("value"))
      val (tMin, tMax) = base.agg(min(col("ts")), max(col("ts")))
        .as[(Timestamp, Timestamp)].collect().head
      val span = tMax.getTime - tMin.getTime
      val t1 = new Timestamp(tMin.getTime + span / 3)
      val t2 = new Timestamp(tMin.getTime + 2 * span / 3)

      def runPass(): Unit = {
        val stream = spark.readStream.schema(base.schema)
          .option("maxFilesPerTrigger", 1)
          .parquet(in)
        val q = SessionTimerStream.sessions(spark, stream, watermarkDelay = "1 second")
          .writeStream.format("parquet").outputMode("append")
          .option("path", out).option("checkpointLocation", ck)
          .trigger(Trigger.AvailableNow()).start()
        StreamDrain.boundedAwait(q)
      }
      // time-ordered replay, restart mid-stream (timers must survive the
      // checkpoint), and NO sentinel anywhere
      base.filter(col("ts") < lit(t1)).repartition(1).write.mode("append").parquet(in)
      base.filter(col("ts") >= lit(t1) && col("ts") < lit(t2)).repartition(1)
        .write.mode("append").parquet(in)
      runPass()
      base.filter(col("ts") >= lit(t2)).repartition(1).write.mode("append").parquet(in)
      runPass()

      // batch truth with each session's close: end = last event + gap
      val batch = base
        .groupBy(session_window(col("ts"), graft.queries.Events.SessionGap), col("user_id"))
        .agg(count(lit(1)).as("n_events"), graft.core.Agg.dsum(col("value")).as("total_value"))
        .select(
          col("user_id"), col("session_window.start").as("s"), col("session_window.end").as("e"),
          col("n_events"), col("total_value"))
        .collect()
        .map(r => (
          r.getAs[Long]("user_id"), r.getAs[Timestamp]("s").getTime,
          r.getAs[Timestamp]("e").getTime, r.getAs[Long]("n_events"),
          r.getAs[Double]("total_value")))
      // the final watermark: max event time of the last batch − delay
      val finalWm = tMax.getTime - 1000L
      val drained = batch.filter(_._3 <= finalWm)
        .map(t => (t._1, t._2, t._4, t._5)).toSet
      val open = batch.filter(_._3 > finalWm)
        .map(t => (t._1, t._2, t._4, t._5)).toSet

      val got = spark.read.parquet(out).collect()
        .map(r => (
          r.getAs[Long]("user_id"), r.getAs[Timestamp]("session_start").getTime,
          r.getAs[Long]("n_events"), r.getAs[Double]("total_value"))).toSet

      assert(drained.nonEmpty && open.nonEmpty,
        s"fixture must leave sessions on both sides of the horizon (${drained.size}/${open.size})")
      // the drain contract, both directions, values bit-equal
      assert(got == drained, {
        val missing = drained -- got; val extra = got -- drained
        s"timer drain diverged: missing=${missing.take(3)} extra=${extra.take(3)}"
      })
      assert(got.intersect(open).isEmpty, "a still-open session leaked past the watermark")
    }
  }

  test("cross-validation: timer drain matches the sentinel-drained built-in twin where both emit") {
    import spark.implicits._
    withRocksDb {
      // the sentinel spec stays the semantics oracle (round-12 verdict
      // #4 asks for cross-validation, not replacement): same synthetic
      // replay through BOTH twins; the built-in + sentinel drains
      // everything, the timer twin drains everything the final watermark
      // passed — on a fixture whose sessions all close before the last
      // arrival, the two emission sets must be identical.
      def t(hhmm: String): Timestamp = Timestamp.valueOf(s"2024-01-01 $hhmm:00")
      val evs = Seq(
        (1L, t("09:00"), 1.5), (1L, t("09:10"), 2.5), // u1 session A
        (2L, t("09:05"), 4.0),                        // u2 session
        (1L, t("11:00"), 8.0),                        // u1 session B
        (3L, t("15:00"), 0.5))                        // late-day arrival closes everything
      val root = Files.createTempDirectory("session-timer-xval").toString
      val inT = s"$root/inT"; val outT = s"$root/outT"; val ckT = s"$root/ckT"
      val inS = s"$root/inS"; val outS = s"$root/outS"; val ckS = s"$root/ckS"
      val df = evs.toDF("user_id", "ts", "value")

      // timer twin: two batches, no sentinel; u3's own session stays open
      df.filter(col("ts") < lit(t("12:00"))).repartition(1).write.mode("append").parquet(inT)
      df.filter(col("ts") >= lit(t("12:00"))).repartition(1).write.mode("append").parquet(inT)
      val qT = SessionTimerStream.sessions(
        spark, spark.readStream.schema(df.schema).option("maxFilesPerTrigger", 1).parquet(inT),
        watermarkDelay = "1 second")
        .writeStream.format("parquet").outputMode("append")
        .option("path", outT).option("checkpointLocation", ckT)
        .trigger(Trigger.AvailableNow()).start()
      StreamDrain.boundedAwait(qT)

      // built-in twin: same replay plus the flush sentinel
      df.filter(col("ts") < lit(t("12:00"))).repartition(1).write.mode("append").parquet(inS)
      df.filter(col("ts") >= lit(t("12:00"))).repartition(1).write.mode("append").parquet(inS)
      Seq((-1L, t("23:00"), 0.0)).toDF("user_id", "ts", "value")
        .repartition(1).write.mode("append").parquet(inS)
      val qS = SessionStream.sessions(
        spark, spark.readStream.schema(df.schema).option("maxFilesPerTrigger", 1).parquet(inS),
        watermarkDelay = "1 second")
        .writeStream.format("parquet").outputMode("append")
        .option("path", outS).option("checkpointLocation", ckS)
        .trigger(Trigger.AvailableNow()).start()
      StreamDrain.boundedAwait(qS)

      def rows(path: String, dropUsers: Set[Long]): Set[(Long, String, Long, Double)] =
        spark.read.parquet(path).collect()
          .map(r => (
            r.getAs[Long]("user_id"),
            String.valueOf(r.getAs[Any]("session_start")).replace('T', ' ').take(16),
            r.getAs[Long]("n_events"), r.getAs[Double]("total_value")))
          .filterNot(t => dropUsers.contains(t._1)).toSet

      // drop the sentinel user from the built-in sink and u3 from both:
      // u3's session closes only via the sentinel (timer twin withholds it)
      val gotTimer = rows(outT, dropUsers = Set(3L))
      val gotSentinel = rows(outS, dropUsers = Set(-1L, 3L))
      assert(gotTimer.nonEmpty && gotTimer == gotSentinel,
        s"twins diverge: timer=$gotTimer sentinel=$gotSentinel")
      // and the timer twin really did withhold u3 (no sentinel to close it)
      assert(rows(outT, Set.empty).forall(_._1 != 3L))
    }
  }
}
