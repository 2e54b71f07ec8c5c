package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Custom-processor sessionization with EVENT-TIME TIMERS — the
  * production drain the flush sentinel stands in for (round-12 verdict
  * #4): [[SessionStream.sessions]] (the pure-built-in twin) emits a
  * session only when a LATER ARRIVAL advances the watermark past its
  * close, so tests and demos append a sentinel event to drain the last
  * real sessions. This sibling closes sessions on
  * `transformWithState` event-time timers instead: each user keeps its
  * open sessions as state, registers one timer at the earliest close
  * (last event + gap), and `handleExpiredTimer` emits every session the
  * watermark has passed — no sentinel, no reserved user id, emission
  * driven by the engine's own watermark clock. Sessions still open at
  * the stream horizon stay open (their close is beyond the final
  * watermark) — the honest continuous-stream contract, which
  * SessionTimerStreamSpec asserts as a computed split: emitted ≡ batch
  * sessions with close ≤ final watermark, withheld ≡ exactly the rest.
  *
  * Semantics are the built-in `session_window`'s: an event extends a
  * session while ts < last + gap (sessions are [start, last + gap)
  * windows), one event can BRIDGE two open sessions into one, and
  * watermark-late input rows are dropped by the engine before the
  * processor (TimeMode.EventTime + withWatermark). The value aggregate
  * is the dsum fixed-point fold (per-row round(x·1e4) BEFORE the
  * processor, exact integer sums inside, ONE final division), so
  * emitted totals are BIT-equal to q_session_window's.
  *
  * Scale shape: state per user is its OPEN sessions only (bounded by
  * the gap and the watermark delay — closed sessions leave state the
  * micro-batch their timer fires) plus one registered timer; the
  * shuffle is the same user-keyed exchange the batch groupBy runs.
  * Timer count is ≤ one per user with open state — the engine stores
  * timers in the state store alongside the values, so restart safety
  * comes from the same checkpoint the twins already gate.
  */
object SessionTimerStream {

  final case class Ev(user_id: Long, ts: Timestamp, value_fp: Long)

  final case class Sess(startMs: Long, lastMs: Long, n: Long, sumFp: Long)

  final case class SessionRow(
      user_id: Long,
      session_start: Timestamp,
      n_events: Long,
      total_value: Double)

  class TimerSessionProcessor(gapMs: Long)
      extends StatefulProcessor[Long, Ev, SessionRow] {
    @transient private var open: ValueState[Seq[Sess]] = _
    @transient private var timer: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      open = getHandle.getValueState[Seq[Sess]]("open", Encoders.kryo[Seq[Sess]], TTLConfig.NONE)
      timer = getHandle.getValueState[Long]("timer", Encoders.scalaLong, TTLConfig.NONE)
    }

    /** Keep exactly one registered timer per user, at the earliest open
      * close — re-registered whenever a merge/extension moves it.
      */
    private def syncTimer(sessions: Seq[Sess]): Unit = {
      val want = if (sessions.isEmpty) -1L else sessions.map(_.lastMs + gapMs).min
      val have = if (timer.exists()) timer.get() else -1L
      if (want != have) {
        if (have >= 0L) getHandle.deleteTimer(have)
        if (want >= 0L) { getHandle.registerTimer(want); timer.update(want) }
        else timer.clear()
      }
    }

    override def handleInputRows(
        key: Long,
        rows: Iterator[Ev],
        timerValues: TimerValues): Iterator[SessionRow] = {
      var sessions = if (open.exists()) open.get() else Seq.empty[Sess]
      rows.foreach { e =>
        val ts = e.ts.getTime
        // an event merges with every session it gap-overlaps — possibly
        // bridging two (the built-in session_window merge semantics)
        val (hit, miss) = sessions.partition(s => ts < s.lastMs + gapMs && s.startMs < ts + gapMs)
        val merged = Sess(
          (ts +: hit.map(_.startMs)).min,
          (ts +: hit.map(_.lastMs)).max,
          hit.map(_.n).sum + 1L,
          hit.map(_.sumFp).sum + e.value_fp)
        sessions = miss :+ merged
      }
      open.update(sessions)
      syncTimer(sessions)
      Iterator.empty
    }

    override def handleExpiredTimer(
        key: Long,
        timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[SessionRow] = {
      val wm = math.max(timerValues.getCurrentWatermarkInMs, expiredTimerInfo.getExpiryTimeInMs)
      val sessions = if (open.exists()) open.get() else Seq.empty[Sess]
      val (closed, stillOpen) = sessions.partition(_.lastMs + gapMs <= wm)
      if (stillOpen.isEmpty) open.clear() else open.update(stillOpen)
      timer.clear() // the fired timer is gone; register the next close
      syncTimer(stillOpen)
      closed.sortBy(_.startMs).iterator.map { s =>
        // the dsum final chain: exact integer sum, ONE divide by 1e4
        SessionRow(key, new Timestamp(s.startMs), s.n, s.sumFp.toDouble / 10000.0)
      }
    }
  }

  /** Quantize values with the batch dsum recipe (round(x·1e4), exact in
    * double space) so the stateful fold is pure integer algebra.
    */
  def arrivals(spark: SparkSession, events: DataFrame, watermarkDelay: String): Dataset[Ev] = {
    import spark.implicits._
    events
      .select(
        col("user_id"),
        col("ts").cast("timestamp").as("ts"),
        round(col("value") * lit(10000.0)).cast("long").as("value_fp"))
      .withWatermark("ts", watermarkDelay)
      .as[Ev]
  }

  /** 30-min-gap sessions per user, drained by event-time timers — the
    * q_session_window aggregate without a flush sentinel.
    */
  def sessions(
      spark: SparkSession,
      events: DataFrame,
      watermarkDelay: String,
      gap: String = graft.queries.Events.SessionGap): Dataset[SessionRow] = {
    import spark.implicits._
    val gapMs = org.apache.spark.sql.catalyst.util.IntervalUtils
      .stringToInterval(org.apache.spark.unsafe.types.UTF8String.fromString(gap))
      .microseconds / 1000L
    arrivals(spark, events, watermarkDelay)
      .groupByKey(_.user_id)
      .transformWithState(
        new TimerSessionProcessor(gapMs), TimeMode.EventTime(), OutputMode.Append())
  }
}
