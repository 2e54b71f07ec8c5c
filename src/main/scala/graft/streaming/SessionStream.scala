package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Agg

/** Streaming sessionization from PURE BUILT-INS — the sixth stream≡batch
  * twin, and deliberately the one with no custom processor: the batch
  * q_session_window's scaladoc claims `session_window` works identically
  * under `readStream` + watermark, and this composition (plus
  * SessionStreamSpec) makes that claim a gated equality instead of a
  * comment. Contrast with [[SearchStream]]/[[PricingStream]]: when the
  * engine's built-in stateful operator already expresses the semantics,
  * the twin is a one-liner — custom `transformWithState` processors are
  * reserved for state shapes built-ins can't hold (the preference order
  * the survey mandates).
  *
  * Append-mode emission: a session row emits only once the watermark
  * passes its close (last event + gap), so sessions still open at
  * stream end never surface. The production pattern — used by the spec
  * — is a FLUSH SENTINEL: one event far past the real horizon advances
  * the watermark over every real session's close on the next
  * micro-batch; the sentinel's own (never-closing) session is the only
  * row withheld, and it belongs to a reserved user id the consumer
  * excludes. The aggregate itself is the dsum fixed-point fold, so
  * emitted rows are BIT-equal to the batch query's.
  *
  * Scale shape: state is per (user, open session) — bounded by the gap
  * and the watermark delay, evicted on close; the shuffle is the same
  * user-keyed exchange the batch groupBy runs. Late events beyond the
  * watermark delay drop (the documented streaming trade; the spec's
  * time-ordered replay keeps the equality exact).
  */
object SessionStream {

  /** 30-min-gap sessions per user over an event stream — the EXACT
    * q_session_window aggregate under a watermark.
    */
  def sessions(spark: SparkSession, events: DataFrame, watermarkDelay: String): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(session_window(col("ts"), graft.queries.Events.SessionGap), col("user_id"))
      .agg(count(lit(1)).as("n_events"), Agg.dsum(col("value")).as("total_value"))
      .select(
        col("user_id"),
        col("session_window.start").cast("timestamp_ntz").as("session_start"),
        col("n_events"),
        col("total_value"))

  /** 1-hour tumbling windows per event type — the EXACT
    * q_tumbling_window aggregate under a watermark (fixed windows close
    * as the watermark passes window end; same flush-sentinel drain as
    * [[sessions]], same dsum bit-equality).
    */
  def tumbling(spark: SparkSession, events: DataFrame, watermarkDelay: String): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), graft.queries.Events.TumblingWidth), col("event_type"))
      .agg(count(lit(1)).as("cnt"), Agg.dsum(col("value")).as("sum_value"))
      .select(
        col("window.start").cast("timestamp_ntz").as("hour_start"),
        col("event_type"),
        col("cnt"),
        col("sum_value"))

  /** 1-hour windows sliding every 30 min — the EXACT q_sliding_window
    * aggregate under a watermark (every event lands in two windows; each
    * closes independently as the watermark passes its end). Completes
    * the windowed trio with [[tumbling]] and [[sessions]].
    */
  def sliding(spark: SparkSession, events: DataFrame, watermarkDelay: String): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), graft.queries.Events.TumblingWidth, graft.queries.Events.SlideStep))
      .agg(count(lit(1)).as("cnt"), Agg.dsum(col("value")).as("sum_value"))
      .select(
        col("window.start").cast("timestamp_ntz").as("win_start"),
        col("cnt"),
        col("sum_value"))
}
