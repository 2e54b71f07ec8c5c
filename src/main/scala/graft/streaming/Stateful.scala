package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Custom stateful streaming op (SURVEY §2.8 "stateful ops"):
  * per-user running event counts via `flatMapGroupsWithState` — state (the
  * cumulative count) persists in the checkpointed state store across
  * micro-batches and across `Trigger.AvailableNow` runs.
  *
  * Used where built-ins can't express the state machine; the session
  * windows the reference's extension needs are done with the built-in
  * `session_window` (see graft.queries.Events) — this demonstrates the
  * escape hatch.
  */
object Stateful {

  final case class UserEvent(user_id: Long, event_type: String)
  final case class UserCount(user_id: Long, cumulative: Long, batch_events: Int)

  def updateCount(
      userId: Long,
      events: Iterator[UserEvent],
      state: GroupState[Long]): Iterator[UserCount] = {
    val n = events.size
    val total = state.getOption.getOrElse(0L) + n
    state.update(total)
    Iterator.single(UserCount(userId, total, n))
  }

  /** Running per-user counts over a stream of UserEvent. */
  def runningCounts(spark: SparkSession, events: Dataset[UserEvent]): Dataset[UserCount] = {
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(updateCount)
  }

  /** Same state machine on the Spark 4 `transformWithState` API
    * (StatefulProcessor + typed ValueState): the successor to
    * flatMapGroupsWithState — explicit named state slots with per-slot
    * encoders and TTL, timers, and schema-evolvable RocksDB-backed
    * state. Requires
    * `spark.sql.streaming.stateStore.providerClass = ...RocksDBStateStoreProvider`.
    */
  class RunningCountProcessor extends StatefulProcessor[Long, UserEvent, UserCount] {
    @transient private var count: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      count = getHandle.getValueState[Long]("count", Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(
        key: Long,
        rows: Iterator[UserEvent],
        timerValues: TimerValues): Iterator[UserCount] = {
      val n = rows.size
      val total = (if (count.exists()) count.get() else 0L) + n
      count.update(total)
      Iterator.single(UserCount(key, total, n))
    }
  }

  /** runningCounts via transformWithState (state survives runs exactly as
    * the flatMapGroupsWithState variant; spec asserts both agree).
    */
  def runningCountsTws(spark: SparkSession, events: Dataset[UserEvent]): Dataset[UserCount] = {
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(new RunningCountProcessor, TimeMode.None(), OutputMode.Append())
  }

  final case class Scored(key: String, id: Long, score: Double)
  final case class Leader(key: String, rank: Int, id: Long, score: Double)

  /** Streaming per-key top-k — the stateful counterpart of the batch
    * [[graft.plans.TopKPerKey]] operator: each key's state is the
    * CURRENT top-k only (a bounded list, exactly the batch operator's
    * per-key heap), updated per micro-batch and re-emitted whenever it
    * changes. State size is k rows per live key regardless of stream
    * length — the property that lets a leaderboard run forever. Ties
    * break (score desc, id asc), matching the batch operator's
    * determinism contract.
    *
    * Entrant identity: one board slot per id, scored at its BEST score
    * so far (re-scores and re-deliveries collapse to max) — standard
    * leaderboard semantics; without the dedupe, a re-scored id would
    * occupy multiple ranks at once. Needing every submission ranked as a
    * distinct row is a different operator (give rows unique ids).
    */
  class TopKProcessor(k: Int) extends StatefulProcessor[String, Scored, Leader] {
    @transient private var top: ValueState[List[(Double, Long)]] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      top = getHandle.getValueState[List[(Double, Long)]](
        "top", Encoders.kryo[List[(Double, Long)]], TTLConfig.NONE)

    override def handleInputRows(
        key: String,
        rows: Iterator[Scored],
        timerValues: TimerValues): Iterator[Leader] = {
      val prev = if (top.exists()) top.get() else Nil
      val merged = (prev ++ rows.map(r => (r.score, r.id)))
        .groupBy { case (_, id) => id }
        .map { case (_, scores) => scores.maxBy { case (s, _) => s } }
        .toList
        .sortBy { case (s, id) => (-s, id) }
        .take(k)
      if (merged == prev) Iterator.empty
      else {
        top.update(merged)
        merged.iterator.zipWithIndex.map { case ((s, id), i) => Leader(key, i + 1, id, s) }
      }
    }
  }

  /** Per-key top-k leaderboard over a stream of Scored rows. */
  def leaderboard(spark: SparkSession, scored: Dataset[Scored], k: Int): Dataset[Leader] = {
    import spark.implicits._
    scored
      .groupByKey(_.key)
      .transformWithState(new TopKProcessor(k), TimeMode.None(), OutputMode.Append())
  }

  final case class ValEvent(user_id: Long, event_id: Long, ts: Long, value: Double)
  final case class Decayed(user_id: Long, event_id: Long, decayed: Double)

  /** Streaming counterpart of the batch `q_decay_sum` window: per-user
    * finite-horizon exponentially-decayed rolling sum, maintained
    * incrementally. State per key is the last 8 values (newest first) —
    * the SAME 8-value bound the batch formulation's truncated horizon
    * implies, which is exactly why the recurrence is streamable with
    * bounded state: Σ_{k=0..7} v(k)·2^(7−k) needs only the ring, never
    * the history. Rows are ordered (ts, event_id) within each
    * micro-batch so intra-batch arrival order can't reorder the taps;
    * cross-batch late data is watermark territory (the batch query is
    * the replay/backfill path).
    */
  class DecayProcessor extends StatefulProcessor[Long, ValEvent, Decayed] {
    @transient private var recent: ValueState[List[Double]] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      recent = getHandle.getValueState[List[Double]](
        "recent", Encoders.kryo[List[Double]], TTLConfig.NONE)

    override def handleInputRows(
        key: Long,
        rows: Iterator[ValEvent],
        timerValues: TimerValues): Iterator[Decayed] = {
      var hist = if (recent.exists()) recent.get() else Nil
      val out = rows.toSeq.sortBy(r => (r.ts, r.event_id)).map { r =>
        hist = (r.value :: hist).take(8)
        // newest gets weight 2^7 — the identical left-associated sum the
        // batch expression evaluates, so the doubles agree bit-for-bit
        val d = hist.zipWithIndex.map { case (v, k) => v * (1L << (7 - k)) }.sum
        Decayed(key, r.event_id, d)
      }
      recent.update(hist)
      out.iterator
    }
  }

  /** Per-user decayed activity scores over a stream of ValEvent. */
  def decayScores(spark: SparkSession, events: Dataset[ValEvent]): Dataset[Decayed] = {
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(new DecayProcessor, TimeMode.None(), OutputMode.Append())
  }
}
