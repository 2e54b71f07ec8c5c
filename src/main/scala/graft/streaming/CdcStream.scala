package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming CDC apply — the materialized-upsert-view twin of
  * q_merge_apply, and the operation the reference pipeline actually IS
  * (a source database's change feed continuously applied to a warehouse
  * table): `transformWithState` keyed by the row key holds the live
  * resolved row and folds U/D/I change events into it as they arrive.
  *
  * Conflict resolution is a PER-COLUMN max-seq LATTICE, not
  * apply-in-arrival-order: presence, price, and status each keep the
  * writer with the highest seq seen so far (a partial row image only
  * competes for the columns it carries). Each column's fold is a join in
  * the (seq, value) lattice — commutative, associative, idempotent — so
  * the final state is independent of arrival order AND of re-delivery:
  * the CdcStreamSpec gates replay the same feed time-ordered, fully
  * REVERSED, and with a re-delivered batch, and assert the final table
  * is identical each time, equal to the batch MERGE. This is the honest
  * streaming contract for CDC: where the watermarked twins DROP late
  * rows (SessionStreamSpec's divergence gates), an upsert view folds
  * them losslessly, because last-write-wins is defined by the log's seq,
  * not by arrival time.
  *
  * The per-column rule reproduces q_merge_apply's batch semantics on any
  * feed where full-image ops (I, and the seq-0 target snapshot) carry
  * every column and partial updates carry the columns they change — the
  * standard CDC partial-image shape. Presence: an I or U (upsert) with
  * the highest presence-seq makes the row live; a D makes it dead;
  * columns written before a delete survive a later re-insert exactly as
  * a seq-ordered replay would leave them.
  *
  * Scale shape: state is ONE resolved row per live key — the upsert view
  * itself, which is what any CDC consumer must hold (RocksDB-backed, so
  * the "state" is the serving table). Arrivals shuffle once on the key;
  * emissions are change-only (the view's own change stream, `upd`-
  * versioned per key so downstream consumers can take latest-wins).
  * Deleted keys retain a tombstone holding the delete's seq — the
  * standard price of making deletion commute with stale updates.
  * [[agedView]] is the production variant that pays that price only
  * temporarily: it maps the log's seq onto EVENT TIME
  * (`timestamp_seconds(seq)`), so Spark's own watermark over that column
  * IS the feed's seq low-watermark — advanced by the feed's heartbeat
  * rows (op `H`, the MySQL-binlog heartbeat shape), which carry no data
  * and touch no state. A key whose state goes dead registers an
  * event-time timer at its delete's seq; when the watermark passes it,
  * the timer fires, the tombstone is CLEARED from the store, and an
  * `aged = true` marker row is emitted as visible evidence. This is
  * safe precisely because of the watermark contract: once the
  * low-watermark passes the delete's seq the engine has already dropped
  * every possible stale (lower-seq) arrival, so nothing remains for the
  * tombstone to defend against — a higher-seq re-insert wins against a
  * missing row exactly as it would against the tombstone. The price, as
  * with every watermarked twin, is that lossless-under-any-order now
  * holds only WITHIN the watermark delay (CdcAgeSpec gates both halves:
  * aged-out state and the watermark dropping a post-age stale update).
  */
object CdcStream {

  /** One change event; `value`/`newStatus` are None for the columns a
    * partial image does not carry (D carries neither).
    */
  final case class ChangeArrival(
      k: Long, seq: Long, op: String, value: Option[Double], newStatus: Option[String])

  /** Per-key resolved state: each column its own (seq, value) lattice. */
  final case class RowState(
      pSeq: Long, present: Boolean,
      vSeq: Long, price: Option[Double],
      sSeq: Long, status: Option[String],
      upd: Long)

  /** Change-only emission of the live view; consumers take max-`upd` per
    * key — valid here because this view never clears state, so `upd` is
    * globally monotone per key. `present = false` is the view's delete
    * notification. (The AGED view's contract differs — see
    * [[AgedApplied]]: aging resets `upd`, so its consumers must resolve
    * by (pSeq, upd).)
    */
  final case class Applied(
      k: Long, upd: Long, present: Boolean, status: Option[String], price: Option[Double])

  /** [[Applied]] plus the aging marker: `aged = true` rows are emitted by
    * [[AgedApplyProcessor]] the moment a tombstone is cleared at the seq
    * low-watermark — the visible evidence that state was released.
    *
    * Latest-wins for THIS view is max-(`pSeq`, `upd`), NOT max-`upd`:
    * aging clears the state, so a post-age revival restarts `upd` at 1
    * — lower than the aged marker's — and a max-`upd` consumer would
    * resolve the key to the marker forever, silently dropping the
    * revival. `pSeq` (the presence lattice's seq) breaks the tie the
    * right way: a revival's seq is necessarily above the watermark that
    * aged the tombstone, hence above the marker's `pSeq`, so
    * (pSeq, upd) ordering puts every revival emission above every
    * pre-age emission and the marker. Within one state epoch `pSeq` is
    * nondecreasing and `upd` strictly increasing, so the ordering is
    * also correct epoch-internally. (The un-aged [[Applied]] view keeps
    * plain max-`upd`: its state never resets.)
    */
  final case class AgedApplied(
      k: Long, pSeq: Long, upd: Long, present: Boolean, status: Option[String],
      price: Option[Double], aged: Boolean)

  private val EmptyRow =
    RowState(Long.MinValue, false, Long.MinValue, None, Long.MinValue, None, 0L)

  /** Seq→event-time offset (one day of seconds): Spark's watermark starts
    * at epoch 0, so seq-proportional timestamps must sit strictly above
    * it or the first feed rows would be born late.
    */
  val SeqEpochOffset: Long = 86400L

  /** The per-column max-seq lattice join — shared by both processors so
    * the aged variant cannot drift from the gated fold. Op `H` is a feed
    * heartbeat: it advances the watermark (via its event-time column) but
    * folds to a no-op.
    */
  private def fold(s0: RowState, op: String, seq: Long,
      value: Option[Double], newStatus: Option[String]): RowState = {
    require(op == "U" || op == "D" || op == "I" || op == "H", s"unknown CDC op $op")
    if (op == "H") return s0
    var s = s0
    // presence lattice: U/I assert the row exists, D that it does not
    if (seq > s.pSeq) s = s.copy(pSeq = seq, present = op != "D")
    // value lattices: only the columns this image carries compete
    if (op != "D" && value.isDefined && seq > s.vSeq)
      s = s.copy(vSeq = seq, price = value)
    if (op != "D" && newStatus.isDefined && seq > s.sSeq)
      s = s.copy(sSeq = seq, status = newStatus)
    s.copy(upd = s.upd + 1L)
  }

  class ApplyProcessor extends StatefulProcessor[Long, ChangeArrival, Applied] {
    @transient private var st: ValueState[RowState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[RowState]("row", Encoders.kryo[RowState], TTLConfig.NONE)

    override def handleInputRows(
        key: Long,
        rows: Iterator[ChangeArrival],
        timerValues: TimerValues): Iterator[Applied] = {
      var s = if (st.exists()) st.get() else EmptyRow
      rows.foreach(r => s = fold(s, r.op, r.seq, r.value, r.newStatus))
      st.update(s)
      Iterator.single(Applied(key, s.upd, s.present, s.status, s.price))
    }
  }

  /** [[ChangeArrival]] with the seq mapped onto event time, for the aged
    * variant (`ts = timestamp_seconds(seq)`).
    */
  final case class ChangeArrivalTs(
      k: Long, seq: Long, op: String, value: Option[Double], newStatus: Option[String],
      ts: Timestamp)

  /** The aging variant: identical lattice fold, plus one event-time timer
    * per dead key at its delete's seq. When the watermark (= the feed's
    * seq low-watermark) passes it, the tombstone is cleared and an
    * `aged` marker emitted. A revival (higher-seq U/I) deletes the
    * pending timer; heartbeat-only keys never create state.
    */
  class AgedApplyProcessor extends StatefulProcessor[Long, ChangeArrivalTs, AgedApplied] {
    @transient private var st: ValueState[RowState] = _
    @transient private var tmr: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      st = getHandle.getValueState[RowState]("row", Encoders.kryo[RowState], TTLConfig.NONE)
      tmr = getHandle.getValueState[Long]("tmr", Encoders.scalaLong, TTLConfig.NONE)
    }

    private def syncTimer(s: RowState): Unit = {
      // a tombstone ages the moment the low-watermark passes its delete's
      // seq; live keys keep no timer
      val want =
        if (!s.present && s.pSeq > Long.MinValue) (s.pSeq + SeqEpochOffset) * 1000L else -1L
      val have = if (tmr.exists()) tmr.get() else -1L
      if (want != have) {
        if (have >= 0L) getHandle.deleteTimer(have)
        if (want >= 0L) { getHandle.registerTimer(want); tmr.update(want) }
        else tmr.clear()
      }
    }

    override def handleInputRows(
        key: Long,
        rows: Iterator[ChangeArrivalTs],
        timerValues: TimerValues): Iterator[AgedApplied] = {
      var s = if (st.exists()) st.get() else EmptyRow
      var nReal = 0
      rows.foreach { r =>
        if (r.op != "H") nReal += 1
        s = fold(s, r.op, r.seq, r.value, r.newStatus)
      }
      if (nReal == 0) return Iterator.empty // heartbeats advance the watermark only
      st.update(s)
      syncTimer(s)
      Iterator.single(AgedApplied(key, s.pSeq, s.upd, s.present, s.status, s.price, aged = false))
    }

    override def handleExpiredTimer(
        key: Long,
        timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[AgedApplied] = {
      tmr.clear()
      if (!st.exists()) return Iterator.empty
      val s = st.get()
      if (s.present) { syncTimer(s); return Iterator.empty } // revived before firing
      st.clear()
      Iterator.single(AgedApplied(key, s.pSeq, s.upd + 1L, false, None, None, aged = true))
    }
  }

  /** Processing-time TTL fallback of [[AgedApplyProcessor]], for feeds
    * WITHOUT op-`H` heartbeats: the event-time low-watermark never
    * advances through idle periods on such a feed, so its tombstones
    * would live forever (the base view's keep-forever behavior). This
    * variant bounds tombstone state by a WALL-CLOCK cap instead: a key
    * whose state goes dead registers a processing-time timer at
    * now + ttl; if still dead when it fires, the tombstone is cleared
    * and the `aged` marker emitted. A re-delivered delete keeps the
    * EARLIEST expiry (re-delivery must not extend a tombstone's life);
    * a revival cancels it.
    *
    * The price — documented, not hand-waved — is the heartbeat path's
    * provable no-resurrection argument: with no watermark there is no
    * engine-level late-row drop, so a stale (below-delete-seq) image
    * arriving after expiry re-creates state as if first-seen, and the
    * STATE STORE can hold a resurrected row the event-time path provably
    * cannot. Two mitigations survive: (1) consumers applying the
    * documented max-(pSeq, upd) resolution still resolve the key to the
    * pre-age tombstone emission — the stale row's pSeq sits below the
    * delete's, so the VIEW stays correct even when the store does not;
    * (2) any later legitimate image beats the stale state in the seq
    * lattice. CdcAgeSpec's TTL twin asserts markers, bounded state, AND
    * the divergence (the store-level resurrection the heartbeat path is
    * gated to refuse) as computed fact.
    */
  class TtlAgedApplyProcessor(ttlMs: Long)
      extends StatefulProcessor[Long, ChangeArrival, AgedApplied] {
    @transient private var st: ValueState[RowState] = _
    @transient private var tmr: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      st = getHandle.getValueState[RowState]("row", Encoders.kryo[RowState], TTLConfig.NONE)
      tmr = getHandle.getValueState[Long]("tmr", Encoders.scalaLong, TTLConfig.NONE)
    }

    private def syncTimer(s: RowState, nowMs: Long): Unit =
      if (!s.present && s.pSeq > Long.MinValue) {
        if (!tmr.exists()) {
          getHandle.registerTimer(nowMs + ttlMs)
          tmr.update(nowMs + ttlMs)
        } // else: keep the earliest expiry
      } else if (tmr.exists()) {
        getHandle.deleteTimer(tmr.get())
        tmr.clear()
      }

    override def handleInputRows(
        key: Long,
        rows: Iterator[ChangeArrival],
        timerValues: TimerValues): Iterator[AgedApplied] = {
      var s = if (st.exists()) st.get() else EmptyRow
      var nReal = 0
      rows.foreach { r =>
        if (r.op != "H") nReal += 1
        s = fold(s, r.op, r.seq, r.value, r.newStatus)
      }
      if (nReal == 0) return Iterator.empty
      st.update(s)
      syncTimer(s, timerValues.getCurrentProcessingTimeInMs())
      Iterator.single(AgedApplied(key, s.pSeq, s.upd, s.present, s.status, s.price, aged = false))
    }

    override def handleExpiredTimer(
        key: Long,
        timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[AgedApplied] = {
      tmr.clear()
      if (!st.exists()) return Iterator.empty
      val s = st.get()
      if (s.present) return Iterator.empty // revived before firing
      st.clear()
      Iterator.single(AgedApplied(key, s.pSeq, s.upd + 1L, false, None, None, aged = true))
    }
  }

  /** The full feed for the q_merge_apply fixture: the target snapshot as
    * seq-0 full-image inserts, plus the change log — both single-sourced
    * from [[graft.queries.Incremental]] so batch and stream replay the
    * identical rows.
    */
  def fixtureFeed(spark: SparkSession, dir: String): DataFrame = {
    val target = graft.queries.Incremental.mergeTarget(spark, dir)
      .select(col("k"), lit(0L).as("seq"), lit("I").as("op"),
        col("price").as("val"), col("status").as("new_status"))
    target.unionByName(graft.queries.Incremental.mergeLog(spark, dir))
  }

  /** The live upsert view over a change-event stream. */
  def view(spark: SparkSession, changes: DataFrame): Dataset[Applied] = {
    import spark.implicits._
    changes
      .select(
        col("k").cast("long").as("k"),
        col("seq").cast("long").as("seq"),
        col("op"),
        col("val").as("value"),
        col("new_status").as("newStatus"))
      .as[ChangeArrival]
      .groupByKey(_.k)
      .transformWithState(new ApplyProcessor, TimeMode.None(), OutputMode.Append())
  }

  /** Feed heartbeat rows (op `H`) at the given seqs — the feed-progress
    * signal that advances the seq low-watermark without touching state.
    * Keyed to a reserved id so they shuffle to one no-op group.
    */
  def heartbeats(spark: SparkSession, seqs: Seq[Long]): DataFrame = {
    import spark.implicits._
    seqs.toDF("seq").select(
      lit(-1L).as("k"), col("seq"), lit("H").as("op"),
      lit(null).cast("double").as("val"), lit(null).cast("string").as("new_status"))
  }

  /** The tombstone-AGING upsert view: same lattice fold, with the seq
    * mapped onto event time so the configured watermark delay defines the
    * feed's seq low-watermark. Tombstones are cleared (and `aged = true`
    * markers emitted) once the low-watermark passes their delete's seq;
    * arrivals more than `watermarkDelay` of seq-time behind the feed head
    * are dropped by the engine — the honest bounded-lateness contract
    * this variant trades the unbounded tombstone store for.
    */
  def agedView(
      spark: SparkSession, changes: DataFrame, watermarkDelay: String): Dataset[AgedApplied] = {
    import spark.implicits._
    changes
      .select(
        col("k").cast("long").as("k"),
        col("seq").cast("long").as("seq"),
        col("op"),
        col("val").as("value"),
        col("new_status").as("newStatus"),
        timestamp_seconds(col("seq") + lit(SeqEpochOffset)).as("ts"))
      .withWatermark("ts", watermarkDelay)
      .as[ChangeArrivalTs]
      .groupByKey(_.k)
      .transformWithState(new AgedApplyProcessor, TimeMode.EventTime(), OutputMode.Append())
  }

  /** The processing-time TTL aging view ([[TtlAgedApplyProcessor]]) — the
    * heartbeat-less fallback. No watermark, no event-time column: the
    * feed needs nothing beyond its change rows, and tombstone state is
    * bounded by wall-clock `ttl` instead of the seq low-watermark. See
    * the processor scaladoc for the resurrection tradeoff this accepts.
    *
    * OPERATIONAL NOTE — do NOT drive this view with
    * `Trigger.AvailableNow` + `awaitTermination()`. A
    * `TimeMode.ProcessingTime` stateful operator always reports that
    * another micro-batch might do work (wall-clock keeps advancing, so a
    * registered-but-unexpired timer could fire next batch), and
    * AvailableNow terminates only when no data remains AND no operator
    * wants another batch — the combination busy-loops empty micro-batches
    * forever once the backlog is consumed (observed: thousands of empty
    * commits). `processAllAvailable()` hangs identically: the forced
    * timer batches keep the engine from ever latching its no-new-data
    * flag. Run it as the continuous stream it is
    * (`Trigger.ProcessingTime`) and stop it on an EXTERNAL condition
    * (e.g. expected sink state); CdcAgeSpec.drainTtl is the
    * bounded-drain recipe.
    */
  def ttlAgedView(
      spark: SparkSession, changes: DataFrame, ttlMs: Long): Dataset[AgedApplied] = {
    import spark.implicits._
    changes
      .select(
        col("k").cast("long").as("k"),
        col("seq").cast("long").as("seq"),
        col("op"),
        col("val").as("value"),
        col("new_status").as("newStatus"))
      .as[ChangeArrival]
      .groupByKey(_.k)
      .transformWithState(
        new TtlAgedApplyProcessor(ttlMs), TimeMode.ProcessingTime(), OutputMode.Append())
  }
}
