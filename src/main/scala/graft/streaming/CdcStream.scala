package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

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
  * standard price of making deletion commute with stale updates; a
  * production deployment ages tombstones out once the feed's seq
  * low-watermark passes them.
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
    * key. `present = false` is the view's delete notification.
    */
  final case class Applied(
      k: Long, upd: Long, present: Boolean, status: Option[String], price: Option[Double])

  class ApplyProcessor extends StatefulProcessor[Long, ChangeArrival, Applied] {
    @transient private var st: ValueState[RowState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[RowState]("row", Encoders.kryo[RowState], TTLConfig.NONE)

    override def handleInputRows(
        key: Long,
        rows: Iterator[ChangeArrival],
        timerValues: TimerValues): Iterator[Applied] = {
      var s =
        if (st.exists()) st.get()
        else RowState(Long.MinValue, false, Long.MinValue, None, Long.MinValue, None, 0L)
      rows.foreach { r =>
        require(r.op == "U" || r.op == "D" || r.op == "I", s"unknown CDC op ${r.op}")
        // presence lattice: U/I assert the row exists, D that it does not
        if (r.seq > s.pSeq) s = s.copy(pSeq = r.seq, present = r.op != "D")
        // value lattices: only the columns this image carries compete
        if (r.op != "D" && r.value.isDefined && r.seq > s.vSeq)
          s = s.copy(vSeq = r.seq, price = r.value)
        if (r.op != "D" && r.newStatus.isDefined && r.seq > s.sSeq)
          s = s.copy(sSeq = r.seq, status = r.newStatus)
        s = s.copy(upd = s.upd + 1L)
      }
      st.update(s)
      Iterator.single(Applied(key, s.upd, s.present, s.status, s.price))
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
}
