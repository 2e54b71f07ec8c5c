package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming twin of the incremental inverted-index maintenance
  * ([[graft.ext.SearchQueries]]' q_index_incremental, round-11 verdict
  * #5): per-term index segments maintained with `transformWithState`
  * over ARRIVING documents. The batch query proves the segment-merge
  * algebra associative (df and total_tf add; doc-disjoint entry arrays
  * concatenate); this processor IS that fold run one micro-batch at a
  * time — each batch's per-(term, doc) postings rows merge into the
  * stored per-term state, so stream-end digests are IDENTICAL to the
  * from-scratch q_inverted_index build over the same corpus.
  * IndexStreamSpec streams the fixture corpus in multiple micro-batches
  * across a restart and asserts exactly that, term for term.
  *
  * Delivery contract: same as [[SearchStream]] — append-only docs,
  * exactly-once per (term, doc) from the checkpointed source; a
  * re-delivered (term, doc) entry (doc_id already posted for the term)
  * is skipped wholesale, making re-delivery idempotent (here the guard
  * is COMPLETE, unlike SearchStream's stats-only residual, because every
  * arrival carries its doc_id and the state holds all of the term's
  * postings).
  *
  * Scale shape: keying by term gives the same shuffle axis as the batch
  * build's (term, doc) → term aggregation; per-term state is O(the
  * term's postings) — at 100 TB the stopword axis shards by the same
  * (term, doc_id div B) composite key as the batch scale note, and the
  * per-segment states merge by the same algebra. Only terms that
  * received arrivals re-emit, so the append sink carries one digest row
  * per (term, batch-with-changes); `df` is monotone per term (each
  * folded doc adds exactly one posting), so max(df) marks the final row.
  */
object IndexStream {

  /** One document's postings for one term — the same unit the batch
    * build aggregates (perDocPostings): tf plus the serialized
    * "doc:p1,p2" entry.
    */
  final case class TermArrival(term: String, doc_id: Long, tf: Long, entry: String)

  /** One emitted digest row; equals the q_inverted_index row for `term`
    * once the stream has folded the whole corpus.
    */
  final case class SegRow(term: String, df: Long, total_tf: Long, postings_md5: String)

  final case class SegState(df: Long, totalTf: Long, entries: Map[Long, String])

  private[streaming] def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  class SegmentProcessor extends StatefulProcessor[String, TermArrival, SegRow] {
    @transient private var st: ValueState[SegState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[SegState]("seg", Encoders.kryo[SegState], TTLConfig.NONE)

    override def handleInputRows(
        key: String,
        rows: Iterator[TermArrival],
        timerValues: TimerValues): Iterator[SegRow] = {
      var s = if (st.exists()) st.get() else SegState(0L, 0L, Map.empty)
      rows.foreach { r =>
        if (!s.entries.contains(r.doc_id)) {
          s = SegState(s.df + 1L, s.totalTf + r.tf, s.entries.updated(r.doc_id, r.entry))
        }
      }
      st.update(s)
      val canonical = s.entries.toSeq.sortBy { case (doc, _) => doc }
        .map { case (_, e) => e }.mkString("|")
      Iterator.single(SegRow(key, s.df, s.totalTf, md5Hex(canonical)))
    }
  }

  /** Explode a (doc_id, text) stream into per-(term, doc) postings rows —
    * the exact serialized unit the batch build's perDocPostings emits.
    */
  def termArrivals(spark: SparkSession, docs: Dataset[(Long, String)]): Dataset[TermArrival] = {
    import spark.implicits._
    docs.flatMap { case (id, text) =>
      text.split(" ", -1).zipWithIndex
        .groupBy { case (w, _) => w }
        .map { case (term, occ) =>
          val ps = occ.map { case (_, p) => p }.sorted
          TermArrival(term, id, ps.length.toLong, s"$id:${ps.mkString(",")}")
        }
    }
  }

  /** Per-term incremental index segments over a document stream. */
  def segments(spark: SparkSession, docs: Dataset[(Long, String)]): Dataset[SegRow] = {
    import spark.implicits._
    termArrivals(spark, docs)
      .groupByKey(_.term)
      .transformWithState(new SegmentProcessor, TimeMode.None(), OutputMode.Append())
  }
}
