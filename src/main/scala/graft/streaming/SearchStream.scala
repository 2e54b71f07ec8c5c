package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming twin of the batch BM25 ranking ([[graft.ext.SearchQueries]]'
  * q_bm25): an incremental per-query top-k leaderboard over ARRIVING
  * documents, maintained with `transformWithState` (round-10 verdict #7,
  * the retrieval counterpart of [[Stateful.TopKProcessor]]).
  *
  * Why the state is what it is: a BM25 score is NOT incrementally
  * per-doc — every arrival shifts the corpus stats (N, total tokens,
  * per-term df) and thereby every candidate's score. What IS incremental
  * is the sufficient statistics: per query the state holds (n, total_tok,
  * df per query term, and the candidate postings — (dl, per-term tf) for
  * docs containing ≥1 query term). Each micro-batch folds its arrivals
  * into those statistics and re-ranks, so stream-end state scores are
  * IDENTICAL to the batch query over the same corpus — the exact-integer
  * formula is copied term for term (same div discipline; all operands
  * positive). SearchStreamSpec streams the fixture corpus through
  * [[leaderboard]] across multiple micro-batches and asserts each query's
  * final board equals q_bm25's top-5 doc-for-doc and score-for-score.
  *
  * Delivery contract: arrivals are APPEND-ONLY (a doc_id's text never
  * changes) and exactly-once per (query, doc) — the checkpointed
  * micro-batch source provides exactly-once across restarts. As
  * defense-in-depth, a re-delivered CANDIDATE arrival (doc_id already in
  * `cand`) is skipped wholesale, so candidate re-delivery is idempotent;
  * a re-delivered STATS-ONLY arrival (empty tfs — the doc never entered
  * `cand`) cannot be detected without an O(corpus) seen-set per query,
  * so it stays excluded by contract rather than guarded. Both halves are
  * asserted in SearchStreamSpec (candidate re-delivery leaves the board
  * and `upd` unchanged).
  *
  * Scale shape: keying by query_id partitions state by query; per-query
  * state is O(candidate postings of that query's terms) — the same
  * work-∝-postings bound as the batch plan, NOT O(corpus), because
  * no-hit documents only bump three counters. The re-rank per batch is
  * O(candidates·terms); a production board with many queries shards the
  * fan-out (one DocArrival per query per doc) through the same shuffle
  * the batch tf join uses. Emission carries `upd` (docs seen) so readers
  * can select each query's latest board from an append sink.
  */
object SearchStream {

  /** One document's contribution to one query's index: document length
    * plus the tf of each query term it contains (empty map = stats-only
    * arrival — the doc still moves N/total_tok).
    */
  final case class DocArrival(query_id: Int, doc_id: Long, dl: Long, tfs: Map[String, Long])

  /** One leaderboard slot; `upd` = docs seen by this query's state when
    * the board was emitted (monotone — max(upd) marks the final board).
    */
  final case class Hit(query_id: Int, upd: Long, rank: Int, doc_id: Long, score_fp: Long)

  final case class IndexState(
      n: Long,
      totalTok: Long,
      df: Map[String, Long],
      cand: Map[Long, (Long, Map[String, Long])])

  /** The q_bm25 integer fixed-point scoring chain, verbatim: k1=1.2 b=0.75
    * carried as integers (2200, 250/750 milli), raw Robertson idf ratio
    * without the log (see q_bm25's comment), truncating division — all
    * operands positive, so Long `/` here ≡ Spark `div` ≡ DuckDB `//`.
    */
  private[streaming] def scoreFp(
      n: Long, totalTok: Long, dl: Long, df: Map[String, Long], tfs: Map[String, Long]): Long =
    tfs.map { case (term, tf) =>
      val dlRatioFp = dl * n * 1000L / totalTok
      val normFp = 250L + (750L * dlRatioFp) / 1000L
      val denomFp = tf * 1000L + (12L * normFp) / 10L
      val tfwFp = tf * 2200L * 1000000L / denomFp
      val idfFp = (2L * n - 2L * df(term) + 1L) * 1000000L / (2L * df(term) + 1L)
      idfFp * tfwFp / 1000000L
    }.sum

  class Bm25Processor(k: Int) extends StatefulProcessor[Int, DocArrival, Hit] {
    @transient private var st: ValueState[IndexState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[IndexState]("idx", Encoders.kryo[IndexState], TTLConfig.NONE)

    override def handleInputRows(
        key: Int,
        rows: Iterator[DocArrival],
        timerValues: TimerValues): Iterator[Hit] = {
      var s = if (st.exists()) st.get() else IndexState(0L, 0L, Map.empty, Map.empty)
      rows.foreach { r =>
        // re-delivered candidate: the doc already contributed to every
        // statistic — folding it again would double-count n/total_tok/df
        // (the ADVICE r11 skew). Skip wholesale; see the delivery
        // contract in the object scaladoc for the stats-only half.
        if (!s.cand.contains(r.doc_id)) {
          s = IndexState(
            s.n + 1L,
            s.totalTok + r.dl,
            r.tfs.keys.foldLeft(s.df)((m, t) => m.updated(t, m.getOrElse(t, 0L) + 1L)),
            if (r.tfs.nonEmpty) s.cand.updated(r.doc_id, (r.dl, r.tfs)) else s.cand)
        }
      }
      st.update(s)
      s.cand.toSeq
        .map { case (doc, (dl, tfs)) => (doc, scoreFp(s.n, s.totalTok, dl, s.df, tfs)) }
        .sortBy { case (doc, sc) => (-sc, doc) }
        .take(k)
        .iterator
        .zipWithIndex
        .map { case ((doc, sc), i) => Hit(key, s.n, i + 1, doc, sc) }
    }
  }

  /** Explode a (doc_id, text) stream into per-query arrivals for the
    * fixed q_bm25 keyword workload — one arrival per query per doc so
    * every query's state sees the full corpus statistics.
    */
  def arrivals(spark: SparkSession, docs: Dataset[(Long, String)]): Dataset[DocArrival] = {
    import spark.implicits._
    val byQuery: Map[Int, Seq[String]] = graft.ext.SearchQueries.queryTermPairs
      .groupBy { case (q, _) => q }
      .view.mapValues(_.map { case (_, t) => t })
      .toMap
    docs.flatMap { case (id, text) =>
      val toks = text.split(" ", -1)
      val counts = toks.groupBy(identity).view.mapValues(_.length.toLong).toMap
      byQuery.map { case (q, terms) =>
        DocArrival(q, id, toks.length.toLong, terms.flatMap(t => counts.get(t).map(t -> _)).toMap)
      }
    }
  }

  /** Per-query BM25 top-k leaderboard over a document stream. */
  def leaderboard(spark: SparkSession, docs: Dataset[(Long, String)], k: Int): Dataset[Hit] = {
    import spark.implicits._
    arrivals(spark, docs)
      .groupByKey(_.query_id)
      .transformWithState(new Bm25Processor(k), TimeMode.None(), OutputMode.Append())
  }
}
