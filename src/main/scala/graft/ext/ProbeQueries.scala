package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Q
import graft.core.Tables

/** Distributed linear-probe trainer over document quality features —
  * trainer #2 next to the k-means family ([[ClusterQueries]]): the
  * quality-filter model an LLM data pipeline fits on cheap per-doc
  * signals (fastText-style probes, Gopher-quality regressions). Full-batch
  * gradient descent on least squares, run EXACTLY in integer fixed point
  * so DuckDB re-derives the whole training chain bit-identically — the
  * loss trajectory AND the weight iterates are cross-engine
  * differentials, not in-plan booleans (the q_kmeans gate recipe applied
  * to a gradient trainer).
  *
  * Arithmetic contract (all values integer end-to-end):
  *  - features are integers scaled to O(≤128) with DATA-INDEPENDENT
  *    constants (f0 = 8 bias, f1 = tokens, f2 = chars div 8,
  *    f3 = 8·stopword hits, f4 = 4·distinct tokens; fixture maxima
  *    100/577/14/31 — the scaling equalizes magnitudes so one global
  *    step size conditions all coordinates);
  *  - the synthetic target y = 3·f1 + 2·f3 − f4 + md5-noise(±10) keeps
  *    the label deterministic and engine-identical (conv/'0x' hex md5
  *    prefix, the q_weighted_sample recipe);
  *  - weights live in WScale = 2^20 fixed point; per-row residual
  *    resid = Σ f_j·w_j − y·WScale stays < 2^32, per-row gradient terms
  *    < 2^42, and gradient SUMS are bigint-aggregated (exact Long far
  *    past 2^53 — at sf0.1 the sums reach ~10^15);
  *  - the update w ← w − floorDiv(grad, n·EtaC) uses FLOOR division on
  *    signed values via the pmod identity (a − pmod(a,d)) div d, which
  *    Spark's `div` and DuckDB's `//` evaluate identically because the
  *    numerator is exactly divisible; Math.floorDiv on the driver is the
  *    same function. EtaC = 2^14 sits 4× inside the measured divergence
  *    boundary (2^12 diverges, 2^13 is monotone at sf0.01 AND sf0.1) so
  *    the descent is monotone with margin on the fixture family;
  *  - the reported loss Σ (resid div WScale)² is computed in the SAME
  *    scan as the gradient — one aggregate pass per iteration, the
  *    q_kmeans_fused one-scan-per-round shape.
  *
  * Scale shape: each iteration is one narrow map over the feature table
  * against 5 broadcast weight literals plus one partial+final aggregate;
  * exactly 7 numbers (loss + 5 gradients + count) reach the driver per
  * round, independent of corpus size. At 100 TB the feature extraction
  * is a pure map fused into the scan, and iterations scale as scans —
  * the same argument as [[ClusterQueries.inertiaFused]].
  */
object ProbeQueries {

  private val WScale = 1L << 20
  private val EtaC = 1L << 14
  private val Updates = 5

  /** Integer feature/label table shared by both engines (see scaladoc). */
  private def feats(docs: DataFrame): DataFrame = {
    val nTok = size(split(col("text"), " ")).cast("long")
    val stop = expr(
      "CAST(size(filter(split(text, ' '), w -> w IN ('the','a','of','and'))) AS BIGINT)")
    val dist = expr("CAST(size(array_distinct(split(text, ' '))) AS BIGINT)")
    val noise = expr(
      "CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 15), 16, 10) AS BIGINT) % 21 - 10")
    docs.select(
      col("doc_id"),
      col("source"),
      lit(8L).as("f0"),
      nTok.as("f1"),
      expr("CAST(n_chars AS BIGINT) div 8").as("f2"),
      (stop * 8).as("f3"),
      (dist * 4).as("f4"),
      (nTok * 3 + stop * 16 - dist * 4 + noise).as("y"))
  }

  /** Score threshold for the APPLY step (pred_fp ≥ Thresh·WScale passes):
    * a fixed constant in label units — the quality bar a production
    * filter pins, not a data-derived quantile. 140 sits at the fixture
    * family's predicted-score median (measured ~143 at sf0.001/0.01/0.1,
    * range ~28–238), so both classes are populated at every SF.
    */
  private val Thresh = 140L

  /** One GD round's aggregate: loss of the CURRENT weights plus the 5
    * gradient sums and the row count, in a single scan.
    */
  private def roundAgg(f: DataFrame, w: Seq[Long]): (Long, Seq[Long], Long) = {
    val resid =
      s"((f0*${w(0)} + f1*${w(1)} + f2*${w(2)} + f3*${w(3)} + f4*${w(4)}) - y * $WScale)"
    val rl = s"(($resid - pmod($resid, $WScale)) div $WScale)"
    val row = f
      .agg(
        expr(s"sum($rl * $rl)").as("loss"),
        expr(s"sum($resid * f0)").as("g0"),
        expr(s"sum($resid * f1)").as("g1"),
        expr(s"sum($resid * f2)").as("g2"),
        expr(s"sum($resid * f3)").as("g3"),
        expr(s"sum($resid * f4)").as("g4"),
        count(lit(1)).as("n"))
      .head()
    (row.getLong(0), (1 to 5).map(row.getLong(_)), row.getLong(6))
  }

  /** The full training trajectory: rows (iter, loss, w0..w4) where w is
    * the weight vector whose loss is reported (iter 0 = zero weights).
    */
  def trajectory(s: SparkSession, d: String): DataFrame = {
    // loop-invariant feature relation, materialized once (round 21):
    // each GD round re-ran the tokenize-feature scan. Ckpt seam per the
    // round-21 ADVICE (aggregate-only consumers — join-neutral).
    val f = graft.core.Ckpt.truncate(feats(Tables(s, d, "documents")))
    var w: Seq[Long] = Seq.fill(5)(0L)
    val hist = scala.collection.mutable.ArrayBuffer[(Long, Long, Seq[Long])]()
    for (t <- 0 to Updates) {
      val (loss, g, n) = roundAgg(f, w)
      hist += ((t.toLong, loss, w))
      if (t < Updates) {
        val dDiv = n * EtaC
        w = w.zip(g).map { case (wj, gj) => wj - Math.floorDiv(gj, dDiv) }
      }
    }
    import s.implicits._
    hist.toSeq
      .map { case (t, loss, wv) => (t, loss, wv(0), wv(1), wv(2), wv(3), wv(4)) }
      .toDF("iter", "loss", "w0", "w1", "w2", "w3", "w4")
      .orderBy("iter")
  }

  /** The quality-filter APPLY step: train to the final weights (the
    * trajectory's w5), then ONE scoring scan — per-source document
    * counts, pass counts at the fixed threshold, and the exact integer
    * sum of predicted scores. This is the production shape: the trainer
    * runs once, the filter is a pure per-row expression against 5
    * broadcast literals, fused into whatever scan feeds the pipeline.
    */
  def applyScores(s: SparkSession, d: String): DataFrame = {
    // Ckpt seam per the round-21 ADVICE (aggregate-only consumers)
    val f = graft.core.Ckpt.truncate(feats(Tables(s, d, "documents")))
    var w: Seq[Long] = Seq.fill(5)(0L)
    for (_ <- 0 until Updates) {
      val (_, g, n) = roundAgg(f, w)
      val dDiv = n * EtaC
      w = w.zip(g).map { case (wj, gj) => wj - Math.floorDiv(gj, dDiv) }
    }
    val pred = expr(
      s"f0*${w(0)} + f1*${w(1)} + f2*${w(2)} + f3*${w(3)} + f4*${w(4)}")
    f.select(col("source"), pred.as("pred"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("pred") >= lit(Thresh * WScale), 1L).otherwise(0L)).as("n_pass"),
        sum(col("pred")).cast("long").as("sum_pred_fp"))
      .orderBy("source")
  }

  /** DuckDB re-derivation of the identical chain: feature CTE, then one
    * (gradient, weight-update) CTE pair per round, weights threaded as
    * one-row cross joins — generated by the same loop that drives the
    * Spark side, so the two engines cannot drift apart structurally.
    */
  private def oracleCtes: String = {
    val featSql =
      "SELECT doc_id, source, CAST(8 AS BIGINT) AS f0, " +
        "CAST(len(string_split(text, ' ')) AS BIGINT) AS f1, " +
        "CAST(n_chars // 8 AS BIGINT) AS f2, " +
        "CAST(8 * len(list_filter(string_split(text, ' '), w -> w IN ('the','a','of','and'))) AS BIGINT) AS f3, " +
        "CAST(4 * len(list_distinct(string_split(text, ' '))) AS BIGINT) AS f4, " +
        "CAST(3 * len(string_split(text, ' ')) " +
        "+ 16 * len(list_filter(string_split(text, ' '), w -> w IN ('the','a','of','and'))) " +
        "- 4 * len(list_distinct(string_split(text, ' '))) " +
        "+ (CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) % 21) - 10 " +
        "AS BIGINT) AS y FROM documents"
    def resid(wRef: Int => String) =
      s"((f0*${wRef(0)} + f1*${wRef(1)} + f2*${wRef(2)} + f3*${wRef(3)} + f4*${wRef(4)}) - y * $WScale)"
    def gCte(t: Int): String = {
      val wRef: Int => String = j => if (t == 0) "0" else s"w$t.w$j"
      val from = if (t == 0) "F" else s"F, w$t"
      val r = resid(wRef)
      val rl = s"(($r - ((($r % $WScale) + $WScale) % $WScale)) // $WScale)"
      s"g$t AS (SELECT CAST(SUM($rl * $rl) AS BIGINT) AS loss, " +
        (0 to 4).map(j => s"CAST(SUM($r * f$j) AS BIGINT) AS g$j").mkString(", ") +
        s" FROM $from)"
    }
    def wCte(t: Int): String = {
      // w{t} = w{t-1} - floorDiv(g{t-1}, n*EtaC), floor via the pmod identity
      val prev: Int => String = j => if (t == 1) "0" else s"w${t - 1}.w$j"
      val from = if (t == 1) s"g${t - 1}, nn" else s"g${t - 1}, nn, w${t - 1}"
      val cols = (0 to 4).map { j =>
        val g = s"g${t - 1}.g$j"
        val d = s"(nn.n * $EtaC)"
        s"CAST(${prev(j)} - (($g - ((($g % $d) + $d) % $d)) // $d) AS BIGINT) AS w$j"
      }.mkString(", ")
      s"w$t AS (SELECT $cols FROM $from)"
    }
    (s"F AS ($featSql)" +: "nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM F)" +:
      (0 to Updates).flatMap(t =>
        Seq(gCte(t)) ++ (if (t < Updates) Seq(wCte(t + 1)) else Nil))).mkString(", ")
  }

  private def oracle: String = {
    val rows = (0 to Updates).map { t =>
      if (t == 0)
        "SELECT CAST(0 AS BIGINT) AS iter, g0.loss AS loss, " +
          (0 to 4).map(j => s"CAST(0 AS BIGINT) AS w$j").mkString(", ") + " FROM g0"
      else
        s"SELECT CAST($t AS BIGINT) AS iter, g$t.loss AS loss, " +
          (0 to 4).map(j => s"w$t.w$j AS w$j").mkString(", ") + s" FROM g$t, w$t"
    }.mkString(" UNION ALL ")
    s"WITH $oracleCtes $rows ORDER BY iter"
  }

  /** Apply-step oracle: the shared training CTE chain to w{Updates}, then
    * the same per-source scoring rollup.
    */
  private def oracleApply: String = {
    val wT = s"w$Updates"
    val pred = (0 to 4).map(j => s"f$j*$wT.w$j").mkString(" + ")
    s"WITH $oracleCtes, scored AS (SELECT source, ($pred) AS pred FROM F, $wT) " +
      "SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs, " +
      s"CAST(SUM(CASE WHEN pred >= ${Thresh * WScale} THEN 1 ELSE 0 END) AS BIGINT) AS n_pass, " +
      "CAST(SUM(pred) AS BIGINT) AS sum_pred_fp " +
      "FROM scored GROUP BY source ORDER BY source"
  }

  val queries: Seq[Q] = Seq(
    Q("q_gd_train", (s, d) => trajectory(s, d), Some(oracle)),
    // the serving half: filter/score the corpus with the trained probe —
    // see [[applyScores]]; the oracle re-derives training AND scoring
    Q("q_gd_apply", (s, d) => applyScores(s, d), Some(oracleApply))
  )
}
