package graft.ext

import org.apache.spark.sql.functions._

import graft.Q
import graft.core.Tables

/** Sketch-family completion: count-min frequency estimation and
  * frequent-items detection, alongside the existing HLL
  * (q_approx_distinct), quantile sketch (q_approx_percentile) and minhash
  * union (q_minhash_union). Sketches are THE 100 TB answer for frequency
  * questions: fixed-size state, associative merges, one pass.
  *
  * Both are approximate/seeded → rows-only in the gate; error bounds are
  * asserted in SketchSpec (CMS never underestimates; freqItems finds
  * every true heavy hitter).
  */
object SketchQueries {

  /** Count-min estimates for the corpus's top tokens. The sketch is built
    * distributed (partial sketches merge associatively) and only the
    * fixed-size table reaches the driver; estimates are then looked up
    * for a deterministic probe set (the 5 alphabetically-first tokens).
    */
  def countMinEstimates(s: org.apache.spark.sql.SparkSession, d: String): org.apache.spark.sql.DataFrame = {
    import s.implicits._
    val tok = Tables(s, d, "documents")
      .select(explode(split(col("text"), " ")).as("token"))
      .filter(col("token") =!= "")
    val sketch = tok.stat.countMinSketch("token", eps = 0.001, confidence = 0.99, seed = 42)
    val probes = tok.select(col("token")).distinct()
      .orderBy("token").limit(5)
      .as[String].collect().toSeq
    probes.map(t => (t, sketch.estimateCount(t))).toDF("token", "cms_estimate")
      .orderBy("token")
  }

  val queries: Seq[Q] = Seq(
    Q(
      "q_countmin",
      // eps=0.001 → estimate <= true + 0.001 * total (one-sided error);
      // hash-seed-specific → rows-only, bound proven in SketchSpec.
      (s, d) => countMinEstimates(s, d),
      None
    ),
    Q(
      "q_freq_items",
      // Misra-Gries-style frequent items over the token stream: every
      // token with frequency above the support threshold is guaranteed
      // present (false positives possible — the one-sided contract,
      // asserted in SketchSpec). Output is the deterministic sorted list
      // size + membership flags for the known corpus heavy hitters.
      (s, d) => {
        import s.implicits._
        val tok = Tables(s, d, "documents")
          .select(explode(split(col("text"), " ")).as("token"))
          .filter(col("token") =!= "")
        val found = tok.stat.freqItems(Seq("token"), support = 0.01)
          .select(explode(col("token_freqItems")).as("token"))
        // reduce to a stable scalar shape: how many of the TRUE top-5
        // exact heavy hitters the sketch surfaced (must be all 5)
        val top5 = tok.groupBy(col("token")).agg(count(lit(1)).as("c"))
          .orderBy(col("c").desc, col("token")).limit(5).select(col("token"))
        top5.join(found, Seq("token"), "left_semi")
          .agg(count(lit(1)).as("top5_found"))
      },
      None
    ),
    Q(
      "q_hll_union",
      // Mergeable sketch COLUMNS (Spark 4 DataSketches HLL): one HLL
      // sketch per source persists as a binary column, and the corpus
      // distinct-token count is re-derived by UNIONING the stored
      // sketches — no second scan of the data. This is the incremental
      // pattern for 100 TB distinct-count maintenance: per-partition
      // sketches are tiny, associative, and re-aggregable at any
      // granularity. Insertion-order independent, but the estimate is
      // sketch-parameterized → rows-only; SketchSpec pins the error
      // bounds against exact counts.
      (s, d) => {
        val tok = Tables(s, d, "documents")
          .select(col("source"), explode(split(col("text"), " ")).as("token"))
          .filter(col("token") =!= "")
        val perSource = tok
          .groupBy(col("source"))
          .agg(
            hll_sketch_agg(col("token"), lit(12)).as("sk"),
            countDistinct(col("token")).as("exact_distinct"))
        val rows = perSource.select(
          col("source"),
          hll_sketch_estimate(col("sk")).as("est_distinct"),
          col("exact_distinct"))
        val merged = perSource
          .agg(hll_union_agg(col("sk"), lit(false)).as("sk"))
          .crossJoin(tok.agg(countDistinct(col("token")).as("exact_distinct")))
          .select(
            lit("__union__").as("source"),
            hll_sketch_estimate(col("sk")).as("est_distinct"),
            col("exact_distinct"))
        rows.unionByName(merged).orderBy("source")
      },
      None
    )
  )
}
