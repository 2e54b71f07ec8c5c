package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication building blocks for the training-data pipeline: exact
  * (hash groupBy), MinHash+LSH (shingle → minhash signature → banded
  * bucket join), SimHash (custom codegen expression), and exact n-gram
  * Jaccard on blocked candidates.
  *
  * Scale design: every step is a narrow per-row expression or a shuffle
  * keyed on a bounded-cardinality bucket key. No all-pairs comparison ever
  * happens — candidate generation is LSH banding (probability of a pair
  * colliding ≈ 1-(1-j^r)^b), and only candidates get the exact/estimated
  * similarity pass. That's the property that survives 100 TB: work is
  * O(docs × signature) + O(colliding pairs), not O(docs²).
  */
object Dedup {

  /** Distinct k-char shingle array of `text` (codegen'd higher-order fns). */
  def shingles(k: Int, textCol: String = "text"): Column =
    expr(
      s"array_distinct(transform(sequence(1, greatest(1, length($textCol) - ${k - 1})), " +
        s"i -> substring($textCol, i, $k)))")

  /** n-hash MinHash signatures for `df(idCol, textCol)`. Default path: the
    * custom codegen expression `graft_minhash` ([[graft.functions.MinHash]])
    * — every accumulator advanced in one traversal of the shingle array,
    * per row, with NO explode, NO aggregate, and NO exchange. Fallback
    * (`graft.minhash.expr=false`): the previous explode → 32-accumulator
    * min hash-aggregate plan. Both produce BIT-IDENTICAL signatures
    * (`min over s of xxhash64(s, i)` — pinned by DedupSpec), so every
    * downstream band hash and recall gate is path-independent. A naive
    * per-row HOF formulation is NOT equivalent in cost: Catalyst inlines
    * the shared shingle projection once per hash — measured 20× slower;
    * the custom expression is what makes the per-row form win.
    *
    * NULL text is dropped BEFORE either path: a null doc has no shingle
    * set, and the two paths used to diverge on it (the expr path emitted
    * a null sig while the agg path's groupBy kept a degenerate one) —
    * worse, null sigs band to identical hashes (xxhash64 skips null
    * children), so every null-text doc would pile into ONE quadratic LSH
    * bucket. Dropping them keeps the paths row-identical (DedupSpec pins
    * the null-text case) and the bucket law intact.
    */
  def minhashSignatures(df: DataFrame, idCol: String, textCol: String, shingleK: Int, nHashes: Int): DataFrame = {
    // Hash-repartition the THIN (id, text) rows by id BEFORE the expensive
    // shingle+hash work: a document corpus often arrives in few/large
    // splits (here: single-row-group parquet → 1-task scan), which would
    // run the whole pipeline on one core. Spreading 5k-row inputs is
    // ~free and unlocks full-cluster parallelism for the heavy part.
    // Explicit partition count keeps AQE from coalescing the tiny
    // pre-compute exchange back to one partition.
    val nonNull = df.filter(col(textCol).isNotNull)
    val spread =
      if (df.sparkSession.conf.get("graft.minhash.spread", "true").toBoolean)
        nonNull.repartition(df.sparkSession.sparkContext.defaultParallelism, col(idCol))
      else nonNull
    if (df.sparkSession.conf.get("graft.minhash.expr", "true").toBoolean)
      spread.select(
        col(idCol).as("id"),
        call_function("graft_minhash", shingles(shingleK, textCol), lit(nHashes)).as("sig"))
    else {
      val exploded = spread
        .select(col(idCol).as("id"), explode(shingles(shingleK, textCol)).as("s"))
      exploded
        .groupBy(col("id"))
        .agg(
          min(expr("xxhash64(s, 0)")).as("m0"),
          (1 until nHashes).map(i => min(expr(s"xxhash64(s, $i)")).as(s"m$i")): _*)
        .select(col("id"), array((0 until nHashes).map(i => col(s"m$i")): _*).as("sig"))
    }
  }

  /** LSH band hashes: split the signature into `bands` rows of
    * `rowsPerBand`, hash each band. Two docs collide in a band iff that
    * whole band of minhashes is equal.
    */
  def bandHashes(bands: Int, rowsPerBand: Int, sigCol: String = "sig"): Column =
    array((0 until bands).map { b =>
      val slice = (0 until rowsPerBand).map(r => s"$sigCol[${b * rowsPerBand + r}]").mkString(", ")
      expr(s"xxhash64($slice, $b)")
    }: _*)

  /** Estimated Jaccard from two aligned minhash signatures. */
  def estJaccard(a: Column, b: Column, nHashes: Int): Column =
    size(filter(zip_with(a, b, (x, y) => x === y), m => m)).cast("double") / nHashes.toDouble

  /** MinHash-LSH candidate pairs over `df(idCol, textCol)`: returns
    * (a_id, b_id, est_jaccard) for pairs colliding in ≥1 band, filtered to
    * `minJaccard`. nHashes = bands × rowsPerBand.
    */
  def minhashPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleK: Int = 5,
      bands: Int = 8,
      rowsPerBand: Int = 4,
      minJaccard: Double = 0.4): DataFrame = {
    val nHashes = bands * rowsPerBand
    // NOTE: recompute-per-side is the measured winner for the sig subtree.
    // persist() was 3x slower (InMemoryTableScan breaks whole-stage
    // codegen around the banded self-join); snapshotting sigs to a temp
    // parquet and re-reading also lost the interleaved A/B (2.50s vs
    // 1.89s min-of-4 at sf0.1 — write barrier + two file scans cost more
    // than recomputing the now-parallel explode). At cluster scale the
    // band join becomes a shuffle join and exchange reuse removes the
    // duplication anyway.
    val sigs = minhashSignatures(df, idCol, textCol, shingleK, nHashes)
    val banded = sigs
      .select(col("id"), col("sig"), posexplode(bandHashes(bands, rowsPerBand)).as(Seq("band_idx", "band_hash")))
    val a = banded.select(col("id").as("a_id"), col("sig").as("a_sig"), col("band_idx"), col("band_hash"))
    val b = banded.select(col("id").as("b_id"), col("sig").as("b_sig"), col("band_idx"), col("band_hash"))
    a.join(b, Seq("band_idx", "band_hash"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"), estJaccard(col("a_sig"), col("b_sig"), nHashes).as("est_jaccard"))
      .distinct()
      .filter(col("est_jaccard") >= minJaccard)
  }

  /** Incremental LSH probe: candidate pairs INVOLVING the delta subset,
    * found by banding only the delta side and probing the FULL band index
    * (which at production scale is a stored table — signatures are content
    * functions, computed once per doc ever). Returns the same (a_id, b_id)
    * set as [[minhashPairs]] restricted to delta-involving pairs — exactly,
    * not approximately, since both run the same deterministic hash family;
    * q_dedup_incremental driver-gates that equality and DedupSpec sweeps it
    * on random corpora.
    */
  def incrementalMinhashPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      isDelta: Column,
      shingleK: Int = 5,
      bands: Int = 8,
      rowsPerBand: Int = 4,
      minJaccard: Double = 0.4): DataFrame = {
    val nHashes = bands * rowsPerBand
    val flagged = df.select(col(idCol), col(textCol), isDelta.as("__delta"))
    val sigs = minhashSignatures(flagged, idCol, textCol, shingleK, nHashes)
      .join(flagged.select(col(idCol).as("id"), col("__delta")), Seq("id"))
    val banded = sigs.select(
      col("id"), col("sig"), col("__delta"),
      posexplode(bandHashes(bands, rowsPerBand)).as(Seq("band_idx", "band_hash")))
    val probe = banded
      .filter(col("__delta"))
      .select(col("id").as("a_id"), col("sig").as("a_sig"), col("band_idx"), col("band_hash"))
    val index = banded.select(
      col("id").as("b_id"), col("sig").as("b_sig"), col("band_idx"), col("band_hash"))
    probe
      .join(index, Seq("band_idx", "band_hash"))
      .filter(col("a_id") =!= col("b_id"))
      .select(
        least(col("a_id"), col("b_id")).as("p_a"),
        greatest(col("a_id"), col("b_id")).as("p_b"),
        estJaccard(col("a_sig"), col("b_sig"), nHashes).as("est"))
      .filter(col("est") >= minJaccard)
      .select(col("p_a").as("a_id"), col("p_b").as("b_id"))
      .distinct()
  }

  /** Connected components by min-label propagation — the cluster step
    * after near-dup pair detection (keep one doc per component). Each
    * iteration: every node adopts the min of its own and its neighbors'
    * labels — two shuffles (neighbor join + min agg); converges in
    * O(component diameter) rounds, which for near-dup clusters is small.
    * Labels persist per round to truncate lineage (else the plan doubles
    * each iteration); the driver only reads the CHANGED COUNT — a control
    * decision, not data — so the computation stays distributed. Same shape
    * scales to 100 TB: it is label propagation à la GraphX/Pregel without
    * the RDD API.
    *
    * @param nodes (id) one row per node
    * @param edges (a, b) undirected pairs
    * @return (id, comp) where comp = min node id of the component
    */
  def connectedComponents(nodes: DataFrame, edges: DataFrame, maxIters: Int = 50): DataFrame = {
    // Persist the (possibly expensive) edge derivation — it is re-joined
    // every round; without this the whole pair-detection subtree would
    // recompute per iteration.
    val sym = edges.select(col("a").as("src"), col("b").as("dst"))
      .union(edges.select(col("b").as("src"), col("a").as("dst")))
      .persist()
    var labels = nodes.select(col("id"), col("id").as("comp")).persist()
    labels.count()
    // `cached` tracks the PERSISTED frame backing `labels` — unpersist must
    // be called on the exact Dataset that was persisted, not a projection
    // over it, or the cache block leaks for the loop's lifetime.
    var cached = labels
    var changed = 1L
    var i = 0
    while (changed > 0 && i < maxIters) {
      val nb = sym.join(labels.withColumnRenamed("id", "src"), Seq("src"))
        .select(col("dst").as("id"), col("comp"))
        .groupBy(col("id"))
        .agg(min(col("comp")).as("nb_comp"))
      // Convergence detection is folded into the SAME pass that computes
      // the new labels: a per-row `chg` flag summed by the materializing
      // action, instead of a second join of next-vs-previous labels — one
      // fewer shuffle join per round, and the changed-count (a control
      // decision) is all that reaches the driver.
      val next = labels
        .join(nb, Seq("id"), "left")
        .select(
          col("id"),
          least(col("comp"), coalesce(col("nb_comp"), col("comp"))).as("comp"),
          (coalesce(col("nb_comp"), col("comp")) < col("comp")).cast("long").as("chg"))
        .persist()
      changed = next.agg(coalesce(sum(col("chg")), lit(0L))).first().getLong(0)
      cached.unpersist()
      cached = next
      labels = next.select(col("id"), col("comp"))
      i += 1
    }
    if (changed > 0) {
      cached.unpersist() // don't pin caches on the failure path
      sym.unpersist()
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIters rounds " +
          s"($changed labels still changing) — a component's diameter exceeds " +
          "maxIters; raise it (rounds needed = max component diameter)")
    }
    // localCheckpoint: truncates lineage like persist but its blocks are
    // released by the ContextCleaner once unreferenced — no per-call cache
    // leak; then drop the loop's explicit caches.
    val out = labels.localCheckpoint(true)
    cached.unpersist()
    sym.unpersist()
    out
  }

  /** Blocked exact k-gram Jaccard candidate pairs — the shared shape for
    * every exact near-dup stage: gram sets materialize once per ROW (an
    * inline [[ngramJaccardExpr]] would rebuild both arrays per candidate
    * pair), the thin rows hash-spread before the O(len²) array_distinct
    * (single-row-group inputs would otherwise run it one-task), and
    * candidates join only on the caller's block columns — O(bucket²),
    * never O(docs²). Returns (a_id, b_id, jac >= minJac). The jac
    * arithmetic (int sizes, one double division) is bit-identical to the
    * inline expression form, so existing DuckDB oracles are unaffected.
    */
  def blockedJaccardPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      k: Int,
      minJac: Double,
      blockCols: Seq[(String, Column)]): DataFrame = {
    val spread = docs.repartition(
      docs.sparkSession.sparkContext.defaultParallelism, col(idCol))
    val names = blockCols.map(_._1)
    val withG = spread.select(
      (col(idCol).as("id") +: blockCols.map { case (n, c) => c.as(n) }) :+
        shingles(k, textCol).as("grams"): _*)
    val a = withG.select(
      (col("id").as("a_id") +: names.map(col)) :+ col("grams").as("a_g"): _*)
    val b = withG.select(
      (col("id").as("b_id") +: names.map(col)) :+ col("grams").as("b_g"): _*)
    a.join(b, names)
      .filter(col("a_id") < col("b_id"))
      .select(
        col("a_id"), col("b_id"),
        (size(array_intersect(col("a_g"), col("b_g"))).cast("double") /
          size(array_union(col("a_g"), col("b_g")))).as("jac"))
      .filter(col("jac") >= minJac)
  }

  /** Exact k-gram Jaccard as a SQL expression over text columns a/b. */
  def ngramJaccardExpr(k: Int, a: String, b: String): Column = {
    def grams(c: String) =
      s"array_distinct(transform(sequence(1, greatest(1, length($c) - ${k - 1})), i -> substring($c, i, $k)))"
    expr(
      s"CAST(size(array_intersect(${grams(a)}, ${grams(b)})) AS DOUBLE) / " +
        s"size(array_union(${grams(a)}, ${grams(b)}))")
  }

  /** Prefix-filtered exact k-gram Jaccard self-join — the AllPairs /
    * PPJoin family (Bayardo/Ma/Srikant, WWW'07; Xiao/Wang/Lin/Yu,
    * WWW'08). Unlike [[blockedJaccardPairs]]' heuristic blocking, this is
    * COMPLETE: under any global gram order, two sets with Jaccard >= τ
    * must share a gram inside each other's first (sz − ⌈τ·sz⌉ + 1) grams,
    * so blocking on that prefix alone cannot miss a qualifying pair. The
    * order used is rarest-first (document frequency asc, gram asc): the
    * prefix then holds each doc's MOST selective grams, and candidate
    * volume is Σ df(g)² over prefix grams — the quantity the ordering
    * minimizes. τ is a RATIONAL tauNum/tauDen so the prefix length is
    * exact integer arithmetic; an IEEE ceil(sz·τ) landing one ulp low
    * would silently break the completeness guarantee.
    *
    * Scale shape (learned the hard way — the first cut carried the gram
    * arrays through the prefix join and OOM'd at 10× data): the rows
    * that cross the prefix-gram shuffle are THIN (id, position, size) —
    * candidate pairs are pruned by PPJoin's length filter
    * (τ·max ≤ min) and positional filter (grams remaining after the
    * match position can't reach the required overlap), deduplicated as
    * bare (a, b) pairs, and only then re-joined to the rank arrays for
    * exact verification. The gram dictionary (bounded vocabulary)
    * broadcasts; docs are re-encoded as sorted integer-rank arrays
    * (cheaper to ship and intersect than strings). Candidate volume is
    * still Σ df(g)² over prefix grams — at low τ the prefix is most of
    * the doc and this is intrinsically expensive; the filter's sweet
    * spot is the high-τ near-dup regime.
    */
  def prefixJaccardPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      k: Int,
      tauNum: Int,
      tauDen: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spread = docs.repartition(
      docs.sparkSession.sparkContext.defaultParallelism, col(idCol))
    val g = spread.select(col(idCol).as("id"), shingles(k, textCol).as("grams"))
    // rarest-first global order; the ranking window runs over the
    // DICTIONARY (bounded), never the corpus — same argument as
    // q_dict_encode
    val dict = g.select(explode(col("grams")).as("gram"))
      .groupBy(col("gram")).agg(count(lit(1)).as("df"))
      .withColumn("rid", row_number().over(Window.orderBy(col("df").asc, col("gram").asc)))
      .select(col("gram"), col("rid"))
    val sets = g.select(col("id"), explode(col("grams")).as("gram"))
      .join(broadcast(dict), "gram")
      .groupBy(col("id"))
      .agg(sort_array(collect_list(col("rid"))).as("toks"))
      .withColumn("sz", size(col("toks")))
    // prefix length sz − ⌈τ·sz⌉ + 1, with ⌈a/b⌉ = (a + b − 1) div b;
    // posexplode keeps the in-prefix position for the positional filter
    val pref = sets.select(
      col("id"), col("sz"),
      posexplode(expr(s"slice(toks, 1, sz - ((sz * $tauNum + $tauDen - 1) div $tauDen) + 1)")))
      .select(col("id"), col("sz"), col("pos"), col("col").as("ptok"))
    // required absolute overlap for J >= τ: ⌈τ/(1+τ) · (sza+szb)⌉
    val tReq = expr(
      s"($tauNum * (sza + szb) + ($tauNum + $tauDen) - 1) div ($tauNum + $tauDen)")
    val cand = pref
      .select(col("id").as("a_id"), col("sz").as("sza"), col("pos").as("pa"), col("ptok"))
      .join(
        pref.select(col("id").as("b_id"), col("sz").as("szb"), col("pos").as("pb"), col("ptok")),
        "ptok")
      .filter(col("a_id") < col("b_id"))
      // length filter: τ·max(sza,szb) ≤ min(sza,szb), else J < τ outright
      .filter(
        col("sza") * tauNum <= col("szb") * tauDen &&
          col("szb") * tauNum <= col("sza") * tauDen)
      // positional filter: achievable overlap ≤ (overlap possible before
      // the matched rank: ≤ min(pa, pb), since each side has exactly
      // pa/pb elements below it) + (elements from the match on:
      // ≤ min(sza−pa, szb−pb), 0-based pos, match included). Dropping
      // the first term would over-prune: the earliest PREFIX-prefix
      // collision can still have prior shared grams that sit beyond the
      // other side's prefix.
      .filter(
        least(col("pa"), col("pb")) +
          least(col("sza") - col("pa"), col("szb") - col("pb")) >= tReq)
      .select(col("a_id"), col("b_id"))
      .distinct()
    val ta = sets.select(col("id").as("a_id"), col("toks").as("ta"), col("sz").as("sza"))
    val tb = sets.select(col("id").as("b_id"), col("toks").as("tb"), col("sz").as("szb"))
    cand
      .join(ta, "a_id")
      .join(tb, "b_id")
      .withColumn("inter", size(array_intersect(col("ta"), col("tb"))))
      .select(
        col("a_id"), col("b_id"),
        (col("inter").cast("double") /
          (col("sza") + col("szb") - col("inter")).cast("double")).as("jac"))
      .filter(col("jac") >= lit(tauNum.toDouble / tauDen))
  }

  /** Prefix-filtered exact k-gram CONTAINMENT join — the asymmetric sibling
    * of [[prefixJaccardPairs]]. C(a→b) = |grams(a) ∩ grams(b)| / |grams(a)|,
    * the "a is mostly inside b" relation web-scrape dedup needs where
    * Jaccard is blind: a quoted article inside a longer page, boilerplate
    * wrapped around a syndicated body, a doc re-published with an appendix.
    * Jaccard penalizes the size gap (J = |∩|/|∪| shrinks as b grows);
    * containment is size-invariant on the b side, so the pair
    * (snippet, superset-page) that J ≥ τ misses is exactly what C ≥ τ
    * finds. Directional: both (a→b) and (b→a) are tested, each on its own
    * threshold ⌈τ·|a|⌉.
    *
    * Completeness: a needs |∩| ≥ ⌈τ·sza⌉ grams of ITS OWN set inside b, so
    * if b contains none of a's first (sza − ⌈τ·sza⌉ + 1) grams (rarest-first
    * order), at most ⌈τ·sza⌉ − 1 can match — the PROBE side blocks on its
    * prefix only, but the INDEX side must list every gram (a superset page
    * has no short prefix that's guaranteed to hit). Candidate volume is
    * Σ_g dfPrefix(g)·df(g) — between the Jaccard filter's Σ dfPrefix² and
    * all-pairs; the same thin-row / length / positional / dedup-then-verify
    * staging as the Jaccard form keeps what crosses the shuffle to
    * (id, pos, sz) triples. Length filter: szb ≥ ⌈τ·sza⌉ (no upper bound —
    * asymmetry is the point). Positional: shared grams below the matched
    * rank ≤ min(pa, pb); at-or-above ≤ min(sza−pa, szb−pb).
    */
  def containmentPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      k: Int,
      tauNum: Int,
      tauDen: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spread = docs.repartition(
      docs.sparkSession.sparkContext.defaultParallelism, col(idCol))
    val g = spread.select(col(idCol).as("id"), shingles(k, textCol).as("grams"))
    val dict = g.select(explode(col("grams")).as("gram"))
      .groupBy(col("gram")).agg(count(lit(1)).as("df"))
      .withColumn("rid", row_number().over(Window.orderBy(col("df").asc, col("gram").asc)))
      .select(col("gram"), col("rid"))
    val sets = g.select(col("id"), explode(col("grams")).as("gram"))
      .join(broadcast(dict), "gram")
      .groupBy(col("id"))
      .agg(sort_array(collect_list(col("rid"))).as("toks"))
      .withColumn("sz", size(col("toks")))
    // probe side: prefix of length sz − ⌈τ·sz⌉ + 1; index side: ALL grams
    // with their sorted position (for the positional filter)
    val probe = sets.select(
      col("id"), col("sz"),
      posexplode(expr(s"slice(toks, 1, sz - ((sz * $tauNum + $tauDen - 1) div $tauDen) + 1)")))
      .select(col("id").as("a_id"), col("sz").as("sza"), col("pos").as("pa"), col("col").as("ptok"))
    val index = sets.select(col("id"), col("sz"), posexplode(col("toks")))
      .select(col("id").as("b_id"), col("sz").as("szb"), col("pos").as("pb"), col("col").as("ptok"))
    // required overlap: ⌈τ·sza⌉, integer-exact
    val tReq = expr(s"(sza * $tauNum + $tauDen - 1) div $tauDen")
    val cand = probe
      .join(index, "ptok")
      .filter(col("a_id") =!= col("b_id"))
      .filter(col("szb") >= tReq)
      .filter(
        least(col("pa"), col("pb")) +
          least(col("sza") - col("pa"), col("szb") - col("pb")) >= tReq)
      .select(col("a_id"), col("b_id"))
      .distinct()
    val ta = sets.select(col("id").as("a_id"), col("toks").as("ta"), col("sz").as("sza"))
    val tb = sets.select(col("id").as("b_id"), col("toks").as("tb"))
    cand
      .join(ta, "a_id")
      .join(tb, "b_id")
      .withColumn("inter", size(array_intersect(col("ta"), col("tb"))))
      // τ-comparison in exact integers; the emitted ratio is one double
      // division, identical on both sides
      .filter(col("inter") * tauDen >= col("sza") * tauNum)
      .select(
        col("a_id"), col("b_id"),
        (col("inter").cast("double") / col("sza").cast("double")).as("containment"))
  }
}
