package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`): exact
  * brute-force cosine top-k as the correctness baseline, and a
  * random-hyperplane LSH bucketed variant as the scale path.
  *
  * Scale design: brute-force is broadcast(queries) × corpus — linear in
  * corpus size and embarrassingly parallel, correct for small query sets.
  * The LSH variant buckets the corpus by signature band so each query only
  * scores its colliding buckets — sublinear candidate sets, the structure
  * you shard at 100 TB (signature computation is a narrow map; the join is
  * a shuffle on band keys). All arithmetic in double, sequential fold, so
  * results are reproducible bit-for-bit across engines.
  */
object Similarity {

  /** Sequential-fold dot product of two array<double> columns, via the
    * native codegen expression [[graft.functions.DotProduct]]. For
    * array<double> inputs the bits are identical to the HOF
    * `aggregate(zip_with(...))` formulation — strict left-to-right
    * accumulation — but a primitive loop per row instead of a per-element
    * lambda expression tree (`dotHof` kept for the equivalence spec).
    * On raw array<float> the native kernel widens each element to double
    * BEFORE multiplying (matching an up-front cast), while the HOF
    * multiplies in float and widens per addition — different bits; cast
    * to array<double> first when bit parity matters (all in-repo callers
    * do).
    */
  def dot(a: Column, b: Column): Column = call_function("graft_dot", a, b)

  /** Reference HOF formulation (boxing-heavy; used to cross-check dot). */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  /** Fixed-seed random hyperplanes (nPlanes × dim) for sign-LSH. */
  def hyperplanes(nPlanes: Int, dim: Int, seed: Long = 42L): Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(nPlanes)(Seq.fill(dim)(rnd.nextGaussian()))
  }

  /** Sign-bit signature column: bit i = (v · plane_i >= 0). */
  def signature(vec: Column, planes: Seq[Seq[Double]]): Column = {
    val bits = planes.zipWithIndex.map { case (p, i) =>
      when(dot(vec, array(p.map(lit): _*)) >= 0, lit(1L << i)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** Band values from a signature: `bands` chunks of `bitsPerBand` bits. */
  def bandCols(sig: Column, bands: Int, bitsPerBand: Int): Column = {
    val mask = (1L << bitsPerBand) - 1
    array((0 until bands).map(b => shiftright(sig.cast("long"), b * bitsPerBand).bitwiseAND(mask)): _*)
  }

  /** Exact brute-force cosine top-k: for each row of `queries`, the k
    * nearest rows of `corpus` (self excluded) by cosine.
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    // Precompute each side's norm ONCE per vector (a projection below the
    // join) instead of inside the per-pair cosine: the pair stage then
    // costs one dot + one multiply + one divide instead of three dots —
    // a 3× flop cut on the O(|q|·|c|) stage, measured 2.1× end-to-end on
    // the all-pairs kNN graph (PLANS.md). Bit-identical to the fused
    // cosine: sqrt(dot(v,v)) is the same double wherever evaluated, and
    // the divisor keeps the same (q-norm × c-norm) multiplication order.
    val q = queries
      .select(col("vec_id").as("q_id"), col("embedding").cast("array<double>").as("qv"))
      .withColumn("qn", sqrt(dot(col("qv"), col("qv"))))
    val c = corpus
      .select(col("vec_id").as("n_id"), col("embedding").cast("array<double>").as("cv"))
      .withColumn("cn", sqrt(dot(col("cv"), col("cv"))))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("n_id"))
    broadcast(q)
      .crossJoin(c)
      .filter(col("q_id") =!= col("n_id"))
      .select(
        col("q_id"), col("n_id"),
        (dot(col("qv"), col("cv")) / (col("qn") * col("cn"))).as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("n_id"), col("cos"))
  }

  /** LSH-bucketed cosine top-k: candidates = corpus rows sharing ≥1
    * signature band with the query; exact cosine re-scoring on candidates.
    */
  def lshTopK(queries: DataFrame, corpus: DataFrame, k: Int,
              bands: Int = 8, bitsPerBand: Int = 4): DataFrame = {
    val planes = hyperplanes(bands * bitsPerBand, 64)
    def prep(df: DataFrame, idAs: String, vecAs: String, nrmAs: String): DataFrame = {
      val v = col("embedding").cast("array<double>")
      df.select(col("vec_id").as(idAs), v.as(vecAs), signature(v, planes).as("sig"))
        .select(
          col(idAs), col(vecAs), sqrt(dot(col(vecAs), col(vecAs))).as(nrmAs),
          posexplode(bandCols(col("sig"), bands, bitsPerBand)).as(Seq("band_idx", "band_val")))
    }
    val q = prep(queries, "q_id", "qv", "qn")
    val c = prep(corpus, "n_id", "cv", "cn")
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("n_id"))
    q.join(c, Seq("band_idx", "band_val"))
      .filter(col("q_id") =!= col("n_id"))
      // norms precomputed per (vector, band) row, never per candidate
      // pair — same doubles as the fused cosine (see bruteForceTopK)
      .select(
        col("q_id"), col("n_id"),
        (dot(col("qv"), col("cv")) / (col("qn") * col("cn"))).as("cos"))
      .distinct()
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("n_id"), col("cos"))
  }
}
