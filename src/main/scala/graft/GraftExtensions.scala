package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

import graft.functions.{AllL2, ArgMinL2, DotProduct, MinHashSig, MinL2, SimHash64, SortedDotProduct, SortedIntersectGe, Sum128, ZOrderExpr}

/** SparkSessionExtensions hook: registers graft's custom Catalyst
  * expressions as SQL functions. Activate either via
  * `SparkSession.builder.withExtensions(new GraftExtensions)` or
  * `--conf spark.sql.extensions=graft.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(
      (
        FunctionIdentifier("simhash64"),
        new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
        (children: Seq[Expression]) => SimHash64(children.head)))
    ext.injectFunction(
      (
        FunctionIdentifier("graft_dot"),
        new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
        (children: Seq[Expression]) => {
          if (children.size != 2)
            throw new IllegalArgumentException(
              s"graft_dot requires exactly 2 arguments (array<double>, array<double>), got ${children.size}")
          DotProduct(children(0), children(1))
        }))
    Seq(
      ("graft_argmin_l2", classOf[ArgMinL2].getName,
        (c: Seq[Expression]) => ArgMinL2(c(0), c(1)): Expression),
      ("graft_min_l2", classOf[MinL2].getName,
        (c: Seq[Expression]) => MinL2(c(0), c(1)): Expression),
      ("graft_l2s", classOf[AllL2].getName,
        (c: Seq[Expression]) => AllL2(c(0), c(1)): Expression)
    ).foreach { case (name, cls, build) =>
      ext.injectFunction(
        (
          FunctionIdentifier(name),
          new ExpressionInfo(cls, name),
          (children: Seq[Expression]) => {
            if (children.size != 2)
              throw new IllegalArgumentException(
                s"$name requires exactly 2 arguments (array<double|float>, " +
                  s"foldable array<array<double>>), got ${children.size}")
            build(children)
          }))
    }
    ext.injectFunction(
      (
        FunctionIdentifier("graft_zorder"),
        new ExpressionInfo(classOf[ZOrderExpr].getName, "graft_zorder"),
        (children: Seq[Expression]) => {
          if (children.size != 2)
            throw new IllegalArgumentException(
              s"graft_zorder requires exactly 2 arguments (bigint, bigint), got ${children.size}")
          ZOrderExpr(children(0), children(1))
        }))
    ext.injectFunction(
      (
        FunctionIdentifier("graft_minhash"),
        new ExpressionInfo(classOf[MinHashSig].getName, "graft_minhash"),
        (children: Seq[Expression]) => children match {
          case Seq(c, org.apache.spark.sql.catalyst.expressions.Literal(n: Int, _)) =>
            MinHashSig(c, n)
          case _ =>
            throw new IllegalArgumentException(
              "graft_minhash requires (array<string>, literal int hash count)")
        }))
    // Overflow-safe fixed-point sum with primitive (two-long) buffers —
    // Agg.dsum's accumulator (see Sum128 scaladoc for the int128 layout).
    ext.injectFunction(
      (
        FunctionIdentifier("graft_sum128"),
        new ExpressionInfo(classOf[Sum128].getName, "graft_sum128"),
        (children: Seq[Expression]) => {
          if (children.size != 1)
            throw new IllegalArgumentException(
              s"graft_sum128 requires exactly 1 bigint argument, got ${children.size}")
          Sum128(children.head)
        }))
    ext.injectFunction(
      (
        FunctionIdentifier("graft_inter_ge"),
        new ExpressionInfo(classOf[SortedIntersectGe].getName, "graft_inter_ge"),
        (children: Seq[Expression]) => {
          if (children.size != 3)
            throw new IllegalArgumentException(
              s"graft_inter_ge requires exactly 3 arguments (array<int>, array<int>, int), got ${children.size}")
          SortedIntersectGe(children(0), children(1), children(2))
        }))
    ext.injectFunction(
      (
        FunctionIdentifier("graft_sorted_dot"),
        new ExpressionInfo(classOf[SortedDotProduct].getName, "graft_sorted_dot"),
        (children: Seq[Expression]) => {
          if (children.size != 4)
            throw new IllegalArgumentException(
              "graft_sorted_dot requires exactly 4 arguments " +
                s"(array<string>, array<bigint>, array<string>, array<bigint>), got ${children.size}")
          SortedDotProduct(children(0), children(1), children(2), children(3))
        }))
    // Count-Min sketch: the mergeable counting sketch (heavy hitters in
    // fixed space — see functions/Cms.scala for the deterministic
    // cross-engine hash that makes its estimates fully differential).
    ext.injectFunction(
      (
        FunctionIdentifier("graft_cms"),
        new ExpressionInfo(classOf[graft.functions.CmsAggregate].getName, "graft_cms"),
        (children: Seq[Expression]) => {
          if (children.size != 1)
            throw new IllegalArgumentException(
              s"graft_cms requires exactly 1 string argument, got ${children.size}")
          graft.functions.CmsAggregate(children.head)
        }))
    ext.injectFunction(
      (
        FunctionIdentifier("graft_cms_query"),
        new ExpressionInfo(classOf[graft.functions.CmsQuery].getName, "graft_cms_query"),
        (children: Seq[Expression]) => {
          if (children.size != 2)
            throw new IllegalArgumentException(
              s"graft_cms_query requires exactly 2 arguments (array<bigint> sketch, string), got ${children.size}")
          graft.functions.CmsQuery(children(0), children(1))
        }))
    // KMV/theta sketch: the mergeable distinct-count sketch with SET
    // OPERATIONS (intersection estimates HLL cannot give — see
    // functions/Kmv.scala for the cross-engine md5-prefix hash that
    // makes every estimate a full value differential).
    ext.injectFunction(
      (
        FunctionIdentifier("graft_kmv"),
        new ExpressionInfo(classOf[graft.functions.KmvAggregate].getName, "graft_kmv"),
        (children: Seq[Expression]) => {
          if (children.size != 1)
            throw new IllegalArgumentException(
              s"graft_kmv requires exactly 1 string argument, got ${children.size}")
          graft.functions.KmvAggregate(children.head)
        }))
    ext.injectFunction(
      (
        FunctionIdentifier("graft_kmv_est"),
        new ExpressionInfo(classOf[graft.functions.KmvEstimate].getName, "graft_kmv_est"),
        (children: Seq[Expression]) => {
          if (children.size != 1)
            throw new IllegalArgumentException(
              s"graft_kmv_est requires exactly 1 argument (array<bigint> sketch), got ${children.size}")
          graft.functions.KmvEstimate(children.head)
        }))
    ext.injectFunction(
      (
        FunctionIdentifier("graft_kmv_union"),
        new ExpressionInfo(classOf[graft.functions.KmvUnion].getName, "graft_kmv_union"),
        (children: Seq[Expression]) => {
          if (children.size != 2)
            throw new IllegalArgumentException(
              s"graft_kmv_union requires exactly 2 array<bigint> sketch arguments, got ${children.size}")
          graft.functions.KmvUnion(children(0), children(1))
        }))
    ext.injectFunction(
      (
        FunctionIdentifier("graft_kmv_diff"),
        new ExpressionInfo(classOf[graft.functions.KmvDiff].getName, "graft_kmv_diff"),
        (children: Seq[Expression]) => {
          if (children.size != 2)
            throw new IllegalArgumentException(
              s"graft_kmv_diff requires exactly 2 array<bigint> sketch arguments, got ${children.size}")
          graft.functions.KmvDiff(children(0), children(1))
        }))
    ext.injectFunction(
      (
        FunctionIdentifier("graft_kmv_intersect"),
        new ExpressionInfo(classOf[graft.functions.KmvIntersect].getName, "graft_kmv_intersect"),
        (children: Seq[Expression]) => {
          if (children.size != 2)
            throw new IllegalArgumentException(
              s"graft_kmv_intersect requires exactly 2 array<bigint> sketch arguments, got ${children.size}")
          graft.functions.KmvIntersect(children(0), children(1))
        }))
    // Spark's runtime-filter bloom machinery (the expressions
    // InjectRuntimeFilter plants under AQE), exposed as first-class
    // session functions so a pipeline can BUILD a bloom filter over one
    // relation and PROBE it from another without waiting for the
    // optimizer to decide — the broadcast-a-sketch membership path that
    // replaces a shuffle semi-join at 100 TB. graft_bloom_agg(xxhash64(x),
    // nItems, nBits) → binary; graft_might_contain(bloom, xxhash64(x)) →
    // boolean (the bloom argument must be foldable — a literal or scalar
    // subquery — exactly as the internal expression requires).
    ext.injectFunction(
      (
        FunctionIdentifier("graft_bloom_agg"),
        new ExpressionInfo(classOf[BloomFilterAggregate].getName, "graft_bloom_agg"),
        (children: Seq[Expression]) =>
          children match {
            case Seq(c) => new BloomFilterAggregate(c)
            case Seq(c, n) => new BloomFilterAggregate(c, n)
            case Seq(c, n, b) => new BloomFilterAggregate(c, n, b)
            case _ =>
              throw new IllegalArgumentException(
                s"graft_bloom_agg takes 1-3 arguments (xxhash64 col[, nItems[, nBits]]), got ${children.size}")
          }))
    ext.injectFunction(
      (
        FunctionIdentifier("graft_might_contain"),
        new ExpressionInfo(classOf[BloomFilterMightContain].getName, "graft_might_contain"),
        (children: Seq[Expression]) => {
          if (children.size != 2)
            throw new IllegalArgumentException(
              s"graft_might_contain requires exactly 2 arguments (bloom binary, xxhash64 col), got ${children.size}")
          BloomFilterMightContain(children(0), children(1))
        }))
    // Opt-in COUNT(DISTINCT) → HLL++ rewrite; no-op unless the session
    // sets graft.approx.distinct=true (see ApproxDistinctRewrite).
    ext.injectOptimizerRule(_ => graft.engine.ApproxDistinctRewrite)
    // SUM(CAST(<integral> AS DECIMAL(38,0))) → graft_sum128: the
    // fixed-point accumulator rewrite for delegated SQL text the engine
    // cannot edit (default ON; see Sum128Rewrite).
    ext.injectOptimizerRule(_ => graft.engine.Sum128Rewrite)
    // Custom whole-operator plan (§2.9 tier c): per-key top-k via bounded
    // heaps. The strategy only fires on the TopKPerKey node; the rewrite
    // (graft.topk.rewrite, default ON, cardinality-guarded) turns the
    // row_number()<=K window pattern into that node when the k·keys
    // working set is provably bounded.
    ext.injectOptimizerRule(_ => graft.plans.TopKRewrite)
    ext.injectPlannerStrategy(_ => graft.plans.TopKStrategy)
  }
}
