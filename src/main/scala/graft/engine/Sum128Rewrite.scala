package graft.engine

import org.apache.spark.sql.catalyst.expressions.{
  Alias, AttributeReference, Cast, Expression, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{
  AggregateExpression, Average, Count, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project, Window}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.{ByteType, DecimalType, IntegerType, LongType, ShortType}

import graft.functions.Sum128

/** Logical rewrite: `SUM(CAST(<integral> AS DECIMAL(38,0)))` →
  * [[graft.functions.Sum128]] — the int128 primitive-buffer accumulator
  * behind `Agg.dsum`, applied to DELEGATED SQL text the engine is not
  * allowed to edit.
  *
  * Why a Rule and not "just call graft_sum128": the fixed-point recipe
  * this repo shares with its DuckDB oracle spells overflow-safe sums as
  * `SUM(CAST(x AS DECIMAL(38,0)))` — identical text in both engines is
  * the differential-testing contract (SqlQueries.scala:14), and the
  * reference's users ship arbitrary SELECT text (variables.tf:72-75).
  * Spark executes that shape with a Decimal(38,0) sum buffer: one
  * Decimal allocation per input row (measured: 4 such sums over a
  * 600k-row serial scan = 1.54 s vs 0.72 s for plain long sums). The
  * rewrite swaps in the two-primitive-long int128 buffer, keeping the
  * per-row cost at plain-long level while preserving the overflow
  * guarantee — the accumulator is exact to ~2^127, so 1e13 rows ×
  * 1e18-magnitude inputs (the 100 TB envelope that overflows BIGINT's
  * 2^63) stays exact.
  *
  * Semantics: bit-identical results on the full reachable domain
  * (Sum128Spec: 20k-random-long differential, 2^63-crossing totals,
  * mixed-sign partial merges, null/empty contract). The only divergence
  * window is a total past DECIMAL(38,0)'s ~1e38 ceiling, where the
  * decimal sum raises an ANSI overflow and Sum128 raises a precision
  * error materializing the result — both fail loudly, neither returns
  * wrong data.
  *
  * Scope guard: only `Sum(Cast(x, DecimalType(38,0)))` with an integral
  * x rewrites (the cast long→decimal(38,0) is always exact, so ANSI/TRY
  * cast modes agree); sums over genuinely fractional decimals keep
  * Spark's accumulator. DISTINCT sums are left alone (the SQL tier has
  * none; Aggregation planning treats distinct functions specially).
  * Fires in both [[Aggregate]] and [[Window]] nodes — WindowExec's
  * AggregateProcessor takes declarative aggregates (proven by the
  * direct Sum128 window-frame sums in q_window_range). The result type
  * is DecimalType(38,0) either way, so parent operators and output
  * schema are unaffected. Gated by `graft.sum128.rewrite` (default ON),
  * read from SQLConf per-query so concurrent sessions can disagree.
  */
object Sum128Rewrite extends Rule[LogicalPlan] {

  val Flag = "graft.sum128.rewrite"

  /** The exact-cast domain: any integral input widens to bigint without
    * loss, so `Sum128(cast(x as bigint))` ≡ `Sum(cast(x as
    * decimal(38,0)))` on every reachable input.
    */
  private def asLong(e: Expression): Option[Expression] = e.dataType match {
    case LongType => Some(e)
    case ByteType | ShortType | IntegerType => Some(Cast(e, LongType))
    case _ => None
  }

  private def rewriteAgg(agg: Aggregate): Aggregate =
    agg.transformExpressions {
      case ae @ AggregateExpression(Sum(c: Cast, _), _, false, _, _)
          if c.dataType == DecimalType(38, 0) && asLong(c.child).isDefined =>
        ae.copy(aggregateFunction = Sum128(asLong(c.child).get))
      case ae @ AggregateExpression(avg @ Average(c: Cast, _), _, false, _, _)
          if c.dataType == DecimalType(38, 0) && asLong(c.child).isDefined =>
        rewriteAvg(ae, avg, c)
    }.asInstanceOf[Aggregate]

  /** `AVG(CAST(<integral> AS DECIMAL(38,0)))` — same per-row Decimal
    * buffer cost as the SUM shape (Average's sum slot is
    * DecimalType.bounded(48,0) = (38,0)). Bit-identity is BY
    * CONSTRUCTION, not by reimplementation: the replacement is Spark's
    * own `Average.evaluateExpression` — whatever division/rounding tree
    * this Spark version builds — with its two buffer slots substituted:
    * `sum` → a [[Sum128]] aggregate (result DecimalType(38,0), the same
    * type as the slot it replaces on the reachable domain; Sum128Spec's
    * differential covers 2^63-crossing totals) and `count` → `Count`
    * over the same cast child (Average's count increments exactly on
    * non-null children, which the cast preserves). Mode/filter clauses
    * carry over to both replacement aggregates; the final expression is
    * a plain projection over them, so the Aggregate's output schema and
    * every parent are untouched.
    */
  private def rewriteAvg(
      ae: AggregateExpression, avg: Average, c: Cast): Expression = {
    val sumSlot = avg.aggBufferAttributes.head
    val countSlot = avg.aggBufferAttributes(1)
    val sumAgg = ae.copy(
      aggregateFunction = Sum128(asLong(c.child).get),
      resultId = NamedExpression.newExprId)
    val countAgg = ae.copy(
      aggregateFunction = Count(Seq(c)),
      resultId = NamedExpression.newExprId)
    avg.evaluateExpression.transform {
      case a: AttributeReference if a.exprId == sumSlot.exprId => sumAgg
      case a: AttributeReference if a.exprId == countSlot.exprId => countAgg
    }
  }

  /** The window shape arrives pre-extracted: the analyzer's
    * ExtractWindowExpressions pulls the cast into a Project below the
    * Window (`_w0 = CAST(x AS DECIMAL(38,0))`), so the Window node sums
    * a bare decimal attribute. Rewrite = add a long-typed sibling alias
    * for each such extraction and point Sum128 at it; the original
    * decimal alias stays for any other consumer (column pruning drops it
    * when orphaned).
    */
  private def rewriteWindow(w: Window): LogicalPlan = w.child match {
    case p: Project =>
      val castSource = p.projectList.collect {
        case a @ Alias(c: Cast, _)
            if c.dataType == DecimalType(38, 0) && c.child.deterministic &&
              asLong(c.child).isDefined =>
          a.exprId -> asLong(c.child).get
      }.toMap
      if (castSource.isEmpty) w
      else {
        val added = scala.collection.mutable.LinkedHashMap.empty[Long, NamedExpression]
        val newW = w.transformExpressions {
          case ae @ AggregateExpression(Sum(attr: AttributeReference, _), _, false, _, _)
              if castSource.contains(attr.exprId) =>
            val longAlias = added.getOrElseUpdate(
              attr.exprId.id, Alias(castSource(attr.exprId), s"${attr.name}_g128")())
            ae.copy(aggregateFunction = Sum128(longAlias.toAttribute))
        }.asInstanceOf[Window]
        if (added.isEmpty) w
        else {
          // Restore the ORIGINAL output attribute list above the widened
          // Window: the synthesized _g128 columns widen the child
          // Project and hence Window.output, and while
          // ExtractWindowExpressions happens to leave a Project above
          // every Window today, the rule itself must guarantee
          // output-preservation — an arity-sensitive parent (Union /
          // Except / Distinct) sitting directly on the Window would
          // otherwise see a changed schema (round-15 advice).
          Project(
            w.output,
            newW.copy(child = p.copy(projectList = p.projectList ++ added.values)))
        }
      }
    case _ => w
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!SQLConf.get.getConfString(Flag, "true").toBoolean) plan
    else
      plan.transformUp {
        case agg: Aggregate => rewriteAgg(agg)
        case w: Window => rewriteWindow(w)
      }
}
