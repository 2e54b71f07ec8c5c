package graft.engine

import org.apache.spark.sql.catalyst.expressions.aggregate.{
  AggregateExpression, Complete, Count, HyperLogLogPlusPlus}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf

/** Opt-in logical rewrite: exact `COUNT(DISTINCT x)` → HyperLogLog++
  * estimate. The accuracy-for-cost trade every interactive engine offers
  * (BigQuery's APPROX_COUNT_DISTINCT, Presto/Trino's approx_distinct)
  * expressed as a Catalyst [[Rule]] instead of a query rewrite: flip
  * `graft.approx.distinct=true` on the session and every single-column
  * distinct count in the plan — DataFrame or delegated SQL, however deeply
  * nested — plans as a mergeable sketch aggregate.
  *
  * Why an optimizer rule and not "just call approx_count_distinct": the
  * reference's users ship arbitrary SELECT text (variables.tf:72-75), so
  * the engine cannot edit their queries. At 100 TB the difference is
  * structural — exact distinct plans an Expand + second shuffle keyed on
  * (group, value) sized by the DATA, while the sketch is a fixed ~1.6 KB
  * buffer per group with map-side combine, one shuffle sized by the GROUP
  * COUNT.
  *
  * Scope guard: only `Count(single child)` with `isDistinct=true` and no
  * filter clause rewrites; multi-arg distinct counts and filtered
  * aggregates keep exact semantics. The result type (long) is unchanged,
  * so parent operators and output schema are unaffected. Registered via
  * [[graft.GraftExtensions]] `injectOptimizerRule`, gated per-query by
  * SQLConf so concurrent sessions can disagree about the flag.
  */
object ApproxDistinctRewrite extends Rule[LogicalPlan] {

  val Flag = "graft.approx.distinct"

  /** relativeSD of the sketch (HLL++ default 0.05 ≈ 1.6 KB of registers). */
  private val RelativeSD = 0.05

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!SQLConf.get.getConfString(Flag, "false").toBoolean) plan
    else
      plan.transformUp {
        case agg: Aggregate =>
          agg.transformExpressions {
            case ae @ AggregateExpression(Count(Seq(child)), _, true, None, _) =>
              AggregateExpression(
                HyperLogLogPlusPlus(child, RelativeSD),
                Complete,
                isDistinct = false,
                filter = None,
                resultId = ae.resultId)
          }
      }
}
