package graft.plans

import org.apache.spark.sql.catalyst.expressions.{
  Alias, Attribute, AttributeReference, Expression, LessThan, LessThanOrEqual,
  Literal, RowNumber, SortOrder, WindowExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, UnaryNode, Window}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.IntegerType

/** Whole-operator custom plan (SURVEY §2.9 tier c): per-key top-k.
  *
  * The ubiquitous `row_number() OVER (PARTITION BY k ORDER BY o) <= K`
  * pattern plans as Window: a full shuffle of EVERY row keyed on k, then a
  * complete per-key SORT, then a filter that throws away all but K rows
  * per key. At 100 TB that wastes two ways: the shuffle carries the whole
  * table, and the sort pays n·log(n) per key for an answer that needs only
  * the K best.
  *
  * [[TopKPerKey]] declares the operator's real semantics, and
  * [[graft.plans.TopKPerKeyFinalExec]] executes it as bounded heaps:
  * a map-side partial pass retains at most K rows per key per input
  * partition (so the shuffle carries ≤ K·keys·mappers rows — for hot keys
  * orders of magnitude less than the data), and the reduce side merges
  * heaps and emits ranks. O(n·log K) comparisons, no full sort, fixed
  * per-key memory.
  *
  * Output = child.output :+ rankAttr (same shape as the Window form, same
  * exprId when rewritten from one), so the node is a drop-in replacement
  * and downstream references stay resolved.
  */
final case class TopKPerKey(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    rankAttr: Attribute,
    child: LogicalPlan)
    extends UnaryNode {

  require(k > 0, s"top-k needs k > 0, got $k")

  override def output: Seq[Attribute] = child.output :+ rankAttr

  // rankAttr is produced here, not derived from the child — without this
  // CheckAnalysis reports it "missing from input"
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr :: Nil)

  override def maxRows: Option[Long] = child.maxRows

  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKey =
    copy(child = newChild)
}

object TopKPerKey {

  /** Fresh rank attribute for direct (non-rewrite) construction. */
  def rankAttribute(name: String = "rn"): Attribute =
    AttributeReference(name, IntegerType, nullable = false)()
}

/** Opt-in logical rewrite (`graft.topk.rewrite=true`):
  * `Filter(rn <= K, Window(rn := row_number() OVER (...)))` →
  * [[TopKPerKey]]. Fires on the exact single-window-expression shape with
  * a literal bound — anything else (other window functions alongside,
  * compound filter conditions, non-literal bounds) keeps the Window plan.
  * The rewritten node reuses the window alias' exprId, so downstream
  * projections of the rank column resolve unchanged. Same SQLConf gating
  * pattern as [[graft.engine.ApproxDistinctRewrite]].
  */
object TopKRewrite extends Rule[LogicalPlan] {

  val Flag = "graft.topk.rewrite"

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!SQLConf.get.getConfString(Flag, "false").toBoolean) plan
    else
      plan.transformUp {
        case f @ Filter(
              cond,
              Window(
                Seq(alias @ Alias(WindowExpression(RowNumber(), _), _)),
                partSpec,
                orderSpec,
                child,
                _)) if orderSpec.nonEmpty =>
          val rn = alias.toAttribute
          val bound = cond match {
            case LessThanOrEqual(a: Attribute, Literal(v: Int, IntegerType))
                if a.semanticEquals(rn) => Some(v)
            case LessThan(a: Attribute, Literal(v: Int, IntegerType))
                if a.semanticEquals(rn) => Some(v - 1)
            case _ => None
          }
          bound.filter(_ > 0) match {
            case Some(k) => TopKPerKey(partSpec, orderSpec, k, rn, child)
            case None => f
          }
      }
}
