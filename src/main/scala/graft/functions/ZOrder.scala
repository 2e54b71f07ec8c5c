package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Morton (Z-order) interleave of the low 16 bits of two longs — the
  * multi-dimensional clustering key behind ZORDER-style data-skipping
  * layouts (see `graft.queries.Partitioned` q_zorder). The static kernel
  * uses the canonical magic-mask bit spread (O(log bits), branch-free)
  * rather than a 16-iteration loop; bit-identical to the HOF
  * `aggregate(transform(sequence(0,15), ...))` formulation (asserted in
  * ZOrderSpec) and to DuckDB's list_sum equivalent.
  */
object ZOrder {

  /** Spread the low 16 bits of v so bit i lands at position 2i. */
  def spread16(v: Long): Long = {
    var x = v & 0xFFFFL
    x = (x | (x << 8)) & 0x00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0FL
    x = (x | (x << 2)) & 0x33333333L
    x = (x | (x << 1)) & 0x55555555L
    x
  }

  /** Interleave: x's bits at even positions, y's at odd. */
  def interleave16(x: Long, y: Long): Long =
    spread16(x) | (spread16(y) << 1)
}

/** Catalyst expression `graft_zorder(bigint, bigint) -> bigint`, registered
  * through [[graft.GraftExtensions]]; codegen-friendly so a z-ordered
  * write's sort key evaluates as one primitive call per row instead of a
  * 16-element HOF fold with per-element lambda evaluation.
  */
case class ZOrderExpr(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_zorder requires (bigint, bigint) arguments, " +
        s"got (${left.dataType.sql}, ${right.dataType.sql})")

  override def dataType: DataType = LongType
  override def nullable: Boolean = left.nullable || right.nullable
  override def prettyName: String = "graft_zorder"

  override def nullSafeEval(a: Any, b: Any): Any =
    ZOrder.interleave16(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.ZOrder.interleave16($a, $b);")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): ZOrderExpr =
    copy(left = newLeft, right = newRight)
}
