package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{
  AttributeReference, BinaryExpression, BitwiseAnd, BitwiseNot, BitwiseOr,
  Expression, If, IsNotNull, IsNull, Literal, Or, ShiftRight, ShiftRightUnsigned
}
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{BooleanType, DataType, Decimal, DecimalType, LongType}

/** Static helpers for the 128-bit fixed-point sum. */
object Sum128Util {

  private val Two64 = java.math.BigInteger.ONE.shiftLeft(64)

  /** Exact (hi·2^64 + unsigned lo) as a Decimal(38,0) — evaluated once
    * per GROUP, never per row, so the BigInteger/BigDecimal allocation
    * here is off the hot path by construction.
    */
  def toDecimal(hi: Long, lo: Long): Decimal = {
    val ulo =
      if (lo >= 0) java.math.BigInteger.valueOf(lo)
      else java.math.BigInteger.valueOf(lo).add(Two64)
    val v = java.math.BigInteger.valueOf(hi).shiftLeft(64).add(ulo)
    Decimal(new java.math.BigDecimal(v), 38, 0)
  }
}

/** Wrapping (2's-complement) long addition — `a + b` with Java overflow
  * semantics regardless of the session's ANSI mode. The int128
  * accumulator in [[Sum128]] NEEDS the wrap: its low word is an unsigned
  * 64-bit limb whose overflow is caught by the explicit carry chain, so
  * an ANSI overflow check here would be a false alarm.
  */
case class WrapAdd(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft wrap_add requires (bigint, bigint), got (${left.dataType.sql}, ${right.dataType.sql})")

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_wrap_add"

  override def nullSafeEval(a: Any, b: Any): Any =
    a.asInstanceOf[Long] + b.asInstanceOf[Long]

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $a + $b;")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): WrapAdd =
    copy(left = l, right = r)
}

/** Exact conversion of the (hi, lo) int128 buffer to Decimal(38,0). */
case class Int128ToDecimal(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DecimalType(38, 0)
  override def prettyName: String = "graft_int128_to_decimal"

  override def nullSafeEval(hi: Any, lo: Any): Any =
    Sum128Util.toDecimal(hi.asInstanceOf[Long], lo.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (hi, lo) =>
      s"${ev.value} = graft.functions.Sum128Util.toDecimal($hi, $lo);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Int128ToDecimal =
    copy(left = l, right = r)
}

/** `graft_sum128(bigint) -> decimal(38,0)`: overflow-safe integer sum
  * with an int128 accumulator held as TWO PRIMITIVE LONGS (hi + unsigned
  * lo limb, explicit carry chain) instead of Spark's Decimal(38,0) sum
  * buffer, whose per-row update allocates a Decimal object per input.
  * Same contract as `sum(cast(x as decimal(38,0)))`: exact at any corpus
  * size (1e13 rows × 1e18-magnitude rows is ~1e31 ≪ 2^127), null for an
  * empty/all-null group, nulls skipped — [[graft.core.Agg.dsum]]'s
  * accumulator recipe with the per-row cost of a plain long sum.
  * Measured (600k-row serial scan, 4 sums): decimal accumulators 1.6 s,
  * long sums 0.7 s — this closes that gap without giving up the
  * overflow guarantee a raw `sum(bigint)` abandons past 2^63.
  *
  * The declarative buffer is (hi: long, lo: long, seen: boolean) — all
  * primitives, so the aggregate stays on HashAggregateExec's fast path
  * and every update/merge expression participates in whole-stage
  * codegen. The one BigInteger materialization happens in
  * [[Int128ToDecimal]] at evaluate time, once per group.
  */
case class Sum128(child: Expression)
    extends DeclarativeAggregate with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_sum128 requires a bigint argument, got ${child.dataType.sql}")

  override def dataType: DataType = DecimalType(38, 0)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_sum128"

  private lazy val hi = AttributeReference("hi", LongType, nullable = false)()
  private lazy val lo = AttributeReference("lo", LongType, nullable = false)()
  private lazy val seen = AttributeReference("seen", BooleanType, nullable = false)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] = Seq(hi, lo, seen)

  override lazy val initialValues: Seq[Expression] =
    Seq(Literal(0L), Literal(0L), Literal(false))

  /** Carry-out of the unsigned addition a + b = s: the standard
    * bit-twiddle ((a & b) | ((a | b) & ~s)) has the carry in its sign
    * bit; >>> 63 exposes it as 0/1. Pure bitwise ops — no overflow
    * semantics to trip on.
    */
  private def carry(a: Expression, b: Expression, s: Expression): Expression =
    ShiftRightUnsigned(
      BitwiseOr(BitwiseAnd(a, b), BitwiseAnd(BitwiseOr(a, b), BitwiseNot(s))),
      Literal(63))

  private def add128(
      accHi: Expression, accLo: Expression,
      xHi: Expression, xLo: Expression): (Expression, Expression) = {
    val newLo = WrapAdd(accLo, xLo)
    val c = carry(accLo, xLo, newLo)
    (WrapAdd(WrapAdd(accHi, xHi), c), newLo)
  }

  override lazy val updateExpressions: Seq[Expression] = {
    // sign-extend the 64-bit input to 128 bits: high word = x >> 63
    val (newHi, newLo) = add128(hi, lo, ShiftRight(child, Literal(63)), child)
    if (child.nullable) {
      Seq(
        If(IsNull(child), hi, newHi),
        If(IsNull(child), lo, newLo),
        Or(seen, IsNotNull(child)))
    } else Seq(newHi, newLo, Literal(true))
  }

  override lazy val mergeExpressions: Seq[Expression] = {
    val (newHi, newLo) = add128(hi.left, lo.left, hi.right, lo.right)
    Seq(newHi, newLo, Or(seen.left, seen.right))
  }

  override lazy val evaluateExpression: Expression =
    If(seen, Int128ToDecimal(hi, lo), Literal(null, DecimalType(38, 0)))

  override protected def withNewChildInternal(newChild: Expression): Sum128 =
    copy(child = newChild)
}
