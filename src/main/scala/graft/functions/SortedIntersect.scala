package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Static kernel: intersection size of two SORTED (ascending, distinct,
  * null-free) int arrays via a two-pointer walk, with an early-exit bound
  * — the verify-stage workhorse of the prefix-filter join family, where
  * the overwhelming majority of candidate pairs are far below threshold
  * and a full `array_intersect` (hash-set build per row pair) is wasted
  * work.
  */
object InterGe {

  /** Returns the exact intersection size when it can reach `t`, else -1.
    * The walk aborts as soon as `count + min(remaining_a, remaining_b)`
    * proves the threshold unreachable — for dissimilar pairs that is
    * after ~(len − t) steps, not len. Deterministic: -1 exactly when the
    * true intersection size is < t, the exact size otherwise, so callers
    * filter `>= max(t, 0)` and read surviving values as exact.
    */
  def compute(a: ArrayData, b: ArrayData, t: Int): Int = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var c = 0
    while (i < na && j < nb) {
      val ra = na - i
      val rb = nb - j
      if (c + (if (ra < rb) ra else rb) < t) return -1
      val x = a.getInt(i)
      val y = b.getInt(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    if (c >= t) c else -1
  }

  /** [[compute]] over long-element arrays — the prefix-dedup family's
    * rank ids are dictionary ordinals (O(distinct shingles), billions at
    * corpus scale), so its sorted rank arrays are array<bigint>.
    */
  def computeLong(a: ArrayData, b: ArrayData, t: Int): Int = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var c = 0
    while (i < na && j < nb) {
      val ra = na - i
      val rb = nb - j
      if (c + (if (ra < rb) ra else rb) < t) return -1
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    if (c >= t) c else -1
  }
}

/** Catalyst expression `graft_inter_ge(array<int|bigint>, same, t)` ->
  * int: exact sorted-array intersection size if >= t, else -1.
  * Participates in whole-stage codegen (SURVEY §2.9 custom-Expression
  * tier); registered through [[graft.GraftExtensions]]. Inputs MUST be
  * sorted ascending and null-free — the prefix-join family builds them
  * with `sort_array(collect_list(rid))` over the scale-safe global-rank
  * dictionary, which guarantees both. Both arrays must share one element
  * type; the long form exists because dictionary ordinals exceed int
  * range on a real corpus vocabulary.
  */
case class SortedIntersectGe(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  private def arrOk(dt: DataType): Boolean = dt match {
    case ArrayType(IntegerType, _) => true
    case ArrayType(LongType, _) => true
    case _ => false
  }

  private def isLong: Boolean = first.dataType match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  // compare ELEMENT types, not full ArrayType equality: containsNull is
  // metadata about provenance (a literal array vs a collect_list-built
  // one differ only there) and must not reject otherwise-matching inputs;
  // the int-vs-long mismatch rejection is what matters.
  private def sameElementType: Boolean = (first.dataType, second.dataType) match {
    case (ArrayType(et1, _), ArrayType(et2, _)) => et1 == et2
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (arrOk(first.dataType) && sameElementType && third.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"graft_inter_ge requires (array<int|bigint>, same element type, int), got " +
          s"(${first.dataType.sql}, ${second.dataType.sql}, ${third.dataType.sql})")

  override def dataType: DataType = IntegerType
  override def nullable: Boolean =
    first.nullable || second.nullable || third.nullable
  override def prettyName: String = "graft_inter_ge"

  override def nullSafeEval(a: Any, b: Any, t: Any): Any =
    if (isLong)
      InterGe.computeLong(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], t.asInstanceOf[Int])
    else
      InterGe.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], t.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kernel = if (isLong) "computeLong" else "compute"
    nullSafeCodeGen(ctx, ev, (a, b, t) => {
      s"${ev.value} = graft.functions.InterGe.$kernel($a, $b, $t);"
    })
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): SortedIntersectGe =
    copy(first = newFirst, second = newSecond, third = newThird)
}
