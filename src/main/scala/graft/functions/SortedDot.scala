package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Static kernel: exact sparse-vector dot product over two TERM-SORTED
  * parallel-array signatures via a two-pointer merge — the scoring
  * workhorse of the champion-list sparse-cosine family. The relational
  * formulation (candidate ⋈ sig-a on doc ⋈ sig-b on (doc, term) →
  * hash-agg SUM) re-explodes every candidate pair into |sig| rows and
  * shuffles them twice; with per-doc signature arrays the pair's dot is
  * one bounded merge inside whole-stage codegen and the candidate
  * relation never fans out (round-15 stage probe: the 3-way-join pairs
  * stage was 3.8 s of the 5.3 s query at sf0.1).
  */
object SortedDot {

  /** Σ wa(i)·wb(j) over positions with ta(i) == tb(j), both term arrays
    * sorted ascending in UTF8 binary order (sort_array's string order)
    * and duplicate-free per side — guaranteed by the builders, which
    * sort_array a (doc, term)-grouped collect_list. A malformed input
    * (parallel arrays of different lengths) is rejected loudly rather
    * than scored wrong.
    *
    * Overflow FAILS LOUDLY, like the relational `SUM(wa*wb)` it
    * replaced, which threw under ANSI past 2^63: `multiplyHigh` detects
    * a product outside the long range (overflow-domain weights — e.g.
    * tf·(n·1e6 div df) squares past 2^63 at large n with df=1) and
    * `addExact` covers the accumulator, so a wrap can never silently
    * become a wrong score (round-15 advice).
    */
  def compute(ta: ArrayData, wa: ArrayData, tb: ArrayData, wb: ArrayData): Long = {
    val na = ta.numElements()
    val nb = tb.numElements()
    if (wa.numElements() != na || wb.numElements() != nb)
      throw new IllegalArgumentException(
        s"graft_sorted_dot: parallel arrays differ in length (${na} vs ${wa.numElements()}, ${nb} vs ${wb.numElements()})")
    var i = 0
    var j = 0
    var acc = 0L
    while (i < na && j < nb) {
      val cmp = ta.getUTF8String(i).compareTo(tb.getUTF8String(j))
      if (cmp == 0) {
        val a = wa.getLong(i)
        val b = wb.getLong(j)
        val lo = a * b
        // exact iff the high 64 bits are the sign extension of the low
        if (java.lang.Math.multiplyHigh(a, b) != (lo >> 63))
          throw new ArithmeticException(
            s"graft_sorted_dot: weight product $a * $b overflows long")
        acc = java.lang.Math.addExact(acc, lo)
        i += 1
        j += 1
      } else if (cmp < 0) i += 1
      else j += 1
    }
    acc
  }

  /** [[compute]] for INTEGER-keyed signatures (array<bigint> key arrays,
    * sorted ascending, duplicate-free per side): the two-pointer merge's
    * per-step comparison becomes one long compare instead of a UTF8
    * byte-wise compareTo — the round-22 dictionary-encoded index layout
    * (terms mapped to dense ids at build time; the integer dot is
    * order-free, so the result is bit-identical to the string-keyed
    * merge over the same term↔id bijection). Same loud overflow
    * contract.
    */
  def computeLong(ta: ArrayData, wa: ArrayData, tb: ArrayData, wb: ArrayData): Long = {
    val na = ta.numElements()
    val nb = tb.numElements()
    if (wa.numElements() != na || wb.numElements() != nb)
      throw new IllegalArgumentException(
        s"graft_sorted_dot: parallel arrays differ in length (${na} vs ${wa.numElements()}, ${nb} vs ${wb.numElements()})")
    var i = 0
    var j = 0
    var acc = 0L
    while (i < na && j < nb) {
      val ka = ta.getLong(i)
      val kb = tb.getLong(j)
      if (ka == kb) {
        val a = wa.getLong(i)
        val b = wb.getLong(j)
        val lo = a * b
        if (java.lang.Math.multiplyHigh(a, b) != (lo >> 63))
          throw new ArithmeticException(
            s"graft_sorted_dot: weight product $a * $b overflows long")
        acc = java.lang.Math.addExact(acc, lo)
        i += 1
        j += 1
      } else if (ka < kb) i += 1
      else j += 1
    }
    acc
  }
}

/** Catalyst expression `graft_sorted_dot(array<string>, array<bigint>,
  * array<string>, array<bigint>)` -> bigint: exact dot product of two
  * sparse integer vectors given as (sorted terms, aligned weights)
  * parallel arrays. Participates in whole-stage codegen (SURVEY §2.9
  * custom-Expression tier); registered through [[graft.GraftExtensions]].
  * Term arrays MUST be sorted ascending (UTF8 binary order — what
  * `sort_array` produces for strings) and duplicate- and null-free;
  * the signature builders guarantee all three by sorting a
  * (doc, term)-grouped collect_list. Null in any argument → null.
  */
case class SortedDotProduct(
    first: Expression,
    second: Expression,
    third: Expression,
    fourth: Expression)
    extends QuaternaryExpression {

  private def termsOk(dt: DataType): Boolean = dt match {
    case ArrayType(StringType, _) => true
    case ArrayType(LongType, _) => true
    case _ => false
  }

  private def weightsOk(dt: DataType): Boolean = dt match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  /** Integer-keyed form (round 22): both key arrays are array<bigint>
    * (dictionary-encoded term ids) — the merge compares longs instead
    * of UTF8 strings; result is identical under any key bijection.
    */
  private lazy val longKeys: Boolean = first.dataType match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (termsOk(first.dataType) && weightsOk(second.dataType) &&
      termsOk(third.dataType) && weightsOk(fourth.dataType) &&
      ((first.dataType, third.dataType) match {
        case (ArrayType(a, _), ArrayType(b, _)) => a == b
        case _ => false
      }))
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        "graft_sorted_dot requires (array<string>|array<bigint> keys, array<bigint>, " +
          "same key type, array<bigint>), got " +
          s"(${first.dataType.sql}, ${second.dataType.sql}, ${third.dataType.sql}, ${fourth.dataType.sql})")

  override def dataType: DataType = LongType
  override def nullable: Boolean =
    first.nullable || second.nullable || third.nullable || fourth.nullable
  override def prettyName: String = "graft_sorted_dot"

  override def nullSafeEval(ta: Any, wa: Any, tb: Any, wb: Any): Any =
    if (longKeys)
      SortedDot.computeLong(
        ta.asInstanceOf[ArrayData],
        wa.asInstanceOf[ArrayData],
        tb.asInstanceOf[ArrayData],
        wb.asInstanceOf[ArrayData])
    else
      SortedDot.compute(
        ta.asInstanceOf[ArrayData],
        wa.asInstanceOf[ArrayData],
        tb.asInstanceOf[ArrayData],
        wb.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val method = if (longKeys) "computeLong" else "compute"
    nullSafeCodeGen(ctx, ev, (ta, wa, tb, wb) => {
      s"${ev.value} = graft.functions.SortedDot.$method($ta, $wa, $tb, $wb);"
    })
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression,
      newSecond: Expression,
      newThird: Expression,
      newFourth: Expression): SortedDotProduct =
    copy(first = newFirst, second = newSecond, third = newThird, fourth = newFourth)
}
