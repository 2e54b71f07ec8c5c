package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Static squared-L2 kernels against a CONSTANT codebook (the k-means /
  * IVF / PQ hot loop). The HOF formulation —
  * `aggregate(zip_with(v, array(lits), (x,y) => (x-y)*(x-y)), 0.0, +)`
  * per centroid, then `array_position(array_min(...))` — evaluates an
  * interpreted lambda expression tree PER ELEMENT PER CENTROID and
  * allocates an intermediate array per pair; the round-15 stage probe
  * measured the PQ encode map (480k tokens × 4 subspaces × 16 entries)
  * at 10.6 s of a 14.4 s query. These kernels are one primitive loop,
  * called from whole-stage codegen like [[Dot]].
  *
  * PARITY CONTRACT with the HOF form (bit-identical where inputs are
  * finite, the only regime the engine produces):
  *  - per-centroid distance is the SAME strict left-to-right IEEE fold
  *    `acc + (x - c_i)²` — same additions, same order, same bits;
  *  - a length mismatch or null element nulls THAT distance (zip_with
  *    pads/propagates to null) — it is skipped by min/argmin exactly as
  *    `array_min` ignores nulls; every distance null → result null;
  *  - argmin ties break to the FIRST index achieving the min, exactly
  *    `array_position(dists, array_min(dists))`;
  *  - NaN distances (impossible on finite inputs) are skipped where
  *    `array_min` would sort them last — divergence only when EVERY
  *    distance is NaN, which finite codebooks cannot produce.
  */
object L2Kernel {

  private def dist2At(v: ArrayData, vFloat: Boolean, cb: Array[Double]): java.lang.Double = {
    val n = v.numElements()
    if (cb.length != n) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (v.isNullAt(i)) return null
      val x = if (vFloat) v.getFloat(i).toDouble else v.getDouble(i)
      val d = x - cb(i)
      s += d * d
      i += 1
    }
    java.lang.Double.valueOf(s)
  }

  /** First-wins argmin of squared L2 over the codebook; null if no valid
    * distance exists.
    */
  def argMin(v: ArrayData, books: Array[Array[Double]], vFloat: Boolean): java.lang.Integer = {
    var best = Double.PositiveInfinity
    var bestI = -1
    var c = 0
    while (c < books.length) {
      val d = dist2At(v, vFloat, books(c))
      // strict < keeps the FIRST index on ties (array_position semantics)
      // and rejects NaN (NaN < x is false)
      if (d != null && d.doubleValue() < best) {
        best = d.doubleValue()
        bestI = c
      }
      c += 1
    }
    if (bestI < 0) null else Integer.valueOf(bestI)
  }

  /** Min squared L2 over the codebook; null if no valid distance. */
  def minDist(v: ArrayData, books: Array[Array[Double]], vFloat: Boolean): java.lang.Double = {
    val i = argMin(v, books, vFloat)
    if (i == null) null else dist2At(v, vFloat, books(i.intValue()))
  }

  /** Every per-centroid squared L2 (null where invalid) — the probe /
    * multi-probe form that needs the whole distance row.
    */
  def allDists(v: ArrayData, books: Array[Array[Double]], vFloat: Boolean): ArrayData = {
    val out = new Array[Any](books.length)
    var c = 0
    while (c < books.length) {
      out(c) = dist2At(v, vFloat, books(c))
      c += 1
    }
    new GenericArrayData(out)
  }
}

/** Shared scaffolding: (vector, FOLDABLE codebook literal) expressions.
  * The codebook child must be a constant `array<array<double>>` — it is
  * evaluated ONCE per executor into a primitive `double[][]` (a lazy val
  * on the deserialized expression; a codegen reference object), never
  * per row.
  */
abstract class CodebookExpression extends BinaryExpression {

  protected def kernelName: String

  private def vecOk(dt: DataType): Boolean = dt match {
    case ArrayType(DoubleType, _) | ArrayType(FloatType, _) => true
    case _ => false
  }

  protected def vFloat: Boolean = left.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (!vecOk(left.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"$kernelName requires array<double|float> vector, got ${left.dataType.sql}")
    else if (!right.foldable || !right.dataType.isInstanceOf[ArrayType] ||
      !right.dataType.asInstanceOf[ArrayType].elementType.isInstanceOf[ArrayType] ||
      right.dataType.asInstanceOf[ArrayType].elementType.asInstanceOf[ArrayType]
        .elementType != DoubleType)
      TypeCheckResult.TypeCheckFailure(
        s"$kernelName requires a FOLDABLE array<array<double>> codebook, " +
          s"got ${right.dataType.sql} (foldable=${right.foldable})")
    else TypeCheckResult.TypeCheckSuccess

  @transient protected lazy val books: Array[Array[Double]] = {
    val ad = right.eval(null).asInstanceOf[ArrayData]
    Array.tabulate(ad.numElements())(i => ad.getArray(i).toDoubleArray())
  }
}

/** `graft_argmin_l2(vec, books) -> int`: index of the nearest codebook
  * entry by squared L2 — the k-means / IVF / PQ assignment step, fused
  * into whole-stage codegen.
  */
case class ArgMinL2(left: Expression, right: Expression) extends CodebookExpression {
  override protected def kernelName: String = "graft_argmin_l2"
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_argmin_l2"

  override def nullSafeEval(v: Any, ignoredBooks: Any): Any = {
    val r = L2Kernel.argMin(v.asInstanceOf[ArrayData], books, vFloat)
    if (r == null) null else r.intValue()
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val booksRef = ctx.addReferenceObj("books", books, "double[][]")
    nullSafeCodeGen(ctx, ev, (v, _) => s"""
      java.lang.Integer ${ev.value}_r =
        graft.functions.L2Kernel.argMin($v, $booksRef, $vFloat);
      if (${ev.value}_r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ${ev.value}_r.intValue(); }
    """)
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): ArgMinL2 =
    copy(left = l, right = r)
}

/** `graft_min_l2(vec, books) -> double`: squared L2 to the nearest
  * entry — the per-row inertia term.
  */
case class MinL2(left: Expression, right: Expression) extends CodebookExpression {
  override protected def kernelName: String = "graft_min_l2"
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_min_l2"

  override def nullSafeEval(v: Any, ignoredBooks: Any): Any = {
    val r = L2Kernel.minDist(v.asInstanceOf[ArrayData], books, vFloat)
    if (r == null) null else r.doubleValue()
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val booksRef = ctx.addReferenceObj("books", books, "double[][]")
    nullSafeCodeGen(ctx, ev, (v, _) => s"""
      java.lang.Double ${ev.value}_r =
        graft.functions.L2Kernel.minDist($v, $booksRef, $vFloat);
      if (${ev.value}_r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ${ev.value}_r.doubleValue(); }
    """)
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): MinL2 =
    copy(left = l, right = r)
}

/** `graft_l2s(vec, books) -> array<double>`: the whole distance row (one
  * squared L2 per entry, null where invalid) — what the probe /
  * multi-probe forms posexplode.
  */
case class AllL2(left: Expression, right: Expression) extends CodebookExpression {
  override protected def kernelName: String = "graft_l2s"
  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)
  override def nullable: Boolean = left.nullable
  override def prettyName: String = "graft_l2s"

  override def nullSafeEval(v: Any, ignoredBooks: Any): Any =
    L2Kernel.allDists(v.asInstanceOf[ArrayData], books, vFloat)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val booksRef = ctx.addReferenceObj("books", books, "double[][]")
    nullSafeCodeGen(ctx, ev, (v, _) =>
      s"${ev.value} = graft.functions.L2Kernel.allDists($v, $booksRef, $vFloat);")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): AllL2 =
    copy(left = l, right = r)
}
