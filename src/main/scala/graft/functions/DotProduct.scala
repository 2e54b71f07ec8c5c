package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Static kernel so generated code calls straight into a primitive loop —
  * no per-element Column-expression tree, no boxing per element (the HOF
  * `aggregate(zip_with(...))` formulation allocates an intermediate array
  * and evaluates a lambda expression tree per element).
  */
object Dot {

  /** Sequential-fold dot product. Parity contract with the HOF version
    * (and DuckDB's list_dot_product): strict left-to-right accumulation —
    * same IEEE additions in the same order, same bits out. Null on length
    * mismatch or any null element (zip_with pads/propagates to null).
    * `aFloat`/`bFloat` select the element reader — float arrays are read
    * and widened per element (what a cast to array<double> would do,
    * without materializing the copy); JIT hoists the constant branches.
    */
  def compute(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      s += x * y
      i += 1
    }
    java.lang.Double.valueOf(s)
  }
}

/** Catalyst expression `graft_dot(array<double|float>, array<double|float>)
  * -> double`, registered through [[graft.GraftExtensions]]; participates
  * in whole-stage codegen (SURVEY §2.9 "custom Expression beats UDF"
  * tier). Float arrays — the raw embedding column type — are accepted
  * directly and widened per element, so no caller-side cast (or array
  * copy) is needed.
  */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {

  private def elemOk(dt: DataType): Boolean = dt match {
    case ArrayType(DoubleType, _) | ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOk(left.dataType) && elemOk(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dot requires array<double> or array<float> arguments, " +
        s"got (${left.dataType.sql}, ${right.dataType.sql})")

  private def isFloat(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any =
    Dot.compute(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      isFloat(left.dataType), isFloat(right.dataType))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val boxed = ctx.freshName("dot")
      val lf = isFloat(left.dataType)
      val rf = isFloat(right.dataType)
      s"""
         |java.lang.Double $boxed = graft.functions.Dot.compute($a, $b, $lf, $rf);
         |if ($boxed == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $boxed.doubleValue();
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}
