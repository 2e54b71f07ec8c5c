package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Static kernel: all `n` MinHash accumulators advanced in ONE traversal
  * of the shingle array. The explode→32×min-agg formulation (the previous
  * serving path) evaluates the same xxhash64 calls but pays explode row
  * materialization, per-row agg bookkeeping, and a hash-agg over
  * #shingles rows per doc; a naive per-row HOF formulation re-evaluates
  * the shingle array once per hash (measured 20× slower — see
  * [[graft.ext.Dedup.minhashSignatures]]'s scaladoc). This loop touches
  * each shingle's bytes once per seed with zero allocation beyond the
  * output array.
  *
  * Parity contract: `mins[j] == min over shingles s of xxhash64(s, j)`,
  * bit-for-bit — Spark's SQL `xxhash64(s, j)` is the MULTI-ARGUMENT hash
  * (fold each child into the running hash, initial seed 42): first
  * `XXH64.hashUnsafeBytes(s.bytes, 42)`, then `XXH64.hashInt(j, ·)` for
  * the int literal. Replicating that exactly is also the cheap layout:
  * the expensive byte traversal happens ONCE per shingle and each of the
  * n accumulators costs one `hashInt` finalization — vs n full byte
  * traversals if each hash were independently seeded. Signatures, band
  * hashes, and every downstream recall gate are bit-identical whichever
  * path computed them. Null shingle elements are skipped; an EMPTY array
  * returns null, mirroring the agg path where explode produces no rows
  * and the doc has no signature group at all.
  */
object MinHash {

  private val SqlHashSeed = 42L

  def compute(arr: ArrayData, n: Int): ArrayData = {
    val m = arr.numElements()
    if (m == 0) return null
    val mins = Array.fill(n)(Long.MaxValue)
    var i = 0
    while (i < m) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        val base = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, SqlHashSeed)
        var j = 0
        while (j < n) {
          val h = XXH64.hashInt(j, base)
          if (h < mins(j)) mins(j) = h
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }
}

/** Catalyst expression `graft_minhash(array<string>, n) -> array<bigint>`
  * (n a literal, fixed at plan time), registered through
  * [[graft.GraftExtensions]]; participates in whole-stage codegen. The
  * per-row replacement for the explode→min-agg MinHash signature plan —
  * no explode, no aggregate, no exchange.
  */
case class MinHashSig(child: Expression, nHashes: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if nHashes > 0 => TypeCheckResult.TypeCheckSuccess
    case ArrayType(StringType, _) =>
      TypeCheckResult.TypeCheckFailure(s"graft_minhash needs a positive hash count, got $nHashes")
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"graft_minhash requires an array<string> argument, got ${other.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_minhash"

  override def nullSafeEval(a: Any): Any =
    MinHash.compute(a.asInstanceOf[ArrayData], nHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val out = ctx.freshName("minhashSig")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $out =
         |  graft.functions.MinHash.compute($a, $nHashes);
         |if ($out == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $out;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}
