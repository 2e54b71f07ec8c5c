package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** K-Minimum-Values (theta) sketch over a string stream — the mergeable
  * DISTINCT-COUNT sketch that, unlike HLL, supports SET OPERATIONS
  * (Beyer et al. 2007; the Apache DataSketches theta family): keep the
  * K smallest distinct hash values; the K-th smallest normalized hash
  * estimates density, so distinct ≈ (K−1)/θ. Two sketches INTERSECT by
  * the inclusion rule — θ = min(θ_a, θ_b), estimate = |{h ∈ S_a ∩ S_b :
  * h < θ}| / θ — which is exactly the question HLL cannot answer
  * without inclusion-exclusion error blowup: "how many distinct items
  * do these two shards SHARE?" (cross-source vocabulary overlap,
  * audience intersection, contamination between corpus slices). State
  * is K longs per group regardless of cardinality; merge = union +
  * truncate (a commutative idempotent monoid), so partial aggregation
  * and shuffles work like any sketch.
  *
  * Like [[CmsSketch]], this sketch is deliberately DETERMINISTIC and
  * RELATIONAL-EMULABLE: the hash is the repo's cross-engine md5 prefix
  * — Spark `conv(substring(md5(x),1,8),16,10)`, DuckDB
  * `CAST('0x'||substring(md5(x),1,8) AS BIGINT)`, JVM first-4-bytes of
  * the digest — a 32-bit value both engines reproduce bit-for-bit, so
  * the DuckDB oracle rebuilds the EXACT k-min sets relationally
  * (DISTINCT hash → ROW_NUMBER ≤ K) and the correctness gates are full
  * value differentials on sketch OUTPUT (estimates included: the
  * division is a fixed two-op double chain both engines evaluate
  * identically), not probabilistic invariants.
  */
object KmvSketch {
  /** Retained minimum hashes per sketch — 64 longs = 512 bytes. */
  val K = 64
  /** Hash range: [0, 2^32) from the md5 8-hex-char prefix. */
  val HashSpace = 4294967296.0

  // One digest per thread, reset per call — getInstance("MD5") allocates
  // (provider lookup + digest object) and hash32 sits on the PER-TOKEN
  // hot path of KmvAggregate.update, the per-token cost the sketch
  // stress tier names as KMV's weak spot.
  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Cross-engine 32-bit hash (see scaladoc): first 4 digest bytes of
    * md5 over UTF-8, as an unsigned 32-bit value in a long.
    */
  def hash32(s: String): Long = {
    val md = md5Local.get()
    md.reset()
    val d = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) | ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }

  /** Decode an `array<bigint>` sketch column to primitive longs, SKIPPING
    * null elements: sketches this library writes never contain them
    * (`containsNull=false`), but a stored sketch re-read through parquet
    * or a user-supplied `array<bigint>` may carry the nullable element
    * type — `ArrayData.toLongArray()` then throws MID-QUERY on the first
    * null. Defined semantics instead: a null element is no hash, so the
    * sketch is the set of its non-null members (order preserved — a
    * sorted input stays sorted). The no-null fast path is the bulk
    * `toLongArray()` copy.
    */
  def longs(ad: org.apache.spark.sql.catalyst.util.ArrayData): Array[Long] = {
    val n = ad.numElements()
    var i = 0
    var nulls = 0
    while (i < n) { if (ad.isNullAt(i)) nulls += 1; i += 1 }
    if (nulls == 0) ad.toLongArray()
    else {
      val out = new Array[Long](n - nulls)
      var j = 0
      i = 0
      while (i < n) {
        if (!ad.isNullAt(i)) { out(j) = ad.getLong(i); j += 1 }
        i += 1
      }
      out
    }
  }

  /** θ in RAW hash units: the K-th smallest retained hash once the
    * sketch filled, else the full hash space (exact mode — every
    * distinct hash seen is retained).
    */
  def thetaRaw(mins: Array[Long]): Double =
    if (mins.length < K) HashSpace else mins(K - 1).toDouble

  /** Distinct estimate: exact count in exact mode; else (K−1)/θ — the
    * two-op double chain `(K−1)·2^32 / h_K` both engines evaluate in
    * the same order.
    */
  def estimate(mins: Array[Long]): Double =
    if (mins.length < K) mins.length.toDouble
    else (K - 1).toDouble * HashSpace / mins(K - 1).toDouble

  /** Theta-intersection estimate over two k-min sets (both sorted
    * ascending): θ = min(θ_a, θ_b); count common hashes STRICTLY below
    * θ; estimate = cnt·2^32/θ_raw... in raw units, cnt / (θ/2^32).
    * In mutual exact mode this degenerates to the exact distinct
    * intersection of the hash sets — the right answer.
    */
  def intersectEstimate(a: Array[Long], b: Array[Long]): Double = {
    val theta = math.min(thetaRaw(a), thetaRaw(b))
    var i = 0; var j = 0; var cnt = 0L
    while (i < a.length && j < b.length) {
      if (a(i) == b(j)) { if (a(i).toDouble < theta) cnt += 1; i += 1; j += 1 }
      else if (a(i) < b(j)) i += 1
      else j += 1
    }
    cnt.toDouble * HashSpace / theta
  }

  /** Sketch UNION: merge-distinct two sorted k-min sets, truncate to K
    * — exactly what the aggregate's [[KmvAggregate.merge]] computes, as
    * a SCALAR over stored sketch columns (the DataSketches set-ops
    * shape: artifacts combine downstream without touching the data).
    */
  def union(a: Array[Long], b: Array[Long]): Array[Long] = {
    val out = new Array[Long](math.min(a.length + b.length, K))
    var i = 0; var j = 0; var n = 0
    while (n < K && (i < a.length || j < b.length)) {
      val take =
        if (i >= a.length) { val v = b(j); j += 1; v }
        else if (j >= b.length) { val v = a(i); i += 1; v }
        else if (a(i) == b(j)) { val v = a(i); i += 1; j += 1; v }
        else if (a(i) < b(j)) { val v = a(i); i += 1; v }
        else { val v = b(j); j += 1; v }
      out(n) = take; n += 1
    }
    if (n == out.length) out else java.util.Arrays.copyOf(out, n)
  }

  /** Theta A-NOT-B estimate (DataSketches AnotB): θ = min(θ_a, θ_b);
    * count hashes of A strictly below θ that are NOT in B — every such
    * hash, if present in B's stream, would be retained in B's k-min set
    * (it is below θ ≤ θ_b), so set membership is decidable from the
    * sketches alone. In mutual exact mode this is the exact distinct
    * hash difference.
    */
  def diffEstimate(a: Array[Long], b: Array[Long]): Double = {
    val theta = math.min(thetaRaw(a), thetaRaw(b))
    val bs = b.toSet
    var i = 0; var cnt = 0L
    while (i < a.length) {
      if (a(i).toDouble < theta && !bs.contains(a(i))) cnt += 1
      i += 1
    }
    cnt.toDouble * HashSpace / theta
  }
}

/** Mutable sorted k-min insertion buffer — `mins(0 until n)` ascending,
  * distinct, primitive longs (the CmsSketch flat-primitive-state
  * convention): one 512-byte array per group, binary-search insert with
  * a bounded `System.arraycopy` shift, zero boxing/allocation per
  * update. Replaces the round-17 `java.util.TreeSet[java.lang.Long]`
  * state (boxed node per retained hash, allocation on the hot
  * aggregation path) with bit-identical retained sets: both keep
  * exactly the K smallest distinct hashes.
  */
final class KmvBuffer {
  import KmvSketch.K
  val mins = new Array[Long](K)
  var n = 0

  def add(h: Long): Unit = {
    // full buffer: anything at or above the current max can't enter
    if (n == K && h >= mins(n - 1)) return
    var lo = 0
    var hi = n
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (mins(mid) < h) lo = mid + 1 else hi = mid
    }
    if (lo < n && mins(lo) == h) return // already retained
    // shift right from the insertion point; a full buffer drops its max
    val tail = math.min(n, K - 1)
    System.arraycopy(mins, lo, mins, lo + 1, tail - lo)
    mins(lo) = h
    if (n < K) n += 1
  }
}

/** `graft_kmv(term)` → sorted `array<bigint>` of the ≤K smallest
  * distinct term hashes. Nulls are skipped; the empty group yields the
  * empty array. Partial aggregation exercises [[merge]] (union +
  * truncate); shuffles move the buffer as little-endian longs.
  */
case class KmvAggregate(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KmvBuffer] {

  override def createAggregationBuffer(): KmvBuffer = new KmvBuffer

  override def update(buffer: KmvBuffer, input: InternalRow): KmvBuffer = {
    val v = child.eval(input)
    if (v != null) buffer.add(KmvSketch.hash32(v.asInstanceOf[UTF8String].toString))
    buffer
  }

  override def merge(buffer: KmvBuffer, other: KmvBuffer): KmvBuffer = {
    var i = 0
    while (i < other.n) { buffer.add(other.mins(i)); i += 1 }
    buffer
  }

  override def eval(buffer: KmvBuffer): Any =
    new GenericArrayData(java.util.Arrays.copyOf(buffer.mins, buffer.n))

  override def serialize(buffer: KmvBuffer): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buffer.n * 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    var i = 0
    while (i < buffer.n) { bb.putLong(buffer.mins(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): KmvBuffer = {
    // serialize() wrote an ascending distinct ≤K sequence — copy it
    // straight into a fresh buffer, no re-insertion needed
    val out = new KmvBuffer
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    while (bb.hasRemaining) { out.mins(out.n) = bb.getLong(); out.n += 1 }
    out
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"graft_kmv requires a string column, got ${other.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "graft_kmv"

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvAggregate =
    copy(child = newChildren.head)
}

/** Scalar `graft_kmv_est(sketch)` → double distinct estimate. */
case class KmvEstimate(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"graft_kmv_est requires array<bigint>, got ${other.sql}")
  }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_kmv_est"

  override def nullSafeEval(sketch: Any): Any =
    KmvSketch.estimate(
      KmvSketch.longs(sketch.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]))

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.KmvSketch.estimate(graft.functions.KmvSketch.longs($c))")

  override protected def withNewChildInternal(newChild: Expression): KmvEstimate =
    copy(child = newChild)
}

/** Scalar `graft_kmv_union(a, b)` → merged (truncated) k-min array —
  * the set-ops composition over STORED sketches.
  */
case class KmvUnion(first: Expression, second: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def left: Expression = first
  override def right: Expression = second

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
      case (a, b) =>
        TypeCheckResult.TypeCheckFailure(
          s"graft_kmv_union requires (array<bigint>, array<bigint>), got (${a.sql}, ${b.sql})")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_kmv_union"

  override def nullSafeEval(a: Any, b: Any): Any =
    new GenericArrayData(KmvSketch.union(
      KmvSketch.longs(a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]),
      KmvSketch.longs(b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])))

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KmvUnion =
    copy(first = newLeft, second = newRight)
}

/** Scalar `graft_kmv_diff(a, b)` → double A-not-B estimate. */
case class KmvDiff(first: Expression, second: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def left: Expression = first
  override def right: Expression = second

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
      case (a, b) =>
        TypeCheckResult.TypeCheckFailure(
          s"graft_kmv_diff requires (array<bigint>, array<bigint>), got (${a.sql}, ${b.sql})")
    }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_kmv_diff"

  override def nullSafeEval(a: Any, b: Any): Any =
    KmvSketch.diffEstimate(
      KmvSketch.longs(a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]),
      KmvSketch.longs(b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]))

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.KmvSketch.diffEstimate(graft.functions.KmvSketch.longs($a), graft.functions.KmvSketch.longs($b))")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KmvDiff =
    copy(first = newLeft, second = newRight)
}

/** Scalar `graft_kmv_intersect(a, b)` → double intersection estimate. */
case class KmvIntersect(first: Expression, second: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def left: Expression = first
  override def right: Expression = second

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
      case (a, b) =>
        TypeCheckResult.TypeCheckFailure(
          s"graft_kmv_intersect requires (array<bigint>, array<bigint>), got (${a.sql}, ${b.sql})")
    }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_kmv_intersect"

  override def nullSafeEval(a: Any, b: Any): Any =
    KmvSketch.intersectEstimate(
      KmvSketch.longs(a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]),
      KmvSketch.longs(b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]))

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.KmvSketch.intersectEstimate(graft.functions.KmvSketch.longs($a), graft.functions.KmvSketch.longs($b))")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KmvIntersect =
    copy(first = newLeft, second = newRight)
}
