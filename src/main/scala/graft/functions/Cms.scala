package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Count-Min sketch over a string stream — the mergeable COUNTING sketch
  * (Cormode & Muthukrishnan 2005) that answers "how often does term t
  * occur?" in fixed space, the 100 TB heavy-hitter primitive: a full
  * `GROUP BY term` materializes the vocabulary (billions of keys on a
  * web corpus), while the sketch is d·w counters per aggregation group,
  * merged associatively across partitions exactly like any partial
  * aggregate. Estimates overcount only (one-sided error): every counter
  * a term hashes to has seen at least all of that term's occurrences.
  *
  * This sketch is deliberately DETERMINISTIC and RELATIONAL-EMULABLE:
  * row j's hash is the repo's cross-engine char-polynomial fold seeded
  * `7 + 13·j` — with a PRIME intermediate modulus (1048573, where the
  * DSIR recipe uses 2^20: `% width` then takes low bits, and on short
  * near-identical tokens the power-of-two lattice clumped buckets to
  * ~5% collision-free per row vs the ~31% a uniform hash gives; the
  * prime restores uniformity, CmsSpec measures it) — then `% width`. Because the hash is expressible in
  * both engines' SQL, the DuckDB oracle can reproduce EXACT estimates
  * relationally — `est_j(t) = Σ occurrences of terms colliding with t in
  * row j`, `est = min_j` — so the correctness gate is a full value
  * differential on the sketch OUTPUT, not a probabilistic invariant.
  * [[CmsSketch.estimate]] serves point queries against the materialized
  * counter array (SURVEY §2.9; the `TypedImperativeAggregate` tier
  * SURVEY §4.3 anticipated for sketches).
  */
object CmsSketch {
  /** Hash rows (depth) — error probability δ = e^−d. */
  val Depth = 4
  /** Counters per row (width) — overcount bound ε = e/w of stream mass. */
  val Width = 1024

  /** Row-j bucket of a term: a char-poly fold over CODE POINTS
    * (matching SQL `ascii(substring(t, i, 1))` both engines), seed
    * `7 + 13·j` and — load-bearing — a PER-ROW MULTIPLIER `31 + 10·j`:
    * an additive seed alone only SHIFTS a polynomial hash, so two
    * same-length terms that collide in one row collide in (almost)
    * every row and the min over rows buys nothing; distinct
    * multipliers make the rows genuinely different polynomials
    * (CmsSpec measures the recovered independence).
    */
  def bucket(term: String, j: Int): Int = {
    var h = 7L + 13L * j
    var i = 0
    while (i < term.length) {
      val cp = term.codePointAt(i)
      h = (h * (31L + 10L * j) + cp) % 1048573L
      i += Character.charCount(cp)
    }
    (h % Width).toInt
  }

  /** Point estimate from a materialized sketch array (d·w longs, row-major). */
  def estimate(sketch: Array[Long], term: String): Long = {
    var best = Long.MaxValue
    var j = 0
    while (j < Depth) {
      val c = sketch(j * Width + bucket(term, j))
      if (c < best) best = c
      j += 1
    }
    best
  }
}

/** `graft_cms(term)` → `array<bigint>` of d·w counters (row-major): the
  * Count-Min aggregate. Nulls are skipped (SQL aggregate convention);
  * the empty group yields the all-zero sketch. Partial aggregation
  * exercises [[merge]] (element-wise add — CMS is a commutative monoid),
  * and shuffles move the buffer through [[serialize]]/[[deserialize]]
  * (little-endian longs).
  */
case class CmsAggregate(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  import CmsSketch.{Depth, Width}

  override def createAggregationBuffer(): Array[Long] = new Array[Long](Depth * Width)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val t = v.asInstanceOf[UTF8String].toString
      var j = 0
      while (j < Depth) {
        buffer(j * Width + CmsSketch.bucket(t, j)) += 1
        j += 1
      }
    }
    buffer
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buffer.length) { buffer(i) += other(i); i += 1 }
    buffer
  }

  override def eval(buffer: Array[Long]): Any = new GenericArrayData(buffer)

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buffer.length * 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.asLongBuffer().put(buffer)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bytes.length / 8)
    java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .asLongBuffer().get(out)
    out
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"graft_cms requires a string column, got ${other.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "graft_cms"

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CmsAggregate =
    copy(child = newChildren.head)
}

/** Scalar companion `graft_cms_query(sketch, term)` → bigint: the point
  * estimate `min_j sketch[j·w + h_j(term)]` against a materialized
  * sketch array. Null sketch or term → null.
  */
case class CmsQuery(first: Expression, second: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def left: Expression = first
  override def right: Expression = second

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType) match {
      case (ArrayType(LongType, _), StringType) => TypeCheckResult.TypeCheckSuccess
      case (a, b) =>
        TypeCheckResult.TypeCheckFailure(
          s"graft_cms_query requires (array<bigint>, string), got (${a.sql}, ${b.sql})")
    }

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_cms_query"

  override def nullSafeEval(sketch: Any, term: Any): Any = {
    val arr = sketch.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toLongArray()
    CmsSketch.estimate(arr, term.asInstanceOf[UTF8String].toString)
  }

  /** Static bridge for codegen (ArrayData → long). */
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (sketch, term) =>
      s"${ev.value} = graft.functions.CmsSketch.estimate($sketch.toLongArray(), $term.toString());")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsQuery =
    copy(first = newLeft, second = newRight)
}
