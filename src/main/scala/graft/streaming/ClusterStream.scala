package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

import graft.ext.Ivf

/** Streaming IVF centroid-statistics maintenance — the fifth
  * stream≡batch twin (search [[SearchStream]], index [[IndexStream]],
  * dedup [[DedupStream]], relational [[PricingStream]], similarity:
  * here), covering the ingest side of the ANN serving stack. Arriving
  * vectors are quantized and assigned to the STORED coarse quantizer by
  * the same expressions the batch family uses ([[Ivf.assignExpr]] over
  * the q_kmeans fixed-point recipe), then `transformWithState` keyed by
  * bucket folds the per-cell sufficient statistics (n, Σ quantized
  * vector). That state is exactly the Lloyd update numerator: at any
  * point the processor's means ARE the next-step centroids
  * (`sum div n`, the q_kmeans floor-mean), so an incremental trainer
  * can refresh its quantizer from the running state without rescanning
  * the corpus — the streaming counterpart of q_sim_ivf_incremental's
  * batch delta-assignment contract. Integer sums are order-independent,
  * so ClusterStreamSpec asserts the stream-end (bucket, n, means) rows
  * equal a batch aggregation over the same corpus EXACTLY, fold order
  * and batch boundaries notwithstanding.
  *
  * Delivery contract: exactly-once from the checkpointed source (the
  * PricingStream IVM assumption): state is K×(dims+1) scalars — the
  * whole point is NOT holding per-vector rows, so re-delivery is
  * undetectable by construction.
  *
  * Scale shape: the pre-stage is a narrow map (centroids are broadcast
  * literals in the codegen'd assignExpr); the shuffle is keyed by
  * bucket (K cells), and per-key state is dims+1 longs — at 1000
  * executors the fold is a partial aggregate per micro-batch, identical
  * to the batch (bucket, pos) hash agg's map-side combine. Sums are
  * Long: quantized dims < 4e6, so overflow needs > 2e12 vectors per
  * cell — beyond any real cell occupancy (and the batch side's bigint
  * accumulator has the same bound).
  */
object ClusterStream {

  final case class VecArrival(vec_id: Long, bucket: Int, v: Seq[Long])

  /** One emitted cell snapshot; `means` is the floor-quantized running
    * centroid (the Lloyd update of the cell's members so far).
    */
  final case class CellRow(bucket: Int, upd: Long, n: Long, means: Seq[Long])

  final case class CellState(n: Long, sums: Seq[Long])

  class CellProcessor extends StatefulProcessor[Int, VecArrival, CellRow] {
    @transient private var st: ValueState[CellState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[CellState]("cell", Encoders.kryo[CellState], TTLConfig.NONE)

    override def handleInputRows(
        key: Int,
        rows: Iterator[VecArrival],
        timerValues: TimerValues): Iterator[CellRow] = {
      var s = if (st.exists()) st.get() else CellState(0L, Seq.empty)
      rows.foreach { r =>
        // fail loudly on a malformed embedding row — Seq.zip would
        // silently truncate and corrupt the cell means (the seedCents
        // width assertion's streaming counterpart, ADVICE r12)
        require(
          s.sums.isEmpty || s.sums.length == r.v.length,
          s"vector width ${r.v.length} != cell state width ${s.sums.length} (vec_id=${r.vec_id})")
        val sums =
          if (s.sums.isEmpty) r.v.toIndexedSeq
          else s.sums.toIndexedSeq.zip(r.v).map { case (a, b) => a + b }
        s = CellState(s.n + 1L, sums)
      }
      st.update(s)
      Iterator.single(CellRow(key, s.n, s.n, s.sums.map(_ / s.n)))
    }
  }

  /** The q_kmeans fixed-point recipe applied to a RAW-space centroid
    * set: round((c+2)·1e6) per dim, so the argmin below compares
    * like-with-like. Callers pass [[Ivf.train]] output (raw doubles);
    * quantizing HERE — not at each call site — keeps the stream
    * assignment in the same unit system as the quantized vectors
    * (ADVICE r12: raw centroids against fixed-point vectors made the
    * argmin a mixed-unit comparison, not the stored quantizer's cells).
    */
  def quantizeCentroids(centroids: Seq[Seq[Double]]): Seq[Seq[Double]] =
    centroids.map(_.map(c => math.round((c + 2.0) * 1000000.0).toDouble))

  /** Quantize + assign arriving vectors with the batch expressions:
    * fixed-point v = round((x+2)·1e6) (the q_kmeans recipe — positive,
    * so truncating division is floor) and the codegen'd literal-centroid
    * argmin over the SAME-recipe quantized centroids.
    */
  def arrivals(
      spark: SparkSession,
      vecs: DataFrame,
      centroids: Seq[Seq[Double]]): Dataset[VecArrival] = {
    import spark.implicits._
    val fpCents = quantizeCentroids(centroids)
    vecs
      .withColumn(
        "__v",
        transform(
          col("embedding").cast("array<double>"),
          x => round((x + lit(2.0)) * lit(1000000.0))))
      .select(
        col("vec_id"),
        Ivf.assignExpr(col("__v"), fpCents).as("bucket"),
        expr("transform(__v, x -> cast(x as bigint))").as("v"))
      .as[VecArrival]
  }

  /** Per-cell running centroid statistics over a vector stream. */
  def cells(
      spark: SparkSession,
      vecs: DataFrame,
      centroids: Seq[Seq[Double]]): Dataset[CellRow] = {
    import spark.implicits._
    arrivals(spark, vecs, centroids)
      .groupByKey(_.bucket)
      .transformWithState(new CellProcessor, TimeMode.None(), OutputMode.Append())
  }
}
