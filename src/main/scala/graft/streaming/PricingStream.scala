package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming twin of the FLAGSHIP hash aggregate
  * ([[graft.queries.Relational]]'s q_agg_pricing, TPC-H Q1 flavor):
  * incremental materialized-view maintenance over arriving lineitem
  * rows with `transformWithState`. The fourth stream≡batch gate after
  * the BM25 leaderboard, the incremental index, and dedup-on-ingest —
  * this one covers the relational core, and its exactness rests on the
  * SAME design decision the batch query made for cross-engine
  * determinism: [[graft.core.Agg.dsum]] quantizes per row and sums
  * exact integers, so the fold is order-INDEPENDENT and a micro-batch
  * accumulation lands on bit-identical doubles to the batch
  * partial+final aggregate. A float-summing aggregate could never make
  * this claim — one determinism fix buys both the DuckDB oracle AND
  * the streaming view.
  *
  * The per-row quantization (round(x·1e4) under Spark's HALF_UP `round`)
  * runs as DataFrame expressions BEFORE the stateful fold — the
  * identical codegen the batch plan uses, so the processor handles only
  * exact integer/min/max/count algebra. State per group is nine scalars
  * (the sufficient statistics); emission recomputes the output columns
  * with the same final-division chain as dsum/davg. Delivery contract:
  * exactly-once from the checkpointed source — lineitem has no unique
  * row key ((l_orderkey, l_linenumber) is NOT unique in this corpus),
  * so re-delivery is undetectable by construction and the contract is
  * the standard IVM assumption. PricingStreamSpec replays the fixture
  * in multiple micro-batches across a restart and asserts the final
  * board equals q_agg_pricing field-for-field, doubles bit-equal.
  *
  * Scale shape: keyed by the same (returnflag, linestatus) the batch
  * groupBy shuffles on; arriving batches fold map-side like a partial
  * aggregate. Sums accumulate in BigInt (the streaming counterpart of
  * the batch DecimalType(38,0) accumulator — no overflow at any scale).
  */
object PricingStream {

  final case class LineArrival(
      l_returnflag: String,
      l_linestatus: String,
      qty: Double,
      qty_fp: Long,
      base_fp: Long,
      disc_fp: Long,
      charge_fp: Long)

  final case class PricingRow(
      l_returnflag: String,
      l_linestatus: String,
      upd: Long,
      sum_qty: Double,
      sum_base: Double,
      sum_disc: Double,
      sum_charge: Double,
      avg_qty: Double,
      avg_price: Double,
      min_qty: Double,
      max_qty: Double,
      count_order: Long)

  final case class GroupState(
      n: Long,
      qtyFp: BigInt,
      baseFp: BigInt,
      discFp: BigInt,
      chargeFp: BigInt,
      minQty: Double,
      maxQty: Double)

  class PricingProcessor extends StatefulProcessor[(String, String), LineArrival, PricingRow] {
    @transient private var st: ValueState[GroupState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[GroupState]("grp", Encoders.kryo[GroupState], TTLConfig.NONE)

    override def handleInputRows(
        key: (String, String),
        rows: Iterator[LineArrival],
        timerValues: TimerValues): Iterator[PricingRow] = {
      var s =
        if (st.exists()) st.get()
        else GroupState(0L, BigInt(0), BigInt(0), BigInt(0), BigInt(0), Double.MaxValue, Double.MinValue)
      rows.foreach { r =>
        s = GroupState(
          s.n + 1L,
          s.qtyFp + r.qty_fp,
          s.baseFp + r.base_fp,
          s.discFp + r.disc_fp,
          s.chargeFp + r.charge_fp,
          math.min(s.minQty, r.qty),
          math.max(s.maxQty, r.qty))
      }
      st.update(s)
      // the dsum/davg final chain verbatim: exact-integer → double, ONE
      // divide by 1e4 (and one by n for the averages)
      val sumQty = s.qtyFp.toDouble / 10000.0
      val sumBase = s.baseFp.toDouble / 10000.0
      Iterator.single(PricingRow(
        key._1, key._2, s.n,
        sumQty, sumBase,
        s.discFp.toDouble / 10000.0,
        s.chargeFp.toDouble / 10000.0,
        sumQty / s.n, sumBase / s.n,
        s.minQty, s.maxQty, s.n))
    }
  }

  /** Quantize arriving lineitem rows with the IDENTICAL batch-side
    * expressions (Agg.dsum's round(x·1e4), exact in double space) so the
    * stateful fold is pure integer algebra.
    */
  def arrivals(spark: SparkSession, lineitem: DataFrame): Dataset[LineArrival] = {
    import spark.implicits._
    def fp(c: org.apache.spark.sql.Column) =
      // same HALF_UP round + long cast as Agg.dsum's per-row step (the
      // decimal intermediate was dropped there too — see Agg docs)
      round(c * lit(10000.0)).cast("long")
    lineitem.select(
      col("l_returnflag"), col("l_linestatus"),
      col("l_quantity").as("qty"),
      fp(col("l_quantity")).as("qty_fp"),
      fp(col("l_extendedprice")).as("base_fp"),
      fp(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("disc_fp"),
      fp(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax")))
        .as("charge_fp"))
      .as[LineArrival]
  }

  /** Incrementally maintained q_agg_pricing view over a lineitem stream. */
  def view(spark: SparkSession, lineitem: DataFrame): Dataset[PricingRow] = {
    import spark.implicits._
    arrivals(spark, lineitem)
      .groupByKey(r => (r.l_returnflag, r.l_linestatus))
      .transformWithState(new PricingProcessor, TimeMode.None(), OutputMode.Append())
  }
}
