package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.{Registry, SparkSpec}

/** The incremental-materialized-view gate: PricingStream's stream-end
  * state must equal the batch q_agg_pricing output field-for-field with
  * BIT-EQUAL doubles — possible only because the dsum fixed-point
  * design makes the aggregate order-independent; this spec is the proof
  * that one determinism decision buys the streaming view too.
  */
class PricingStreamSpec extends SparkSpec {

  private def withRocksDb[A](body: => A): A = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(
      key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("stream-end view equals q_agg_pricing bit-for-bit: fixture, multi-batch, restart") {
    withRocksDb {
      val dir = sf()
      val root = Files.createTempDirectory("pricing-stream").toString
      val in = s"$root/in"; val out = s"$root/out"; val ck = s"$root/ck"
      val li = spark.read.parquet(s"$dir/lineitem.parquet")
      val cols = Seq(
        "l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount", "l_tax")
      val thin = li.select(cols.map(col): _*)
      // two files in run 1, a third after a restart — the view must fold
      // across both boundaries; the split key is arbitrary row content
      thin.filter(col("l_quantity") <= lit(15.0)).repartition(1)
        .write.mode("append").parquet(in)
      thin.filter(col("l_quantity") > lit(15.0) && col("l_quantity") <= lit(35.0)).repartition(1)
        .write.mode("append").parquet(in)
      def runPass(): Unit = {
        val stream = spark.readStream.schema(thin.schema)
          .option("maxFilesPerTrigger", 1)
          .parquet(in)
        val q = PricingStream.view(spark, stream)
          .writeStream.format("parquet").outputMode("append")
          .option("path", out).option("checkpointLocation", ck)
          .trigger(Trigger.AvailableNow()).start()
        StreamDrain.boundedAwait(q)
      }
      runPass()
      thin.filter(col("l_quantity") > lit(35.0)).repartition(1)
        .write.mode("append").parquet(in)
      runPass()

      val rows = spark.read.parquet(out)
      val finals = rows
        .join(
          rows.groupBy("l_returnflag", "l_linestatus").agg(max("upd").as("upd")),
          Seq("l_returnflag", "l_linestatus", "upd"))
        .collect()
        .map { r =>
          (r.getAs[String]("l_returnflag"), r.getAs[String]("l_linestatus")) -> (
            r.getAs[Double]("sum_qty"), r.getAs[Double]("sum_base"),
            r.getAs[Double]("sum_disc"), r.getAs[Double]("sum_charge"),
            r.getAs[Double]("avg_qty"), r.getAs[Double]("avg_price"),
            r.getAs[Double]("min_qty"), r.getAs[Double]("max_qty"),
            r.getAs[Long]("count_order"))
        }.toMap
      val want = Registry.byName("q_agg_pricing").run(spark, dir).collect()
        .map { r =>
          (r.getAs[String]("l_returnflag"), r.getAs[String]("l_linestatus")) -> (
            r.getAs[Double]("sum_qty"), r.getAs[Double]("sum_base"),
            r.getAs[Double]("sum_disc"), r.getAs[Double]("sum_charge"),
            r.getAs[Double]("avg_qty"), r.getAs[Double]("avg_price"),
            r.getAs[Double]("min_qty"), r.getAs[Double]("max_qty"),
            r.getAs[Long]("count_order"))
        }.toMap
      assert(want.nonEmpty)
      assert(finals == want, {
        val keys = want.keySet ++ finals.keySet
        val diff = keys.filter(k => finals.get(k) != want.get(k))
        s"view diverges from batch on groups $diff:\n stream=${diff.map(finals.get)}\n batch=${diff.map(want.get)}"
      })
      // the view really was incremental: interim boards exist below the
      // final row counts
      val interim = rows.groupBy("l_returnflag", "l_linestatus")
        .agg(countDistinct("upd").as("gens"))
        .filter(col("gens") >= 2).count()
      assert(interim > 0, "expected at least one group to emit across multiple micro-batches")
    }
  }

  test("stragglers never diverge: the unwatermarked IVM folds arbitrarily late rows exactly") {
    // The late-data contract CONTRAST to SessionStreamSpec's divergence
    // gates (round-12 verdict #3): the windowed twins run under a
    // watermark, so watermark-late rows drop and the divergence from
    // batch is exactly those rows; THIS twin keeps no event-time state
    // at all (TimeMode.None — per-group sufficient statistics), so a
    // straggler delivered arbitrarily many batches late folds
    // identically to an on-time row and the divergence set is EMPTY by
    // construction. Replay: newest ship-dates first, then the oldest
    // slice as a final straggler batch — an ordering a watermarked view
    // would have dropped wholesale.
    withRocksDb {
      val dir = sf()
      val root = Files.createTempDirectory("pricing-straggler").toString
      val in = s"$root/in"; val out = s"$root/out"; val ck = s"$root/ck"
      val li = spark.read.parquet(s"$dir/lineitem.parquet")
      val cols = Seq(
        "l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount", "l_tax")
      // TIMESTAMP_NTZ doesn't feed percentile_disc — compare on epoch secs
      val cut = li
        .selectExpr(
          "percentile_disc(0.3) WITHIN GROUP " +
            "(ORDER BY cast(cast(l_shipdate AS TIMESTAMP) AS LONG)) AS c")
        .collect().head.getDouble(0).toLong
      val thin = li.select(
        (cols.map(col) :+
          col("l_shipdate").cast("timestamp").cast("long").as("__ship_s")): _*)
      def runPass(): Unit = {
        val stream = spark.readStream
          .schema(thin.select(cols.map(col): _*).schema)
          .option("maxFilesPerTrigger", 1)
          .parquet(in)
        val q = PricingStream.view(spark, stream)
          .writeStream.format("parquet").outputMode("append")
          .option("path", out).option("checkpointLocation", ck)
          .trigger(Trigger.AvailableNow()).start()
        StreamDrain.boundedAwait(q)
      }
      // newest 70% first...
      thin.filter(col("__ship_s") >= lit(cut)).select(cols.map(col): _*)
        .repartition(1).write.mode("append").parquet(in)
      runPass()
      // ...then the oldest 30% as the straggler batch
      thin.filter(col("__ship_s") < lit(cut)).select(cols.map(col): _*)
        .repartition(1).write.mode("append").parquet(in)
      runPass()

      val rows = spark.read.parquet(out)
      val finals = rows
        .join(
          rows.groupBy("l_returnflag", "l_linestatus").agg(max("upd").as("upd")),
          Seq("l_returnflag", "l_linestatus", "upd"))
        .collect()
        .map { r =>
          (r.getAs[String]("l_returnflag"), r.getAs[String]("l_linestatus")) -> (
            r.getAs[Double]("sum_qty"), r.getAs[Double]("sum_base"),
            r.getAs[Double]("sum_disc"), r.getAs[Double]("sum_charge"),
            r.getAs[Double]("avg_qty"), r.getAs[Double]("avg_price"),
            r.getAs[Double]("min_qty"), r.getAs[Double]("max_qty"),
            r.getAs[Long]("count_order"))
        }.toMap
      val want = Registry.byName("q_agg_pricing").run(spark, dir).collect()
        .map { r =>
          (r.getAs[String]("l_returnflag"), r.getAs[String]("l_linestatus")) -> (
            r.getAs[Double]("sum_qty"), r.getAs[Double]("sum_base"),
            r.getAs[Double]("sum_disc"), r.getAs[Double]("sum_charge"),
            r.getAs[Double]("avg_qty"), r.getAs[Double]("avg_price"),
            r.getAs[Double]("min_qty"), r.getAs[Double]("max_qty"),
            r.getAs[Long]("count_order"))
        }.toMap
      // the straggler batch really carried rows
      assert(thin.filter(col("__ship_s") < lit(cut)).count() > 0)
      // divergence set: EMPTY — bit-equal on every group and field
      assert(finals == want, {
        val keys = want.keySet ++ finals.keySet
        val diff = keys.filter(k => finals.get(k) != want.get(k))
        s"straggler replay diverged on groups $diff"
      })
    }
  }
}
