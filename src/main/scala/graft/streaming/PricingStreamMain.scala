package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.Sessions

/** Runnable demo of the incrementally maintained pricing view
  * ([[PricingStream]]): replays a testdata `lineitem` table as a file
  * stream in >=2 micro-batches and prints the final per-group board —
  * the state PricingStreamSpec proves bit-equal to q_agg_pricing.
  *
  * Usage: runMain graft.streaming.PricingStreamMain [sfDir]
  */
object PricingStreamMain {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption
      .orElse(sys.env.get("SPARK_GRAFT_SF_DIR"))
      .getOrElse("/root/testdata/sf0.001")
    val spark = Sessions.build("graft-pricing-stream")
    spark.conf.set(
      "spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val root = Files.createTempDirectory("pricing-stream-demo").toString
      val cols = Seq(
        "l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount", "l_tax")
      val thin = spark.read.parquet(s"$dir/lineitem.parquet").select(cols.map(col): _*)
      thin.filter(col("l_quantity") <= lit(25.0)).repartition(1)
        .write.mode("append").parquet(s"$root/in")
      thin.filter(col("l_quantity") > lit(25.0)).repartition(1)
        .write.mode("append").parquet(s"$root/in")
      val stream = spark.readStream.schema(thin.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(s"$root/in")
      val q = PricingStream.view(spark, stream)
        .writeStream.format("parquet").outputMode("append")
        .option("path", s"$root/out").option("checkpointLocation", s"$root/ck")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      val rows = spark.read.parquet(s"$root/out")
      rows
        .join(
          rows.groupBy("l_returnflag", "l_linestatus").agg(max("upd").as("upd")),
          Seq("l_returnflag", "l_linestatus", "upd"))
        .orderBy("l_returnflag", "l_linestatus")
        .collect().foreach { r =>
          println(
            s"[pricing-stream] ${r.getAs[String]("l_returnflag")}/${r.getAs[String]("l_linestatus")} " +
              s"n=${r.getAs[Long]("count_order")} sum_qty=${r.getAs[Double]("sum_qty")} " +
              s"sum_charge=${r.getAs[Double]("sum_charge")} (after ${r.getAs[Long]("upd")} rows)")
        }
    } finally spark.stop()
  }
}
