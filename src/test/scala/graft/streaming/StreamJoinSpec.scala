package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Stream-stream interval join: in-window clicks match, out-of-window and
  * keyless clicks don't.
  */
class StreamJoinSpec extends SparkSpec {

  test("attribution joins clicks to impressions within the window only") {
    val root = Files.createTempDirectory("ssj").toString
    val impDir = s"$root/imp"; val clkDir = s"$root/clk"
    val out = s"$root/out"; val ck = s"$root/ck"
    Files.createDirectories(Paths.get(impDir))
    Files.createDirectories(Paths.get(clkDir))

    // impression for ad 1 at 00:00 and ad 3 at 00:00
    Files.writeString(Paths.get(s"$impDir/i1.csv"),
      "1,2024-01-01 00:00:00\n3,2024-01-01 00:00:00")
    // clicks: ad 1 at 00:05 (in window), ad 1 at 00:50 (outside the
    // 20-minute window), ad 2 at 00:05 (no impression)
    Files.writeString(Paths.get(s"$clkDir/c1.csv"),
      "1,2024-01-01 00:05:00\n1,2024-01-01 00:50:00\n2,2024-01-01 00:05:00")

    val impSchema = StructType(Seq(
      StructField("ad_id", LongType), StructField("ts_raw", StringType)))
    val clkSchema = StructType(Seq(
      StructField("ad_id", LongType), StructField("ts_raw", StringType)))
    val imps = spark.readStream.schema(impSchema).csv(impDir)
      .select(col("ad_id"), col("ts_raw").cast("timestamp").as("ts"))
    val clks = spark.readStream.schema(clkSchema).csv(clkDir)
      .select(col("ad_id"), col("ts_raw").cast("timestamp").as("click_ts"))

    val q = StreamJoin.attribution(imps, clks, windowMinutes = 20)
      .writeStream.outputMode("append").format("parquet")
      .option("path", out).option("checkpointLocation", ck)
      .trigger(Trigger.AvailableNow()).start()
    StreamDrain.boundedAwait(q)

    val got = spark.read.parquet(out).collect()
      .map(r => (r.getLong(0), r.getTimestamp(2).toString)).toSet
    assert(got == Set((1L, "2024-01-01 00:05:00.0")),
      s"expected exactly the in-window ad-1 click, got $got")
  }

  test("stream-stream attribution equals the batch interval join on the fixture corpus") {
    // the stream≡batch gate for the join primitive (the aggregate twins
    // live in SearchStream/PricingStream/etc.): views are impressions,
    // purchases are clicks, keyed by user. Impressions arrive in batch 1
    // and clicks in batch 2 — matches must come out of the impression
    // STATE, not same-batch co-presence; no watermark can evict an
    // impression before any click arrives because the click-side
    // watermark only advances once click data is seen.
    val dir = sf()
    val root = Files.createTempDirectory("ssj-gate").toString
    val impDir = s"$root/imp"; val clkDir = s"$root/clk"
    val out = s"$root/out"; val ck = s"$root/ck"
    val ev = graft.queries.Events.events(spark, dir)
    val impB = ev.filter(col("event_type") === "view")
      .select(col("user_id").as("ad_id"), col("ts"))
    val clkB = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("ad_id"), col("ts").as("click_ts"))
    impB.repartition(1).write.mode("append").parquet(impDir)
    clkB.repartition(1).write.mode("append").parquet(clkDir)

    val imps = spark.readStream.schema(impB.schema).parquet(impDir)
    val clks = spark.readStream.schema(clkB.schema).parquet(clkDir)
    val q = StreamJoin.attribution(imps, clks, windowMinutes = 20)
      .writeStream.outputMode("append").format("parquet")
      .option("path", out).option("checkpointLocation", ck)
      .trigger(Trigger.AvailableNow()).start()
    StreamDrain.boundedAwait(q)

    def asSet(df: org.apache.spark.sql.DataFrame) =
      df.collect()
        .map(r => (r.getLong(0), String.valueOf(r.get(1)), String.valueOf(r.get(2))))
        .groupBy(identity).view.mapValues(_.length).toMap // multiset: dup pairs count
    val got = asSet(spark.read.parquet(out))
    val want = asSet(
      impB.join(
        clkB,
        impB("ad_id") === clkB("ad_id") &&
          clkB("click_ts") >= impB("ts") &&
          clkB("click_ts") <= impB("ts") + expr("INTERVAL 20 MINUTES"),
        "inner")
        .select(impB("ad_id"), impB("ts").as("imp_ts"), clkB("click_ts")))
    assert(want.nonEmpty, "fixture must produce attributed pairs")
    assert(got == want, {
      val keys = got.keySet ++ want.keySet
      val diff = keys.filter(k => got.get(k) != want.get(k)).take(5)
      s"stream/batch join results diverge on $diff"
    })
  }

  test("stream-static enrichment keeps every event; unknown keys get nulls, not drops") {
    import spark.implicits._
    val root = Files.createTempDirectory("sse").toString
    val in = s"$root/in"; val out = s"$root/out"; val ck = s"$root/ck"
    Files.createDirectories(Paths.get(in))
    Files.writeString(Paths.get(s"$in/e1.csv"), "1,10\n2,20\n99,30")
    val schema = StructType(Seq(
      StructField("user_id", LongType), StructField("value", LongType)))
    val stream = spark.readStream.schema(schema).csv(in)
    val dim = Seq((1L, "gold"), (2L, "basic")).toDF("user_id", "tier")
    val q = StreamJoin.enrich(stream, dim, "user_id")
      .writeStream.outputMode("append").format("parquet")
      .option("path", out).option("checkpointLocation", ck)
      .trigger(Trigger.AvailableNow()).start()
    StreamDrain.boundedAwait(q)
    val got = spark.read.parquet(out).collect()
      .map(r => (r.getLong(0), r.getLong(1), Option(r.getString(2)))).toSet
    assert(got == Set(
      (1L, 10L, Some("gold")),
      (2L, 20L, Some("basic")),
      (99L, 30L, None)), s"got $got")
  }
}
