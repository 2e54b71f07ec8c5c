package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.{Registry, SparkSpec}

/** The streaming CDC-apply gate: the live upsert view's final table must
  * equal the batch MERGE (q_merge_apply) — delivered time-ordered,
  * delivered fully REVERSED, and with a re-delivered batch. The
  * per-column max-seq lattice makes all three runs identical; this is
  * the complement of the watermark twins' late-data drop contract.
  */
class CdcStreamSpec extends SparkSpec {

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

  /** Drain the staged feed files and return the view's final live rows
    * as (k -> (status, price)), plus the tombstone count.
    */
  private def drain(in: String, root: String): (Map[Long, (String, Double)], Long) = {
    val out = s"$root/out"; val ck = s"$root/ck"
    val schema = CdcStream.fixtureFeed(spark, sf()).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(in)
    val q = CdcStream.view(spark, stream)
      .writeStream.format("parquet").outputMode("append")
      .option("path", out).option("checkpointLocation", ck)
      .trigger(Trigger.AvailableNow()).start()
    StreamDrain.boundedAwait(q)
    val rows = spark.read.parquet(out)
    val finals = rows
      .join(rows.groupBy("k").agg(max("upd").as("upd")), Seq("k", "upd"))
      .collect()
    val live = finals.filter(_.getAs[Boolean]("present"))
      .map(r => r.getAs[Long]("k") ->
        ((r.getAs[String]("status"), r.getAs[Double]("price")))).toMap
    (live, finals.count(!_.getAs[Boolean]("present")).toLong)
  }

  private def expected(): Map[Long, (String, Double)] =
    Registry.byName("q_merge_apply").run(spark, sf()).collect()
      .map(r => r.getAs[Long]("k") ->
        ((r.getAs[String]("status"), r.getAs[Double]("price")))).toMap

  test("upsert view ≡ batch MERGE: time-ordered delivery, multi-batch") {
    withRocksDb {
      val root = Files.createTempDirectory("cdc-stream").toString
      val feed = CdcStream.fixtureFeed(spark, sf())
      feed.filter(col("seq") === 0).repartition(1).write.mode("append").parquet(s"$root/in")
      feed.filter(col("seq").isin(1, 2)).repartition(1).write.mode("append").parquet(s"$root/in")
      feed.filter(col("seq").isin(3, 4)).repartition(1).write.mode("append").parquet(s"$root/in")
      val (live, tombs) = drain(s"$root/in", root)
      assert(live == expected(), "stream view differs from batch MERGE (ordered replay)")
      assert(tombs > 0, "deletes must leave visible tombstones")
    }
  }

  test("upsert view ≡ batch MERGE under fully REVERSED delivery + a re-delivered batch") {
    withRocksDb {
      val root = Files.createTempDirectory("cdc-stream-rev").toString
      val feed = CdcStream.fixtureFeed(spark, sf())
      // newest changes land first, the base snapshot last — the worst
      // case for any arrival-order-dependent fold
      feed.filter(col("seq").isin(3, 4)).repartition(1).write.mode("append").parquet(s"$root/in")
      feed.filter(col("seq").isin(1, 2)).repartition(1).write.mode("append").parquet(s"$root/in")
      feed.filter(col("seq") === 0).repartition(1).write.mode("append").parquet(s"$root/in")
      // at-least-once: one batch delivered twice
      feed.filter(col("seq").isin(3, 4)).repartition(1).write.mode("append").parquet(s"$root/in")
      val (live, _) = drain(s"$root/in", root)
      assert(live == expected(), "reversed/re-delivered replay diverged from the batch MERGE")
    }
  }
}
