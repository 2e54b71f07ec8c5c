package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.{Registry, SparkSpec}

/** Tombstone-aging gates for [[CdcStream.agedView]] — the production
  * variant the base CdcStream scaladoc designs: the seq low-watermark
  * (Spark's event-time watermark over `timestamp_seconds(seq)`, advanced
  * by heartbeat rows) ages dead keys out of the state store.
  *
  * Three halves of the contract, each asserted as computed fact:
  *   1. live view ≡ batch MERGE, and every dead key emits exactly one
  *      `aged = true` marker once the low-watermark passes its delete;
  *   2. the state really is CLEARED — a post-age re-insert restarts the
  *      key's `upd` counter at 1 (a surviving tombstone would continue
  *      the old count) — AND the documented max-(pSeq, upd) consumer
  *      resolution of the full change stream yields the revived LIVE
  *      row, not the aged marker (the trap a max-upd consumer falls
  *      into, since the fresh counter sorts below the marker's);
  *   3. the safety argument holds mechanically — a stale (below-
  *      watermark) update delivered after aging is dropped by the
  *      ENGINE (numRowsDroppedByWatermark > 0) and the view does not
  *      resurrect the key.
  */
class CdcAgeSpec extends SparkSpec {

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

  /** Keys whose highest-seq op is D — the tombstones the batch MERGE
    * drops and the aged view must eventually clear.
    */
  private def deadKeys(): Set[Long] =
    CdcStream.fixtureFeed(spark, sf())
      .withColumn("rn",
        row_number().over(Window.partitionBy(col("k")).orderBy(col("seq").desc)))
      .filter(col("rn") === 1 && col("op") === "D")
      .select("k").collect().map(_.getLong(0)).toSet

  private def expectedLive(): Map[Long, (String, Double)] =
    Registry.byName("q_merge_apply").run(spark, sf()).collect()
      .map(r => r.getAs[Long]("k") ->
        ((r.getAs[String]("status"), r.getAs[Double]("price")))).toMap

  /** Latest-wins resolution of the aged view's change stream — the
    * documented consumer contract: max-(pSeq, upd) per key, NOT
    * max-upd, so a post-age revival (fresh upd counter but strictly
    * higher pSeq) dominates the aged marker.
    */
  private def resolve(rows: org.apache.spark.sql.DataFrame) = {
    val winners = rows.groupBy("k").agg(max(struct(col("pSeq"), col("upd"))).as("w"))
      .select(col("k"), col("w.pSeq").as("pSeq"), col("w.upd").as("upd"))
    rows.join(winners, Seq("k", "pSeq", "upd"))
  }

  /** Drain whatever is staged under `in` through the aged view; returns
    * the started (terminated) query for progress inspection.
    */
  private def drainAged(in: String, out: String, ck: String) = {
    val schema = CdcStream.fixtureFeed(spark, sf()).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(in)
    val q = CdcStream.agedView(spark, stream, watermarkDelay = "5 seconds")
      .writeStream.format("parquet").outputMode("append")
      .option("path", out).option("checkpointLocation", ck)
      .trigger(Trigger.AvailableNow()).start()
    StreamDrain.boundedAwait(q)
    q
  }

  private def stage(root: String, df: org.apache.spark.sql.DataFrame): Unit =
    df.repartition(1).write.mode("append").parquet(s"$root/in")

  test("aged view ≡ batch MERGE; tombstones age at the low-watermark; state is cleared") {
    withRocksDb {
      val root = Files.createTempDirectory("cdc-age").toString
      val feed = CdcStream.fixtureFeed(spark, sf())
      stage(root, feed.filter(col("seq") === 0))
      stage(root, feed.filter(col("seq").isin(1, 2)))
      stage(root, feed.filter(col("seq").isin(3, 4)))
      // heartbeats push the low-watermark (delay 5 s) far past every
      // delete's seq; the second one gives the fired timers a batch to run
      stage(root, CdcStream.heartbeats(spark, Seq(100L)))
      stage(root, CdcStream.heartbeats(spark, Seq(101L)))
      drainAged(s"$root/in", s"$root/out", s"$root/ck")

      val rows = spark.read.parquet(s"$root/out")
      val finals = resolve(rows).collect()
      val live = finals.filter(_.getAs[Boolean]("present"))
        .map(r => r.getAs[Long]("k") ->
          ((r.getAs[String]("status"), r.getAs[Double]("price")))).toMap
      assert(live == expectedLive(), "aged view's live rows differ from the batch MERGE")

      val dead = deadKeys()
      assert(dead.nonEmpty, "fixture must produce tombstones for the gate to bite")
      val agedMarks = rows.filter(col("aged")).collect()
      assert(agedMarks.map(_.getAs[Long]("k")).toSet == dead,
        "aged markers must cover exactly the keys whose latest op is D")
      assert(agedMarks.length == dead.size, "exactly one aged marker per tombstone")

      // state-clearance evidence: a post-age re-insert starts a FRESH
      // upd counter (1). A surviving tombstone would continue its count.
      val k0 = dead.min
      stage(root, spark.range(1).select(
        lit(k0).as("k"), lit(102L).as("seq"), lit("I").as("op"),
        lit(999.5).as("val"), lit("Z").as("new_status")))
      drainAged(s"$root/in", s"$root/out", s"$root/ck")
      val allRows = spark.read.parquet(s"$root/out")
      val revived = allRows
        .filter(col("k") === k0 && col("present") && !col("aged") &&
          col("price") === 999.5)
        .collect()
      assert(revived.length == 1, s"post-age re-insert of $k0 must emit once")
      assert(revived.head.getAs[Long]("upd") == 1L,
        "re-insert after aging must start a fresh state (upd = 1) — tombstone not cleared?")
      // consumer-contract half: max-(pSeq, upd) resolution of the FULL
      // change stream (pre-age emissions + aged marker + revival) must
      // yield the LIVE revived row, not the aged tombstone — the exact
      // failure mode of a max-upd consumer, since the revival's upd (1)
      // is below the marker's.
      val resolved = resolve(allRows).filter(col("k") === k0).collect()
      assert(resolved.length == 1, s"resolution of $k0 must be unique")
      assert(resolved.head.getAs[Boolean]("present") &&
        resolved.head.getAs[Double]("price") == 999.5,
        "max-(pSeq, upd) resolution after revival must yield the live row, not the aged marker")
    }
  }

  test("aging composes with the lattice: reversed delivery WITHIN the delay still ≡ batch MERGE") {
    withRocksDb {
      val root = Files.createTempDirectory("cdc-age-rev").toString
      val feed = CdcStream.fixtureFeed(spark, sf())
      // newest changes first, base snapshot last — all seqs span 4 s,
      // inside the 5 s delay, so the lattice's order-independence is
      // preserved; only then do heartbeats advance the low-watermark
      stage(root, feed.filter(col("seq").isin(3, 4)))
      stage(root, feed.filter(col("seq").isin(1, 2)))
      stage(root, feed.filter(col("seq") === 0))
      stage(root, CdcStream.heartbeats(spark, Seq(100L)))
      stage(root, CdcStream.heartbeats(spark, Seq(101L)))
      drainAged(s"$root/in", s"$root/out", s"$root/ck")
      val rows = spark.read.parquet(s"$root/out")
      val finals = resolve(rows).collect()
      val live = finals.filter(_.getAs[Boolean]("present"))
        .map(r => r.getAs[Long]("k") ->
          ((r.getAs[String]("status"), r.getAs[Double]("price")))).toMap
      assert(live == expectedLive(), "reversed-within-delay replay diverged from the batch MERGE")
      assert(rows.filter(col("aged")).collect().map(_.getAs[Long]("k")).toSet == deadKeys(),
        "aging after a reversed replay must still clear exactly the dead keys")
    }
  }

  /** Drain whatever is staged under `in` through the TTL view — BOUNDED.
    *
    * The TTL view cannot be driven by ANY of the engine's own
    * completion signals: a `TimeMode.ProcessingTime` stateful operator
    * answers "might another batch do work?" with YES forever (wall-clock
    * always advances, so a not-yet-expired timer could always fire next
    * batch). Under `Trigger.AvailableNow` + `awaitTermination()` that
    * spins empty micro-batches indefinitely once the files are consumed
    * (round-14 forensics: 2,800-10,700 spins, 22-65 min, before the
    * runs were killed) — and `processAllAvailable()` hangs the same way,
    * because the forced timer batches keep the engine from ever latching
    * its no-new-data flag. The ONLY sound drain is external: run the
    * view as the continuous stream it is (`Trigger.ProcessingTime`),
    * poll the SINK until the caller's expected state appears
    * (time-bounded — a hard `fail` at the deadline instead of a wedged
    * suite), then `stop()`. The parquet sink is exactly-once via its
    * metadata log, so sink counts are exact conditions.
    */
  private def drainTtl(in: String, out: String, ck: String, ttlMs: Long)(
      done: org.apache.spark.sql.DataFrame => Boolean): Unit = {
    val schema = CdcStream.fixtureFeed(spark, sf()).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(in)
    val q = CdcStream.ttlAgedView(spark, stream, ttlMs)
      .writeStream.format("parquet").outputMode("append")
      .option("path", out).option("checkpointLocation", ck)
      .trigger(Trigger.ProcessingTime("200 milliseconds")).start()
    // the shared harness carries this drain now (round-15 verdict #6
    // factored the round-15 fix into StreamDrain for every twin spec)
    StreamDrain.untilSink(spark, q, out)(done)
  }

  /** Distinct keys carrying at least one non-heartbeat arrival in `df` —
    * the exact number of (non-aged) emissions one micro-batch over `df`
    * appends to the sink, hence the drain condition for data-only
    * stages.
    */
  private def emittingKeys(df: org.apache.spark.sql.DataFrame): Long =
    df.filter(col("op") =!= "H").select("k").distinct().count()

  test("TTL fallback: heartbeat-less feed ages tombstones at wall-clock expiry, state bounded") {
    withRocksDb {
      val root = Files.createTempDirectory("cdc-ttl").toString
      val feed = CdcStream.fixtureFeed(spark, sf())
      // NO heartbeat rows anywhere in this test — the point of the
      // fallback. Stage the whole feed, drain, then let the wall clock
      // pass the TTL and drain again (an empty-delta restart still runs
      // micro-batches, which is when expired processing-time timers fire).
      val dead = deadKeys()
      assert(dead.nonEmpty)
      val snap = feed.filter(col("seq") === 0)
      val log = feed.filter(col("seq") >= 1)
      val expectData = emittingKeys(snap) + emittingKeys(log)
      stage(root, snap)
      stage(root, log)
      drainTtl(s"$root/in", s"$root/out", s"$root/ck", ttlMs = 2000L) { out =>
        out.filter(!col("aged")).count() == expectData
      }
      Thread.sleep(2500L)
      // a fresh live-key update (not a heartbeat) gives the restarted
      // query a batch to process; its key is live, so it touches no
      // timer — the expired tombstone timers fire on the same restart
      val liveK = expectedLive().keys.min
      stage(root, spark.range(1).select(
        lit(liveK).as("k"), lit(50L).as("seq"), lit("U").as("op"),
        lit(123.25).as("val"), lit(null).cast("string").as("new_status")))
      drainTtl(s"$root/in", s"$root/out", s"$root/ck", ttlMs = 2000L) { out =>
        out.filter(col("aged")).count() == dead.size &&
          out.filter(col("k") === liveK && col("price") === 123.25).count() >= 1
      }

      val rows = spark.read.parquet(s"$root/out")
      val agedMarks = rows.filter(col("aged")).collect()
      assert(agedMarks.map(_.getAs[Long]("k")).toSet == dead,
        "TTL aging must clear exactly the keys whose latest op is D")
      assert(agedMarks.length == dead.size, "exactly one aged marker per tombstone")
      // live view unchanged by aging (modulo the extra live update)
      val live = resolve(rows).collect().filter(_.getAs[Boolean]("present"))
        .map(r => r.getAs[Long]("k") ->
          ((r.getAs[String]("status"), r.getAs[Double]("price")))).toMap
      val expect = expectedLive() + (liveK -> ((expectedLive()(liveK)._1, 123.25)))
      assert(live == expect, "TTL view's live rows differ from the batch MERGE")
    }
  }

  test("TTL fallback divergence: a stale post-age image RESURRECTS store state (the documented price), but max-(pSeq, upd) consumers still resolve the key dead") {
    withRocksDb {
      val root = Files.createTempDirectory("cdc-ttl-stale").toString
      val feed = CdcStream.fixtureFeed(spark, sf())
      val dead = deadKeys()
      val k0 = dead.min
      val snap = feed.filter(col("seq") === 0)
      val log = feed.filter(col("seq") >= 1)
      val expectData = emittingKeys(snap) + emittingKeys(log)
      stage(root, snap)
      stage(root, log)
      drainTtl(s"$root/in", s"$root/out", s"$root/ck", ttlMs = 2000L) { out =>
        out.filter(!col("aged")).count() == expectData
      }
      Thread.sleep(2500L)
      // a live-key nudge batch makes the expired timers fire and the
      // tombstones clear BEFORE the attack arrives (timers fire at batch
      // end, so the attack must land in a LATER micro-batch than the
      // expiry to meet cleared state)
      val liveK = expectedLive().keys.min
      stage(root, spark.range(1).select(
        lit(liveK).as("k"), lit(51L).as("seq"), lit("U").as("op"),
        lit(1.5).as("val"), lit(null).cast("string").as("new_status")))
      drainTtl(s"$root/in", s"$root/out", s"$root/ck", ttlMs = 2000L) { out =>
        out.filter(col("aged")).count() == dead.size
      }
      // the same attack the heartbeat path's gate proves is DROPPED by
      // the watermark: a below-delete-seq I for a dead key, delivered
      // after aging. Here there is no watermark — the fallback ABSORBS it.
      stage(root, spark.range(1).select(
        lit(k0).as("k"), lit(2L).as("seq"), lit("I").as("op"),
        lit(777.0).as("val"), lit("Z").as("new_status")))
      drainTtl(s"$root/in", s"$root/out", s"$root/ck", ttlMs = 2000L) { out =>
        out.filter(col("k") === k0 && col("price") === 777.0).count() >= 1
      }

      val rows = spark.read.parquet(s"$root/out")
      // the divergence, asserted as fact: the stale image produced a
      // fresh live emission (state resurrected, upd restarted at 1) —
      // the event-time twin's numRowsDroppedByWatermark gate proves the
      // same row never reaches state there
      val stale = rows
        .filter(col("k") === k0 && col("present") && !col("aged") && col("price") === 777.0)
        .collect()
      assert(stale.length == 1 && stale.head.getAs[Long]("upd") == 1L,
        "expected the stale image to be absorbed as fresh state — that IS the TTL tradeoff")
      // ...and the consumer-contract mitigation: (pSeq, upd) resolution
      // still yields the tombstone, because the stale row's pSeq (2) is
      // below the delete's
      val resolved = resolve(rows).filter(col("k") === k0).collect()
      assert(resolved.length == 1 && !resolved.head.getAs[Boolean]("present"),
        "max-(pSeq, upd) resolution must keep the key dead despite the store resurrection")
    }
  }

  test("post-age stale update is dropped by the engine and cannot resurrect the key") {
    withRocksDb {
      val root = Files.createTempDirectory("cdc-age-stale").toString
      val feed = CdcStream.fixtureFeed(spark, sf())
      stage(root, feed.filter(col("seq") === 0))
      stage(root, feed.filter(col("seq").isin(1, 2)))
      stage(root, feed.filter(col("seq").isin(3, 4)))
      stage(root, CdcStream.heartbeats(spark, Seq(100L)))
      stage(root, CdcStream.heartbeats(spark, Seq(101L)))
      // the attack the tombstone used to defend against, replayed AFTER
      // aging: a below-watermark I for a dead key. With the tombstone
      // gone, only the engine's late-row drop prevents resurrection.
      val k0 = deadKeys().min
      stage(root, spark.range(1).select(
        lit(k0).as("k"), lit(2L).as("seq"), lit("I").as("op"),
        lit(777.0).as("val"), lit("Z").as("new_status")))
      val q = drainAged(s"$root/in", s"$root/out", s"$root/ck")

      val dropped = q.recentProgress
        .flatMap(p => Option(p.stateOperators).toSeq.flatten)
        .map(_.numRowsDroppedByWatermark).sum
      assert(dropped >= 1L, "the stale row must be dropped by the watermark, not absorbed")

      val rows = spark.read.parquet(s"$root/out")
      val finals = resolve(rows).collect()
      val live = finals.filter(_.getAs[Boolean]("present"))
        .map(r => r.getAs[Long]("k") ->
          ((r.getAs[String]("status"), r.getAs[Double]("price")))).toMap
      assert(live == expectedLive(),
        "stale post-age update resurrected a deleted key — aging safety violated")
      assert(!live.contains(k0), "the attacked key must stay deleted")
    }
  }
}
