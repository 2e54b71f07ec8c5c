package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The ingest-time CC maintenance gate (streaming twin #15): edges
  * streamed in micro-batches — across a restart — must end at EXACTLY
  * the labeling the one-shot batch fixpoint computes over the full edge
  * set. Labels are integers (component minima), so the contract is
  * bit-equality for any slicing; the repair's monotonicity makes
  * replayed batches idempotent, which the re-drain face pins.
  */
class CcStreamSpec extends SparkSpec {

  test("streamed label repair across a restart equals the one-shot batch CC bit-for-bit") {
    import spark.implicits._
    val root = Files.createTempDirectory("cc-stream").toString
    // the real co-purchase graph (induced, fixture-scale) as the edge
    // source — sliced into arrival groups by order-key residue
    val li = graft.core.Tables(spark, sf(), "lineitem")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .filter(col("pk") % 4 === 3)
      .distinct()
    val pairs = li.as("x")
      .join(li.as("y"), col("x.ok") === col("y.ok") && col("x.pk") < col("y.pk"))
      .select(col("x.pk").as("src"), col("y.pk").as("dst"), (col("x.ok") % 3).as("slice"))
      .distinct()
      .localCheckpoint(true)
    // two slices, drain, restart, third slice, drain
    pairs.filter(col("slice") === 0).select("src", "dst").repartition(1)
      .write.mode("append").parquet(s"$root/in")
    pairs.filter(col("slice") === 1).select("src", "dst").repartition(1)
      .write.mode("append").parquet(s"$root/in")
    val inSchema = spark.read.parquet(s"$root/in").schema
    def drain(): Unit = {
      val stream = spark.readStream.schema(inSchema)
        .option("maxFilesPerTrigger", 1).parquet(s"$root/in")
      StreamDrain.boundedAwait(
        CcStream.run(stream, s"$root/edges", s"$root/labels", s"$root/ck"))
    }
    drain()
    pairs.filter(col("slice") === 2).select("src", "dst").repartition(1)
      .write.mode("append").parquet(s"$root/in")
    drain()

    def labelMap(df: org.apache.spark.sql.DataFrame) =
      df.select("pk", "label").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val streamed = labelMap(CcStream.currentLabels(spark, s"$root/labels"))
    // one-shot truth over the SAME universe (edge endpoints)
    val e0 = pairs.select("src", "dst")
    val sym = e0.unionByName(e0.select(col("dst").as("src"), col("src").as("dst")))
    val nodes = sym.select(col("src").as("pk")).distinct()
    val (batchLabels, _, _, _) = graft.queries.Graph.ccConverged(nodes, sym)
    val oneShot = labelMap(batchLabels)
    assert(streamed.nonEmpty && streamed == oneShot,
      "micro-batched label repair must equal the one-shot fixpoint bit-for-bit")

    // idempotency face: re-draining a finished stream changes nothing
    drain()
    assert(labelMap(CcStream.currentLabels(spark, s"$root/labels")) == oneShot)
  }

  test("a merge batch repairs with a small wave over the accumulated graph") {
    import spark.implicits._
    val root = Files.createTempDirectory("cc-stream-wave").toString
    // batch 0: two far components; batch 1: ONE bridging edge
    val b0 = Seq((0L, 1L), (1L, 2L), (10L, 11L), (11L, 12L)).toDF("src", "dst")
    val r0 = CcStream.repairBatch(spark, b0, s"$root/edges", s"$root/labels", 0L)
    val b1 = Seq((2L, 10L)).toDF("src", "dst")
    val r1 = CcStream.repairBatch(spark, b1, s"$root/edges", s"$root/labels", 1L)
    val got = CcStream.currentLabels(spark, s"$root/labels")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 10L -> 0L, 11L -> 0L, 12L -> 0L))
    assert(r0 > 0 && r1 > 0)
    // replaying the merge batch against the repaired state is a no-op
    // wave (monotone labels — the at-least-once safety property)
    val rReplay = CcStream.repairBatch(spark, b1, s"$root/edges", s"$root/labels", 1L)
    assert(rReplay == 1, s"replayed batch should converge in one empty-wave round, ran $rReplay")
  }
}
