package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ext.SimilarityQueries

/** The graph-ANN ingest gate (streaming twin #13): vectors streamed in
  * micro-batches (across a restart) must derive EXACTLY the insert
  * edges the one-shot batch NSW insertion derives — same walk, same
  * frozen base graph, same (src, dst, cos) rows including the cosine
  * doubles. The contract is structural (every join in the walk keys on
  * q_id), so any cross-delta interaction sneaking into the insert chain
  * breaks this gate before it breaks recall.
  */
class GraphInsertStreamSpec extends SparkSpec {

  test("streamed NSW insertion across a restart equals the batch insert bit-for-bit") {
    val root = Files.createTempDirectory("graph-insert").toString
    val dir = sf()
    val (base, delta, baseGraph) = SimilarityQueries.graphIncrementalParts(spark, dir)

    // arrivals in three slices across a restart: the walk must not care
    // which micro-batch carried a vector
    delta.filter(col("vec_id") % 3 === 0).repartition(1)
      .write.mode("append").parquet(s"$root/in")
    delta.filter(col("vec_id") % 3 === 1).repartition(1)
      .write.mode("append").parquet(s"$root/in")
    val inSchema = spark.read.parquet(s"$root/in").schema
    def drain(): Unit = {
      val stream = spark.readStream.schema(inSchema)
        .option("maxFilesPerTrigger", 1).parquet(s"$root/in")
      StreamDrain.boundedAwait(
        GraphInsertStream.run(stream, base, baseGraph, s"$root/out", s"$root/ck"))
    }
    drain()
    delta.filter(col("vec_id") % 3 === 2).repartition(1)
      .write.mode("append").parquet(s"$root/in")
    drain()

    def edges(df: org.apache.spark.sql.DataFrame) =
      df.select("src", "dst", "cos").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val streamed = edges(spark.read.parquet(s"$root/out"))
    val batch = edges(SimilarityQueries.nswInsertEdges(base, delta, baseGraph))
    val nDelta = delta.count()
    assert(batch.size == nDelta * 8, "every delta node links to exactly its walk top-8")
    assert(streamed == batch,
      "micro-batched insertion must equal the one-shot insert bit-for-bit")

    // idempotency face: re-draining a finished stream leaves the sink
    // unchanged (per-batch-id overwrite, no new batches)
    drain()
    assert(edges(spark.read.parquet(s"$root/out")) == batch)
  }

  test("insert edges land on base nodes only and stay inside the walk bound") {
    import spark.implicits._
    val dir = sf()
    val (base, _, baseGraph) = SimilarityQueries.graphIncrementalParts(spark, dir)
    // a single arriving vector: its 8 out-edges must all point at BASE
    // nodes (the frozen structure — a delta cannot link to itself or to
    // other arrivals it never saw)
    val one = base.sparkSession.createDataFrame(
      Seq((1000001L, (0 until 16).map(i => (i % 5).toFloat)))).toDF("vec_id", "embedding")
    val got = GraphInsertStream.insertBatch(one, base, baseGraph)
      .select("src", "dst").collect()
    val baseIds = base.select("vec_id").as[Long].collect().toSet
    assert(got.length == 8)
    assert(got.forall(r => r.getLong(0) == 1000001L && baseIds(r.getLong(1))))
  }
}
