package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ext.{Ivf, Pq}

/** The streaming IVF×PQ serving-layout ingest gate: the stream-built code
  * table must equal the batch [[Pq.encodeCells]] layout SET-exactly
  * (multi-batch + restart), replays must add nothing, and queries served
  * from the stream-built table must answer identically to the batch-built
  * one — the add+search lifecycle, closed end to end.
  */
class PqStreamSpec extends SparkSpec {

  test("stream-built serving layout ≡ batch encodeCells; replay adds nothing; serving agrees") {
    val root = Files.createTempDirectory("pq-stream").toString
    val in = s"$root/in"; val out = s"$root/out"; val ck = s"$root/ck"
    val emb = spark.read.parquet(s"${sf()}/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    // stored quantizer + codebooks: trained ONCE on the base corpus,
    // shared verbatim by the stream ingest and the batch layout
    val coarse = Ivf.train(spark, emb, k = 16)
    val books = Pq.train(spark, emb, m = 8, k = 16, iters = 2)

    emb.filter(col("vec_id") % 3 === 0).repartition(1).write.mode("append").parquet(in)
    emb.filter(col("vec_id") % 3 === 1).repartition(1).write.mode("append").parquet(in)
    def runPass(): Unit =
      StreamDrain.boundedAwait(PqStream.ingest(spark, in, emb.schema, books, coarse, out, ck))
    runPass()
    // restart mid-corpus: the checkpointed source must pick up ONLY the
    // late third
    emb.filter(col("vec_id") % 3 === 2).repartition(1).write.mode("append").parquet(in)
    runPass()

    def servingRows(dir: String) = spark.read.parquet(dir)
      .select(col("vec_id"), col("bucket").cast("int"), col("m"), col("code"))
    val streamed = servingRows(out)
    val batch = Pq.encodeCells(emb, books, coarse)

    val key = Seq("vec_id", "bucket", "m", "code")
    assert(streamed.count() == batch.count(), "row counts differ")
    assert(
      streamed.join(batch, key, "left_anti").isEmpty &&
        batch.join(streamed, key, "left_anti").isEmpty,
      "stream-built layout differs from the batch layout")

    // replay: a new AvailableNow pass with no new files must be a no-op
    val before = streamed.count()
    runPass()
    assert(servingRows(out).count() == before, "an empty replay appended rows")

    // the search half served FROM the stream-built table must answer
    // exactly as from the batch-built one (same stored constants)
    val queries = emb.filter(col("vec_id") < 5)
    def serve(enc: org.apache.spark.sql.DataFrame) =
      Pq.adcRerankTopKIvf(queries, enc, books, coarse, emb, k = 5, shortlist = 32, nprobe = 4)
        .collect()
        .map(r => (r.getAs[Long]("q_id"), r.getAs[Int]("rank"), r.getAs[Long]("vec_id"),
          r.getAs[Double]("d2")))
        .toSet
    assert(serve(streamed) == serve(batch), "serving from the streamed layout diverged")
  }
}
