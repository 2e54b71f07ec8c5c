package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.{Registry, SparkSpec}
import graft.ext.SearchQueries

/** The frozen-index sparse retrieval gate (streaming twin #10):
  * documents streamed in micro-batches (across a restart) against the
  * frozen signature/champion index must score BIT-IDENTICALLY to the
  * batch `q_sparse_cosine` chain — the signature recipe, the candidate
  * generation, the sorted-dot kernel, and the IEEE cosine chain are the
  * same code over the same frozen statistics, so this is exact row
  * equality including the cosine doubles. The idempotent per-batch sink
  * (overwrite keyed on batch id) is also exercised: re-running a
  * completed stream must not duplicate rows.
  */
class SparseStreamSpec extends SparkSpec {

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType)))

  test("streamed serving across a restart equals q_sparse_cosine bit-for-bit") {
    val root = Files.createTempDirectory("sparse-stream").toString
    val dir = sf()
    val docs = graft.core.Tables(spark, dir, "documents").select(col("doc_id"), col("text"))
    val ix = SearchQueries.sparseIndexShared(spark, dir)

    docs.filter(col("doc_id") % 3 === 0).repartition(1)
      .write.mode("append").parquet(s"$root/in")
    docs.filter(col("doc_id") % 3 === 1).repartition(1)
      .write.mode("append").parquet(s"$root/in")
    def drain(): Unit = {
      val stream = spark.readStream.schema(docSchema)
        .option("maxFilesPerTrigger", 1).parquet(s"$root/in")
      StreamDrain.boundedAwait(SparseStream.run(stream, ix, s"$root/out", s"$root/ck"))
    }
    drain()
    // restart with the remaining third: the checkpoint must resume
    // without re-emitting (each earlier batch directory is final)
    docs.filter(col("doc_id") % 3 === 2).repartition(1)
      .write.mode("append").parquet(s"$root/in")
    drain()

    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("a_id", "b_id", "cos", "rnk").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    val streamed = rows(spark.read.parquet(s"$root/out"))
    val batch = rows(Registry.byName("q_sparse_cosine").run(spark, dir))
    assert(streamed.size == batch.size, "exactly one board per probe document")
    assert(streamed == batch,
      "streamed frozen-index serving must equal the batch chain bit-for-bit")

    // idempotency face: draining again with no new input leaves the
    // sink unchanged (no new batches, no duplicated directories)
    drain()
    assert(rows(spark.read.parquet(s"$root/out")) == batch)
  }

  test("a post-refresh document is scored under stale-index semantics") {
    import spark.implicits._
    val dir = sf()
    val ix = SearchQueries.sparseIndexShared(spark, dir)
    // one arriving doc whose vocabulary is entirely unseen: its whole
    // signature drops at the frozen-vocab join → no candidates, no rows
    val alien = SparseStream.scoreBatch(
      Seq((999999L, "zzqx zzqy zzqz")).toDF("doc_id", "text"), ix)
    assert(alien.count() == 0)
    // and an arriving doc made of frozen-vocab terms scores against the
    // frozen corpus even though IT is not in the index
    val probeText = graft.core.Tables(spark, dir, "documents")
      .orderBy("doc_id").select("text").limit(1).collect().head.getString(0)
    val known = SparseStream.scoreBatch(
      Seq((888888L, probeText)).toDF("doc_id", "text"), ix)
      .select("a_id", "b_id").collect()
    assert(known.nonEmpty && known.forall(_.getLong(0) == 888888L))
  }
}
