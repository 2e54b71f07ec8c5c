package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.{Registry, SparkSpec}
import graft.ext.QualityQueries

/** The LangID ingest-scorer gate (streaming twin #16): documents
  * streamed in micro-batches across a restart, tagged against the
  * frozen char-trigram model, must score BIT-IDENTICALLY to the batch
  * `q_langid` chain — same plant, same trigram/bucket builders, same
  * fixed-point fold — so this is exact row equality including the
  * lr_score doubles AND the lang_pred strings, not approximation.
  */
class LangIdStreamSpec extends SparkSpec {

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("source", StringType),
    StructField("text", StringType)))

  test("streamed LangID tags across a restart equal the batch chain bit-for-bit") {
    val root = Files.createTempDirectory("langid-stream").toString
    val docs = graft.core.Tables(spark, sf(), "documents")
      .select(col("doc_id"), col("source"), col("text"))
    docs.filter(col("doc_id") % 3 === 0).repartition(1)
      .write.mode("append").parquet(s"$root/in")
    docs.filter(col("doc_id") % 3 === 1).repartition(1)
      .write.mode("append").parquet(s"$root/in")

    val (model, s0, s1) = QualityQueries.langModel(spark, sf())
    assert(model.nonEmpty && s0 > 0 && s1 > 0, "trained model must cover both classes")
    def drain(): Unit = {
      val stream = spark.readStream.schema(docSchema)
        .option("maxFilesPerTrigger", 1).parquet(s"$root/in")
      val q = LangIdStream.scoredView(stream, model, s0, s1)
        .writeStream.format("parquet").outputMode("append")
        .option("path", s"$root/out").option("checkpointLocation", s"$root/ck")
        .trigger(Trigger.AvailableNow()).start()
      StreamDrain.boundedAwait(q)
    }
    drain()
    // restart with the remaining third — the frozen-model scorer resumes
    // from the checkpoint and must not re-emit earlier docs
    docs.filter(col("doc_id") % 3 === 2).repartition(1)
      .write.mode("append").parquet(s"$root/in")
    drain()

    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id", "lang_true", "lang_pred", "n_feat", "lr_score").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3), r.getDouble(4)))
        .toSet
    val streamed = rows(spark.read.parquet(s"$root/out"))
    val batch = rows(Registry.byName("q_langid").run(spark, sf()))
    assert(streamed.size == batch.size, "exactly one emission per document")
    assert(streamed == batch,
      "streamed LangID rows must equal the batch chain bit-for-bit")
    // and the tags are the PLANTED truth — the ingest path separates too
    val acc = streamed.count(r => r._2 == r._3).toDouble / streamed.size
    assert(acc >= 0.95, s"ingest-path accuracy $acc below floor")
  }
}
