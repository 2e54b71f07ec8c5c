package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.{Registry, SparkSpec}
import graft.ext.QualityQueries

/** The streaming ingest-scorer gate: documents streamed in micro-batches
  * (across a restart) against the frozen bucket model must score
  * BIT-IDENTICALLY to the batch `q_dsir_weights` chain — same feature
  * array, same bucket hash, same fixed-point fold — so this is exact row
  * equality including the score doubles, not approximation.
  */
class DsirStreamSpec extends SparkSpec {

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("source", StringType),
    StructField("text", StringType)))

  test("streamed DSIR scores across a restart equal the batch chain bit-for-bit") {
    val root = Files.createTempDirectory("dsir-stream").toString
    val docs = graft.core.Tables(spark, sf(), "documents")
      .select(col("doc_id"), col("source"), col("text"))
    // stage the corpus as three disjoint files (micro-batches)
    docs.filter(col("doc_id") % 3 === 0).repartition(1)
      .write.mode("append").parquet(s"$root/in")
    docs.filter(col("doc_id") % 3 === 1).repartition(1)
      .write.mode("append").parquet(s"$root/in")

    val (model, sr, st) = QualityQueries.dsirModel(spark, sf())
    def drain(): Unit = {
      val stream = spark.readStream.schema(docSchema)
        .option("maxFilesPerTrigger", 1).parquet(s"$root/in")
      val q = DsirStream.scoredView(stream, model, sr, st)
        .writeStream.format("parquet").outputMode("append")
        .option("path", s"$root/out").option("checkpointLocation", s"$root/ck")
        .trigger(Trigger.AvailableNow()).start()
      StreamDrain.boundedAwait(q)
    }
    drain()
    // restart with the remaining third — the stored-artifact scorer
    // resumes from the checkpoint and must not re-emit earlier docs
    docs.filter(col("doc_id") % 3 === 2).repartition(1)
      .write.mode("append").parquet(s"$root/in")
    drain()

    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id", "n_feat", "dsir_score").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val streamed = rows(spark.read.parquet(s"$root/out"))
    val batch = rows(Registry.byName("q_dsir_weights").run(spark, sf()))
    assert(streamed.size == batch.size, "exactly one emission per document")
    assert(streamed == batch,
      "streamed scores must equal the batch chain bit-for-bit")
  }

  test("a featureless document is dropped, matching the batch explode (no NaN row)") {
    // The batch chain drops an empty/whitespace-only text at its explode;
    // the stream used to emit n_feat=0 with 0/0 = NaN, breaking the
    // bit-equality contract on that edge (round-15 advice).
    val root = Files.createTempDirectory("dsir-stream-empty").toString
    import spark.implicits._
    // note "   " (whitespace) is NOT featureless — the char-hash features
    // include spaces, and the batch explode emits it too; only the empty
    // string produces an empty feature array in both chains
    Seq((900001L, "srcx", ""), (900003L, "srcx", "real words here"))
      .toDF("doc_id", "source", "text")
      .repartition(1).write.mode("append").parquet(s"$root/in")
    val (model, sr, st) = QualityQueries.dsirModel(spark, sf())
    val stream = spark.readStream.schema(docSchema)
      .option("maxFilesPerTrigger", 1).parquet(s"$root/in")
    val q = DsirStream.scoredView(stream, model, sr, st)
      .writeStream.format("parquet").outputMode("append")
      .option("path", s"$root/out").option("checkpointLocation", s"$root/ck")
      .trigger(Trigger.AvailableNow()).start()
    StreamDrain.boundedAwait(q)
    val out = spark.read.parquet(s"$root/out").collect()
    assert(out.map(_.getLong(0)).toSet == Set(900003L),
      s"featureless docs must produce NO row: ${out.mkString(",")}")
    assert(!out.exists(r => r.getDouble(2).isNaN), "NaN score leaked")
  }
}
