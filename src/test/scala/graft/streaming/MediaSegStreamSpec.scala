package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{BinaryType, LongType, StructField, StructType}

import graft.{Registry, SparkSpec}
import graft.ext.MediaSegQueries

/** The ingest segmenter gate: media payloads streamed in micro-batches
  * (across a restart) must segment into EXACTLY the scene set the batch
  * `q_scene_cuts` chain produces — the twin walks hashes imperatively
  * per row while the batch query uses a lag window over an exploded
  * frame table, so the equality cross-checks two independent
  * implementations over the shared decode+hash kernel. Malformed
  * arrivals must be skipped without rows or failure.
  */
class MediaSegStreamSpec extends SparkSpec {

  private val mediaSchema = StructType(Seq(
    StructField("vid", LongType), StructField("payload", BinaryType)))

  test("streamed scene segmentation across a restart equals the batch chain exactly") {
    val root = Files.createTempDirectory("mediaseg-stream").toString
    val media = MediaSegQueries.videoPayloads(spark, sf())
    media.filter(col("vid") % 2 === 0).repartition(1)
      .write.mode("append").parquet(s"$root/in")

    def drain(): Unit = {
      val stream = spark.readStream.schema(mediaSchema)
        .option("maxFilesPerTrigger", 1).parquet(s"$root/in")
      val q = MediaSegStream.sceneView(stream)
        .writeStream.format("parquet").outputMode("append")
        .option("path", s"$root/out").option("checkpointLocation", s"$root/ck")
        .trigger(Trigger.AvailableNow()).start()
      StreamDrain.boundedAwait(q)
    }
    drain()
    // restart with the remaining videos — the checkpoint must prevent
    // re-emission of the first half's scenes
    media.filter(col("vid") % 2 === 1).repartition(1)
      .write.mode("append").parquet(s"$root/in")
    drain()

    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("vid", "scene_id", "start_frame", "n_frames").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3))).toSet
    val streamed = rows(spark.read.parquet(s"$root/out"))
    val batch = rows(Registry.byName("q_scene_cuts").run(spark, sf()))
    assert(streamed.size == batch.size, "exactly one emission per scene")
    assert(streamed == batch, "streamed scenes must equal the batch chain exactly")
  }

  test("streamed audio activity segments equal the batch chain exactly") {
    // the audio leg of the same twin — batch uses the lag/running-sum
    // window over exploded window-peak rows, the twin walks peaks
    // imperatively per payload
    val root = Files.createTempDirectory("mediaseg-audio").toString
    MediaSegQueries.audioPayloads(spark, sf()).repartition(1)
      .write.mode("append").parquet(s"$root/in")
    val audioSchema = StructType(Seq(
      StructField("aid", LongType), StructField("payload", BinaryType)))
    val stream = spark.readStream.schema(audioSchema).parquet(s"$root/in")
    val q = MediaSegStream.activityView(stream)
      .writeStream.format("parquet").outputMode("append")
      .option("path", s"$root/out").option("checkpointLocation", s"$root/ck")
      .trigger(Trigger.AvailableNow()).start()
    StreamDrain.boundedAwait(q)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("aid", "seg_id", "is_active", "start_window", "n_windows", "peak")
        .collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getBoolean(2), r.getInt(3),
          r.getLong(4), r.getInt(5))).toSet
    val streamed = rows(spark.read.parquet(s"$root/out"))
    val batch = rows(Registry.byName("q_audio_activity").run(spark, sf()))
    assert(streamed == batch, "streamed activity segments must equal the batch chain")
  }

  test("malformed payloads are skipped without rows and without failing the batch") {
    import spark.implicits._
    val good = MediaSegQueries.videoPayload(2L)
    val rows = Seq(
      (2L, good),
      (99L, good.dropRight(7)), // truncated frame — parser rejects
      (98L, Array[Byte](1, 2, 3))) // foreign bytes
      .toDF("vid", "payload")
    val out = MediaSegStream.sceneView(rows).collect()
    assert(out.nonEmpty && out.forall(_.getLong(0) == 2L),
      s"malformed payloads leaked rows: ${out.map(_.getLong(0)).toSet}")
  }
}
