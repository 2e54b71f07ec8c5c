package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec

/** Stream≡batch gate for the Count-Min ingest twin (#12): the per-source
  * sketch state at stream end — fixture replayed in micro-batches across
  * a RESTART — must bit-equal the batch `graft_cms` aggregate per
  * source. The monoid algebra CmsSpec proves (element-wise merge,
  * order-independent) is exactly what makes this equality possible; this
  * spec is the proof it survives checkpointed state, RocksDB, and the
  * restart boundary.
  */
class SketchStreamSpec extends SparkSpec {

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

  test("stream-end per-source sketches equal the batch graft_cms bit-for-bit, across a restart") {
    withRocksDb {
      val root = Files.createTempDirectory("sketch-stream").toString
      val in = s"$root/in"; val out = s"$root/out"; val ck = s"$root/ck"
      val docs = graft.core.Tables(spark, sf(), "documents")
        .select(col("doc_id"), col("source"), col("text"))
      docs.filter(col("doc_id") % 3 === 0).repartition(1).write.mode("append").parquet(in)
      docs.filter(col("doc_id") % 3 === 1).repartition(1).write.mode("append").parquet(in)
      def runPass(): Unit = {
        val stream = spark.readStream.schema(docs.schema)
          .option("maxFilesPerTrigger", 1).parquet(in)
        val q = SketchStream.view(spark, stream)
          .toDF()
          .writeStream.format("parquet").outputMode("append")
          .option("path", out).option("checkpointLocation", ck)
          .trigger(Trigger.AvailableNow()).start()
        StreamDrain.boundedAwait(q)
      }
      runPass()
      docs.filter(col("doc_id") % 3 === 2).repartition(1).write.mode("append").parquet(in)
      runPass()

      // last emission per source = the stream-end sketch
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("source")).orderBy(col("upd").desc)
      val streamed = spark.read.parquet(out)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select("source", "sketch").collect()
        .map(r => r.getString(0) -> r.getSeq[Long](1).toSeq).toMap

      val batch = docs
        .select(col("source"),
          explode(filter(split(col("text"), " "), t => t =!= "")).as("term"))
        .groupBy(col("source")).agg(expr("graft_cms(term)").as("sk"))
        .collect().map(r => r.getString(0) -> r.getSeq[Long](1).toSeq).toMap

      assert(streamed.keySet == batch.keySet, "source key sets diverged")
      streamed.foreach { case (src, sk) =>
        assert(sk == batch(src), s"sketch for $src diverged from the batch aggregate")
      }
    }
  }
}
