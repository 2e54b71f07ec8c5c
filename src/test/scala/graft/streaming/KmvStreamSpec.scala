package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec

/** Stream≡batch gate for the KMV ingest twin (#14): the per-source
  * k-min state at stream end — fixture replayed in micro-batches across
  * a RESTART — must bit-equal the batch `graft_kmv` aggregate per
  * source, which also carries the intersection guarantee: the streamed
  * artifacts fed to `graft_kmv_intersect` give the registered
  * q_kmv_overlap estimates exactly.
  */
class KmvStreamSpec extends SparkSpec {

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

  test("stream-end per-source k-min sets equal the batch graft_kmv bit-for-bit, across a restart") {
    withRocksDb {
      val root = Files.createTempDirectory("kmv-stream").toString
      val in = s"$root/in"; val out = s"$root/out"; val ck = s"$root/ck"
      val docs = graft.core.Tables(spark, sf(), "documents")
        .select(col("doc_id"), col("source"), col("text"))
      docs.filter(col("doc_id") % 3 === 0).repartition(1).write.mode("append").parquet(in)
      docs.filter(col("doc_id") % 3 === 1).repartition(1).write.mode("append").parquet(in)
      def runPass(): Unit = {
        val stream = spark.readStream.schema(docs.schema)
          .option("maxFilesPerTrigger", 1).parquet(in)
        val q = KmvStream.view(spark, stream)
          .toDF()
          .writeStream.format("parquet").outputMode("append")
          .option("path", out).option("checkpointLocation", ck)
          .trigger(Trigger.AvailableNow()).start()
        StreamDrain.boundedAwait(q)
      }
      runPass()
      docs.filter(col("doc_id") % 3 === 2).repartition(1).write.mode("append").parquet(in)
      runPass()

      // last emission per source = the stream-end k-min set
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("source")).orderBy(col("upd").desc)
      val streamed = spark.read.parquet(out)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select("source", "mins").collect()
        .map(r => r.getString(0) -> r.getSeq[Long](1).toSeq).toMap

      val batch = graft.ext.SketchQueries
        .kmvBigrams(docs)
        .groupBy(col("source")).agg(expr("graft_kmv(bg)").as("sk"))
        .collect().map(r => r.getString(0) -> r.getSeq[Long](1).toSeq).toMap

      assert(streamed.keySet == batch.keySet, "source key sets diverged")
      streamed.foreach { case (src, mins) =>
        assert(mins == batch(src), s"k-min set for $src diverged from the batch aggregate")
      }
      // the streamed artifacts intersect exactly like the registered
      // overlap gate's sketches: spot-check one pair end to end
      val srcs = streamed.keySet.toSeq.sorted.take(2)
      if (srcs.size == 2) {
        val est = graft.functions.KmvSketch.intersectEstimate(
          streamed(srcs(0)).toArray, streamed(srcs(1)).toArray)
        val batchEst = graft.functions.KmvSketch.intersectEstimate(
          batch(srcs(0)).toArray, batch(srcs(1)).toArray)
        assert(est == batchEst, "streamed-artifact intersection diverged from batch")
      }
    }
  }

  test("windowed view: per-(source,window) sketches equal batch, and their union folds to the whole-source sketch") {
    // the q_kmv_windowed contract at ingest: one sketch per (source,
    // window) key, maintained micro-batch by micro-batch in ANY slicing
    // — and because the k-min set is a union monoid, folding a source's
    // window sketches with KmvSketch.union reproduces its monolithic
    // whole-source sketch bit-for-bit (windowed state loses nothing).
    withRocksDb {
      val root = Files.createTempDirectory("kmv-stream-win").toString
      val in = s"$root/in"; val out = s"$root/out"; val ck = s"$root/ck"
      val docs = graft.core.Tables(spark, sf(), "documents")
        .select(col("doc_id"), col("source"), col("text"))
      // slice ACROSS windows (doc_id mod), so every micro-batch touches
      // several window keys — the adversarial slicing for window state
      docs.filter(col("doc_id") % 3 === 0).repartition(1).write.mode("append").parquet(in)
      docs.filter(col("doc_id") % 3 === 1).repartition(1).write.mode("append").parquet(in)
      docs.filter(col("doc_id") % 3 === 2).repartition(1).write.mode("append").parquet(in)
      val stream = spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1).parquet(in)
      val q = KmvStream.viewWindowed(spark, stream)
        .toDF()
        .writeStream.format("parquet").outputMode("append")
        .option("path", out).option("checkpointLocation", ck)
        .trigger(Trigger.AvailableNow()).start()
      StreamDrain.boundedAwait(q)

      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("source")).orderBy(col("upd").desc)
      val streamed = spark.read.parquet(out)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select("source", "mins").collect()
        .map(r => r.getString(0) -> r.getSeq[Long](1).toSeq).toMap

      val batchWin = graft.ext.SketchQueries
        .kmvBigramsWindowed(docs)
        .groupBy(col("source"), col("w")).agg(expr("graft_kmv(bg)").as("sk"))
        .collect()
        .map(r => s"${r.getString(0)}|${r.getLong(1)}" -> r.getSeq[Long](2).toSeq).toMap
      assert(streamed.keySet == batchWin.keySet, "(source,window) key sets diverged")
      streamed.foreach { case (k, mins) =>
        assert(mins == batchWin(k), s"windowed k-min set for $k diverged from batch")
      }

      // union-across-windows ≡ the monolithic per-source sketch
      val whole = graft.ext.SketchQueries
        .kmvBigrams(docs)
        .groupBy(col("source")).agg(expr("graft_kmv(bg)").as("sk"))
        .collect().map(r => r.getString(0) -> r.getSeq[Long](1).toSeq).toMap
      val folded = streamed.toSeq
        .groupBy(_._1.split('|')(0))
        .map { case (src, wins) =>
          src -> wins.map(_._2.toArray)
            .reduce(graft.functions.KmvSketch.union).toSeq
        }
      assert(folded.keySet == whole.keySet)
      folded.foreach { case (src, mins) =>
        assert(mins == whole(src),
          s"union of $src's window sketches diverged from the whole-source sketch")
      }
    }
  }
}
