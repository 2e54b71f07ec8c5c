package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.ext.Ivf

/** The streaming IVF ingest gate: per-cell sufficient statistics folded
  * one micro-batch at a time must end equal to a batch aggregation over
  * the same corpus under the same stored quantizer — integer sums make
  * the equality exact, not approximate.
  */
class ClusterStreamSpec extends SparkSpec {

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

  test("stream-end cell stats equal the batch aggregation: fixture, multi-batch, restart") {
    withRocksDb {
      val root = Files.createTempDirectory("cluster-stream").toString
      val in = s"$root/in"; val out = s"$root/out"; val ck = s"$root/ck"
      val emb = spark.read.parquet(s"${sf()}/embeddings.parquet")
        .select(col("vec_id"), col("embedding"))
      // the STORED coarse quantizer — trained once on the batch corpus,
      // shared verbatim by the stream assignment and the batch gate
      val centroids = Ivf.train(spark, emb, k = 16)

      emb.filter(col("vec_id") % 3 === 0).repartition(1)
        .write.mode("append").parquet(in)
      emb.filter(col("vec_id") % 3 === 1).repartition(1)
        .write.mode("append").parquet(in)
      def runPass(): Unit = {
        val stream = spark.readStream.schema(emb.schema)
          .option("maxFilesPerTrigger", 1)
          .parquet(in)
        val q = ClusterStream.cells(spark, stream, centroids)
          .writeStream.format("parquet").outputMode("append")
          .option("path", out).option("checkpointLocation", ck)
          .trigger(Trigger.AvailableNow()).start()
        StreamDrain.boundedAwait(q)
      }
      runPass()
      emb.filter(col("vec_id") % 3 === 2).repartition(1)
        .write.mode("append").parquet(in)
      runPass()

      val rows = spark.read.parquet(out)
      val finals = rows
        .join(rows.groupBy("bucket").agg(max("upd").as("upd")), Seq("bucket", "upd"))
        .collect()
        .map(r => r.getAs[Int]("bucket") ->
          ((r.getAs[Long]("n"), r.getAs[collection.Seq[Long]]("means").toSeq)))
        .toMap

      // batch gate: identical quantize+assign expressions, one (bucket,
      // pos) hash agg — the q_kmeans update-step shape under the stored
      // centroids
      val batch = ClusterStream.arrivals(spark, emb, centroids)
        .select(col("bucket"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy(col("bucket"), col("pos"))
        .agg(expr("sum(x) div count(1)").as("m"), count(lit(1)).as("n"))
        .collect()
        .groupBy(_.getInt(0))
        .map { case (b, rs) =>
          b -> ((rs.head.getLong(3), rs.sortBy(_.getInt(1)).map(_.getLong(2)).toSeq))
        }

      assert(batch.nonEmpty && batch.values.map(_._1).sum == emb.count())
      assert(finals.keySet == batch.keySet, s"cell sets diverge: ${finals.keySet} vs ${batch.keySet}")
      for ((b, (n, means)) <- batch) {
        assert(finals(b)._1 == n, s"bucket $b count: stream ${finals(b)._1} vs batch $n")
        assert(finals(b)._2 == means, s"bucket $b means diverge")
      }
      // incrementality evidence: some cell grew across generations
      val multi = rows.groupBy("bucket").agg(countDistinct("upd").as("gens"))
        .filter(col("gens") >= 2).count()
      assert(multi > 0, "expected at least one cell to fold across micro-batches")
    }
  }

  test("streamed drift_cos equals the batch differential bit-for-bit (retrain trigger)") {
    withRocksDb {
      // The q_sim_ivf_incremental scenario, ingest-side (round-12 verdict
      // #5): quantizer trained on the BASE corpus, the DELTA tenth
      // streamed in micro-batches; the retrain trigger computed from the
      // stream-end (n, sums4) cell state must equal Ivf.globalDriftCos's
      // batch value EXACTLY — same davg fixed-point numerators (integer
      // sums are order/batching-independent), same final division chain,
      // same cosine fold.
      val root = Files.createTempDirectory("cluster-drift").toString
      val in = s"$root/in"; val out = s"$root/out"; val ck = s"$root/ck"
      val emb = spark.read.parquet(s"${sf()}/embeddings.parquet")
        .select(col("vec_id"), col("embedding"))
      val base = emb.filter(col("vec_id") % 10 =!= 0)
      val delta = emb.filter(col("vec_id") % 10 === 0)
      val centroids = Ivf.train(spark, base, k = 16)
      val baseCentroid = ClusterStream.davgCentroid(base)

      delta.filter(col("vec_id") % 20 === 0).repartition(1)
        .write.mode("append").parquet(in)
      delta.filter(col("vec_id") % 20 =!= 0).repartition(1)
        .write.mode("append").parquet(in)
      val stream = spark.readStream.schema(emb.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(in)
      val q = ClusterStream.cells(spark, stream, centroids)
        .writeStream.format("parquet").outputMode("append")
        .option("path", out).option("checkpointLocation", ck)
        .trigger(Trigger.AvailableNow()).start()
      StreamDrain.boundedAwait(q)

      val rows = spark.read.parquet(out)
      val cellRows = rows
        .join(rows.groupBy("bucket").agg(max("upd").as("upd")), Seq("bucket", "upd"))
        .collect()
        .map(r => ClusterStream.CellRow(
          r.getAs[Int]("bucket"), r.getAs[Long]("upd"), r.getAs[Long]("n"),
          r.getAs[collection.Seq[Long]]("means").toSeq,
          r.getAs[collection.Seq[Long]]("sums4").toSeq)).toSeq
      val streamed = ClusterStream.driftFromCells(spark, cellRows, baseCentroid)
        .collect().head
      val batch = Ivf.globalDriftCos(emb, col("vec_id") % 10 === 0)
        .collect().head

      val sDrift = streamed.getAs[Double]("drift_cos")
      val bDrift = batch.getAs[Double]("drift_cos")
      assert(sDrift == bDrift, // BIT equality, not a tolerance
        s"streamed drift $sDrift != batch differential $bDrift")
      assert(streamed.getAs[Boolean]("retrain_needed") == (bDrift < 0.9))
    }
  }
}
