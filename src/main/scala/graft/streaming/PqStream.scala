package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

import graft.ext.Pq

/** Streaming IVF×PQ serving-layout ingest — the "add" half of the FAISS
  * IVFPQ lifecycle next to q_pq_adc_ivf's "search" half: arriving vectors
  * are coarse-assigned and PQ-encoded against the STORED quantizer and
  * codebooks, and the (vec_id, bucket, m, code) rows append to the
  * serving table while it keeps serving queries.
  *
  * The twin is deliberately STATELESS — the contrast case in the twin
  * family's preference order. [[Pq.encodeCells]] is a pure per-row
  * expression tree (broadcast codebook/centroid literals, narrow map), so
  * the streaming form is the SAME function applied to a streaming
  * DataFrame; exactly-once comes entirely from the checkpointed file
  * source + transactional file-sink commit protocol, with no processor
  * state to reconcile. Where the stat twins ([[ClusterStream]] etc.) must
  * prove their fold order-independent, here stream ≡ batch holds because
  * the per-row map is the identical expression tree — PqStreamSpec gates
  * the appended table SET-equal to the batch layout across multi-batch +
  * restart, proves replay adds nothing, and closes the loop by serving
  * q_pq_adc_ivf's probe→ADC→re-rank pipeline FROM the stream-built table
  * against the batch-built one.
  *
  * Scale shape: ingest is embarrassingly parallel (no exchange at all —
  * the encode map fuses into the scan; the sink partitions by bucket so
  * serving reads stay cell-local); the serving side is q_pq_adc_ivf's
  * plan unchanged. At 100 TB this is the shape that matters: index
  * maintenance must not shuffle the corpus, and here nothing does.
  */
object PqStream {

  /** The serving-layout rows for a (possibly streaming) vector frame —
    * [[Pq.encodeCells]] verbatim; the twin IS the batch expression tree.
    */
  def encoded(
      vecs: DataFrame,
      books: Seq[Seq[Seq[Double]]],
      coarse: Seq[Seq[Double]]): DataFrame =
    Pq.encodeCells(vecs, books, coarse)

  /** Drain `srcDir`'s vector files into the serving table at `outDir`
    * (parquet, partitioned by coarse cell so serving probes read only
    * their buckets), one checkpointed micro-batch per file.
    */
  def ingest(
      spark: org.apache.spark.sql.SparkSession,
      srcDir: String,
      schema: StructType,
      books: Seq[Seq[Seq[Double]]],
      coarse: Seq[Seq[Double]],
      outDir: String,
      checkpoint: String): StreamingQuery =
    encoded(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(srcDir),
      books, coarse)
      .writeStream
      .format("parquet")
      .outputMode("append")
      .partitionBy("bucket")
      .option("path", outDir)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
}
