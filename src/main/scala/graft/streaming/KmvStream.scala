package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

import graft.functions.KmvSketch

/** Streaming twin #14: per-source KMV/theta sketches maintained at
  * INGEST — distinct-count AND overlap telemetry from 512 bytes of
  * state per source, forever. The batch job can afford the exact
  * per-bigram COUNT(DISTINCT) alongside the sketch; the ingest path
  * cannot (the key space grows without bound) — and unlike the HLL
  * column Spark ships, the streamed KMV artifacts still INTERSECT
  * downstream (`graft_kmv_intersect` over any two stored sketches),
  * so cross-shard overlap is answerable without ever co-scanning
  * shards.
  *
  * The exactness claim leans on the same algebra KmvSpec proves: the
  * k-min set is a union monoid (commutative, idempotent), so folding
  * arrivals micro-batch by micro-batch — across restarts, in any
  * partition order — lands on the IDENTICAL k-min array the batch
  * `graft_kmv` computes over the whole corpus. KmvStreamSpec replays
  * the fixture in micro-batches across a restart and asserts per-source
  * arrays bit-equal the batch aggregate's, which transfers every
  * q_kmv_* estimate guarantee to the streamed artifact. The bigram
  * spelling is single-sourced in `SketchQueries.kmvBigrams` so stream
  * and batch cannot drift.
  */
object KmvStream {

  final case class BigramArrival(source: String, bg: String)

  final case class SourceKmv(source: String, upd: Long, mins: Array[Long])

  class KmvProcessor extends StatefulProcessor[String, BigramArrival, SourceKmv] {
    @transient private var st: ValueState[Array[Long]] = _
    @transient private var n: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      st = getHandle.getValueState[Array[Long]](
        "kmv", Encoders.kryo[Array[Long]], TTLConfig.NONE)
      n = getHandle.getValueState[Long]("n", Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(
        key: String,
        rows: Iterator[BigramArrival],
        timerValues: TimerValues): Iterator[SourceKmv] = {
      val set = new java.util.TreeSet[java.lang.Long]()
      if (st.exists()) st.get().foreach(h => set.add(h))
      var count = if (n.exists()) n.get() else 0L
      rows.foreach { r =>
        val h = KmvSketch.hash32(r.bg)
        if (set.size < KmvSketch.K) set.add(h)
        else if (h < set.last()) { if (set.add(h)) set.remove(set.last()) }
        count += 1L
      }
      val out = new Array[Long](set.size)
      val it = set.iterator()
      var i = 0
      while (it.hasNext) { out(i) = it.next(); i += 1 }
      st.update(out)
      n.update(count)
      Iterator.single(SourceKmv(key, count, out))
    }
  }

  /** Arriving documents → (source, bigram) rows through the batch
    * query's exact spelling.
    */
  def arrivals(spark: SparkSession, docs: DataFrame): Dataset[BigramArrival] = {
    import spark.implicits._
    graft.ext.SketchQueries.kmvBigrams(docs).as[BigramArrival]
  }

  /** Incrementally maintained per-source k-min sets over a document stream. */
  def view(spark: SparkSession, docs: DataFrame): Dataset[SourceKmv] = {
    import spark.implicits._
    arrivals(spark, docs)
      .groupByKey(_.source)
      .transformWithState(new KmvProcessor, TimeMode.None(), OutputMode.Append())
  }

  /** WINDOWED ingest state (q_kmv_windowed's stream half): one k-min
    * sketch per (source, window) — the key is the composite
    * "source|window" string, the processor is the UNCHANGED
    * [[KmvProcessor]] (it is key-agnostic; the monoid algebra that
    * makes per-source folding slicing-invariant applies per key
    * verbatim). Window arithmetic and bigram spelling come from
    * [[graft.ext.SketchQueries.kmvBigramsWindowed]], so the batch row,
    * its oracle, and this view cannot drift.
    */
  def viewWindowed(spark: SparkSession, docs: DataFrame): Dataset[SourceKmv] = {
    import spark.implicits._
    graft.ext.SketchQueries.kmvBigramsWindowed(docs)
      .select(
        org.apache.spark.sql.functions.concat_ws(
          "|", org.apache.spark.sql.functions.col("source"),
          org.apache.spark.sql.functions.col("w")).as("source"),
        org.apache.spark.sql.functions.col("bg"))
      .as[BigramArrival]
      .groupByKey(_.source)
      .transformWithState(new KmvProcessor, TimeMode.None(), OutputMode.Append())
  }
}
