package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

import graft.functions.CmsSketch

/** Streaming twin #12: per-source Count-Min sketches maintained at
  * INGEST — the operational home of a counting sketch. A batch job can
  * afford the exact per-term GROUP BY alongside the sketch; the ingest
  * path cannot (the vocabulary grows without bound), which is exactly
  * why the sketch exists: per source, state is d·w longs, FOREVER, no
  * matter how many terms arrive.
  *
  * The exactness claim leans on the same algebra the batch aggregate
  * proves (CmsSpec): the sketch is a commutative monoid, so folding
  * arrivals micro-batch by micro-batch — across restarts, in any
  * partition order — lands on the IDENTICAL counter array the batch
  * `graft_cms` computes over the whole corpus. SketchStreamSpec replays
  * the fixture in multiple micro-batches across a restart and asserts
  * per-source sketch arrays bit-equal the batch aggregate's, which also
  * transfers every q_cms_* estimate guarantee to the streamed artifact.
  *
  * Scale shape: keyed by source (the per-shard telemetry shape of
  * q_cms_grouped); each micro-batch folds its terms into the per-key
  * array in one pass. Emission is the FULL sketch per key per batch —
  * d·w longs, the fixed-size artifact a downstream store overwrites.
  */
object SketchStream {

  final case class TermArrival(source: String, term: String)

  final case class SourceSketch(source: String, upd: Long, sketch: Array[Long])

  class CmsProcessor extends StatefulProcessor[String, TermArrival, SourceSketch] {
    @transient private var st: ValueState[Array[Long]] = _
    @transient private var n: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      st = getHandle.getValueState[Array[Long]](
        "cms", Encoders.kryo[Array[Long]], TTLConfig.NONE)
      n = getHandle.getValueState[Long]("n", Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(
        key: String,
        rows: Iterator[TermArrival],
        timerValues: TimerValues): Iterator[SourceSketch] = {
      val sk =
        if (st.exists()) st.get()
        else new Array[Long](CmsSketch.Depth * CmsSketch.Width)
      var count = if (n.exists()) n.get() else 0L
      rows.foreach { r =>
        var j = 0
        while (j < CmsSketch.Depth) {
          sk(j * CmsSketch.Width + CmsSketch.bucket(r.term, j)) += 1
          j += 1
        }
        count += 1L
      }
      st.update(sk)
      n.update(count)
      Iterator.single(SourceSketch(key, count, sk.clone()))
    }
  }

  /** Tokenize arriving documents with the batch query's exact spelling
    * (whitespace split, empty terms dropped).
    */
  def arrivals(spark: SparkSession, docs: DataFrame): Dataset[TermArrival] = {
    import spark.implicits._
    docs.select(
      col("source"),
      explode(filter(split(col("text"), " "), t => t =!= "")).as("term"))
      .as[TermArrival]
  }

  /** Incrementally maintained per-source sketches over a document stream. */
  def view(spark: SparkSession, docs: DataFrame): Dataset[SourceSketch] = {
    import spark.implicits._
    arrivals(spark, docs)
      .groupByKey(_.source)
      .transformWithState(new CmsProcessor, TimeMode.None(), OutputMode.Append())
  }
}
