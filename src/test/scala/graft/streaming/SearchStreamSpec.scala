package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.{Registry, SparkSpec}

/** The SearchStream gate (round-11 verdict #1): the streaming BM25
  * leaderboard's stream-end state must equal the batch q_bm25 top-5
  * doc-for-doc and score-for-score — scoreFp claims verbatim parity with
  * the bm25Scores integer chain, and this spec proves it over the fixture
  * corpus replayed in multiple micro-batches across a query restart.
  */
class SearchStreamSpec extends SparkSpec {

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType)))

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

  /** One AvailableNow pass of [[SearchStream.leaderboard]] over whatever
    * files sit unprocessed in `in`, appending boards to `out`.
    */
  private def runPass(in: String, out: String, ck: String, k: Int): Unit = {
    import spark.implicits._
    val stream = spark.readStream.schema(docSchema)
      .option("maxFilesPerTrigger", 1)
      .parquet(in)
      .as[(Long, String)]
    val q = SearchStream.leaderboard(spark, stream, k)
      .writeStream.format("parquet").outputMode("append")
      .option("path", out).option("checkpointLocation", ck)
      .trigger(Trigger.AvailableNow()).start()
    StreamDrain.boundedAwait(q)
  }

  /** Each query's final board from the append sink: the rows carrying
    * that query's max `upd`, as (query_id, rank, doc_id, score_fp).
    */
  private def finalBoards(out: String): Seq[(Int, Int, Long, Long)] = {
    val hits = spark.read.parquet(out)
    hits
      .join(hits.groupBy("query_id").agg(max("upd").as("upd")), Seq("query_id", "upd"))
      .collect()
      .map(r => (
        r.getAs[Int]("query_id"), r.getAs[Int]("rank"),
        r.getAs[Long]("doc_id"), r.getAs[Long]("score_fp")))
      .sortBy { case (q, rnk, _, _) => (q, rnk) }
      .toSeq
  }

  private def batchTop5(dir: String): Seq[(Int, Int, Long, Long)] =
    Registry.byName("q_bm25").run(spark, dir).collect()
      .map(r => (
        r.getAs[Int]("query_id"), r.getAs[Int]("rnk"),
        r.getAs[Long]("doc_id"), r.getAs[Long]("score_fp")))
      .sortBy { case (q, rnk, _, _) => (q, rnk) }
      .toSeq

  test("stream-end boards equal q_bm25's top-5 exactly: fixture corpus, multi-batch, restart") {
    withRocksDb {
      val root = Files.createTempDirectory("search-stream").toString
      val in = s"$root/in"; val out = s"$root/out"; val ck = s"$root/ck"
      val docs = spark.read.parquet(s"${sf()}/documents.parquet")
        .select(col("doc_id"), col("text"))
      val nDocs = docs.count()
      // run 1: docs split over TWO files (maxFilesPerTrigger=1 forces two
      // micro-batches inside the run); run 2 restarts from the checkpoint
      // and folds a third file — state must carry across both boundaries
      docs.filter(col("doc_id") % 3 === 0).repartition(1)
        .write.mode("append").parquet(in)
      docs.filter(col("doc_id") % 3 === 1).repartition(1)
        .write.mode("append").parquet(in)
      runPass(in, out, ck, k = 5)
      docs.filter(col("doc_id") % 3 === 2).repartition(1)
        .write.mode("append").parquet(in)
      runPass(in, out, ck, k = 5)

      val hits = spark.read.parquet(out)
      // the stream really was incremental: boards were emitted at
      // corpus-prefix sizes strictly below the final count
      val upds = hits.select("upd").distinct().collect().map(_.getLong(0)).sorted
      assert(upds.last == nDocs, s"final boards must have seen all $nDocs docs: ${upds.toSeq}")
      assert(upds.length >= 3, s"expected >=3 distinct board generations: ${upds.toSeq}")

      val got = finalBoards(out)
      val want = batchTop5(sf())
      assert(want.nonEmpty)
      assert(got == want, s"stream-end boards diverge from q_bm25:\n got=$got\nwant=$want")
    }
  }

  test("candidate re-delivery is idempotent: board and upd unchanged, still equals batch") {
    import spark.implicits._
    withRocksDb {
      // every doc contains a term from EVERY query, so each doc is a
      // CANDIDATE for all three states — the guard path (skip wholesale)
      // covers n/total_tok/df/cand on every key. (Stats-only re-delivery
      // is excluded by the delivery contract — see SearchStream's doc.)
      val fixture = Seq(
        (0L, "value spark customer"),
        (1L, "table batch query value value"),
        (2L, "spark customer table batch"),
        (3L, "query value spark table customer batch"))
      val corpus = fixture.map { case (id, t) =>
        (id, t, "en", "t", t.length.toLong)
      }.toDF("doc_id", "text", "lang", "source", "n_chars")
      val dir = Files.createTempDirectory("search-stream-corpus").toString
      corpus.write.mode("overwrite").parquet(s"$dir/documents.parquet")

      val root = Files.createTempDirectory("search-stream-redeliver").toString
      val in = s"$root/in"; val out = s"$root/out"; val ck = s"$root/ck"
      fixture.take(3).toDF("doc_id", "text").repartition(1)
        .write.mode("append").parquet(in)
      runPass(in, out, ck, k = 5)
      // batch 2 RE-DELIVERS docs 0 and 2 alongside the genuinely new doc 3
      (Seq(fixture(0), fixture(2)) :+ fixture(3)).toDF("doc_id", "text").repartition(1)
        .write.mode("append").parquet(in)
      runPass(in, out, ck, k = 5)

      val hits = spark.read.parquet(out)
      // upd counts DISTINCT docs folded: 3 after batch 1, 4 after batch 2
      // (re-delivered docs skipped, never 6)
      val upds = hits.select("upd").distinct().collect().map(_.getLong(0)).sorted
      assert(upds.toSeq == Seq(3L, 4L), s"re-delivery must not bump upd: ${upds.toSeq}")
      val got = finalBoards(out)
      val want = batchTop5(dir)
      assert(want.nonEmpty)
      assert(got == want, s"boards diverge after re-delivery:\n got=$got\nwant=$want")
    }
  }
}
