package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The stale-cache hazard the stored-artifact registries are keyed
  * against (round-14 advice): a per-JVM registry keyed only on (dir,
  * params) silently serves the OLD index after the fixture under `dir`
  * is regenerated. Every registry ([[Pq.shared]]/[[Pq.sharedDf]],
  * [[Ivf.trainShared]], [[SearchQueries.sparseIndexShared]],
  * [[SearchQueries.bm25IndexShared]], [[Dedup.minhashIndexShared]])
  * embeds `Tables.fingerprint` (file count + bytes + max mtime) in its key for
  * exactly this reason — this spec REBUILDS a corpus under one path
  * mid-JVM and asserts the served artifacts reflect the new rows, so
  * the fingerprint keying is a gated contract, not a comment.
  */
class ArtifactRegistrySpec extends SparkSpec {

  private def writeCorpus(dir: String, ids: Seq[Long], vocab: Seq[String]): Unit = {
    import spark.implicits._
    // every doc repeats vocab terms with a doc-specific skew so
    // signatures are non-trivial and corpora of different id ranges
    // produce different byte sizes (the fingerprint's b= component
    // changes even within one mtime granule)
    ids.map { id =>
      val words = (0 until 8).map(i => vocab(((id + i) % vocab.size).toInt))
      (id, words.mkString(" "))
    }.toDF("doc_id", "text")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
  }

  test("sparse index registry rebuilds when the corpus under the same path is regenerated") {
    val dir = java.nio.file.Files.createTempDirectory("graft-artifact-reg").toString
    writeCorpus(dir, 0L until 20L, Seq("apple", "banana", "cherry", "date"))
    val first = SearchQueries.championServe(SearchQueries.sparseIndexShared(spark, dir))
      .select(col("a_id")).distinct().collect().map(_.getLong(0)).toSet
    assert(first.nonEmpty && first.forall(_ < 20L))
    // regenerate the fixture under the SAME path: different ids, vocab, size
    writeCorpus(dir, 100L until 140L, Seq("dog", "elephant", "fox"))
    val second = SearchQueries.championServe(SearchQueries.sparseIndexShared(spark, dir))
      .select(col("a_id")).distinct().collect().map(_.getLong(0)).toSet
    assert(second.nonEmpty && second.forall(_ >= 100L),
      s"registry served the stale pre-rebuild index: $second")
  }

  test("BM25 postings registry rebuilds when the corpus under the same path is regenerated") {
    val dir = java.nio.file.Files.createTempDirectory("graft-artifact-reg-bm25").toString
    writeCorpus(dir, 0L until 20L, Seq("apple", "banana", "cherry", "date"))
    val first = SearchQueries.bm25IndexShared(spark, dir)
    assert(first.nDocs == 20L && first.postings.count() > 0)
    writeCorpus(dir, 100L until 140L, Seq("dog", "elephant", "fox"))
    val second = SearchQueries.bm25IndexShared(spark, dir)
    assert(second.nDocs == 40L,
      s"registry served the stale postings artifact: nDocs=${second.nDocs}")
    assert(second.docLens.select(min(col("doc_id"))).collect().head.getLong(0) == 100L)
  }

  test("minhash band-index registry rebuilds when the corpus under the same path is regenerated") {
    val dir = java.nio.file.Files.createTempDirectory("graft-artifact-reg-mh").toString
    writeCorpus(dir, 0L until 20L, Seq("apple", "banana", "cherry", "date"))
    val first = Dedup.minhashIndexShared(spark, dir)
    // 8 bands per doc in the banded artifact
    assert(first.nDocs == 20L && first.banded.count() == 20L * 8)
    writeCorpus(dir, 100L until 140L, Seq("dog", "elephant", "fox"))
    val second = Dedup.minhashIndexShared(spark, dir)
    assert(second.nDocs == 40L,
      s"registry served the stale band index: nDocs=${second.nDocs}")
    assert(second.banded.select(min(col("id"))).collect().head.getLong(0) == 100L)
  }

  test("PQ codes registry rebuilds when the corpus under the same path is regenerated") {
    val dir = java.nio.file.Files.createTempDirectory("graft-artifact-reg-pq").toString
    writeCorpus(dir, 0L until 20L, Seq("apple", "banana", "cherry", "date"))
    val firstRows = SearchQueries.pqTokenCodes(spark, dir).count()
    // codes = m=4 rows per surviving token vector
    val expectFirst = 4L * SearchQueries.tokenVecs(
      spark.read.parquet(s"$dir/documents.parquet")).count()
    assert(firstRows == expectFirst)
    writeCorpus(dir, 100L until 140L, Seq("dog", "elephant", "fox"))
    val secondRows = SearchQueries.pqTokenCodes(spark, dir).count()
    val expectSecond = 4L * SearchQueries.tokenVecs(
      spark.read.parquet(s"$dir/documents.parquet")).count()
    assert(secondRows == expectSecond && secondRows != firstRows,
      s"registry served stale codes: $secondRows (want $expectSecond, old $firstRows)")
  }
}
