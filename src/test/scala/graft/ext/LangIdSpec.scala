package graft.ext

import org.apache.spark.sql.functions._

/** LangID (q_langid / q_langid_mix) — the planted-separation teeth the
  * registered differential can't carry as a float-free boolean: the
  * hashed char-trigram likelihood-ratio model must actually SEPARATE
  * the planted bilingual corpus (rot13'd odd sources), not just be
  * cross-engine deterministic.
  */
class LangIdSpec extends graft.SparkSpec {

  test("planted bilingual corpus separates: accuracy >= 0.95, every source majority-correct") {
    val rows = QualityQueries.langScores(spark, sf()).collect()
    assert(rows.nonEmpty)
    val correct = rows.count(r => r.getAs[String]("lang_pred") == r.getAs[String]("lang_true"))
    val acc = correct.toDouble / rows.length
    info(s"LangID accuracy on the planted corpus: $acc (${rows.length} docs)")
    assert(acc >= 0.95, s"LangID failed to separate the planted languages: accuracy $acc")
    // every source's majority prediction matches its planted language —
    // the q_langid_mix rollup's visible separation
    val bySource = rows.groupBy(_.getAs[String]("source"))
    bySource.foreach { case (src, docs) =>
      val truth = docs.head.getAs[String]("lang_true")
      val majority = docs.count(_.getAs[String]("lang_pred") == truth)
      assert(majority * 2 > docs.length,
        s"source $src: planted $truth but only $majority/${docs.length} predicted so")
    }
  }

  test("3-class variant separates identity / rot13 / reversed text") {
    val rows = QualityQueries.langScores3(spark, sf()).collect()
    assert(rows.nonEmpty)
    val acc = rows.count(r =>
      r.getAs[String]("lang_pred") == r.getAs[String]("lang_true")).toDouble / rows.length
    info(s"3-class accuracy on the planted corpus: $acc (${rows.length} docs)")
    assert(acc >= 0.95, s"3-class LangID failed to separate: accuracy $acc")
    // every class actually present and predicted
    val preds = rows.map(_.getAs[String]("lang_pred")).toSet
    assert(preds == Set("l0", "l1", "l2"), s"predicted classes: $preds")
  }

  test("langBucket pins the empty feature to the fold base (oracle's empty-list semantics)") {
    // round-19 ADVICE: an empty-text doc yields one "" trigram feature;
    // Spark's sequence(1, 0) is the DESCENDING [1, 0] (hash 6727) while
    // the DuckDB oracle's range(1, len+1) is empty (hash stays 7) — the
    // guard must pin "" to 7 while leaving non-empty features untouched
    import spark.implicits._
    val rows = Seq("", "abc", "a").toDF("f")
      .select(col("f"), QualityQueries.langBucket(col("f")).as("b"))
      .collect()
      .map(r => r.getAs[String]("f") -> r.getAs[Long]("b")).toMap
    assert(rows("") == 7L, s"empty feature bucketed to ${rows("")}, oracle says 7")
    // non-empty: the char-polynomial fold, unchanged by the guard
    def fold(s: String): Long =
      (s.foldLeft(7L)((h, c) => (h * 31 + c.toLong) % 1048576)) % QualityQueries.LangBPublic
    assert(rows("abc") == fold("abc"))
    assert(rows("a") == fold("a"))
  }

  test("held-out docs (not in the train slice) classify correctly too") {
    // the model trains on (doc_id div 20) % 4 = 0; generalization to
    // unseen docs is what makes this language ID rather than memorization
    val rows = QualityQueries.langScores(spark, sf())
      .filter((col("doc_id") / 20).cast("long") % 4 =!= 0).collect()
    assert(rows.nonEmpty)
    val acc = rows.count(r =>
      r.getAs[String]("lang_pred") == r.getAs[String]("lang_true")).toDouble / rows.length
    info(s"held-out accuracy: $acc (${rows.length} docs)")
    assert(acc >= 0.9, s"held-out accuracy $acc below floor")
  }
}
