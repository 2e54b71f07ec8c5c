package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The curation-v3 ordering invariant must be a live tripwire, not a
  * tautology: on a corpus WITH exact duplicates, the well-ordered
  * pipeline passes the contract and the mis-ordered one (LSH before
  * exact dedup) flips it.
  */
class CurationSpec extends SparkSpec {

  private def dupCorpus() = {
    val base = graft.core.Tables(spark, sf(), "documents")
      .select(col("doc_id"), col("text"))
    base.unionByName(
      base.filter(col("doc_id") % 5 === 0)
        .select((col("doc_id") + lit(1000000L)).as("doc_id"), col("text")))
  }

  test("well-ordered pipeline satisfies the survivor-set contract") {
    val corpus = dupCorpus()
    val row = Curation.v3Gate(corpus, Curation.exactSurvivors(corpus)).head()
    assert(row.getAs[Boolean]("lsh_input_is_survivor_set"))
    assert(row.getAs[Boolean]("near_dup_kept_bounded"))
    // the duplicated subset must actually collapse
    assert(row.getAs[Long]("n_exact_survivors") < row.getAs[Long]("n_docs"))
  }

  test("mis-ordered pipeline (LSH before exact dedup) flips the contract") {
    val corpus = dupCorpus()
    val row = Curation.v3Gate(corpus, Curation.withFingerprint(corpus)).head()
    assert(!row.getAs[Boolean]("lsh_input_is_survivor_set"),
      "duplicate fingerprints reached the LSH stage without tripping the contract")
  }

  test("exact survivors keep the lowest doc_id per fingerprint") {
    val corpus = dupCorpus()
    val surv = Curation.exactSurvivors(corpus)
    // every duplicated original (doc_id % 5 == 0) survives as itself, never
    // as its +1_000_000 copy
    assert(surv.filter(col("doc_id") >= 1000000L).count() == 0L)
    assert(surv.count() == corpus.select(col("text")).distinct().count())
  }
}
