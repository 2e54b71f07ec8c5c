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
    assert(row.getAs[Boolean]("near_dup_keep_rule_consistent"))
    // the duplicated subset must actually collapse
    assert(row.getAs[Long]("n_exact_survivors") < row.getAs[Long]("n_docs"))
  }

  test("mis-ordered pipeline (LSH before exact dedup) flips the contract") {
    val corpus = dupCorpus()
    val row = Curation.v3Gate(corpus, Curation.withFingerprint(corpus)).head()
    assert(!row.getAs[Boolean]("lsh_input_is_survivor_set"),
      "duplicate fingerprints reached the LSH stage without tripping the contract")
  }

  test("keep-rule consistency contract is falsifiable: a mis-oriented pair chain flips it") {
    import spark.implicits._
    def consistent(pairs: Seq[(Long, Long)]): Boolean = {
      val df = pairs.toDF("a_id", "b_id")
      val g = Curation.localMinimaStats(df).head()
      val removed = df.select(countDistinct(col("b_id"))).head().getLong(0)
      g.getAs[Long]("n_pair_docs") - removed == g.getAs[Long]("n_local_min")
    }
    // well-oriented chain 1-2, 2-3: removed {2,3}, survivors = local minima {1}
    assert(consistent(Seq((1L, 2L), (2L, 3L))))
    // same chain with the second pair reversed: distinct b_ids collapse to
    // {2} but the graph still has one local minimum among three docs
    assert(!consistent(Seq((1L, 2L), (3L, 2L))),
      "reversed pair orientation passed the consistency contract")
  }

  test("exact survivors keep the lowest doc_id per fingerprint") {
    val corpus = dupCorpus()
    val surv = Curation.exactSurvivors(corpus)
    // every duplicated original (doc_id % 5 == 0) survives as itself, never
    // as its +1_000_000 copy
    assert(surv.filter(col("doc_id") >= 1000000L).count() == 0L)
    assert(surv.count() == corpus.select(col("text")).distinct().count())
  }

  test("DSIR selection shifts toward the target source, and target-slice docs score highest") {
    // The importance-resampling property the oracle's hash differential
    // cannot express: selection must OVERREPRESENT the target source
    // (src0) relative to the pool. On the fixture src0 selects at 100%
    // while the pool averages well below (round-15 measurement:
    // 1.00 vs 0.36-0.84 per non-target source).
    val sel = graft.Registry.byName("q_dsir_select").run(spark, sf()).collect()
    val rates = sel.map(r => r.getAs[String]("source") -> r.getAs[Double]("sel_rate")).toMap
    val others = rates.removed("src0").values
    assert(rates("src0") == rates.values.max,
      s"target source must have the max selection rate, got $rates")
    assert(rates("src0") > others.sum / others.size,
      "target selection rate must exceed the non-target average")
    // selection binds (not everything selected), so the shift has teeth
    assert(sel.map(_.getAs[Long]("n_selected")).sum < sel.map(_.getAs[Long]("n_docs")).sum)
  }
}
