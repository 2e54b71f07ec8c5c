package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed BPE (byte-pair-encoding) vocabulary induction — the merge
  * loop of Sennrich et al. 2016 run as Spark dataflow: each round counts
  * adjacent symbol pairs corpus-wide (one explode + one hash-agg), takes
  * the most frequent pair (ONE row to the driver — the merge decision is
  * control, not data), and rewrites every word's symbol array with the
  * pair fused. Ties break lexicographically so the learned vocabulary is
  * deterministic on any cluster size.
  *
  * The per-word rewrite is a left fold over the symbol array (array HOF,
  * codegen'd): append-or-fuse, exactly the sequential merge a
  * single-process BPE trainer applies, so results match a reference
  * implementation token-for-token (pinned in BpeSpec).
  *
  * Scale shape per round: explode(word symbols) → (pair) hash-agg →
  * driver argmax (1 row) → narrow map. Words are deduplicated up front
  * and carry their corpus frequency, so the heavy stages run over the
  * VOCABULARY (distinct words), not the corpus — the same trick every
  * production BPE trainer uses.
  */
object Bpe {

  /** Split each doc into words, dedup to (word, freq), explode words into
    * initial character-symbol arrays.
    */
  def wordSymbols(docs: DataFrame, textCol: String): DataFrame =
    docs
      .select(explode(split(col(textCol), " ")).as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("word"))
      .agg(count(lit(1)).as("freq"))
      .withColumn("syms", split(col("word"), ""))

  /** Adjacent-pair frequencies over the current symbol arrays, weighted
    * by word frequency.
    */
  def pairCounts(words: DataFrame): DataFrame =
    words
      .select(
        col("freq"),
        explode(zip_with(
          slice(col("syms"), lit(1), size(col("syms")) - 1),
          slice(col("syms"), lit(2), size(col("syms")) - 1),
          (a, b) => concat(a, lit("\u0000"), b))).as("pair"))
      .groupBy(col("pair"))
      .agg(sum(col("freq")).as("n"))

  /** One merge pass: fuse every non-overlapping occurrence of (a, b) in
    * the symbol array, left to right — a fold that either fuses the new
    * symbol with the pending previous one or appends. Matches the
    * sequential semantics: after "aa"+"a" with merge (a,a), "aaa" becomes
    * ["aa", "a"], not ["a", "aa"].
    */
  def mergeExpr(syms: Column, a: String, b: String): Column = {
    val aLit = lit(a); val bLit = lit(b)
    // accumulator: the rewritten prefix; step: if the last element is `a`
    // (not yet fused) and the next symbol is `b`, replace last with a+b,
    // else append. element_at(-1) reads the pending last symbol.
    aggregate(
      syms,
      array().cast("array<string>"),
      (acc, s) =>
        when(
          size(acc) > 0 && element_at(acc, -1) === aLit && s === bLit,
          concat(slice(acc, lit(1), size(acc) - 1), array(concat(aLit, bLit))))
          .otherwise(concat(acc, array(s))))
  }

  /** Learn `merges` BPE merges. Returns (merge_rank, left, right, pair_count)
    * — one row per learned merge, plus the final corpus symbol count as a
    * trailing audit row (rank = merges + 1).
    */
  def train(spark: SparkSession, docs: DataFrame, textCol: String, merges: Int): DataFrame = {
    import spark.implicits._
    var words = wordSymbols(docs, textCol)
    val learned = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    for (rank <- 1 to merges) {
      // deterministic argmax: highest count, then lexicographic pair
      val top = pairCounts(words)
        .orderBy(col("n").desc, col("pair"))
        .limit(1)
        .collect()
      if (top.nonEmpty) {
        val Array(a, b) = top.head.getString(0).split("\u0000", 2)
        learned += ((rank, a, b, top.head.getLong(1)))
        val merged = words.withColumn("syms", mergeExpr(col("syms"), a, b))
        // materialize each round: the rewrite lineage would otherwise
        // re-run every earlier merge per round (same O(rounds²) trap as
        // q_pagerank). Round 21: the per-round parquet write+read-back
        // (a disk round trip per merge) is replaced by the shared
        // lineage-truncation seam — localCheckpoint by default, the
        // reliable checkpoint dir on a cluster (graft.core.Ckpt).
        words = graft.core.Ckpt.truncate(merged)
      }
    }
    val totalSyms = words
      .select(sum(size(col("syms")).cast("long") * col("freq")).as("t"))
      .collect().head.getLong(0)
    (learned.toSeq :+ ((merges + 1, "<total_symbols>", "", totalSyms)))
      .toDF("merge_rank", "left", "right", "n")
  }

  /** Apply a learned merge list to a corpus — the tokenizer SERVING path.
    * The fold over merge ranks runs once per DISTINCT word (the same
    * vocabulary dedup the trainer uses), and the corpus joins back to the
    * encoded vocab by word — AQE broadcasts the vocab when it fits, so at
    * 100 TB the per-occurrence cost is one hash-join probe, not a
    * re-tokenization. Returns one row per doc: word and token counts.
    */
  def encode(docs: DataFrame, textCol: String, merges: Seq[(String, String)]): DataFrame = {
    val words = docs
      .select(col("doc_id"), explode(split(col(textCol), " ")).as("word"))
      .filter(col("word") =!= "")
    val vocab = words
      .select(col("word")).distinct()
      .withColumn(
        "n_syms",
        size(merges.foldLeft(split(col("word"), "")) {
          case (syms, (a, b)) => mergeExpr(syms, a, b)
        }))
    words
      .join(vocab, Seq("word"))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_words"),
        sum(col("n_syms")).as("n_tokens"))
      .orderBy(col("doc_id"))
  }
}
