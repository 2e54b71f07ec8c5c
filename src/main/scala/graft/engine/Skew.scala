package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation (SURVEY §4 / builder scale notes): when one grouping
  * key dominates, a single reducer receives most rows. Salting splits each
  * hot key into `saltBuckets` sub-keys for a first partial aggregate, then
  * re-aggregates the (small) salted results — two shuffles, but the heavy
  * one is uniform. AQE's skew-join handling covers joins; this covers
  * aggregations whose partials don't combine map-side well (e.g. exact
  * distinct structures, collect-style aggs).
  *
  * The helper is algebra-preserving for aggregates expressible as a
  * (merge ∘ partial) pair — sums/counts/min/max — which callers pass
  * explicitly.
  */
object Skew {

  /** Two-stage salted aggregation:
    * stage 1 groups by (keys, salt) computing `partials`;
    * stage 2 groups by keys computing `merges` over the stage-1 columns.
    * The salt mixes a per-row id so FULLY IDENTICAL duplicate rows — the
    * classic hot-key shape — still spread across buckets; content hashing
    * alone would send them all to one bucket. Salt assignment is therefore
    * not stable across runs, but the FINAL result is: stage 2 merges over
    * all buckets, and the (merge ∘ partial) contract makes the composition
    * salt-independent.
    *
    * Task-retry safety: the id expression is nondeterministic, so Spark
    * marks the stage-1 shuffle output INDETERMINATE and, on a fetch
    * failure, ROLLS BACK and re-runs the whole map stage instead of
    * recomputing single tasks against stale reducer fetches (the
    * SPARK-23207 repartition fix, generalized by SPARK-25341) — a retry
    * costs a stage re-run, never a wrong aggregate.
    */
  def saltedAgg(
      df: DataFrame,
      keys: Seq[String],
      saltBuckets: Int,
      partials: Seq[Column],
      merges: Seq[Column]): DataFrame = {
    val salted = df.withColumn(
      "_salt",
      pmod(hash(monotonically_increasing_id()), lit(saltBuckets)))
    val stage1 = salted
      .groupBy((keys :+ "_salt").map(col): _*)
      .agg(partials.head, partials.tail: _*)
    stage1
      .groupBy(keys.map(col): _*)
      .agg(merges.head, merges.tail: _*)
  }
}
