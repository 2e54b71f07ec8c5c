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
    *
    * Default salt = hash of all columns mod buckets: DETERMINISTIC, so a
    * retried stage-1 task reproduces the same (key, salt) routing and the
    * result is exact under any failure pattern. Caveat: fully identical
    * duplicate rows all hash to one bucket, so a hot key made of literal
    * duplicates doesn't spread — pass spreadDuplicates=true to mix a
    * per-row id into the salt. That spreads duplicates but the id is
    * NONDETERMINISTIC: safe when `df` reads straight from a deterministic
    * source (file scans — a retried task re-reads the same split in the
    * same order), NOT safe if `df` sits downstream of a shuffle whose
    * reduce-side row order can differ across task retries.
    */
  def saltedAgg(
      df: DataFrame,
      keys: Seq[String],
      saltBuckets: Int,
      partials: Seq[Column],
      merges: Seq[Column],
      spreadDuplicates: Boolean = false): DataFrame = {
    val saltSource =
      if (spreadDuplicates) hash(monotonically_increasing_id())
      else hash(df.columns.map(col).toIndexedSeq: _*)
    val salted = df.withColumn("_salt", pmod(saltSource, lit(saltBuckets)))
    val stage1 = salted
      .groupBy((keys :+ "_salt").map(col): _*)
      .agg(partials.head, partials.tail: _*)
    stage1
      .groupBy(keys.map(col): _*)
      .agg(merges.head, merges.tail: _*)
  }

  /** Salted equi-join for a skewed LEFT side: each left row gets a
    * deterministic salt in [0, saltBuckets), the (smaller) right side is
    * replicated once per salt value, and the join runs on (key, salt) —
    * the hot key's rows spread over `saltBuckets` reducers instead of one.
    * Result is EXACTLY the plain inner join (each left row meets each
    * matching right row exactly once, at its own salt). Cost: right side
    * ×saltBuckets — the standard trade when AQE's skew splitting can't
    * kick in (e.g. the skewed side is already partitioned by the join key
    * for a later stage).
    */
  def saltedJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      saltBuckets: Int,
      spreadDuplicates: Boolean = false): DataFrame = {
    // Salt derivation must be RETRY-DETERMINISTIC: the salt is a shuffle
    // key, and a map task re-executed after a fetch failure must assign
    // every row the SAME salt, or completed reducers have consumed rows
    // under the old assignment while re-fetching reducers see the new one
    // — duplicated/dropped join rows (Spark only guards nondeterministic
    // partitioning for round-robin repartition, SPARK-23207; a user salt
    // column gets no such protection, so monotonically_increasing_id /
    // rand are NOT safe here). Default salt = xxhash64 over every
    // hashable column (MapType skipped — unhashable): pure row content,
    // so it is stable across retries for ANY input, including one sitting
    // downstream of a shuffle whose retry can re-deal rows to different
    // partitions. The trade is that byte-identical duplicate rows share a
    // bucket — a hot key made of literal duplicates doesn't spread.
    // spreadDuplicates=true mixes spark_partition_id into the hash to
    // break such clumps, and is ONLY safe when `left` reads straight from
    // a deterministic source (a file scan re-reads the same split with the
    // same partition id on retry) — never on a post-shuffle frame, where a
    // fetch-failure re-execution can re-assign partition ids and change a
    // shuffle key mid-join. Same opt-in contract as [[saltedAgg]]. The
    // salt column name is namespaced to avoid clobbering a user `_salt`.
    val saltCol = "__graft_salt"
    require(!left.columns.contains(saltCol) && !right.columns.contains(saltCol),
      s"input already has a $saltCol column")
    val hashable = left.schema.fields.collect {
      case f if !f.dataType.isInstanceOf[org.apache.spark.sql.types.MapType] => col(f.name)
    }.toIndexedSeq
    val saltInputs =
      if (spreadDuplicates) spark_partition_id().cast("long") +: hashable else hashable
    val l = left.withColumn(
      saltCol, pmod(xxhash64(saltInputs: _*), lit(saltBuckets.toLong)))
    val r = right.withColumn(
      saltCol, explode(array((0 until saltBuckets).map(l => lit(l.toLong)): _*)))
    l.join(r, Seq(key, saltCol)).drop(saltCol)
  }
}
