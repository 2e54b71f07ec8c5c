package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Ckpt.TruncateOps

/** Dense global ordered ranking WITHOUT a one-partition window sort — the
  * distributed primitive behind `q_global_index` and the ring-based
  * sampling ops. `row_number() OVER (ORDER BY …)` is the plan that dies
  * first on a real corpus (one reducer sorts everything; measured 10.9×
  * slower than this at 9.6M rows, PLANS.md); this is the scale-safe form:
  *
  *   1. range-repartition on the sort key (EXPLICIT partition count so AQE
  *      never re-coalesces between the two consumers) + sort WITHIN each
  *      partition — Spark's own ORDER BY plan minus the final single
  *      reducer;
  *   2. per-partition sequence numbers from `monotonically_increasing_id`
  *      (partition ordinal in the upper bits, in-partition row number in
  *      the lower 33; both expressions nondeterministic, so Catalyst pins
  *      the Project above the Sort — evaluation happens in sorted order);
  *   3. the sorted+sequenced relation is eagerly checkpointed — ONE
  *      materialization of the one shuffle (see [[indexedCounted]] for
  *      why this is a correctness requirement, not a cache hint) — then
  *      per-partition counts collect to the driver (P rows, bounded
  *      state) and gidx = literal-map offset lookup + sequence.
  *
  * The caller must pass a TOTAL order (unique sort key) for the rank to
  * be well-defined. The 33-bit in-partition sequence caps a partition at
  * 8.6 G rows — any sane P keeps partitions far below that.
  */
object Ranks {

  /** Append `gidx` (dense 0-based global rank by `sortCols`) AND
    * `cum_before` (exclusive running sum of `valueCol` in that order) —
    * the distributed PREFIX SUM, built as a two-level Blelloch scan on
    * top of [[globalIndex]]:
    *
    *   1. gidx from the range-repartitioned two-pass (one corpus
    *      shuffle, reused exchange);
    *   2. rows block by `blk = gidx div blockSize`; the in-block
    *      exclusive prefix is a window PER BLOCK (hash exchange on
    *      n/blockSize well-distributed keys — each sort touches
    *      blockSize rows, never the corpus);
    *   3. per-block totals get their own running sum — a window over
    *      n/blockSize rows, then broadcast back as block offsets.
    *
    * `cum_before = block offset + in-block prefix`. Level-3's window is
    * one partition over n/blockSize rows: at 10¹² input rows and
    * blockSize 4096 that is 2.4·10⁸ block rows — the point where a
    * THIRD scan level applies (same construction, recursively); one
    * extra level covers any realistic corpus, so the depth is
    * effectively 2-3, not a parameter.
    */
  def globalRunningSum(
      df: DataFrame,
      sortCols: Seq[org.apache.spark.sql.Column],
      valueCol: org.apache.spark.sql.Column,
      p: Int,
      blockSize: Long = 4096L): DataFrame = {
    val indexed = globalIndex(df.withColumn("__v", valueCol.cast("long")), sortCols, p)
      .withColumn("__blk", expr(s"gidx div $blockSize"))
    val inBlock = indexed.withColumn(
      "__cin",
      coalesce(
        sum(col("__v")).over(
          Window.partitionBy(col("__blk")).orderBy(col("gidx"))
            .rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
    val offsets = indexed
      .groupBy(col("__blk")).agg(sum(col("__v")).as("__bt"))
      .withColumn(
        "__boff",
        coalesce(
          // n/blockSize block rows, never the corpus. pmod(blk, 1) ≡ 0
          // DECLARES the bounded single partition: identical execution
          // to an unpartitioned window without WindowExec's no-partition
          // warning on a frame that is small by construction (a plain
          // `* 0` or lit(0) key gets simplified away by the optimizer,
          // resurrecting the warning).
          sum(col("__bt")).over(
            Window.partitionBy(pmod(col("__blk"), lit(1L)))
              .orderBy(col("__blk")).rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select(col("__blk"), col("__boff"))
    inBlock
      .join(broadcast(offsets), "__blk")
      .withColumn("cum_before", col("__boff") + col("__cin"))
      .drop("__v", "__blk", "__cin", "__boff")
  }

  /** Append `__ntile` — exact SQL `NTILE(buckets) OVER (ORDER BY sortCols)`
    * semantics WITHOUT the one-partition window sort: gidx from the
    * range-repartitioned two-pass, then the tile is a pure per-row
    * expression of (gidx, N). SQL NTILE hands the first `N mod b` tiles
    * `ceil(N/b)` rows and the rest `floor(N/b)`:
    *
    *   q = N div b; r = N mod b; cut = r·(q+1)
    *   tile(gidx) = gidx div (q+1) + 1              if gidx < cut
    *              = r + (gidx − cut) div q + 1      otherwise
    *
    * The corpus shuffles once (the checkpointed [[indexedCounted]] core);
    * N falls out of the same P-row driver-side count that builds the
    * offsets, so there is no second aggregate over the corpus and no
    * window anywhere. Requires a total order on `sortCols` (ties make
    * NTILE nondeterministic on any engine).
    */
  def globalNtile(
      df: DataFrame,
      sortCols: Seq[org.apache.spark.sql.Column],
      buckets: Int,
      p: Int): DataFrame = {
    val (indexed, n) = indexedCounted(df, sortCols, p)
    val b = buckets.toLong
    val q = n / b
    val r = n % b
    val cut = r * (q + 1)
    // q=0 only when N < buckets, where every row has gidx < cut — the
    // otherwise branch is unreachable but must still be evaluable
    // (integer div-by-zero), hence the max(q,1) denominator. All four
    // constants are driver-side longs, so the tile is a pure codegen
    // expression over gidx.
    val qSafe = math.max(q, 1L)
    indexed.withColumn(
      "__ntile",
      when(col("gidx") < lit(cut), expr(s"gidx div ${q + 1}") + lit(1L))
        .otherwise(lit(r) + expr(s"(gidx - $cut) div $qSafe") + lit(1L)))
  }

  /** Append a dense 0-based `gidx` column ranking `df` by `sortCols`. */
  def globalIndex(df: DataFrame, sortCols: Seq[org.apache.spark.sql.Column], p: Int): DataFrame =
    indexedCounted(df, sortCols, p)._1

  /** The shared two-pass core: `(indexed frame with gidx, total row count)`.
    *
    * The sorted+sequenced relation is EAGERLY materialized
    * (`localCheckpoint`) before its consumers run. This is load-bearing
    * for correctness, not a cache hint: `repartitionByRange` SAMPLES its
    * range boundaries with an RDD-id-seeded generator, so if the offsets
    * branch and the data branch each re-execute the exchange (which
    * happens whenever column pruning makes the two subtrees canonically
    * different — any passthrough column not in `sortCols` does it), the
    * two executions see DIFFERENT partition boundaries and the offsets no
    * longer match the per-partition sequences: gidx silently loses
    * density (observed: 15 000 rows → 14 675 distinct gidx). Exchange
    * reuse repaired only the coincidental case where `sortCols` covered
    * every column. The checkpoint pins ONE materialization — the corpus
    * still shuffles exactly once — and the per-partition offsets then
    * come from a P-row count collected to the driver (bounded state, same
    * class as centroids/codebooks) and re-enter the plan as a literal
    * pid→offset map lookup: no window, no join, nothing left to re-plan.
    * On a multi-executor cluster `localCheckpoint` trades fault-tolerance
    * for speed (blocks die with an executor); a 100 TB run with long
    * stages sets `graft.checkpoint.dir` and this call site (like every
    * iterative kernel's — [[graft.core.Ckpt]]) switches to reliable
    * `checkpoint()` storage.
    */
  private[graft] def indexedCounted(
      df: DataFrame,
      sortCols: Seq[org.apache.spark.sql.Column],
      p: Int): (DataFrame, Long) = {
    val passthrough = df.columns.map(col).toSeq
    val sorted = df
      .repartitionByRange(p, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
      .select(
        passthrough :+ spark_partition_id().as("__pid")
          :+ monotonically_increasing_id().as("__mid"): _*)
      .truncateLineage()
    val counts = sorted
      .groupBy(col("__pid")).agg(count(lit(1)).as("__cnt"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    var acc = 0L
    val entries = Seq.newBuilder[org.apache.spark.sql.Column]
    counts.foreach { case (pid, c) => entries += lit(pid) += lit(acc); acc += c }
    val offLookup =
      if (counts.isEmpty) lit(0L) else element_at(map(entries.result(): _*), col("__pid"))
    val out = sorted
      .withColumn(
        "gidx",
        offLookup + (col("__mid") - col("__pid").cast("long") * lit(8589934592L)))
      .drop("__pid", "__mid")
    (out, acc)
  }
}
