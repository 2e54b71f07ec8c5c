package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

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
  *   3. per-partition counts → running-sum offsets (a window over P rows,
  *      not the corpus) broadcast back; gidx = offset + sequence.
  *
  * Both consumers hang off the SAME range exchange, which the planner
  * dedupes to a reused stage at runtime (PlanAuditSpec executes and
  * asserts), so the input shuffles exactly once. The caller must pass a
  * TOTAL order (unique sort key) for the rank to be well-defined. The
  * 33-bit in-partition sequence caps a partition at 8.6 G rows — any sane
  * P keeps partitions far below that.
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
          sum(col("__bt")).over(
            Window.orderBy(col("__blk")).rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select(col("__blk"), col("__boff"))
    inBlock
      .join(broadcast(offsets), "__blk")
      .withColumn("cum_before", col("__boff") + col("__cin"))
      .drop("__v", "__blk", "__cin", "__boff")
  }

  /** Append a dense 0-based `gidx` column ranking `df` by `sortCols`. */
  def globalIndex(df: DataFrame, sortCols: Seq[org.apache.spark.sql.Column], p: Int): DataFrame = {
    val passthrough = df.columns.map(col).toSeq
    val sorted = df
      .repartitionByRange(p, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
      .select(
        passthrough :+ spark_partition_id().as("__pid")
          :+ monotonically_increasing_id().as("__mid"): _*)
    val offsets = sorted
      .groupBy(col("__pid"))
      .agg(count(lit(1)).as("__cnt"))
      .withColumn(
        "__off",
        coalesce(
          sum(col("__cnt")).over(
            Window.orderBy(col("__pid")).rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select(col("__pid"), col("__off"))
    sorted
      .join(broadcast(offsets), "__pid")
      .withColumn(
        "gidx",
        col("__off") + (col("__mid") - col("__pid").cast("long") * lit(8589934592L)))
      .drop("__pid", "__mid", "__cnt", "__off")
  }
}
