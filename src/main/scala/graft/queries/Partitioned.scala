package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.Q
import graft.core.{Agg, Tables}

/** Partition-layout operators: the write-side partitioning strategy and the
  * read-side pruning it buys. At 100 TB the single highest-leverage layout
  * decision is partitioning fact tables by a date-derived key — a filter or
  * dim-join on that key then skips whole directories instead of reading and
  * discarding rows. Two pruning modes both verified here:
  *
  *   - STATIC partition pruning: a literal predicate on the partition
  *     column never touches excluded partitions' files;
  *   - DYNAMIC partition pruning (DPP): when the predicate lives on the
  *     OTHER side of a join (a filtered dim), Catalyst inserts a runtime
  *     subquery filter on the fact scan, reusing the join's broadcast —
  *     the fact side prunes at execution time without a manual IN-list.
  *
  * Plan shape enforced in PlanAuditSpec (`dynamicpruningexpression` on the
  * fact scan's PartitionFilters).
  */
object Partitioned {

  /** lineitem re-laid-out as a ship-month-partitioned table (the layout a
    * 100 TB warehouse would maintain as the canonical copy), in a fresh
    * temp dir per call. ~83 month partitions over the 1995-2001 range.
    */
  private def shipMonthLayout(s: org.apache.spark.sql.SparkSession, d: String): String = {
    val tmp = graft.core.Tmp.dir("graft_dpp")
    Tables(s, d, "lineitem")
      .withColumn("ship_ym", date_format(col("l_shipdate"), "yyyy-MM"))
      .write
      .mode("overwrite")
      .partitionBy("ship_ym")
      .parquet(tmp)
    tmp
  }

  val queries: Seq[Q] = Seq(
    Q(
      "q_partition_prune",
      // Dim-driven month filter over the partitioned fact: the month list
      // comes from a DIFFERENT table's scan (orders in 1997), so the fact
      // can only be pruned at runtime — this is the DPP path. The join is
      // a broadcast (12 dim rows) and the fact scan's PartitionFilters
      // carry the dynamic subquery. Output is a per-month rollup with the
      // fixed-point sum recipe.
      (s, d) => {
        val layout = shipMonthLayout(s, d)
        val fact = s.read.parquet(layout)
        val dim = Tables(s, d, "orders")
          .filter(year(col("o_orderdate")) === 1997)
          .select(date_format(col("o_orderdate"), "yyyy-MM").as("ym"))
          .distinct()
        fact
          .join(dim, fact("ship_ym") === dim("ym"))
          .groupBy(col("ship_ym"))
          .agg(
            count(lit(1)).as("n_rows"),
            Agg.dsum(col("l_quantity")).as("sum_qty"))
          .orderBy("ship_ym")
      },
      Some(
        "WITH dim AS (SELECT DISTINCT strftime(o_orderdate, '%Y-%m') AS ym FROM orders " +
          "WHERE year(o_orderdate) = 1997), " +
          "f AS (SELECT strftime(l_shipdate, '%Y-%m') AS ship_ym, l_quantity FROM lineitem) " +
          "SELECT ship_ym, CAST(COUNT(*) AS BIGINT) AS n_rows, " +
          Agg.dsumSql("l_quantity") + " AS sum_qty " +
          "FROM f JOIN dim ON f.ship_ym = dim.ym GROUP BY ship_ym ORDER BY ship_ym")
    ),
    Q(
      "q_zorder",
      // Z-order (Morton) clustering key: interleave the low 16 bits of two
      // dimensions so that range-sorting on ONE value co-locates rows that
      // are close in BOTH — the multi-dimensional data-skipping layout
      // (Delta/Iceberg OPTIMIZE ZORDER). The audit groups rows by coarse
      // z-bucket (top 6 bits) and shows each bucket spans a narrow range
      // of BOTH dimensions — the property that makes parquet min/max
      // pruning work on either filter column after a
      // repartitionByRange(zvalue) + sortWithinPartitions(zvalue) write.
      // Exact integer bit arithmetic — identical in any engine. The key
      // is computed by the codegen'd graft_zorder expression (magic-mask
      // Morton spread, graft.functions.ZOrder); ZOrderSpec pins it
      // bit-equal to the 16-term HOF fold the oracle mirrors.
      (s, d) => {
        Tables(s, d, "lineitem")
          .select(
            (col("l_partkey") % 65536).as("x"),
            (col("l_suppkey") % 65536).as("y"))
          .withColumn("zval", expr("graft_zorder(x, y)"))
          .groupBy((col("zval") / 67108864L).cast("long").as("z_bucket")) // top 6 of 32 bits
          .agg(
            count(lit(1)).as("n_rows"),
            min(col("x")).as("min_x"), max(col("x")).as("max_x"),
            min(col("y")).as("min_y"), max(col("y")).as("max_y"))
          .orderBy("z_bucket")
      },
      Some(
        "WITH b AS (SELECT l_partkey % 65536 AS x, l_suppkey % 65536 AS y FROM lineitem), " +
          "z AS (SELECT x, y, CAST(list_sum(list_transform(range(0, 16), i -> " +
          "(((x >> i) & 1) << (2*i)) + (((y >> i) & 1) << (2*i+1)))) AS BIGINT) AS zval FROM b) " +
          "SELECT CAST(zval // 67108864 AS BIGINT) AS z_bucket, CAST(COUNT(*) AS BIGINT) AS n_rows, " +
          "min(x) AS min_x, max(x) AS max_x, min(y) AS min_y, max(y) AS max_y " +
          "FROM z GROUP BY 1 ORDER BY 1")
    ),
    Q(
      "q_bucketed_join",
      // Co-located (bucketed) join: both sides are written `bucketBy(8,
      // orderkey)` + sortBy into managed tables, so each scan reports
      // hash-clustered output partitioning on the join key and the
      // sort-merge join — AND the orderkey rollup above it — need NO
      // shuffle at all (PlanAuditSpec asserts zero hashpartitioning
      // exchanges). This is the other canonical 100 TB layout lever next
      // to date partitioning: pre-bucket the fact and its biggest
      // co-joined table on the join key once at write time, and every
      // subsequent join/agg on that key skips its exchange entirely. The
      // merge hint keeps the demonstration honest at test sizes where the
      // dim side would otherwise broadcast.
      (s, d) => {
        s.sql("CREATE DATABASE IF NOT EXISTS graft_buckets")
        // The warehouse dir outlives the in-memory catalog across JVMs, so
        // a leftover table location turns overwrite into a failing CREATE;
        // drop through the catalog, then clear any orphaned location.
        for (t <- Seq("lineitem_b", "orders_b")) {
          s.sql(s"DROP TABLE IF EXISTS graft_buckets.$t")
          val loc = java.nio.file.Paths.get(
            new java.net.URI(s.conf.get("spark.sql.warehouse.dir")).getPath,
            "graft_buckets.db", t)
          if (java.nio.file.Files.exists(loc)) {
            import scala.jdk.CollectionConverters._
            java.nio.file.Files.walk(loc).iterator().asScala.toSeq.reverse
              .foreach(java.nio.file.Files.deleteIfExists(_))
          }
        }
        Tables(s, d, "lineitem")
          .select("l_orderkey", "l_quantity", "l_extendedprice")
          .write.mode("overwrite")
          .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
          .saveAsTable("graft_buckets.lineitem_b")
        Tables(s, d, "orders")
          .select("o_orderkey", "o_totalprice")
          .write.mode("overwrite")
          .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
          .saveAsTable("graft_buckets.orders_b")
        val l = s.table("graft_buckets.lineitem_b")
        val o = s.table("graft_buckets.orders_b")
        l.hint("merge")
          .join(o.hint("merge"), col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_orderkey"))
          .agg(
            count(lit(1)).as("n_items"),
            Agg.dsum(col("l_quantity")).as("sum_qty"),
            max(col("o_totalprice")).as("total_price"))
          .orderBy("o_orderkey")
      },
      Some(
        "SELECT o_orderkey, CAST(COUNT(*) AS BIGINT) AS n_items, " +
          Agg.dsumSql("l_quantity") + " AS sum_qty, " +
          "max(o_totalprice) AS total_price " +
          "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
          "GROUP BY o_orderkey ORDER BY o_orderkey")
    ),
    Q(
      "q_compaction",
      // Small-file compaction planner — the lakehouse maintenance op that
      // keeps a partitioned 100 TB table scannable (thousands of tiny
      // ingest files per partition wreck scan parallelism and NameNode /
      // object-store listing). The file inventory here is derived
      // deterministically from lineitem (one "file" per ship-month ×
      // orderkey-shard, sized by its row count); the plan assigns files
      // to target-sized rewrite bins with a running-sum window — bin =
      // floor((cumsum − size) / target) over files ordered largest-first
      // — so planning is ONE window pass over file METADATA (rows =
      // files, not data), and the rewrite that consumes it reads each
      // input file exactly once. No driver-side loop: at a million files
      // this is still a single shuffle keyed on the partition.
      (s, d) => {
        val target = 256.0
        val files = Tables(s, d, "lineitem")
          .groupBy(
            date_format(col("l_shipdate"), "yyyy-MM").as("ship_ym"),
            (col("l_orderkey") % 24).as("file_id"))
          .agg(count(lit(1)).as("size_kb"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("ship_ym"))
          .orderBy(col("size_kb").desc, col("file_id"))
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
        files
          .withColumn(
            "bin_id",
            floor((sum(col("size_kb")).over(w) - col("size_kb")) / target))
          .groupBy(col("ship_ym"), col("bin_id"))
          .agg(count(lit(1)).as("n_files"), sum(col("size_kb")).as("bin_kb"))
          .orderBy("ship_ym", "bin_id")
      },
      Some(
        "WITH files AS (SELECT strftime(l_shipdate, '%Y-%m') AS ship_ym, " +
          "l_orderkey % 24 AS file_id, CAST(COUNT(*) AS BIGINT) AS size_kb " +
          "FROM lineitem GROUP BY 1, 2), " +
          "b AS (SELECT ship_ym, size_kb, CAST(FLOOR((SUM(size_kb) OVER " +
          "(PARTITION BY ship_ym ORDER BY size_kb DESC, file_id ROWS UNBOUNDED PRECEDING) " +
          "- size_kb) / 256.0) AS BIGINT) AS bin_id FROM files) " +
          "SELECT ship_ym, bin_id, CAST(COUNT(*) AS BIGINT) AS n_files, " +
          "CAST(SUM(size_kb) AS BIGINT) AS bin_kb " +
          "FROM b GROUP BY 1, 2 ORDER BY 1, 2")
    )
  )
}
