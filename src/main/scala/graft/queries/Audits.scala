package graft.queries

import org.apache.spark.sql.functions._

import graft.Q
import graft.core.Tables

/** Declarative data-quality expectations (the dbt-test / Deequ shape): a
  * constraint set — uniqueness, not-null, referential integrity, value
  * range, accepted set — evaluated in ONE pass plus one anti-join, each
  * emitting a violation count and a pass flag. This is the validation
  * gate a pipeline runs between ingest and load; the reference pipeline
  * loads blind (WRITE_TRUNCATE with no checks), so this is the guard a
  * production replacement adds first.
  *
  * Scale shape: the five scalar checks share a single scan (conditional
  * sums + one count-distinct); referential integrity is one anti-join
  * keyed on the FK. Output is one row per constraint regardless of data
  * size. One constraint (priority accepted-set) is deliberately too
  * narrow so the FAILING path is exercised, not just green checkmarks.
  */
object Audits {

  val queries: Seq[Q] = Seq(
    Q(
      "q_skew_profile",
      // Join-key skew profiler — the diagnostic you run BEFORE deciding
      // between a plain shuffle join, broadcast, or salting
      // (engine/Skew): per-key row counts reduced to one summary row of
      // exact numbers — key count, row count, max key size, interpolated
      // p50/p99 of the count distribution (type-7, bit-equal per
      // q_percentile), and skew_ratio = max/avg computed as one double
      // division of exact integers. Two hash aggregates (corpus → per-key
      // counts → 1 row); nothing key-cardinality-sized leaves the
      // executors. The reducer-stall criterion at 1000 executors is
      // skew_ratio ≫ 1 with max_cnt in the hundreds of millions — this
      // row is how a pipeline notices BEFORE the 4-hour stage.
      (s, d) => {
        val counts = Events.events(s, d)
          .groupBy(col("user_id")).agg(count(lit(1)).as("cnt"))
        counts
          .agg(
            count(lit(1)).as("n_keys"),
            sum(col("cnt")).as("n_rows"),
            max(col("cnt")).as("max_cnt"),
            expr("percentile(cnt, 0.5D)").as("p50_cnt"),
            expr("percentile(cnt, 0.99D)").as("p99_cnt"))
          .select(
            col("n_keys"), col("n_rows"), col("max_cnt"), col("p50_cnt"), col("p99_cnt"),
            ((col("max_cnt") * col("n_keys")).cast("double") / col("n_rows").cast("double"))
              .as("skew_ratio"))
      },
      Some(
        "WITH c AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS cnt FROM events GROUP BY user_id) " +
          "SELECT CAST(COUNT(*) AS BIGINT) AS n_keys, CAST(SUM(cnt) AS BIGINT) AS n_rows, " +
          "max(cnt) AS max_cnt, quantile_cont(cnt, 0.5) AS p50_cnt, quantile_cont(cnt, 0.99) AS p99_cnt, " +
          "CAST(max(cnt) * COUNT(*) AS DOUBLE) / CAST(SUM(cnt) AS DOUBLE) AS skew_ratio " +
          "FROM c")
    ),
    Q(
      "q_expectations",
      (s, d) => {
        val o = Tables(s, d, "orders")
        val scalars = o.agg(
          count(lit(1)).as("n"),
          countDistinct(col("o_orderkey")).as("n_keys"),
          sum(when(col("o_custkey").isNull, 1L).otherwise(0L)).as("null_cust"),
          sum(when(col("o_totalprice") < 0.0, 1L).otherwise(0L)).as("neg_price"),
          sum(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L).otherwise(0L))
            .as("bad_priority"))
        val fk = o
          .join(Tables(s, d, "customer"), o("o_custkey") === col("c_custkey"), "left_anti")
          .agg(count(lit(1)).as("fk_viol"))
        scalars
          .crossJoin(fk)
          .select(explode(array(
            struct(lit("o_custkey_fk_customer").as("constraint_name"), col("fk_viol").as("n_violations")),
            struct(lit("o_custkey_not_null").as("constraint_name"), col("null_cust").as("n_violations")),
            struct(lit("o_orderkey_unique").as("constraint_name"), (col("n") - col("n_keys")).as("n_violations")),
            struct(lit("o_orderpriority_in_set").as("constraint_name"), col("bad_priority").as("n_violations")),
            struct(lit("o_totalprice_nonnegative").as("constraint_name"), col("neg_price").as("n_violations"))))
            .as("c"))
          .select(
            col("c.constraint_name"),
            col("c.n_violations"),
            (col("c.n_violations") === 0L).as("pass"))
          .orderBy("constraint_name")
      },
      Some(
        "WITH a AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_keys, " +
          "CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_cust, " +
          "CAST(SUM(CASE WHEN o_totalprice < 0.0 THEN 1 ELSE 0 END) AS BIGINT) AS neg_price, " +
          "CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS bad_priority " +
          "FROM orders), " +
          "f AS (SELECT CAST(COUNT(*) AS BIGINT) AS fk_viol FROM orders o " +
          "LEFT JOIN customer c ON o.o_custkey = c.c_custkey WHERE c.c_custkey IS NULL), " +
          "u AS (SELECT 'o_custkey_fk_customer' AS constraint_name, fk_viol AS n_violations FROM f " +
          "UNION ALL SELECT 'o_custkey_not_null', null_cust FROM a " +
          "UNION ALL SELECT 'o_orderkey_unique', n - n_keys FROM a " +
          "UNION ALL SELECT 'o_orderpriority_in_set', bad_priority FROM a " +
          "UNION ALL SELECT 'o_totalprice_nonnegative', neg_price FROM a) " +
          "SELECT constraint_name, n_violations, n_violations = 0 AS pass " +
          "FROM u ORDER BY constraint_name")
    ),
    Q(
      "q_replica_checksum",
      // Replication-parity checksum — the audit the reference's
      // CloudSQL→BigQuery copy never runs: an order-independent per-group
      // row-set fingerprint both the source and the replica can compute
      // independently; equal (n_rows, checksum) per group proves the copy
      // row-for-row without moving data. Per-row hash = first 60 bits of
      // md5 over a '|'-joined canonical string of the integer/char
      // columns (md5 and integer→string are bit-identical across
      // engines; doubles are deliberately excluded from the canonical
      // form — their string form is not portable), summed mod 1e9+7 so
      // 600k-row groups stay far from BIGINT overflow. Scale shape: one
      // scan, one narrow hash-agg keyed on the group — the checksum is
      // mergeable (sum), so partials combine map-side like any sum.
      (s, d) => {
        val h = expr(
          "CAST(conv(substring(md5(concat_ws('|', " +
            "CAST(l_orderkey AS STRING), CAST(l_partkey AS STRING), " +
            "CAST(l_suppkey AS STRING), CAST(l_linenumber AS STRING), " +
            "l_returnflag, l_linestatus, CAST(CAST(l_quantity AS BIGINT) AS STRING))), " +
            "1, 15), 16, 10) AS BIGINT) % 1000000007")
        Tables(s, d, "lineitem")
          .groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("n_rows"), sum(h).as("checksum"))
          .orderBy("l_returnflag")
      },
      Some(
        "SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n_rows, " +
          "CAST(SUM(CAST(('0x' || substring(md5(concat_ws('|', " +
          "l_orderkey, l_partkey, l_suppkey, l_linenumber, " +
          "l_returnflag, l_linestatus, CAST(l_quantity AS BIGINT))), " +
          "1, 15)) AS BIGINT) % 1000000007) AS BIGINT) AS checksum " +
          "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag")
    )
  )
}
