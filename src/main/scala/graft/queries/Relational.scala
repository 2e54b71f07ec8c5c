package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Q
import graft.core.{Agg, Tables}

/** Relational operator suite — SURVEY.md §2.2 (projection/filter), §2.3
  * (joins), §2.4 (aggregation), §2.5 (windows), §2.6 (sort/limit/set ops).
  *
  * Every query is deterministic end-to-end: total ORDER BY over the output
  * key set in both the Spark plan and the DuckDB oracle, aliased columns
  * matching exactly, and decimal-accumulator sums ([[graft.core.Agg]]) so
  * partial-aggregation trees hash-match a single-threaded oracle.
  *
  * Scale notes (100 TB design points): filters/projections push to the
  * parquet scan; small dims (region/nation) are broadcast explicitly; all
  * aggregates are partial+final hash aggregates (map-side combine); top-k
  * uses TakeOrderedAndProject (no global sort materialization).
  */
object Relational {

  private def t(s: SparkSession, d: String, n: String): DataFrame = Tables(s, d, n)

  val queries: Seq[Q] = Seq(
    // ---------------------------------------------------------- §2.2 scans/filters
    Q(
      "q_projection",
      (s, d) =>
        t(s, d, "customer")
          .select(col("c_custkey"), col("c_name"))
          .orderBy("c_custkey"),
      Some("SELECT c_custkey, c_name FROM customer ORDER BY c_custkey")
    ),
    Q(
      "q_project_all",
      (s, d) => t(s, d, "region").orderBy("r_regionkey"),
      Some("SELECT * FROM region ORDER BY r_regionkey")
    ),
    Q(
      "q_filter_eq",
      (s, d) =>
        t(s, d, "orders")
          .filter(col("o_orderstatus") === "F")
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
          .orderBy("o_orderkey"),
      Some(
        "SELECT o_orderkey, o_custkey, o_totalprice FROM orders WHERE o_orderstatus = 'F' ORDER BY o_orderkey")
    ),
    Q(
      "q_filter_conj",
      (s, d) =>
        t(s, d, "lineitem")
          .filter((col("l_returnflag") === "R" || col("l_linestatus") === "F") && col("l_quantity") > 30)
          .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"), col("l_returnflag"))
          .orderBy("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag"),
      Some(
        "SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag FROM lineitem " +
          "WHERE (l_returnflag = 'R' OR l_linestatus = 'F') AND l_quantity > 30 " +
          "ORDER BY l_orderkey, l_linenumber, l_quantity, l_returnflag"),
      headline = true
    ),
    Q(
      "q_filter_in",
      (s, d) =>
        t(s, d, "customer")
          .filter(col("c_mktsegment").isin("BUILDING", "AUTOMOBILE"))
          .select(col("c_custkey"), col("c_mktsegment"))
          .orderBy("c_custkey"),
      Some(
        "SELECT c_custkey, c_mktsegment FROM customer WHERE c_mktsegment IN ('BUILDING','AUTOMOBILE') ORDER BY c_custkey")
    ),
    Q(
      "q_filter_like",
      // `_` is a single-char wildcard (SURVEY §7.4 risk 4): 'b_ue%' matches
      // 'blue bolt' via the wildcard, not a literal underscore.
      (s, d) =>
        t(s, d, "part")
          .filter(col("p_name").like("b_ue%") || col("p_name").like("%gear"))
          .select(col("p_partkey"), col("p_name"))
          .orderBy("p_partkey"),
      Some(
        "SELECT p_partkey, p_name FROM part WHERE p_name LIKE 'b_ue%' OR p_name LIKE '%gear' ORDER BY p_partkey")
    ),
    Q(
      "q_filter_between",
      (s, d) =>
        t(s, d, "orders")
          .filter(
            col("o_totalprice").between(10000, 30000) &&
              col("o_orderpriority").isNotNull &&
              !(col("o_orderstatus") === "P"))
          .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
          .orderBy("o_orderkey"),
      Some(
        "SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders " +
          "WHERE o_totalprice BETWEEN 10000 AND 30000 AND o_orderpriority IS NOT NULL " +
          "AND NOT (o_orderstatus = 'P') ORDER BY o_orderkey")
    ),

    // ---------------------------------------------------------------- §2.3 joins
    Q(
      "q_join_inner",
      (s, d) =>
        t(s, d, "customer")
          .join(t(s, d, "orders"), col("c_custkey") === col("o_custkey"))
          .filter(col("o_totalprice") > 20000)
          .select(col("o_orderkey"), col("c_custkey"), col("c_name"), col("o_totalprice"))
          .orderBy("o_orderkey"),
      Some(
        "SELECT o_orderkey, c_custkey, c_name, o_totalprice FROM customer " +
          "JOIN orders ON c_custkey = o_custkey WHERE o_totalprice > 20000 ORDER BY o_orderkey")
    ),
    Q(
      "q_join_star",
      // Star join with explicit broadcast of the two small dims; fact-side
      // shuffle only on o_orderkey/c_custkey. Headline benchmark query.
      (s, d) => {
        val l = t(s, d, "lineitem")
        val o = t(s, d, "orders")
        val c = t(s, d, "customer")
        val n = broadcast(t(s, d, "nation"))
        val r = broadcast(t(s, d, "region"))
        l.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(c, col("o_custkey") === col("c_custkey"))
          .join(n, col("c_nationkey") === col("n_nationkey"))
          .join(r, col("n_regionkey") === col("r_regionkey"))
          .groupBy(col("r_name"))
          .agg(
            Agg.dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"),
            count(lit(1)).as("n_items"))
          .orderBy("r_name")
      },
      Some(
        "SELECT r_name, " +
          Agg.dsumSql("l_extendedprice * (1 - l_discount)") + " AS revenue, " +
          "CAST(COUNT(*) AS BIGINT) AS n_items " +
          "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
          "JOIN customer ON o_custkey = c_custkey " +
          "JOIN nation ON c_nationkey = n_nationkey " +
          "JOIN region ON n_regionkey = r_regionkey " +
          "GROUP BY r_name ORDER BY r_name"),
      headline = true
    ),
    Q(
      "q_join_left",
      (s, d) =>
        t(s, d, "customer")
          .join(t(s, d, "orders"), col("c_custkey") === col("o_custkey"), "left_outer")
          .groupBy(col("c_custkey"))
          .agg(count(col("o_orderkey")).as("n_orders"))
          .orderBy("c_custkey"),
      Some(
        "SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS n_orders FROM customer " +
          "LEFT JOIN orders ON c_custkey = o_custkey GROUP BY c_custkey ORDER BY c_custkey")
    ),
    Q(
      "q_join_full",
      (s, d) => {
        val cc = t(s, d, "customer")
          .groupBy(col("c_nationkey").as("nk"))
          .agg(count(lit(1)).as("ncust"))
        val ss = t(s, d, "supplier")
          .groupBy(col("s_nationkey").as("nk"))
          .agg(count(lit(1)).as("nsupp"))
        cc.join(ss, Seq("nk"), "full_outer")
          .select(col("nk"), col("ncust"), col("nsupp"))
          .orderBy("nk")
      },
      Some(
        "SELECT COALESCE(c.nk, s.nk) AS nk, c.ncust, s.nsupp FROM " +
          "(SELECT c_nationkey AS nk, CAST(COUNT(*) AS BIGINT) AS ncust FROM customer GROUP BY 1) c " +
          "FULL JOIN " +
          "(SELECT s_nationkey AS nk, CAST(COUNT(*) AS BIGINT) AS nsupp FROM supplier GROUP BY 1) s " +
          "ON c.nk = s.nk ORDER BY nk")
    ),
    Q(
      "q_join_semi",
      (s, d) =>
        t(s, d, "customer")
          .join(
            t(s, d, "orders").filter(col("o_totalprice") > 30000),
            col("c_custkey") === col("o_custkey"),
            "left_semi")
          .select(col("c_custkey"), col("c_name"))
          .orderBy("c_custkey"),
      Some(
        "SELECT c_custkey, c_name FROM customer WHERE EXISTS " +
          "(SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 30000) " +
          "ORDER BY c_custkey")
    ),
    Q(
      "q_join_anti",
      // anti-join against a filtered build side (customers with no
      // high-value order) — non-empty at every scale factor.
      (s, d) =>
        t(s, d, "customer")
          .join(
            t(s, d, "orders").filter(col("o_totalprice") > 450000),
            col("c_custkey") === col("o_custkey"),
            "left_anti")
          .select(col("c_custkey"), col("c_name"))
          .orderBy("c_custkey"),
      Some(
        "SELECT c_custkey, c_name FROM customer WHERE NOT EXISTS " +
          "(SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 450000) " +
          "ORDER BY c_custkey")
    ),
    Q(
      "q_join_cross",
      (s, d) =>
        t(s, d, "region")
          .crossJoin(t(s, d, "nation"))
          .filter(col("r_regionkey") < col("n_regionkey"))
          .select(col("r_name"), col("n_name"))
          .orderBy("r_name", "n_name"),
      Some(
        "SELECT r_name, n_name FROM region CROSS JOIN nation " +
          "WHERE r_regionkey < n_regionkey ORDER BY r_name, n_name")
    ),
    Q(
      "q_join_range",
      // Equi + range predicate: items shipped more than 20 days after order.
      (s, d) =>
        t(s, d, "orders")
          .join(
            t(s, d, "lineitem"),
            col("l_orderkey") === col("o_orderkey") &&
              col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 20 DAYS"))
          .select(col("o_orderkey"), col("l_linenumber"), col("l_shipdate").cast("timestamp_ntz").as("l_shipdate"))
          .orderBy("o_orderkey", "l_linenumber", "l_shipdate"),
      Some(
        "SELECT o_orderkey, l_linenumber, CAST(l_shipdate AS TIMESTAMP) AS l_shipdate FROM orders JOIN lineitem " +
          "ON l_orderkey = o_orderkey AND l_shipdate > o_orderdate + INTERVAL 20 DAY " +
          "ORDER BY o_orderkey, l_linenumber, l_shipdate")
    ),

    // ----------------------------------------------------------- §2.4 aggregation
    Q(
      "q_count",
      (s, d) => t(s, d, "lineitem").agg(count(lit(1)).as("cnt")),
      Some("SELECT CAST(COUNT(*) AS BIGINT) AS cnt FROM lineitem")
    ),
    Q(
      "q_agg_pricing",
      // TPC-H Q1 flavor — the flagship hash aggregate. Partial+final agg with
      // map-side combine; decimal accumulators for cross-engine determinism.
      (s, d) =>
        t(s, d, "lineitem")
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            Agg.dsum(col("l_quantity")).as("sum_qty"),
            Agg.dsum(col("l_extendedprice")).as("sum_base"),
            Agg.dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("sum_disc"),
            Agg.dsum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax")))
              .as("sum_charge"),
            Agg.davg(col("l_quantity")).as("avg_qty"),
            Agg.davg(col("l_extendedprice")).as("avg_price"),
            min(col("l_quantity")).as("min_qty"),
            max(col("l_quantity")).as("max_qty"),
            count(lit(1)).as("count_order"))
          .orderBy("l_returnflag", "l_linestatus"),
      Some(
        "SELECT l_returnflag, l_linestatus, " +
          Agg.dsumSql("l_quantity") + " AS sum_qty, " +
          Agg.dsumSql("l_extendedprice") + " AS sum_base, " +
          Agg.dsumSql("l_extendedprice * (1 - l_discount)") + " AS sum_disc, " +
          Agg.dsumSql("l_extendedprice * (1 - l_discount) * (1 + l_tax)") + " AS sum_charge, " +
          Agg.davgSql("l_quantity") + " AS avg_qty, " +
          Agg.davgSql("l_extendedprice") + " AS avg_price, " +
          "MIN(l_quantity) AS min_qty, MAX(l_quantity) AS max_qty, " +
          "CAST(COUNT(*) AS BIGINT) AS count_order " +
          "FROM lineitem GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus"),
      headline = true
    ),
    Q(
      "q_distinct",
      (s, d) =>
        t(s, d, "lineitem")
          .select(col("l_returnflag"), col("l_linestatus"))
          .distinct()
          .orderBy("l_returnflag", "l_linestatus"),
      Some(
        "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem ORDER BY l_returnflag, l_linestatus")
    ),
    Q(
      "q_count_distinct",
      (s, d) =>
        t(s, d, "orders")
          .groupBy(col("o_orderstatus"))
          .agg(countDistinct(col("o_custkey")).as("n_cust"), count(lit(1)).as("n_ord"))
          .orderBy("o_orderstatus"),
      Some(
        "SELECT o_orderstatus, CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_cust, " +
          "CAST(COUNT(*) AS BIGINT) AS n_ord FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus")
    ),
    Q(
      "q_pivot",
      // Pivot aggregation with pinned pivot values (deterministic column
      // set — never let pivot discover values at scale, that's an extra
      // distinct pass over the fact table).
      (s, d) =>
        t(s, d, "lineitem")
          .groupBy(col("l_returnflag"))
          .pivot("l_linestatus", Seq("F", "O"))
          .agg(count(lit(1)))
          // absent combinations pivot to NULL; COUNT(CASE...) yields 0
          .select(
            col("l_returnflag"),
            coalesce(col("F"), lit(0L)).as("n_f"),
            coalesce(col("O"), lit(0L)).as("n_o"))
          .orderBy("l_returnflag"),
      Some(
        "SELECT l_returnflag, CAST(COUNT(CASE WHEN l_linestatus = 'F' THEN 1 END) AS BIGINT) AS n_f, " +
          "CAST(COUNT(CASE WHEN l_linestatus = 'O' THEN 1 END) AS BIGINT) AS n_o " +
          "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag")
    ),
    Q(
      "q_percentile",
      // Exact interpolated percentiles (both engines use type-7 linear
      // interpolation; the sorted-neighbor interpolation is a single
      // deterministic float expression).
      (s, d) =>
        t(s, d, "lineitem")
          .groupBy(col("l_returnflag"))
          .agg(
            expr("percentile(l_quantity, 0.25)").as("p25"),
            expr("percentile(l_quantity, 0.5)").as("p50"),
            expr("percentile(l_quantity, 0.75)").as("p75"),
            expr("percentile(l_extendedprice, 0.9)").as("price_p90"))
          .orderBy("l_returnflag"),
      Some(
        "SELECT l_returnflag, quantile_cont(l_quantity, 0.25) AS p25, " +
          "quantile_cont(l_quantity, 0.5) AS p50, quantile_cont(l_quantity, 0.75) AS p75, " +
          "quantile_cont(l_extendedprice, 0.9) AS price_p90 " +
          "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag")
    ),
    Q(
      "q_approx_distinct",
      // HLL++ sketch — the 100 TB path for distinct counts. The estimate
      // itself is sketch-parameterized, so the DRIVER-GATED output is the
      // invariant: the exact distinct count (a real differential vs the
      // oracle) plus the sketch's error contract reduced to a boolean —
      // rsd 0.01 means |est/exact − 1| sits far inside the 0.05 gate, and
      // a broken sketch implementation flips the flag.
      (s, d) =>
        t(s, d, "orders")
          .agg(
            countDistinct(col("o_custkey")).as("exact_cust"),
            approx_count_distinct(col("o_custkey"), 0.01).as("est"))
          .select(
            col("exact_cust"),
            (abs(col("est").cast("double") / col("exact_cust").cast("double") - 1.0) <= 0.05)
              .as("est_within_5pct")),
      Some(
        "SELECT CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS exact_cust, " +
          "true AS est_within_5pct FROM orders")
    ),
    Q(
      "q_approx_percentile",
      // Mergeable quantile sketch (approx_percentile, accuracy 10000) —
      // the 100 TB path for percentiles: partial sketches merge
      // associatively, so no global sort ever happens (q_percentile's
      // exact interpolation is the small-data oracle sibling). The sketch
      // value is accuracy-parameterized, so the gated output is the RANK
      // contract per group: the returned value's rank window must cover
      // p ± 0.01 (accuracy 10000 guarantees ±1e-4 — 100× margin). The
      // returned value is always a member of the data, so
      // count(x <= est)/n ≥ p − eps and count(x < est)/n ≤ p + eps is the
      // exact Greenwald-Khanna guarantee with duplicates handled.
      (s, d) => {
        val est = t(s, d, "lineitem")
          .groupBy(col("l_returnflag"))
          .agg(
            expr("approx_percentile(l_extendedprice, array(0.5, 0.95, 0.99), 10000)")
              .as("p"))
        def rankOk(i: Int, p: Double) =
          ((sum(when(col("l_extendedprice") <= col("p")(i), 1L).otherwise(0L))
            .cast("double") / count(lit(1)).cast("double") >= p - 0.01) &&
            (sum(when(col("l_extendedprice") < col("p")(i), 1L).otherwise(0L))
              .cast("double") / count(lit(1)).cast("double") <= p + 0.01))
        t(s, d, "lineitem")
          .select(col("l_returnflag"), col("l_extendedprice"))
          .join(broadcast(est), Seq("l_returnflag"))
          .groupBy(col("l_returnflag"))
          .agg(
            rankOk(0, 0.5).as("p50_rank_ok"),
            rankOk(1, 0.95).as("p95_rank_ok"),
            rankOk(2, 0.99).as("p99_rank_ok"))
          .orderBy("l_returnflag")
      },
      Some(
        "SELECT l_returnflag, true AS p50_rank_ok, true AS p95_rank_ok, " +
          "true AS p99_rank_ok FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag")
    ),
    Q(
      "q_string_agg",
      (s, d) =>
        t(s, d, "customer")
          .groupBy(col("c_nationkey"))
          .agg(array_join(array_sort(collect_list(col("c_name"))), ",").as("names_csv"))
          .orderBy("c_nationkey"),
      Some(
        "SELECT c_nationkey, STRING_AGG(c_name, ',' ORDER BY c_name) AS names_csv " +
          "FROM customer GROUP BY c_nationkey ORDER BY c_nationkey")
    ),
    Q(
      "q_rollup",
      (s, d) =>
        t(s, d, "lineitem")
          .rollup(col("l_returnflag"), col("l_linestatus"))
          .agg(count(lit(1)).as("cnt"), Agg.dsum(col("l_quantity")).as("sum_qty"))
          .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first),
      Some(
        "SELECT l_returnflag, l_linestatus, CAST(COUNT(*) AS BIGINT) AS cnt, " +
          Agg.dsumSql("l_quantity") + " AS sum_qty FROM lineitem " +
          "GROUP BY ROLLUP (l_returnflag, l_linestatus) " +
          "ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST")
    ),
    Q(
      "q_cube",
      (s, d) =>
        t(s, d, "orders")
          .cube(col("o_orderstatus"), col("o_orderpriority"))
          .agg(count(lit(1)).as("cnt"), Agg.dsum(col("o_totalprice")).as("sum_price"))
          .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first),
      Some(
        "SELECT o_orderstatus, o_orderpriority, CAST(COUNT(*) AS BIGINT) AS cnt, " +
          Agg.dsumSql("o_totalprice") + " AS sum_price FROM orders " +
          "GROUP BY CUBE (o_orderstatus, o_orderpriority) " +
          "ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST")
    ),
    Q(
      "q_grouping_sets",
      (s, d) => {
        t(s, d, "lineitem").createOrReplaceTempView("lineitem_gs")
        s.sql(
          "SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt FROM lineitem_gs " +
            "GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ()) " +
            "ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST")
      },
      Some(
        "SELECT l_returnflag, l_linestatus, CAST(COUNT(*) AS BIGINT) AS cnt FROM lineitem " +
          "GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ()) " +
          "ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST")
    ),

    // --------------------------------------------------------------- §2.5 windows
    Q(
      "q_window_rank",
      // The segment-partitioned ranks are ordinary parallel windows; the
      // global NTILE(4) is NOT `ntile().over(Window.orderBy(...))` — that
      // plan funnels the whole table through one WindowExec task. It is
      // the two-pass range-partitioned rank (core/Ranks.globalNtile):
      // gidx via a reused range exchange, then tile = pure expression of
      // (gidx, N). Same SQL NTILE semantics (DuckDB oracle agrees
      // hash-exact), no single-partition operator anywhere in the plan
      // (PlanAuditSpec pins it).
      (s, d) => {
        val w = Window.partitionBy(col("c_mktsegment")).orderBy(col("c_acctbal").desc, col("c_custkey"))
        val base = t(s, d, "customer")
          .select(
            col("c_custkey"),
            col("c_mktsegment"),
            col("c_acctbal"),
            row_number().over(w).as("rn"),
            rank().over(w).as("rnk"),
            dense_rank().over(w).as("drnk"),
            percent_rank().over(w).as("pct_rnk"),
            cume_dist().over(w).as("cume"))
        graft.core.Ranks
          .globalNtile(base, Seq(col("c_custkey")), 4, s.sparkContext.defaultParallelism)
          .withColumn("quartile", col("__ntile").cast("int"))
          .select(
            col("c_custkey"), col("c_mktsegment"), col("c_acctbal"),
            col("rn"), col("rnk"), col("drnk"), col("quartile"),
            col("pct_rnk"), col("cume"))
          .orderBy("c_custkey")
      },
      Some(
        "SELECT c_custkey, c_mktsegment, c_acctbal, " +
          "CAST(ROW_NUMBER() OVER w AS INT) AS rn, CAST(RANK() OVER w AS INT) AS rnk, " +
          "CAST(DENSE_RANK() OVER w AS INT) AS drnk, " +
          "CAST(NTILE(4) OVER (ORDER BY c_custkey) AS INT) AS quartile, " +
          "PERCENT_RANK() OVER w AS pct_rnk, CUME_DIST() OVER w AS cume " +
          "FROM customer WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) " +
          "ORDER BY c_custkey")
    ),
    Q(
      "q_window_lag",
      (s, d) => {
        val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
        t(s, d, "orders")
          .select(
            col("o_custkey"),
            col("o_orderkey"),
            col("o_totalprice"),
            lag(col("o_totalprice"), 1).over(w).as("prev_price"),
            lead(col("o_totalprice"), 1).over(w).as("next_price"),
            first_value(col("o_totalprice"))
              .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
              .as("first_price"))
          .orderBy("o_custkey", "o_orderkey")
      },
      Some(
        "SELECT o_custkey, o_orderkey, o_totalprice, " +
          "LAG(o_totalprice, 1) OVER w AS prev_price, " +
          "LEAD(o_totalprice, 1) OVER w AS next_price, " +
          "FIRST_VALUE(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey " +
          "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_price " +
          "FROM orders WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) " +
          "ORDER BY o_custkey, o_orderkey"),
      headline = true
    ),
    Q(
      "q_window_frame",
      // Frames need a TOTAL order to be deterministic — o_orderkey is
      // unique within each customer partition (lineitem's (orderkey,
      // linenumber) is not unique in this dataset).
      (s, d) => {
        import org.apache.spark.sql.types.DoubleType
        val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderkey"))
        val running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val moving = w.rowsBetween(-1, 1)
        // fixed-point window sums — same recipe as Agg.dsum (see Agg docs;
        // graft_sum128 is the accumulator here too)
        val fx = round(col("o_totalprice") * 10000).cast("long")
        def s128(frame: org.apache.spark.sql.expressions.WindowSpec) =
          call_function("graft_sum128", fx).over(frame).cast(DoubleType) / 10000
        t(s, d, "orders")
          .select(
            col("o_custkey"),
            col("o_orderkey"),
            col("o_totalprice"),
            s128(running).as("run_total"),
            (s128(moving) / count(col("o_totalprice")).over(moving)).as("mov_avg_total"))
          .orderBy("o_custkey", "o_orderkey")
      },
      Some(
        "SELECT o_custkey, o_orderkey, o_totalprice, " +
          "(CAST(SUM(CAST(ROUND(o_totalprice * 10000) AS HUGEINT)) OVER run AS DOUBLE) / 10000) AS run_total, " +
          "((CAST(SUM(CAST(ROUND(o_totalprice * 10000) AS HUGEINT)) OVER mov AS DOUBLE) / 10000) / COUNT(o_totalprice) OVER mov) AS mov_avg_total " +
          "FROM orders WINDOW " +
          "run AS (PARTITION BY o_custkey ORDER BY o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), " +
          "mov AS (PARTITION BY o_custkey ORDER BY o_orderkey ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING) " +
          "ORDER BY o_custkey, o_orderkey")
    ),
    Q(
      "q_window_nth",
      // nth_value over the full partition frame: per customer, the top
      // and second-highest order price (1-based nth, NULL when the
      // customer has a single order) — the "runner-up" analytics shape.
      // Unique (price desc, orderkey) tiebreak keeps both engines'
      // nth choice identical.
      (s, d) => {
        val ord = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        val full = ord.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        t(s, d, "orders")
          .select(
            col("o_custkey"),
            row_number().over(ord).as("rn"),
            first(col("o_totalprice")).over(full).as("top_price"),
            nth_value(col("o_totalprice"), 2).over(full).as("second_price"))
          .filter(col("rn") === 1)
          .select(col("o_custkey"), col("top_price"), col("second_price"))
          .orderBy("o_custkey")
      },
      Some(
        "SELECT o_custkey, top_price, second_price FROM (" +
          "SELECT o_custkey, ROW_NUMBER() OVER w AS rn, " +
          "FIRST_VALUE(o_totalprice) OVER wf AS top_price, " +
          "NTH_VALUE(o_totalprice, 2) OVER wf AS second_price " +
          "FROM orders WINDOW " +
          "w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey), " +
          "wf AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey " +
          "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)) t " +
          "WHERE rn = 1 ORDER BY o_custkey")
    ),

    // -------------------------------------------------- §2.6 sort/limit/set ops
    Q(
      "q_topk",
      // orderBy+limit compiles to TakeOrderedAndProject: per-partition heap +
      // driver merge of k rows — no global sort at any scale.
      (s, d) =>
        t(s, d, "orders")
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
          .limit(10),
      Some(
        "SELECT o_orderkey, o_custkey, o_totalprice FROM orders " +
          "ORDER BY o_totalprice DESC, o_orderkey LIMIT 10"),
      headline = true
    ),
    Q(
      "q_sort_multi",
      (s, d) =>
        t(s, d, "lineitem")
          .select(col("l_orderkey"), col("l_linenumber"), col("l_shipdate").cast("timestamp_ntz").as("l_shipdate"))
          .orderBy(col("l_shipdate").desc, col("l_orderkey"), col("l_linenumber"))
          .limit(100),
      Some(
        "SELECT l_orderkey, l_linenumber, l_shipdate FROM lineitem " +
          "ORDER BY l_shipdate DESC, l_orderkey, l_linenumber LIMIT 100")
    ),
    Q(
      "q_union_all",
      // bag-semantics union (Spark union == SQL UNION ALL)
      (s, d) =>
        t(s, d, "customer")
          .select(col("c_nationkey").as("nk"), lit("cust").as("src"))
          .union(t(s, d, "supplier").select(col("s_nationkey").as("nk"), lit("supp").as("src")))
          .groupBy(col("nk"), col("src"))
          .agg(count(lit(1)).as("n"))
          .orderBy("nk", "src"),
      Some(
        "SELECT nk, src, CAST(COUNT(*) AS BIGINT) AS n FROM (" +
          "SELECT c_nationkey AS nk, 'cust' AS src FROM customer " +
          "UNION ALL SELECT s_nationkey AS nk, 'supp' AS src FROM supplier) " +
          "GROUP BY nk, src ORDER BY nk, src")
    ),
    Q(
      "q_union",
      (s, d) =>
        t(s, d, "customer")
          .select(col("c_nationkey").as("nk"))
          .union(t(s, d, "supplier").select(col("s_nationkey").as("nk")))
          .distinct()
          .orderBy("nk"),
      Some(
        "SELECT c_nationkey AS nk FROM customer UNION SELECT s_nationkey FROM supplier ORDER BY nk")
    ),
    Q(
      "q_intersect",
      (s, d) =>
        t(s, d, "customer")
          .select(col("c_nationkey").as("nk"))
          .intersect(t(s, d, "supplier").select(col("s_nationkey").as("nk")))
          .orderBy("nk"),
      Some(
        "SELECT c_nationkey AS nk FROM customer INTERSECT SELECT s_nationkey FROM supplier ORDER BY nk")
    ),
    Q(
      "q_salted_agg",
      // The skew-mitigation path under the differential gate: two-stage
      // salted aggregation (graft.engine.Skew) must produce bit-identical
      // results to a direct GROUP BY — partial fixed-point sums + counts
      // per (key, salt), exact integer merge per key. The oracle is the
      // plain one-stage SQL: algebra preservation IS the claim.
      (s, d) => {
        import org.apache.spark.sql.types.{DecimalType, DoubleType}
        graft.engine.Skew
          .saltedAgg(
            t(s, d, "lineitem").select(col("l_returnflag"), col("l_quantity")),
            keys = Seq("l_returnflag"),
            saltBuckets = 8,
            partials = Seq(
              call_function("graft_sum128", round(col("l_quantity") * 10000).cast("long")).as("psum"),
              count(lit(1)).as("pn")),
            merges = Seq(sum(col("psum")).as("ssum"), sum(col("pn")).as("n")))
          .select(
            col("l_returnflag"),
            (col("ssum").cast(DoubleType) / 10000).as("sum_qty"),
            col("n"))
          .orderBy("l_returnflag")
      },
      Some(
        "SELECT l_returnflag, " + graft.core.Agg.dsumSql("l_quantity") + " AS sum_qty, " +
          "CAST(COUNT(*) AS BIGINT) AS n FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag")
    ),
    Q(
      "q_salted_join",
      // Salted skew-join (graft.engine.Skew.saltedJoin): the fact side
      // spreads each join key over 8 salt buckets, the dim side is
      // replicated ×8, and the join runs on (key, salt) — exactness vs
      // the plain join is the oracle's claim, the same algebra-
      // preservation statement as q_salted_agg. Reach for this when one
      // key dominates and AQE skew-split can't apply.
      (s, d) => {
        val li = t(s, d, "lineitem").select(col("l_orderkey"), col("l_quantity"))
        val o = t(s, d, "orders")
          .select(col("o_orderkey").as("l_orderkey"), col("o_orderstatus"))
        graft.engine.Skew
          .saltedJoin(li, o, "l_orderkey", saltBuckets = 8)
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n"), graft.core.Agg.dsum(col("l_quantity")).as("sum_qty"))
          .orderBy("o_orderstatus")
      },
      Some(
        "SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n, " +
          graft.core.Agg.dsumSql("l_quantity") + " AS sum_qty " +
          "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
          "GROUP BY o_orderstatus ORDER BY o_orderstatus")
    ),
    Q(
      "q_bitmap_distinct",
      // EXACT mergeable distinct counts via bitmap aggregates (the
      // roaring-bitmap pattern): per (flag, bucket) bitmaps OR-merge both
      // upward (corpus row) and sideways (per flag) without rescanning —
      // the exact counterpart of the HLL sketch column (q_hll_union),
      // for when the distinct space is dense integers and exactness is
      // required. Verified against plain COUNT(DISTINCT) — merge
      // losslessness IS the oracle claim.
      (s, d) => {
        val li = t(s, d, "lineitem").select(col("l_returnflag").as("flag"), col("l_partkey"))
        val bm = li
          .groupBy(col("flag"), expr("bitmap_bucket_number(l_partkey)").as("bucket"))
          .agg(expr("bitmap_construct_agg(bitmap_bit_position(l_partkey))").as("bm"))
        val perFlag = bm.groupBy(col("flag"))
          .agg(sum(expr("bitmap_count(bm)")).as("n_distinct"))
        val overall = bm
          .groupBy(col("bucket"))
          .agg(expr("bitmap_or_agg(bm)").as("bm"))
          .agg(sum(expr("bitmap_count(bm)")).as("n_distinct"))
          .select(lit("__all__").as("flag"), col("n_distinct"))
        perFlag.unionByName(overall).orderBy("flag")
      },
      Some(
        "SELECT flag, n_distinct FROM (" +
          "SELECT l_returnflag AS flag, CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_distinct " +
          "FROM lineitem GROUP BY 1 " +
          "UNION ALL SELECT '__all__', CAST(COUNT(DISTINCT l_partkey) AS BIGINT) FROM lineitem) t " +
          "ORDER BY flag")
    ),
    Q(
      "q_unpivot",
      // Wide→long melt (the inverse of q_pivot): three measure columns
      // into (metric, val) rows via the native unpivot operator, then a
      // deterministic per-metric rollup. Oracle states the same melt as
      // UNION ALL — dialect-free and value-identical.
      (s, d) =>
        t(s, d, "lineitem")
          .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"), col("l_discount"), col("l_tax"))
          .unpivot(
            Array(col("l_orderkey"), col("l_linenumber")),
            Array(col("l_quantity"), col("l_discount"), col("l_tax")),
            "metric", "val")
          .groupBy(col("metric"))
          .agg(graft.core.Agg.dsum(col("val")).as("total"), count(lit(1)).as("n"))
          .orderBy("metric"),
      Some(
        "WITH u AS (SELECT 'l_quantity' AS metric, l_quantity AS val FROM lineitem " +
          "UNION ALL SELECT 'l_discount', l_discount FROM lineitem " +
          "UNION ALL SELECT 'l_tax', l_tax FROM lineitem) " +
          "SELECT metric, " + graft.core.Agg.dsumSql("val") + " AS total, " +
          "CAST(COUNT(*) AS BIGINT) AS n FROM u GROUP BY metric ORDER BY metric")
    ),
    Q(
      "q_except",
      (s, d) =>
        t(s, d, "customer")
          .select(col("c_nationkey").as("nk"))
          .except(t(s, d, "supplier").select(col("s_nationkey").as("nk")))
          .orderBy("nk"),
      Some(
        "SELECT c_nationkey AS nk FROM customer EXCEPT SELECT s_nationkey FROM supplier ORDER BY nk")
    )
  )
}
