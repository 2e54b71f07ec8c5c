package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.Q
import graft.core.{Agg, Tables}

/** Storage-format breadth beyond parquet/CSV: ORC and JSON-lines
  * round-trips (round-6 widening). The reference's surface is
  * CSV-in/warehouse-out; a Spark-native engine additionally speaks the
  * columnar and semi-structured formats a lake actually contains, so each
  * query writes a real file set in the foreign format, reads it back, and
  * aggregates — the oracle computes the same result straight from the
  * parquet base table, proving the round-trip is lossless for longs,
  * doubles, strings and timestamps.
  *
  * Scale shape: format conversion is a narrow per-partition rewrite (no
  * shuffle); the audit aggregate is the usual partial+final hash-agg. ORC
  * arrives with the same vectorized reader + min/max-based predicate
  * pushdown as parquet, so the 100 TB story is unchanged by the format.
  */
object Formats {

  val queries: Seq[Q] = Seq(
    Q(
      "q_orc_roundtrip",
      // Parquet → ORC → aggregate. Timestamps cross the ORC boundary
      // (o_orderdate min/max below) — the type most formats corrupt.
      (s, d) => {
        val tmp = graft.core.Tmp.dir("graft_orc")
        Tables(s, d, "orders")
          .filter(col("o_totalprice") > 1000.0)
          .write.mode("overwrite").orc(tmp)
        s.read.orc(tmp)
          .groupBy(col("o_orderstatus"))
          .agg(
            count(lit(1)).as("n"),
            Agg.dsum(col("o_totalprice")).as("total_price"),
            min(col("o_orderdate")).as("first_date"),
            max(col("o_orderdate")).as("last_date"))
          .orderBy("o_orderstatus")
      },
      Some(
        "SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n, " +
          Agg.dsumSql("o_totalprice") + " AS total_price, " +
          "min(o_orderdate) AS first_date, max(o_orderdate) AS last_date " +
          "FROM orders WHERE o_totalprice > 1000.0 GROUP BY o_orderstatus ORDER BY o_orderstatus")
    ),
    Q(
      "q_jsonl_roundtrip",
      // Parquet → JSON lines (to_json per row, text sink) → schema-pinned
      // JSON source → aggregate. Doubles survive because Spark emits the
      // shortest round-trippable decimal form; the read side pins the
      // schema (no inference pass — at 100 TB schema inference is a full
      // extra scan).
      (s, d) => {
        val tmp = graft.core.Tmp.dir("graft_jsonl")
        Tables(s, d, "part")
          .select(to_json(struct(
            col("p_partkey"), col("p_brand"), col("p_retailprice"), col("p_size"))).as("value"))
          .write.mode("overwrite").text(tmp)
        s.read
          .schema("p_partkey BIGINT, p_brand STRING, p_retailprice DOUBLE, p_size INT")
          .json(tmp)
          .groupBy(col("p_brand"))
          .agg(
            count(lit(1)).as("n"),
            Agg.dsum(col("p_retailprice")).as("total_price"),
            max(col("p_size")).cast("long").as("max_size"))
          .orderBy("p_brand")
      },
      Some(
        "SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS n, " +
          Agg.dsumSql("p_retailprice") + " AS total_price, " +
          "CAST(max(p_size) AS BIGINT) AS max_size " +
          "FROM part GROUP BY p_brand ORDER BY p_brand")
    )
  )
}
