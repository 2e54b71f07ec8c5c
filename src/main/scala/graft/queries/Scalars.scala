package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Q
import graft.core.Tables

/** Scalar-function surface — SURVEY.md §2.7. Everything here is a built-in
  * codegen'd Catalyst expression (no UDFs): string ops, date arithmetic,
  * conditional CASE chains, base64, path manipulation, JSON build.
  *
  * The reference's own scalar set (NULL-fix replace, identifier sanitize,
  * type-map CASE chain, path split, base64 — SURVEY §2.7 tier R) is
  * expressed over VALUES-shaped inputs so the DuckDB oracle can replay the
  * identical computation without any table dependency.
  */
object Scalars {

  private def t(s: SparkSession, d: String, n: String): DataFrame = Tables(s, d, n)

  /** MySQL DATA_TYPE samples covering every branch + quirk of the
    * reference's datatype_to_bq.py:6-14 precedence chain.
    */
  private val mysqlTypes = Seq(
    "int", "bigint", "smallint", "tinyint", "mediumint", "decimal", "float",
    "double", "datetime", "date", "timestamp", "time", "year", "varchar",
    "char", "text", "blob", "enum", "json", "point")

  private val dirtyIdents = Seq(
    "big id", "amount/total", "\"quoted\"", "a b/c", "plain", "trail ")

  private val paths = Seq(
    "exports/2024-01-01/users.csv",
    "schemas/2024-01-01/users.schema",
    "exports/2024-01-01/user__field_a.csv",
    "clean/csv/orders.csv",
    "readme.txt")

  val queries: Seq[Q] = Seq(
    Q(
      "q_scalar_string",
      (s, d) =>
        t(s, d, "part")
          .select(
            col("p_partkey"),
            upper(col("p_name")).as("uname"),
            split(col("p_name"), " ").getItem(0).as("word1"),
            substring(col("p_name"), 1, 3).as("pre3"),
            concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
            length(col("p_name")).cast("long").as("name_len"),
            regexp_replace(col("p_name"), "a", "@").as("subbed"),
            format_string("%s#%05d", col("p_brand"), col("p_partkey")).as("sku"))
          .orderBy("p_partkey"),
      Some(
        "SELECT p_partkey, UPPER(p_name) AS uname, string_split(p_name, ' ')[1] AS word1, " +
          "substring(p_name, 1, 3) AS pre3, concat_ws('|', p_brand, p_type) AS brand_type, " +
          "CAST(LENGTH(p_name) AS BIGINT) AS name_len, regexp_replace(p_name, 'a', '@', 'g') AS subbed, " +
          "printf('%s#%05d', p_brand, p_partkey) AS sku " +
          "FROM part ORDER BY p_partkey")
    ),
    Q(
      "q_scalar_date",
      (s, d) =>
        t(s, d, "orders")
          .select(
            col("o_orderkey"),
            year(col("o_orderdate")).cast("long").as("yr"),
            month(col("o_orderdate")).cast("long").as("mo"),
            dayofmonth(col("o_orderdate")).cast("long").as("dom"),
            date_trunc("month", col("o_orderdate")).cast("timestamp_ntz").as("month_start"),
            datediff(lit("1995-06-01").cast("date"), col("o_orderdate").cast("date"))
              .cast("long")
              .as("days_to_mid95"))
          .orderBy("o_orderkey"),
      Some(
        "SELECT o_orderkey, CAST(YEAR(o_orderdate) AS BIGINT) AS yr, " +
          "CAST(MONTH(o_orderdate) AS BIGINT) AS mo, CAST(DAY(o_orderdate) AS BIGINT) AS dom, " +
          "date_trunc('month', o_orderdate) AS month_start, " +
          "CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '1995-06-01') AS BIGINT) AS days_to_mid95 " +
          "FROM orders ORDER BY o_orderkey")
    ),
    Q(
      "q_scalar_math",
      (s, d) =>
        t(s, d, "lineitem")
          .select(
            col("l_orderkey"),
            col("l_linenumber"),
            abs(col("l_quantity") - 25).as("absdev"),
            floor(col("l_extendedprice")).cast("long").as("floor_price"),
            ceil(col("l_discount") * 100).cast("long").as("disc_pct"),
            sqrt(col("l_quantity")).as("sqrt_qty"),
            (col("l_orderkey") % 7).as("key_mod7"))
          .orderBy("l_orderkey", "l_linenumber", "absdev", "floor_price", "disc_pct", "sqrt_qty"),
      Some(
        "SELECT l_orderkey, l_linenumber, ABS(l_quantity - 25) AS absdev, " +
          "CAST(FLOOR(l_extendedprice) AS BIGINT) AS floor_price, " +
          "CAST(CEIL(l_discount * 100) AS BIGINT) AS disc_pct, " +
          "SQRT(l_quantity) AS sqrt_qty, l_orderkey % 7 AS key_mod7 " +
          "FROM lineitem ORDER BY l_orderkey, l_linenumber, absdev, floor_price, disc_pct, sqrt_qty")
    ),
    Q(
      "q_date_arith",
      // date arithmetic: day/month offsets, month-end, truncation round-trip
      (s, d) =>
        t(s, d, "orders")
          .select(
            col("o_orderkey"),
            date_add(col("o_orderdate").cast("date"), 30).as("plus30d"),
            add_months(col("o_orderdate").cast("date"), 2).as("plus2mo"),
            last_day(col("o_orderdate").cast("date")).as("month_end"),
            (col("o_orderdate").cast("date") - expr("INTERVAL 1 WEEK")).cast("date").as("minus1w"))
          .orderBy("o_orderkey"),
      Some(
        "SELECT o_orderkey, CAST(o_orderdate AS DATE) + 30 AS plus30d, " +
          "CAST(CAST(o_orderdate AS DATE) + INTERVAL 2 MONTH AS DATE) AS plus2mo, " +
          "last_day(CAST(o_orderdate AS DATE)) AS month_end, " +
          "CAST(CAST(o_orderdate AS DATE) - INTERVAL 1 WEEK AS DATE) AS minus1w " +
          "FROM orders ORDER BY o_orderkey")
    ),
    Q(
      "q_string_pad",
      (s, d) =>
        t(s, d, "nation")
          .select(
            col("n_nationkey"),
            lpad(col("n_name"), 20, "*").as("padded"),
            rpad(col("n_name"), 20, ".").as("rpadded"),
            trim(lit("  x  ")).as("trimmed"),
            reverse(col("n_name")).as("rev"))
          .orderBy("n_nationkey"),
      Some(
        "SELECT n_nationkey, lpad(n_name, 20, '*') AS padded, rpad(n_name, 20, '.') AS rpadded, " +
          "trim('  x  ') AS trimmed, reverse(n_name) AS rev FROM nation ORDER BY n_nationkey")
    ),
    Q(
      "q_levenshtein",
      // edit-distance near-dup on brand-blocked part-name pairs — the
      // string-metric dedup family, bounded buckets (no all-pairs).
      (s, d) => {
        val p = t(s, d, "part").select(col("p_partkey"), col("p_brand"), col("p_name"))
        val a = p.select(col("p_partkey").as("a_id"), col("p_brand"), col("p_name").as("a_name"))
        val b = p.select(col("p_partkey").as("b_id"), col("p_brand"), col("p_name").as("b_name"))
        a.join(b, Seq("p_brand"))
          .filter(col("a_id") < col("b_id"))
          .select(col("a_id"), col("b_id"), levenshtein(col("a_name"), col("b_name")).cast("long").as("lev"))
          .filter(col("lev") <= 3)
          .orderBy("a_id", "b_id")
      },
      Some(
        "SELECT a.p_partkey AS a_id, b.p_partkey AS b_id, " +
          "CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS lev " +
          "FROM part a JOIN part b ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey " +
          "WHERE levenshtein(a.p_name, b.p_name) <= 3 ORDER BY a_id, b_id")
    ),
    Q(
      "q_typemap_case",
      // The reference's entire type system as a CASE chain
      // (datatype_to_bq.py:6-14), quirks intact: DATETIME before DATE,
      // `INT` substring catching POINT, DECIMAL collapsing to FLOAT,
      // TIMESTAMP falling through to STRING.
      (s, d) => {
        import s.implicits._
        val up = upper(col("mysql_type"))
        mysqlTypes
          .toDF("mysql_type")
          .select(
            col("mysql_type"),
            when(up.contains("DATETIME"), "DATETIME")
              .when(up.contains("DATE"), "DATE")
              .when(up.contains("INT"), "INTEGER")
              .when(up.contains("FLOAT") || up.contains("DOUBLE") || up.contains("DECIMAL"), "FLOAT")
              .otherwise("STRING")
              .as("bq_type"))
          .orderBy("mysql_type")
      },
      Some(
        "SELECT mysql_type, CASE " +
          "WHEN UPPER(mysql_type) LIKE '%DATETIME%' THEN 'DATETIME' " +
          "WHEN UPPER(mysql_type) LIKE '%DATE%' THEN 'DATE' " +
          "WHEN UPPER(mysql_type) LIKE '%INT%' THEN 'INTEGER' " +
          "WHEN UPPER(mysql_type) LIKE '%FLOAT%' OR UPPER(mysql_type) LIKE '%DOUBLE%' " +
          "OR UPPER(mysql_type) LIKE '%DECIMAL%' THEN 'FLOAT' " +
          "ELSE 'STRING' END AS bq_type FROM (VALUES " +
          mysqlTypes.map(v => s"('$v')").mkString(", ") +
          ") AS t(mysql_type) ORDER BY mysql_type")
    ),
    Q(
      "q_sanitize",
      // Identifier sanitization exactly as the reference applies it
      // (csv-cleaner/main.py:37-38): space→_, /→_and_, quotes stripped.
      (s, d) => {
        import s.implicits._
        dirtyIdents
          .toDF("raw")
          .select(
            col("raw"),
            regexp_replace(
              regexp_replace(regexp_replace(col("raw"), " ", "_"), "/", "_and_"),
              "\"",
              "").as("sanitized"))
          .orderBy("raw")
      },
      Some(
        "SELECT raw, replace(replace(replace(raw, ' ', '_'), '/', '_and_'), '\"', '') AS sanitized " +
          "FROM (VALUES " + dirtyIdents.map(v => s"('${v.replace("'", "''")}')").mkString(", ") +
          ") AS t(raw) ORDER BY raw")
    ),
    Q(
      "q_base64",
      (s, d) =>
        t(s, d, "nation")
          .select(
            col("n_nationkey"),
            base64(col("n_name").cast("binary")).as("b64"),
            unbase64(base64(col("n_name").cast("binary"))).cast("string").as("roundtrip"))
          .orderBy("n_nationkey"),
      Some(
        "SELECT n_nationkey, to_base64(encode(n_name)) AS b64, " +
          "decode(from_base64(to_base64(encode(n_name)))) AS roundtrip " +
          "FROM nation ORDER BY n_nationkey")
    ),
    Q(
      "q_path_split",
      // The cleaner/importer's path algebra (os.path.split, [:-4], [-3:],
      // split('.')[0] — csv-cleaner/main.py:15,32, bq-importer/main.py:12-13)
      // as codegen'd expressions over VALUES.
      (s, d) => {
        import s.implicits._
        paths
          .toDF("path")
          .select(
            col("path"),
            regexp_extract(col("path"), "^(.*)/[^/]*$", 1).as("dirname"),
            regexp_extract(col("path"), "([^/]+)$", 1).as("basename"),
            split(regexp_extract(col("path"), "([^/]+)$", 1), "\\.").getItem(0).as("stem"),
            expr("right(path, 3)").as("last3"))
          .orderBy("path")
      },
      Some(
        "SELECT path, regexp_extract(path, '^(.*)/[^/]*$', 1) AS dirname, " +
          "regexp_extract(path, '([^/]+)$', 1) AS basename, " +
          "string_split(regexp_extract(path, '([^/]+)$', 1), '.')[1] AS stem, " +
          "right(path, 3) AS last3 FROM (VALUES " +
          paths.map(v => s"('$v')").mkString(", ") +
          ") AS t(path) ORDER BY path")
    ),
    Q(
      "q_explode",
      // generator/UDTF family: posexplode of a token array, differential
      // against DuckDB unnest + generate_subscripts.
      (s, d) =>
        t(s, d, "part")
          .select(col("p_partkey"), posexplode(split(col("p_name"), " ")).as(Seq("pos", "word")))
          .select(col("p_partkey"), col("pos").cast("long").as("pos"), col("word"))
          .orderBy("p_partkey", "pos"),
      Some(
        "SELECT p_partkey, CAST(generate_subscripts(string_split(p_name, ' '), 1) - 1 AS BIGINT) AS pos, " +
          "unnest(string_split(p_name, ' ')) AS word " +
          "FROM part ORDER BY p_partkey, pos")
    ),
    Q(
      "q_array_fns",
      // array scalar surface: contains / length / sorted / indexed access.
      (s, d) => {
        val words = split(col("p_name"), " ")
        t(s, d, "part")
          .select(
            col("p_partkey"),
            array_contains(words, "blue").as("has_blue"),
            size(words).cast("long").as("n_words"),
            array_join(array_sort(words), "_").as("sorted_words"),
            words.getItem(0).as("first_word"))
          .orderBy("p_partkey")
      },
      Some(
        "SELECT p_partkey, list_contains(string_split(p_name, ' '), 'blue') AS has_blue, " +
          "CAST(len(string_split(p_name, ' ')) AS BIGINT) AS n_words, " +
          "list_aggregate(list_sort(string_split(p_name, ' ')), 'string_agg', '_') AS sorted_words, " +
          "string_split(p_name, ' ')[1] AS first_word " +
          "FROM part ORDER BY p_partkey")
    ),
    Q(
      "q_json_build",
      // Schema-doc JSON build/parse (csv-cleaner/main.py:40-45 emit,
      // bq-importer/main.py:26 parse): to_json → get_json_object round-trip.
      (s, d) =>
        t(s, d, "region")
          .select(
            col("r_regionkey"),
            to_json(struct(col("r_name").as("name"), lit("STRING").as("type"))).as("doc"))
          .withColumn("parsed_name", get_json_object(col("doc"), "$.name"))
          .orderBy("r_regionkey"),
      Some(
        "SELECT r_regionkey, '{\"name\":\"' || r_name || '\",\"type\":\"STRING\"}' AS doc, " +
          "r_name AS parsed_name FROM region ORDER BY r_regionkey")
    ),
    Q(
      "q_conditional",
      (s, d) =>
        t(s, d, "orders")
          .select(
            col("o_orderkey"),
            when(col("o_totalprice") > 30000, "high")
              .when(col("o_totalprice") > 10000, "mid")
              .otherwise("low")
              .as("price_band"),
            coalesce(nullif(col("o_orderstatus"), lit("P")), lit("PENDING")).as("status_norm"),
            col("o_totalprice").cast("long").as("price_trunc"))
          .orderBy("o_orderkey"),
      Some(
        "SELECT o_orderkey, CASE WHEN o_totalprice > 30000 THEN 'high' " +
          "WHEN o_totalprice > 10000 THEN 'mid' ELSE 'low' END AS price_band, " +
          "COALESCE(NULLIF(o_orderstatus, 'P'), 'PENDING') AS status_norm, " +
          "CAST(TRUNC(o_totalprice) AS BIGINT) AS price_trunc " +
          "FROM orders ORDER BY o_orderkey")
    )
  )
}
