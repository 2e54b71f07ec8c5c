package graft.queries

import org.apache.spark.sql.functions._

import graft.Q
import graft.core.{SchemaColumn, Tables}
import graft.pipeline.{Pipeline, SchemaFile}

/** Pipeline-operator queries — SURVEY.md §2.1 (sources/sinks) and the
  * tier-R control-flow operators: the canonical discovery predicate, the
  * suffix-dispatch router, the schema translation stage, and the full
  * export→clean→load path verified differentially against the untouched
  * source table.
  */
object PipelineQueries {

  /** Simulated `information_schema.tables` rows (no live MySQL in this
    * environment). Covers: exact IN match, literal `__` LIKE match, the
    * `_`-as-single-char-wildcard match, a near-miss that must NOT match,
    * and a schema-filter exclusion. (reference: README.md:27,
    * variables.tf:72-75)
    */
  val catalogRows: Seq[(String, String)] = Seq(
    ("users", "default"),
    ("users", "other_schema"),
    ("user__field_a", "default"),
    ("user__field_b", "default"),
    ("userXYfield_c", "default"),
    ("user_field_x", "default"),
    ("orders", "default"),
    ("events_archive", "default"))

  private def catalogValuesSql: String =
    "(VALUES " + catalogRows.map { case (t, s) => s"('$t','$s')" }.mkString(", ") +
      ") AS t(table_name, table_schema)"

  /** Arriving-object names for the suffix-dispatch router
    * (csv-cleaner/main.py:17, bq-importer/main.py:11).
    */
  val arrivals: Seq[String] = Seq(
    "exports/2024-01-01/users.csv",
    "exports/2024-01-01/user__field_a.csv",
    "schemas/2024-01-01/users.schema",
    "schemas/2024-01-01/user__field_a.schema",
    "tmp/notes.txt")

  /** FIXTURES.md §A1 — the exporter's `.schema` wire format. */
  val usersSchemaFixture: String =
    """"id","int"
      |"big id","bigint"
      |"amount/total","decimal"
      |"score","double"
      |"created_at","datetime"
      |"birth date","date"
      |"updated_at","timestamp"
      |"name","varchar"
      |"notes","text"
      |""".stripMargin

  /** Expected CORRECT-mode translation of A1: the quirks fixed —
    * decimal keeps NUMERIC, timestamp stays TIMESTAMP (SURVEY §7.4
    * correct-by-default decision; compat mode preserves the bugs).
    */
  val usersSchemaCorrectExpected: Seq[(Int, String, String, String)] = Seq(
    (1, "id", "INTEGER", "NULLABLE"),
    (2, "big_id", "INTEGER", "NULLABLE"),
    (3, "amount_and_total", "NUMERIC", "NULLABLE"),
    (4, "score", "FLOAT", "NULLABLE"),
    (5, "created_at", "DATETIME", "NULLABLE"),
    (6, "birth_date", "DATE", "NULLABLE"),
    (7, "updated_at", "TIMESTAMP", "NULLABLE"),
    (8, "name", "STRING", "NULLABLE"),
    (9, "notes", "STRING", "NULLABLE"))

  /** Expected compat-mode translation of A1 (FIXTURES §A2). */
  val usersSchemaExpected: Seq[(Int, String, String, String)] = Seq(
    (1, "id", "INTEGER", "NULLABLE"),
    (2, "big_id", "INTEGER", "NULLABLE"),
    (3, "amount_and_total", "FLOAT", "NULLABLE"),
    (4, "score", "FLOAT", "NULLABLE"),
    (5, "created_at", "DATETIME", "NULLABLE"),
    (6, "birth_date", "DATE", "NULLABLE"),
    (7, "updated_at", "STRING", "NULLABLE"),
    (8, "name", "STRING", "NULLABLE"),
    (9, "notes", "STRING", "NULLABLE"))

  private def tmpRoot(sfDir: String): String = {
    val tag = sfDir.replaceAll("[^A-Za-z0-9]", "_")
    s"${System.getProperty("java.io.tmpdir")}/graft_pipeline_$tag"
  }

  val queries: Seq[Q] = Seq(
    Q(
      "q_discovery",
      // The one query the reference README publishes (README.md:27):
      // (LIKE 'user__field%' OR IN('users')) AND table_schema = 'default'.
      // `_` is a single-char wildcard: 'userXYfield_c' matches too.
      (s, d) => {
        import s.implicits._
        catalogRows
          .toDF("table_name", "table_schema")
          .filter(
            (col("table_name").like("user__field%") || col("table_name").isin("users")) &&
              col("table_schema") === "default")
          .select(col("table_name"))
          .orderBy("table_name")
      },
      Some(
        "SELECT table_name FROM " + catalogValuesSql +
          " WHERE (table_name LIKE 'user__field%' OR table_name IN ('users')) " +
          "AND table_schema = 'default' ORDER BY table_name")
    ),
    Q(
      "q_tablelist",
      // The query-runner's publish payload: sorted comma-joined table list
      // (app/cloud-sql-query-runner/main.py:56-64).
      (s, d) => {
        import s.implicits._
        catalogRows
          .toDF("table_name", "table_schema")
          .filter(
            (col("table_name").like("user__field%") || col("table_name").isin("users")) &&
              col("table_schema") === "default")
          .agg(array_join(array_sort(collect_list(col("table_name"))), ",").as("payload"))
      },
      Some(
        "SELECT STRING_AGG(table_name, ',' ORDER BY table_name) AS payload FROM " +
          catalogValuesSql +
          " WHERE (table_name LIKE 'user__field%' OR table_name IN ('users')) " +
          "AND table_schema = 'default'")
    ),
    Q(
      "q_suffix_dispatch",
      (s, d) => {
        import s.implicits._
        arrivals
          .toDF("name")
          .select(
            col("name"),
            when(col("name").endsWith(".csv"), "clean_data")
              .when(col("name").endsWith(".schema"), "translate_schema")
              .otherwise("ignore")
              .as("route"))
          .orderBy("name")
      },
      Some(
        "SELECT name, CASE WHEN name LIKE '%.csv' THEN 'clean_data' " +
          "WHEN name LIKE '%.schema' THEN 'translate_schema' ELSE 'ignore' END AS route " +
          "FROM (VALUES " + arrivals.map(a => s"('$a')").mkString(", ") +
          ") AS t(name) ORDER BY name")
    ),
    Q(
      "q_schema_translate",
      // Stage-2 schema translation over the FIXTURES A1 fixture, end to end
      // through the real SchemaFile reader + SchemaDoc codec.
      (s, d) => {
        import s.implicits._
        val root = tmpRoot(d)
        val path = s"$root/fixtures/users.schema"
        SchemaFile.writeText(s, path, usersSchemaFixture)
        val cols = SchemaFile.read(s, path)
        val fields = graft.core.SchemaDoc.fromColumns(cols, compat = true)
        fields.zipWithIndex
          .map { case (f, i) => (i + 1, f.name, f.tpe.name, "NULLABLE") }
          .toDF("ordinal", "name", "bq_type", "mode")
          .orderBy("ordinal")
      },
      Some(
        "SELECT * FROM (VALUES " +
          usersSchemaExpected
            .map { case (o, n, t, m) => s"($o,'$n','$t','$m')" }
            .mkString(", ") +
          ") AS t(ordinal, name, bq_type, mode) ORDER BY ordinal")
    ),
    Q(
      "q_schema_translate_correct",
      // Same stage-2 translation in CORRECT mode (compat=false): the
      // reference's lossy quirks fixed (NUMERIC kept, TIMESTAMP kept).
      (s, d) => {
        import s.implicits._
        val root = tmpRoot(d)
        val path = s"$root/fixtures/users_correct.schema"
        SchemaFile.writeText(s, path, usersSchemaFixture)
        val cols = SchemaFile.read(s, path)
        val fields = graft.core.SchemaDoc.fromColumns(cols, compat = false)
        fields.zipWithIndex
          .map { case (f, i) => (i + 1, f.name, f.tpe.name, "NULLABLE") }
          .toDF("ordinal", "name", "bq_type", "mode")
          .orderBy("ordinal")
      },
      Some(
        "SELECT * FROM (VALUES " +
          usersSchemaCorrectExpected
            .map { case (o, n, t, m) => s"($o,'$n','$t','$m')" }
            .mkString(", ") +
          ") AS t(ordinal, name, bq_type, mode) ORDER BY ordinal")
    ),
    Q(
      "q_pipeline_load",
      // Full 4-stage pipeline on the customer table: export to dirty
      // wire-format CSV + .schema → clean both → truncate-load → read back.
      // Differential vs the untouched source proves the CSV codec, NULL
      // repair, type mapping, and overwrite-load are lossless.
      // Type-map note: int→INTEGER→long, so c_nationkey widens to BIGINT.
      (s, d) => {
        val layout = Pipeline.Layout(tmpRoot(d), "2024-01-01")
        val types = Seq(
          SchemaColumn("c_custkey", "bigint"),
          SchemaColumn("c_name", "varchar(25)"),
          SchemaColumn("c_nationkey", "int"),
          SchemaColumn("c_acctbal", "double"),
          SchemaColumn("c_mktsegment", "varchar(10)"))
        Pipeline
          .runTable(s, Tables(s, d, "customer"), types, layout, "customer_loaded")
          .orderBy("c_custkey")
      },
      Some(
        "SELECT c_custkey, c_name, CAST(c_nationkey AS BIGINT) AS c_nationkey, " +
          "c_acctbal, c_mktsegment FROM customer ORDER BY c_custkey")
    ),
    Q(
      "q_csv_roundtrip",
      // Full dirty-wire round-trip, driver-gated: write supplier in the
      // MySQL export format ([[DirtyCsv.writeDirty]] — quoted fields,
      // doubled quotes, NULL as the broken unterminated `"N` marker),
      // read it back through the repair+parse path, and aggregate. The
      // oracle computes the same aggregates from the ORIGINAL table with
      // the same injected-null rule, so header layout, quoting, the `"N`
      // repair, and double→string→double round-tripping (Spark emits the
      // shortest form that parses back bit-exactly) are all under the
      // differential.
      (s, d) => {
        import org.apache.spark.sql.types._
        val tmp = graft.core.Tmp.dir("graft_csvrt")
        val src = Tables(s, d, "supplier")
          .select(
            col("s_suppkey"),
            when(col("s_suppkey") % 7 === 0, lit(null: String))
              .otherwise(col("s_name")).as("maybe_name"),
            col("s_acctbal"))
        graft.sources.DirtyCsv.writeDirty(src, tmp)
        val schema = StructType(Seq(
          StructField("s_suppkey", LongType),
          StructField("maybe_name", StringType),
          StructField("s_acctbal", DoubleType)))
        graft.sources.DirtyCsv.read(s, tmp, schema)
          .agg(
            count(lit(1)).as("n_rows"),
            sum(when(col("maybe_name").isNull, 1L).otherwise(0L)).as("n_nulls"),
            countDistinct(col("maybe_name")).as("n_names"),
            graft.core.Agg.dsum(col("s_acctbal")).as("total_acctbal"))
      },
      Some(
        "SELECT CAST(COUNT(*) AS BIGINT) AS n_rows, " +
          "CAST(SUM(CASE WHEN s_suppkey % 7 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls, " +
          "CAST(COUNT(DISTINCT CASE WHEN s_suppkey % 7 <> 0 THEN s_name END) AS BIGINT) AS n_names, " +
          graft.core.Agg.dsumSql("s_acctbal") + " AS total_acctbal FROM supplier")
    )
  )
}
