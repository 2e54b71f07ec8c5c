package graft.queries

import org.apache.spark.sql.functions._

import graft.Q
import graft.sources.JdbcCatalog

/** JDBC-backed registered queries (SURVEY §2.1 rows 1-3) over a seeded
  * embedded Derby database — real JDBC discovery, metadata introspection,
  * and partitioned full-table scan, differentially verified against
  * deterministic VALUES oracles.
  */
object JdbcQueries {

  private val lock = new Object

  private def demoUrl(sfDir: String): String = lock.synchronized {
    val tag = sfDir.replaceAll("[^A-Za-z0-9]", "_")
    JdbcCatalog.seedDemoDb(s"${System.getProperty("java.io.tmpdir")}/graft_derby_$tag")
  }

  val queries: Seq[Q] = Seq(
    Q(
      "q_jdbc_discovery",
      // The reference's stage-1 discovery, pushed whole into the database
      // via the JDBC source (canonical LIKE/IN predicate, README.md:27).
      (s, d) =>
        JdbcCatalog
          .discoverTables(s, demoUrl(d), "user__field%", Seq("users"))
          .orderBy("table_name"),
      Some(
        "SELECT * FROM (VALUES ('user__field_a'), ('user__field_b'), ('users')) " +
          "AS t(table_name) ORDER BY table_name")
    ),
    Q(
      "q_jdbc_introspect",
      // Stage-2 column introspection: ordinal-ordered (name, type) via
      // DatabaseMetaData — the `.schema` export feed.
      (s, d) => {
        import s.implicits._
        JdbcCatalog
          .introspectColumns(demoUrl(d), "users")
          .zipWithIndex
          .map { case (c, i) => (i + 1, c.name, c.mysqlType) }
          .toDF("ordinal", "name", "type_name")
          .orderBy("ordinal")
      },
      Some(
        "SELECT * FROM (VALUES (1, 'id', 'bigint'), (2, 'name', 'varchar'), " +
          "(3, 'balance', 'double'), (4, 'created_at', 'timestamp')) " +
          "AS t(ordinal, name, type_name) ORDER BY ordinal")
    ),
    Q(
      "q_jdbc_scan",
      // Stage-2 data export: partitioned JDBC scan (4 concurrent cursors
      // split on id) — the parallelism knob for big source tables.
      (s, d) =>
        JdbcCatalog
          .fullTableScan(s, demoUrl(d), "users", Some(("id", 1L, 50L, 4)))
          .select(col("id"), col("name"), col("balance"))
          .orderBy("id"),
      Some(
        "SELECT r AS id, 'user_' || r AS name, r * 1.5 AS balance " +
          "FROM range(1, 51) t(r) ORDER BY id")
    )
  )
}
