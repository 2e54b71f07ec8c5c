package graft.sources

import graft.SparkSpec
import graft.core.{SchemaColumn, SchemaDoc, TypeMapping}

/** Embedded-Derby JDBC catalog tests: discovery predicate semantics,
  * ordinal introspection, partitioned scan parity, and the introspected
  * schema feeding the type-map pipeline.
  */
class JdbcCatalogSpec extends SparkSpec {

  private lazy val url =
    JdbcCatalog.seedDemoDb(java.nio.file.Files.createTempDirectory("derby").toString + "/db")

  test("discovery matches LIKE/IN predicate, excludes others") {
    val names = JdbcCatalog
      .discoverTables(spark, url, "user__field%", Seq("users"))
      .collect().map(_.getString(0)).sorted.toSeq
    assert(names == Seq("user__field_a", "user__field_b", "users"))
  }

  test("introspection returns ordinal-ordered typed columns") {
    val cols = JdbcCatalog.introspectColumns(url, "users")
    assert(cols == Seq(
      SchemaColumn("id", "bigint"),
      SchemaColumn("name", "varchar"),
      SchemaColumn("balance", "double"),
      SchemaColumn("created_at", "timestamp")))
  }

  test("introspected schema flows into the BQ type map (compat quirks)") {
    val fields = SchemaDoc.fromColumns(JdbcCatalog.introspectColumns(url, "users"), compat = true)
    assert(fields.map(f => f.name -> f.tpe.name) == Seq(
      "id" -> "INTEGER", "name" -> "STRING", "balance" -> "FLOAT",
      "created_at" -> "STRING")) // TIMESTAMP→STRING reference quirk
  }

  test("partitioned scan returns the same rows as unpartitioned") {
    val plain = JdbcCatalog.fullTableScan(spark, url, "users")
      .orderBy("id").collect().toSeq
    val parts = JdbcCatalog.fullTableScan(spark, url, "users", Some(("id", 1L, 50L, 4)))
    assert(parts.rdd.getNumPartitions == 4)
    assert(parts.orderBy("id").collect().toSeq == plain)
    assert(plain.size == 50)
  }

  test("arbitrary delegated SQL executes inside the database") {
    val n = JdbcCatalog
      .queryJdbc(spark, url, "SELECT COUNT(*) AS c FROM users WHERE balance > 30")
      .collect().head.get(0).toString.toLong
    assert(n == 30) // balances 1.5..75: ids 21..50 exceed 30
  }
}
