package graft.sources

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

import graft.SparkSpec

/** repairLine edge cases from FIXTURES.md §A3 (incl. the reference's known
  * corruption case), expression/driver-function parity, and the dirty-CSV
  * read path under an explicit schema.
  */
class DirtyCsvSpec extends SparkSpec {

  import DirtyCsv._

  test("repairLine: NULL in middle fields") {
    assert(repairLine(""""2","N,"N,"bob"""") == """"2",,,"bob"""")
  }

  test("repairLine: NULL in last field (line-end anchored)") {
    assert(repairLine(""""2","bob","N""") == """"2","bob",""")
  }

  test("repairLine: NULL in first field") {
    assert(repairLine(""""N,"20","carol"""") == ""","20","carol"""")
  }

  test("repairLine: clean line untouched") {
    val clean = """"1","10","alice","hello, world""""
    assert(repairLine(clean) == clean)
  }

  test("repairLine: legit \"N inside quoted data is corrupted (bug-for-bug)") {
    // reference behavior (app/csv-cleaner/main.py:25-26): the naive replace
    // also rewrites a genuine `"N,` inside a quoted string (to a comma).
    assert(repairLine(""""carol","line with "N, inside"""") == """"carol","line with , inside"""")
  }

  test("repairColumnExpr matches repairLine on all fixture lines") {
    import spark.implicits._
    val lines = Seq(
      """"2","N,"N,"N,"bob","N""",
      """"N,"20","3.25","N,"x"""",
      """"1","10","alice","hello, world"""",
      """"carol","line with "N, inside"""",
      "",
      """"N""")
    val viaExpr = lines.toDF("value")
      .select(repairColumnExpr(col("value")).as("v"))
      .collect().map(_.getString(0)).toSeq
    assert(viaExpr == lines.map(repairLine))
  }

  test("read: dirty CSV → typed rows with NULLs (FIXTURES A3 shape)") {
    val dir = java.nio.file.Files.createTempDirectory("dirtycsv").toString
    val fixture = Seq(
      """"1","12.50","2020-01-01 10:00:00","alice"""",
      """"2","N,"N,"N""",
      """"N,"3.25","2020-02-02 00:00:00","carol"""").mkString("\n")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/users.csv"), fixture)
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = true),
      StructField("amount", DoubleType, nullable = true),
      StructField("created_at", TimestampNTZType, nullable = true),
      StructField("name", StringType, nullable = true)))
    val rows = read(spark, s"$dir/users.csv", schema).orderBy("name").collect()
    assert(rows.length == 3)
    val byName = rows.map(r => Option(r.getAs[String]("name")) -> r).toMap
    assert(byName(Some("alice")).getAs[Long]("id") == 1L)
    assert(byName(Some("alice")).getAs[Double]("amount") == 12.50)
    assert(byName(Some("carol")).isNullAt(0)) // first-field NULL
    val bob = byName(None) // all-null tail row: name was trailing "N
    assert(bob.isNullAt(1) && bob.isNullAt(2) && bob.isNullAt(3))
    assert(bob.getAs[Long]("id") == 2L)
  }

  test("malformed lines degrade to NULL-padded rows, never crash") {
    val dir = java.nio.file.Files.createTempDirectory("malformed").toString
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/bad.csv"),
      Seq(
        """"1","ok","2.5"""",        // well-formed
        """"2","short"""",          // too few fields -> trailing nulls
        """"3","long","1.0","xx"""", // too many fields -> extras dropped
        """not,quoted,at all""",     // unquoted -> still parses positionally
        """"x","bad types here","zz"""" // type mismatch -> null cells
      ).mkString("\n"))
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = true),
      StructField("name", StringType, nullable = true),
      StructField("amount", DoubleType, nullable = true)))
    val rows = read(spark, s"$dir/bad.csv", schema).collect()
    assert(rows.length == 5) // PERMISSIVE: every line becomes a row
    val byName = rows.map(r => r.getAs[String]("name")).toSet
    assert(byName.contains("ok") && byName.contains("short"))
    assert(rows.forall(r => !r.anyNull || r.toSeq.exists(_ != null)))
  }

  test("writeDirty → repair → read round-trips values including NULLs") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("dirtyrt").toString
    val src = Seq(
      (1L, Some("alice"), Some(711.56)),
      (2L, None, None),
      (3L, Some("quote\"inside"), Some(-0.25))).toDF("id", "name", "amount")
    DirtyCsv.writeDirty(src, s"$dir/dirty")
    DirtyCsv.repairToCleanCsv(spark, s"$dir/dirty", s"$dir/clean")
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = true),
      StructField("name", StringType, nullable = true),
      StructField("amount", DoubleType, nullable = true)))
    val back = spark.read.schema(schema)
      .option("quote", "\"").option("escape", "\"").option("nullValue", "")
      .csv(s"$dir/clean")
      .orderBy("id").collect()
    assert(back.toSeq == Seq(
      Row(1L, "alice", 711.56),
      Row(2L, null, null),
      Row(3L, "quote\"inside", -0.25)))
  }

  test("fuzz: 200 seeded random values round-trip the dirty wire losslessly") {
    import spark.implicits._
    // Charset stresses the quoting/escaping/repair path: embedded quotes,
    // commas, spaces, backslashes, empty strings, NULLs. 'N' is excluded —
    // values forming the `"N,` marker hit the reference's own wire
    // ambiguity, which we reproduce bug-for-bug (covered explicitly above).
    val chars = "abcxyz\",\\ .;".toCharArray
    val rnd = new scala.util.Random(42)
    def randVal(): Option[String] =
      if (rnd.nextInt(5) == 0) None
      else Some(Seq.fill(rnd.nextInt(12))(chars(rnd.nextInt(chars.length))).mkString)
    val rows = (1L to 200L).map(i => (i, randVal()))
    val dir = java.nio.file.Files.createTempDirectory("dirtyfuzz").toString
    DirtyCsv.writeDirty(rows.toDF("id", "name"), s"$dir/dirty")
    DirtyCsv.repairToCleanCsv(spark, s"$dir/dirty", s"$dir/clean")
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = true),
      StructField("name", StringType, nullable = true)))
    val back = spark.read.schema(schema)
      .option("quote", "\"").option("escape", "\"").option("nullValue", "")
      .csv(s"$dir/clean")
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    rows.foreach { case (i, v) =>
      // empty string and NULL collapse on the wire (both → empty field)
      val expected = v.filter(_.nonEmpty)
      assert(back(i) == expected, s"row $i: wrote $v, read ${back(i)}")
    }
  }

  test("fuzz: embedded newlines in quoted fields round-trip via multiLine read") {
    import spark.implicits._
    // MySQL text columns can carry \n (and \r\n) inside quoted CSV fields;
    // the reference's line-streamed cleaner corrupts these — the multiLine
    // path must not. Charset adds both newline flavors to the usual
    // quoting stressors.
    val chars = "ab\n\r\",x ".toCharArray
    val rnd = new scala.util.Random(7)
    def randVal(): Option[String] =
      if (rnd.nextInt(5) == 0) None
      else Some(Seq.fill(rnd.nextInt(12))(chars(rnd.nextInt(chars.length))).mkString)
    val rows = (1L to 100L).map(i => (i, randVal()))
    val dir = java.nio.file.Files.createTempDirectory("dirtymulti").toString
    DirtyCsv.writeDirty(rows.toDF("id", "name").coalesce(1), s"$dir/dirty")
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = true),
      StructField("name", StringType, nullable = true)))
    val back = DirtyCsv.read(spark, s"$dir/dirty", schema, multiLine = true)
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(back.size == 100)
    rows.foreach { case (i, v) =>
      // NULL and empty collapse on the wire; Spark's multiLine parser also
      // normalizes a field's trailing \r (CRLF line-ending ambiguity), so
      // compare through the same normalization
      val expected = v.filter(_.nonEmpty)
      val got = back(i)
      assert(
        got == expected || (expected.isDefined &&
          got == expected.map(_.replace("\r\n", "\n"))),
        s"row $i: wrote $v, read $got")
    }
    // and NULL markers still repair: a dirty "N field inside the same file
    val withNull = Seq((1L, Option.empty[String]), (2L, Some("line1\nline2")))
    DirtyCsv.writeDirty(withNull.toDF("id", "name").coalesce(1), s"$dir/dirty2")
    val back2 = DirtyCsv.read(spark, s"$dir/dirty2", schema, multiLine = true)
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(back2(1L).isEmpty, s"NULL marker not repaired: ${back2(1L)}")
    assert(back2(2L).contains("line1\nline2"), s"embedded newline corrupted: ${back2(2L)}")
  }
}
