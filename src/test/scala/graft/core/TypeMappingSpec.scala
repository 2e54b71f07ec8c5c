package graft.core

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types._

/** Unit tests for the reference type-map quirk table
  * (datatype_to_bq.py:6-14), identifier sanitization (csv-cleaner
  * main.py:37-38), and the BQ schema JSON codec (main.py:40-45).
  */
class TypeMappingSpec extends AnyFunSuite {

  /** Seeded pseudo-random strings (printable + specials) for property-style
    * checks — scalacheck's scalatest bridge isn't in the offline cache.
    */
  private def randomStrings(n: Int): Seq[String] = {
    val rnd = new scala.util.Random(7)
    val pool = "abcXYZ019 /\"_-.éπ\t"
    Seq.fill(n)(Seq.fill(rnd.nextInt(20))(pool(rnd.nextInt(pool.length))).mkString)
  }

  import BqType._
  import TypeMapping._

  test("compat map: DATETIME checked before DATE") {
    assert(datatypeToBqCompat("datetime") == Datetime)
    assert(datatypeToBqCompat("DATETIME(6)") == Datetime)
    assert(datatypeToBqCompat("date") == Date)
  }

  test("compat map: all INT flavors → INTEGER") {
    for (t <- Seq("int", "bigint", "smallint", "tinyint", "mediumint", "int(11)"))
      assert(datatypeToBqCompat(t) == Integer, t)
  }

  test("compat map quirk: POINT geometry caught by INT substring (bug-for-bug)") {
    assert(datatypeToBqCompat("point") == Integer)
  }

  test("compat map: DECIMAL collapses to FLOAT (lossy, reference behavior)") {
    assert(datatypeToBqCompat("decimal(10,2)") == Float)
    assert(datatypeToBqCompat("double") == Float)
    assert(datatypeToBqCompat("float") == Float)
  }

  test("compat map: TIMESTAMP falls through to STRING (reference quirk)") {
    assert(datatypeToBqCompat("timestamp") == String_)
  }

  test("compat map: fallback STRING for char/text/blob/enum/json") {
    for (t <- Seq("varchar(255)", "char(1)", "text", "blob", "enum('a','b')", "json", "time"))
      assert(datatypeToBqCompat(t) == String_, t)
  }

  test("correct map fixes the quirks") {
    assert(datatypeToBqCorrect("timestamp") == Timestamp)
    assert(datatypeToBqCorrect("decimal(10,2)") == Numeric)
    assert(datatypeToBqCorrect("point") == String_)
    assert(datatypeToBqCorrect("bigint") == Integer)
    assert(datatypeToBqCorrect("tinyblob") == Bytes)
    assert(datatypeToBqCorrect("bool") == Boolean_)
  }

  test("sanitize: space → _, / → _and_, quotes stripped") {
    assert(sanitizeIdentifier("big id") == "big_id")
    assert(sanitizeIdentifier("amount/total") == "amount_and_total")
    assert(sanitizeIdentifier("\"quoted\"") == "quoted")
    assert(sanitizeIdentifier("a b/c") == "a_b_and_c")
  }

  test("sanitize is idempotent") {
    for (s <- randomStrings(500)) {
      val once = sanitizeIdentifier(s)
      assert(sanitizeIdentifier(once) == once, s"input: ${s.map(_.toInt)}")
    }
  }

  test("compat map is total (never throws)") {
    for (s <- randomStrings(500)) { datatypeToBqCompat(s); datatypeToBqCorrect(s) }
  }

  test("bqToSpark mapping") {
    assert(bqToSpark(Datetime) == TimestampNTZType)
    assert(bqToSpark(Date) == DateType)
    assert(bqToSpark(Integer) == LongType)
    assert(bqToSpark(Float) == DoubleType)
    assert(bqToSpark(String_) == StringType)
  }

  test("SchemaDoc render matches the reference JSON shape") {
    val fields = SchemaDoc.fromColumns(
      Seq(SchemaColumn("id", "int"), SchemaColumn("big id", "bigint")),
      compat = true)
    val json = SchemaDoc.renderJson(fields)
    assert(json ==
      """[{"name": "id", "type": "INTEGER", "mode": "NULLABLE"}, """ +
        """{"name": "big_id", "type": "INTEGER", "mode": "NULLABLE"}]""")
  }

  test("SchemaDoc JSON round-trips") {
    val fields = Seq(
      SchemaDoc.Field("a", Datetime),
      SchemaDoc.Field("b", Float),
      SchemaDoc.Field("c", String_))
    assert(SchemaDoc.parseJson(SchemaDoc.renderJson(fields)) == fields)
  }

  test("SchemaDoc → StructType: all nullable, ordered") {
    val st = SchemaDoc.toStructType(
      Seq(SchemaDoc.Field("x", Integer), SchemaDoc.Field("y", Date)))
    assert(st == StructType(Seq(
      StructField("x", LongType, nullable = true),
      StructField("y", DateType, nullable = true))))
  }
}
