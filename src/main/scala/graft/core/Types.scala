package graft.core

import org.apache.spark.sql.types._

/** BigQuery-compatible logical types — the reference's entire type system.
  *
  * The reference maps MySQL `DATA_TYPE` strings to five BigQuery types via a
  * precedence-ordered substring match (reference:
  * app/csv-cleaner/datatype_to_bq.py:1-14). We reproduce that surface
  * exactly in compat mode and offer a corrected mapping by default
  * (DECIMAL keeps precision, TIMESTAMP stays temporal).
  */
sealed abstract class BqType(val name: String)
object BqType {
  case object Datetime extends BqType("DATETIME")
  case object Date     extends BqType("DATE")
  case object Integer  extends BqType("INTEGER")
  case object Float    extends BqType("FLOAT")
  case object String_  extends BqType("STRING")
  case object Timestamp extends BqType("TIMESTAMP") // correct-mode only
  case object Numeric   extends BqType("NUMERIC")   // correct-mode only
  case object Boolean_  extends BqType("BOOLEAN")   // correct-mode only
  case object Bytes     extends BqType("BYTES")     // correct-mode only

  def fromName(s: String): BqType = s.toUpperCase match {
    case "DATETIME"  => Datetime
    case "DATE"      => Date
    case "INTEGER"   => Integer
    case "FLOAT"     => Float
    case "TIMESTAMP" => Timestamp
    case "NUMERIC"   => Numeric
    case "BOOLEAN"   => Boolean_
    case "BYTES"     => Bytes
    case _           => String_
  }
}

object TypeMapping {

  /** Bug-for-bug replica of the reference's precedence-ordered substring
    * match (app/csv-cleaner/datatype_to_bq.py:6-14). Quirks preserved:
    * DATETIME checked before DATE; `INT` substring catches POINT geometry;
    * DECIMAL collapses to FLOAT; TIMESTAMP falls through to STRING.
    */
  def datatypeToBqCompat(mysqlType: String): BqType = {
    val t = mysqlType.toUpperCase
    if (t.contains("DATETIME")) BqType.Datetime
    else if (t.contains("DATE")) BqType.Date
    else if (t.contains("INT")) BqType.Integer
    else if (t.contains("FLOAT") || t.contains("DOUBLE") || t.contains("DECIMAL")) BqType.Float
    else BqType.String_
  }

  /** Corrected mapping: keeps TIMESTAMP temporal, DECIMAL numeric,
    * BOOLEAN/BIT boolean, BLOB bytes; unknown/geometry types map to
    * STRING instead of being caught by the INT substring quirk.
    *
    * MySQL COLUMN_TYPE modifiers are handled both ways they appear:
    * with a display width ("int(10) unsigned zerofill") the takeWhile
    * stops at '(' before the modifier; WITHOUT one (MySQL 8 drops
    * display widths: "int unsigned") the modifier survives the
    * takeWhile, so UNSIGNED/ZEROFILL are stripped explicitly — they
    * change the value range, never the BQ logical type.
    */
  def datatypeToBqCorrect(mysqlType: String): BqType = {
    val t = mysqlType.toUpperCase.takeWhile(c => c.isLetter || c == ' ').trim
      .stripSuffix(" ZEROFILL").stripSuffix(" UNSIGNED")
    t match {
      case "DATETIME"                                      => BqType.Datetime
      case "TIMESTAMP"                                     => BqType.Timestamp
      case "DATE"                                          => BqType.Date
      case "YEAR"                                          => BqType.Integer
      case "TINYINT" | "SMALLINT" | "MEDIUMINT" | "INT" | "INTEGER" | "BIGINT" => BqType.Integer
      case "FLOAT" | "DOUBLE" | "REAL"                     => BqType.Float
      case "DECIMAL" | "NUMERIC"                           => BqType.Numeric
      case "BIT" | "BOOL" | "BOOLEAN"                      => BqType.Boolean_
      case "BLOB" | "TINYBLOB" | "MEDIUMBLOB" | "LONGBLOB" | "BINARY" | "VARBINARY" => BqType.Bytes
      case _                                               => BqType.String_
    }
  }

  /** BQ logical type → Spark DataType. DATETIME is zone-naive MySQL,
    * so TimestampNTZ; session TZ is pinned to UTC regardless.
    */
  def bqToSpark(t: BqType): DataType = t match {
    case BqType.Datetime  => TimestampNTZType
    case BqType.Date      => DateType
    case BqType.Integer   => LongType
    case BqType.Float     => DoubleType
    case BqType.Timestamp => TimestampType
    case BqType.Numeric   => DecimalType(38, 9)
    case BqType.Boolean_  => BooleanType
    case BqType.Bytes     => BinaryType
    case BqType.String_   => StringType
  }

  /** Identifier sanitization, exactly as the reference applies it to the
    * whole `"name","type"` schema line (app/csv-cleaner/main.py:37-38):
    * space → `_`, `/` → `_and_`, double quotes stripped.
    */
  def sanitizeIdentifier(s: String): String =
    s.replace(" ", "_").replace("/", "_and_").replace("\"", "")
}

/** A (name, mysqlType) column pair as it appears in the exported `.schema`
  * CSV (reference: app/cloud-sql-exporter/main.py:53-58 — headerless,
  * quoted, ordinal order).
  */
final case class SchemaColumn(name: String, mysqlType: String) {
  def sanitizedName: String = TypeMapping.sanitizeIdentifier(name)
}

/** BigQuery-format JSON schema document codec.
  *
  * Render shape STRUCTURALLY matches the reference
  * (app/csv-cleaner/main.py:40-45): an array of
  * `{"name": n, "type": t, "mode": "NULLABLE"}` objects, every column
  * forced NULLABLE (main.py:41). Whitespace differs — the reference
  * pretty-prints multi-line; we emit one line (both forms are accepted by
  * BigQuery and by [[SchemaDoc.parseJson]]), so golden tests compare
  * structure, not bytes.
  */
object SchemaDoc {

  final case class Field(name: String, tpe: BqType) {
    def toSparkField: StructField =
      StructField(name, TypeMapping.bqToSpark(tpe), nullable = true)
  }

  def fromColumns(cols: Seq[SchemaColumn], compat: Boolean = true): Seq[Field] =
    cols.map { c =>
      val mapped =
        if (compat) TypeMapping.datatypeToBqCompat(TypeMapping.sanitizeIdentifier(c.mysqlType))
        else TypeMapping.datatypeToBqCorrect(c.mysqlType)
      Field(c.sanitizedName, mapped)
    }

  /** Reference-shape JSON: `[{"name": "a", "type": "INTEGER", "mode": "NULLABLE"}, ...]` */
  def renderJson(fields: Seq[Field]): String =
    fields
      .map(f => s"""{"name": "${f.name}", "type": "${f.tpe.name}", "mode": "NULLABLE"}""")
      .mkString("[", ", ", "]")

  /** Minimal parser for the exact shape renderJson emits (and what the
    * reference's bq-importer consumes, app/bq-importer/main.py:22-27).
    */
  def parseJson(json: String): Seq[Field] = {
    val obj = """\{[^}]*\}""".r
    val kv = """"(name|type)"\s*:\s*"([^"]*)"""".r
    obj.findAllIn(json).toSeq.map { o =>
      val m = kv.findAllMatchIn(o).map(m => m.group(1) -> m.group(2)).toMap
      Field(m.getOrElse("name", ""), BqType.fromName(m.getOrElse("type", "STRING")))
    }
  }

  def toStructType(fields: Seq[Field]): StructType =
    StructType(fields.map(_.toSparkField))
}
