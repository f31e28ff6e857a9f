package graft.sources

import org.apache.spark.sql.types._

/**
 * Bidirectional Trino-type-name ↔ Spark `DataType` mapping — the
 * Spark-native analog of the reference's type matrix
 * (TrinoTypeUtils.java:69–275 `toTrinoType`/`toPaimonType`) and decimal
 * plumbing (DecimalUtils.java). Spark's `DecimalType` already carries
 * precision/scale exactly, so no manual unscaled-long/slice encode is
 * needed — `Decimal` handles both compact and big representations.
 */
object TypeMapping {

  /** Parse a Trino type signature (e.g. `decimal(18,4)`, `array(varchar)`,
    * `map(integer, double)`, `row(a integer, b varchar)`) to a Spark type. */
  def toSparkType(trino: String): DataType = {
    val s = trino.trim
    val lower = s.toLowerCase
    lower match {
      case "boolean" => BooleanType
      case "tinyint" => ByteType
      case "smallint" => ShortType
      case "integer" | "int" => IntegerType
      case "bigint" => LongType
      case "real" => FloatType
      case "double" => DoubleType
      case "varbinary" => BinaryType
      case "date" => DateType
      case "json" => StringType
      case "uuid" => StringType
      case _ if lower == "varchar" || lower.startsWith("varchar(") => StringType
      case _ if lower == "char" || lower.startsWith("char(") => StringType
      case _ if lower == "decimal" => DecimalType(38, 18)
      case _ if lower.startsWith("decimal(") =>
        val Array(p, sc) = args(s).split(",").map(_.trim.toInt)
        DecimalType(p, sc)
      case _ if lower.startsWith("timestamp") && lower.contains("with time zone") =>
        TimestampType
      case _ if lower == "timestamp" || lower.startsWith("timestamp(") =>
        TimestampNTZType
      case _ if lower == "time" || lower.startsWith("time(") =>
        // Spark has no TIME type; nanos-of-day as bigint is the lossless map.
        LongType
      case _ if lower.startsWith("array(") =>
        ArrayType(toSparkType(args(s)))
      case _ if lower.startsWith("map(") =>
        val (k, v) = splitTop(args(s))
        MapType(toSparkType(k), toSparkType(v))
      case _ if lower.startsWith("row(") =>
        val fields = splitAll(args(s)).map { f =>
          val t = f.trim
          val i = t.indexOf(' ')
          require(i > 0, s"row field needs a name: $t")
          StructField(t.substring(0, i), toSparkType(t.substring(i + 1)))
        }
        StructType(fields)
      case _ => throw new IllegalArgumentException(s"unsupported Trino type: $trino")
    }
  }

  /** CHAR(n) length when the signature is a char type — the physical map
    * stays StringType; pad semantics ride as Spark char metadata
    * (see GraftCatalog.currentSchema). */
  def charLength(trino: String): Option[Int] = {
    val lower = trino.trim.toLowerCase
    if (lower.startsWith("char(")) Some(args(trino.trim).trim.toInt) else None
  }

  /** Trino signature of a created/added column, honoring Spark's char
    * plumbing: a CharType field, or a StringType field carrying the
    * analyzer's raw-type metadata (how CHAR(n) DDL reaches a DSv2
    * catalog), persists as char(n) — the reference keeps CharType the
    * same way (TrinoTypeUtils.java:78–80). */
  def fieldTrinoType(f: StructField): String =
    org.apache.spark.sql.catalyst.util.CharVarcharUtils
      .getRawType(f.metadata).getOrElse(f.dataType) match {
      case CharType(n) => s"char($n)"
      case VarcharType(n) => s"varchar($n)"
      case t => toTrinoType(t)
    }

  /** Render a Spark type as the Trino signature the reference would use. */
  def toTrinoType(dt: DataType): String = dt match {
    case CharType(n) => s"char($n)"
    case VarcharType(n) => s"varchar($n)"
    case BooleanType => "boolean"
    case ByteType => "tinyint"
    case ShortType => "smallint"
    case IntegerType => "integer"
    case LongType => "bigint"
    case FloatType => "real"
    case DoubleType => "double"
    case StringType => "varchar"
    case BinaryType => "varbinary"
    case DateType => "date"
    case d: DecimalType => s"decimal(${d.precision},${d.scale})"
    case TimestampNTZType => "timestamp(6)"
    case TimestampType => "timestamp(6) with time zone"
    case ArrayType(e, _) => s"array(${toTrinoType(e)})"
    case MapType(k, v, _) => s"map(${toTrinoType(k)}, ${toTrinoType(v)})"
    case StructType(fields) =>
      fields.map(f => s"${f.name} ${toTrinoType(f.dataType)}").mkString("row(", ", ", ")")
    case other => throw new IllegalArgumentException(s"unsupported Spark type: $other")
  }

  /** Contents of the outermost parens: `decimal(18,4)` → `18,4`. */
  private def args(s: String): String = {
    val open = s.indexOf('(')
    require(open >= 0 && s.endsWith(")"), s"malformed type: $s")
    s.substring(open + 1, s.length - 1)
  }

  /** Split `k, v` at the single top-level comma (nested parens respected). */
  private def splitTop(s: String): (String, String) = {
    val parts = splitAll(s)
    require(parts.length == 2, s"expected two type args: $s")
    (parts(0), parts(1))
  }

  /** Split on top-level commas only. */
  private def splitAll(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var depth = 0
    var start = 0
    for (i <- s.indices) s.charAt(i) match {
      case '(' => depth += 1
      case ')' => depth -= 1
      case ',' if depth == 0 => out += s.substring(start, i); start = i + 1
      case _ =>
    }
    out += s.substring(start)
    out.result()
  }
}
