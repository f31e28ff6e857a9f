package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.TypeMapping._

class TypeMappingSpec extends AnyFunSuite {

  test("scalar types round-trip") {
    val cases = Seq(
      "boolean" -> BooleanType,
      "tinyint" -> ByteType,
      "smallint" -> ShortType,
      "integer" -> IntegerType,
      "bigint" -> LongType,
      "real" -> FloatType,
      "double" -> DoubleType,
      "varbinary" -> BinaryType,
      "date" -> DateType)
    for ((name, dt) <- cases) {
      assert(toSparkType(name) === dt, name)
      assert(toTrinoType(dt) === name, dt.toString)
    }
  }

  test("varchar and char map to StringType") {
    assert(toSparkType("varchar") === StringType)
    assert(toSparkType("varchar(255)") === StringType)
    assert(toSparkType("char(2)") === StringType)
    assert(toTrinoType(StringType) === "varchar")
  }

  test("decimal precision and scale preserved") {
    assert(toSparkType("decimal(18,4)") === DecimalType(18, 4))
    assert(toSparkType("DECIMAL(38, 0)") === DecimalType(38, 0))
    assert(toTrinoType(DecimalType(10, 2)) === "decimal(10,2)")
  }

  test("timestamps: ntz vs with-time-zone") {
    assert(toSparkType("timestamp(3)") === TimestampNTZType)
    assert(toSparkType("timestamp(3) with time zone") === TimestampType)
    assert(toTrinoType(TimestampType) === "timestamp(6) with time zone")
  }

  test("nested types") {
    assert(toSparkType("array(integer)") === ArrayType(IntegerType))
    assert(toSparkType("array(array(varchar))") === ArrayType(ArrayType(StringType)))
    assert(toSparkType("map(varchar, double)") === MapType(StringType, DoubleType))
    assert(toSparkType("row(a integer, b varchar)") ===
      StructType(Seq(StructField("a", IntegerType), StructField("b", StringType))))
    assert(toSparkType("row(x row(y map(varchar, array(bigint))))") ===
      StructType(Seq(StructField("x",
        StructType(Seq(StructField("y",
          MapType(StringType, ArrayType(LongType)))))))))
    assert(toTrinoType(toSparkType("map(varchar, array(decimal(9,2)))")) ===
      "map(varchar, array(decimal(9,2)))")
  }

  test("unsupported types rejected") {
    intercept[IllegalArgumentException](toSparkType("hyperloglog"))
    intercept[IllegalArgumentException](toTrinoType(CalendarIntervalType))
  }
}
