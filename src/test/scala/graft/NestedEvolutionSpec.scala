package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.GraftCatalog

/**
 * Nested struct evolution (r14): add / rename / drop fields INSIDE
 * `row(...)` columns, metadata-only, with old files mapped forward BY
 * NESTED FIELD LINEAGE (per-column nested ids minted on the first
 * nested op) — a renamed member keeps serving the bytes files wrote
 * under its old name; an added member reads null there; positional
 * struct casts never apply.
 */
class NestedEvolutionSpec extends SparkSpecBase {

  private lazy val warehouse = Files.createTempDirectory("graft-nestwh").toString
  private lazy val gc: GraftCatalog = new GraftCatalog(spark, warehouse)

  override def beforeAll(): Unit = {
    super.beforeAll()
    spark.conf.set("spark.sql.catalog.gnest", "graft.sources.GraftSparkCatalog")
    spark.conf.set("spark.sql.catalog.gnest.warehouse", warehouse)
    gc.createSchema("db")
  }

  private def mkRows(lo: Long, hi: Long, shape: String) = {
    import spark.implicits._
    shape match {
      case "v0" => (lo to hi).map(i => (i, (s"a$i", i * 10)))
        .toDF("id", "s").selectExpr("id", "named_struct('a', s._1, 'b', s._2) AS s")
      case "v1" => (lo to hi).map(i => (i, (s"a$i", i * 10, i * 100)))
        .toDF("id", "s")
        .selectExpr("id", "named_struct('x', s._1, 'b', s._2, 'c', s._3) AS s")
    }
  }

  test("add + rename inside a struct: old files serve renamed bytes, null adds") {
    gc.createTable("db", "t1", mkRows(1, 1, "v0").schema)
    gc.append("db", "t1", mkRows(1, 10, "v0"))
    gc.addNestedField("db", "t1", "s.c", LongType)
    gc.renameNestedField("db", "t1", "s.a", "x")
    gc.append("db", "t1", mkRows(11, 20, "v1"))
    val r = gc.read("db", "t1")
      .select(col("id"), col("s.x").as("x"), col("s.b").as("b"), col("s.c").as("c"))
    assert(r.count() === 20)
    // old rows: renamed member serves the old 'a' bytes; added member null
    assert(r.filter(col("id") <= 10 && col("x").startsWith("a") &&
      col("c").isNull).count() === 10)
    assert(r.filter(col("id") === 3).head.getLong(1 + 1) === 30L) // b intact
    // new rows carry the full shape
    assert(r.filter(col("id") > 10 && col("c") === col("id") * 100).count() === 10)
    // schema: the struct shows the evolved shape
    val st = gc.read("db", "t1").schema("s").dataType.asInstanceOf[StructType]
    assert(st.fieldNames.toSeq === Seq("x", "b", "c"))
  }

  test("drop a nested member: disappears everywhere, old bytes stay travelable") {
    gc.dropNestedField("db", "t1", "s.b")
    val st = gc.read("db", "t1").schema("s").dataType.asInstanceOf[StructType]
    assert(st.fieldNames.toSeq === Seq("x", "c"))
    assert(gc.read("db", "t1").count() === 20)
    // a second rename AFTER the drop composes across versions
    gc.renameNestedField("db", "t1", "s.x", "y")
    val r = gc.read("db", "t1").select(col("id"), col("s.y").as("y"))
    assert(r.filter(col("id") === 3).head.getString(1) === "a3")
    assert(r.filter(col("id") === 15).head.getString(1) === "a15")
  }

  test("deep nesting: evolution inside row-in-row; renamed parents re-key kids") {
    import spark.implicits._
    val df = (1L to 5L).map(i => (i, ((i, s"n$i"), i * 2)))
      .toDF("id", "o")
      .selectExpr("id",
        "named_struct('inner', named_struct('k', o._1._1, 'name', o._1._2), 'v', o._2) AS o")
    gc.createTable("db", "t2", df.schema)
    gc.append("db", "t2", df)
    gc.addNestedField("db", "t2", "o.inner.extra", StringType)
    gc.renameNestedField("db", "t2", "o.inner", "core") // parent rename
    gc.renameNestedField("db", "t2", "o.core.name", "label")
    val r = gc.read("db", "t2").select(col("id"),
      col("o.core.k").as("k"), col("o.core.label").as("label"),
      col("o.core.extra").as("extra"), col("o.v").as("v"))
    assert(r.filter(col("label") === concat(lit("n"), col("id"))).count() === 5)
    assert(r.filter(col("extra").isNull).count() === 5)
    assert(r.filter(col("v") === col("id") * 2).count() === 5)
  }

  test("PK merge-on-read across a nested evolution resolves exactly") {
    import spark.implicits._
    val v0 = (1L to 10L).map(i => (i, (s"a$i", i)))
      .toDF("id", "s").selectExpr("id", "named_struct('a', s._1, 'b', s._2) AS s")
    gc.createTable("db", "t3", v0.schema, primaryKey = Seq("id"))
    gc.upsert("db", "t3", v0)
    gc.renameNestedField("db", "t3", "s.a", "z")
    val v1 = (5L to 12L).map(i => (i, (s"Z$i", i)))
      .toDF("id", "s").selectExpr("id", "named_struct('z', s._1, 'b', s._2) AS s")
    gc.upsert("db", "t3", v1)
    val r = gc.read("db", "t3").select(col("id"), col("s.z").as("z"))
    assert(r.count() === 12)
    assert(r.filter(col("id") < 5 && col("z").startsWith("a")).count() === 4)
    assert(r.filter(col("id") >= 5 && col("z").startsWith("Z")).count() === 8)
  }

  test("SQL surface: ALTER TABLE ADD/RENAME/DROP on nested paths") {
    spark.sql("CREATE TABLE gnest.db.ts (id BIGINT, s STRUCT<a: STRING, b: BIGINT>)")
    spark.sql("INSERT INTO gnest.db.ts SELECT id, named_struct('a', concat('a', id), 'b', id) FROM range(1, 6)")
    spark.sql("ALTER TABLE gnest.db.ts ADD COLUMNS (s.c BIGINT)")
    spark.sql("ALTER TABLE gnest.db.ts RENAME COLUMN s.a TO name")
    spark.sql("INSERT INTO gnest.db.ts SELECT id, named_struct('name', concat('N', id), 'b', id, 'c', id * 7) FROM range(6, 11)")
    val r = spark.sql(
      "SELECT id, s.name AS name, s.c AS c FROM gnest.db.ts ORDER BY id")
      .collect()
    assert(r.length === 10)
    assert(r.take(5).forall(x => x.getString(1).startsWith("a") && x.isNullAt(2)))
    assert(r.drop(5).forall(x => x.getString(1).startsWith("N") &&
      x.getLong(2) === x.getLong(0) * 7))
    spark.sql("ALTER TABLE gnest.db.ts DROP COLUMN s.b")
    assert(spark.table("gnest.db.ts").schema("s").dataType
      .asInstanceOf[StructType].fieldNames.toSeq === Seq("name", "c"))
  }

  test("refusals: array elements, duplicate adds, last-member drops") {
    import spark.implicits._
    val df = Seq((1L, Seq((1L, "x")))).toDF("id", "arr")
      .selectExpr("id", "transform(arr, e -> named_struct('k', e._1, 'v', e._2)) AS arr")
    gc.createTable("db", "t4", df.schema)
    val e1 = intercept[IllegalArgumentException](
      gc.addNestedField("db", "t4", "arr.k.w", LongType))
    assert(e1.getMessage.contains("row") || e1.getMessage.contains("array"))
    val e2 = intercept[IllegalArgumentException](
      gc.addNestedField("db", "t1", "s.c", LongType)) // already exists
    assert(e2.getMessage.contains("exists"))
    val e3 = intercept[IllegalArgumentException](
      gc.dropNestedField("db", "t1", "s.y") match {
        case _ => gc.dropNestedField("db", "t1", "s.c") // would leave 0 members
      })
    assert(e3.getMessage.contains("last member"))
  }
}
