package graft

import org.apache.spark.sql.functions._
import graft.operators.AsOfJoin

/** Edge cases across the public surface + the driver's entry contract. */
class EdgeCasesSpec extends SparkSpecBase {

  test("driver entry contract: flagship query returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracleSql key has a registered query") {
    val qs = SparkEntry.queries.keySet
    val missing = SparkEntry.oracleSql.keySet.diff(qs)
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("native kernels on degenerate inputs") {
    // single-element and w=1 sliding min (identity)
    val r1 = spark.sql("SELECT sliding_min_probe FROM (SELECT 1 AS sliding_min_probe)")
    assert(r1.count() === 1) // smoke that sql still parses after extensions
    import org.apache.spark.sql.GraftColumnBridge.{column => c, expression => e}
    import spark.implicits._
    val df = Seq((1L, Seq(5L, 3L, 8L, 1L))).toDF("id", "arr")
    val out = df.select(c(graft.plans.SlidingMin(e(col("arr")), 1)).as("m"))
      .head().getSeq[Long](0)
    assert(out === Seq(5L, 3L, 8L, 1L)) // w=1: identity
    val w4 = df.select(c(graft.plans.SlidingMin(e(col("arr")), 4)).as("m"))
      .head().getSeq[Long](0)
    assert(w4 === Seq(1L)) // single full-width window
    val w5 = df.select(c(graft.plans.SlidingMin(e(col("arr")), 5)).as("m"))
      .head().getSeq[Long](0)
    assert(w5 === Seq.empty) // window longer than input
  }

  test("word shingles degenerate inputs") {
    import org.apache.spark.sql.GraftColumnBridge.{column => c, expression => e}
    import spark.implicits._
    val df = Seq((1L, "alpha beta"), (2L, "solo"), (3L, "")).toDF("id", "t")
    val out = df.select(col("id"),
        c(graft.plans.WordShingles(e(graft.functions.TextHash.tokens(col("t"))), 3)).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(out(1L) === Seq.empty) // 2 tokens < n=3
    assert(out(2L) === Seq.empty)
    assert(out(3L) === Seq.empty)
    val two = df.filter(col("id") === 1)
      .select(c(graft.plans.WordShingles(e(graft.functions.TextHash.tokens(col("t"))), 2)).as("sh"))
      .head().getSeq[String](0)
    assert(two === Seq("alpha beta"))
  }

  test("long_array_dot with unequal lengths uses the common prefix") {
    val r = spark.sql(
      "SELECT long_array_dot(array(1L,2L,3L), array(10L,10L)) AS d").head().getLong(0)
    assert(r === 30L)
  }

  test("asof join with empty right side yields all-null carries") {
    import spark.implicits._
    val left = Seq((1L, 5L, 10L)).toDF("id", "k", "t")
    val right = Seq.empty[(Long, Long, String)].toDF("k", "t", "tag")
    val out = AsOfJoin.asof(left, right, "k", "k", "t", "t",
      Seq("tag" -> "rtag"), "tag").collect()
    assert(out.length === 1)
    assert(out.head.isNullAt(out.head.fieldIndex("rtag")))
  }

  test("asof join left row earlier than every right row gets null") {
    import spark.implicits._
    val left = Seq((1L, 5L, 1L)).toDF("id", "k", "t")
    val right = Seq((5L, 100L, "late")).toDF("k", "t", "tag")
    val out = AsOfJoin.asof(left, right, "k", "k", "t", "t",
      Seq("tag" -> "rtag"), "tag").collect()
    assert(out.head.isNullAt(out.head.fieldIndex("rtag")))
  }

  test("asof join: null keys never match (equality-join semantics)") {
    import spark.implicits._
    val left = Seq((1L, Option(5L), 10L), (2L, Option.empty[Long], 10L))
      .toDF("id", "k", "t")
    val right = Seq((Option(5L), 1L, "real"), (Option.empty[Long], 1L, "ghost"))
      .toDF("k", "t", "tag")
    val out = AsOfJoin.asof(left, right, "k", "k", "t", "t",
      Seq("tag" -> "rtag"), "tag").orderBy("id").collect()
    assert(out(0).getString(out(0).fieldIndex("rtag")) === "real")
    // the null-key left row must NOT pick up the null-key right row
    assert(out(1).isNullAt(out(1).fieldIndex("rtag")))
  }
}
