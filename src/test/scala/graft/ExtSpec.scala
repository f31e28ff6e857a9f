package graft

import org.apache.spark.sql.functions._
import graft.operators.AsOfJoin

/** As-of join semantics on crafted data + HLL accuracy. */
class ExtSpec extends SparkSpecBase {

  test("asof join picks latest right row at-or-before left time") {
    import spark.implicits._
    val left = Seq(
      (1L, 100L, 5L),   // key 100 at t=5 → right t=3 (B)
      (2L, 100L, 3L),   // t=3 → inclusive match (B)
      (3L, 100L, 2L),   // t=2 → right t=1 (A)
      (4L, 100L, 0L),   // t=0 → no right yet → null
      (5L, 200L, 9L))   // key 200 → right t=4 (C)
      .toDF("id", "k", "t")
    val right = Seq(
      (100L, 1L, "A", 10L), (100L, 3L, "B", 11L), (100L, 7L, "late", 12L),
      (200L, 4L, "C", 13L))
      .toDF("k", "t", "tag", "rid")
    val out = AsOfJoin.asof(left, right, "k", "k", "t", "t",
        Seq("tag" -> "rtag", "rid" -> "rrid"), "rid")
      .orderBy("id").collect()
    assert(out.map(r => Option(r.getAs[String]("rtag"))).toSeq ===
      Seq(Some("B"), Some("B"), Some("A"), None, Some("C")))
    // struct carry: rid must come from the same row as tag
    assert(out(0).getAs[Long]("rrid") === 11L)
  }

  test("asof join ties at equal right time resolve to max tie-break") {
    import spark.implicits._
    val left = Seq((1L, 1L, 10L)).toDF("id", "k", "t")
    val right = Seq((1L, 10L, "low", 1L), (1L, 10L, "high", 2L))
      .toDF("k", "t", "tag", "rid")
    val out = AsOfJoin.asof(left, right, "k", "k", "t", "t",
      Seq("tag" -> "rtag"), "rid").collect()
    assert(out.head.getAs[String]("rtag") === "high")
  }

  test("approx_count_distinct within 10% of exact") {
    val l = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val exact = l.agg(countDistinct("l_partkey")).head().getLong(0)
    val approx = l.agg(approx_count_distinct("l_partkey")).head().getLong(0)
    assert(math.abs(approx - exact).toDouble / exact < 0.1,
      s"approx=$approx exact=$exact")
  }
}
