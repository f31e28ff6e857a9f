package graft


import org.apache.spark.sql.functions._
import graft.operators.SkewJoin

/** Scale techniques: bucketed co-located joins (no shuffle) and salted
  * skew joins (identical results, skew fanned out). */
class ScaleSpec extends SparkSpecBase {

  test("bucketed tables join without a shuffle exchange") {
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    val o = spark.read.parquet(s"$sfDir/orders.parquet")
    val l = spark.read.parquet(s"$sfDir/lineitem.parquet")
    o.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable("b_orders")
    l.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable("b_lineitem")
    // Disable broadcast so the planner exercises the bucketed (co-located)
    // sort-merge path — at real scale neither side broadcasts anyway.
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("b_orders").join(spark.table("b_lineitem"),
        col("o_orderkey") === col("l_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must be co-located (no Exchange):\n$plan")
      assert(plan.contains("Bucketed: true"), s"scan must use buckets:\n$plan")
      assert(joined.count() ===
        o.join(l, o("o_orderkey") === l("l_orderkey")).count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("salted join equals plain join on skewed data") {
    import spark.implicits._
    // 90% of left rows share one hot key.
    val left = (1L to 2000L)
      .map(i => (i, if (i % 10 == 0) i % 50 else 7L)).toDF("id", "k")
    val right = (0L until 50L).map(i => (i, s"v$i")).toDF("rk", "payload")
    val plain = left.join(right, col("k") === col("rk"))
      .select("id", "k", "payload").collect().map(_.toString).sorted
    val salted = SkewJoin.salted(left, right, "k", "rk", saltOn = "id", factor = 8)
      .select("id", "k", "payload").collect().map(_.toString).sorted
    assert(salted.length === plain.length)
    assert(salted.toSeq === plain.toSeq)
  }

  test("salting spreads the hot key across salt values") {
    import spark.implicits._
    val left = (1L to 1000L).map(i => (i, 7L)).toDF("id", "k")
    val salts = left.withColumn("__salt", pmod(xxhash64(col("id")), lit(8)))
      .groupBy("__salt").count().collect().map(_.getLong(1))
    assert(salts.length === 8, "all 8 salt buckets should be hit")
    assert(salts.max < 1000 * 0.3, s"no bucket should dominate: ${salts.toSeq}")
  }
}
