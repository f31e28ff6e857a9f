package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Source/sink coverage: partitioned parquet writes with partition
  * pruning, CSV and JSON round-trips. */
class SourcesSpec extends SparkSpecBase {

  test("partitioned write prunes partitions on filtered read") {
    val dir = Files.createTempDirectory("graft-part").toString
    val l = spark.read.parquet(s"$sfDir/lineitem.parquet")
    l.write.mode("overwrite").partitionBy("l_returnflag").parquet(s"$dir/li")
    val filtered = spark.read.parquet(s"$dir/li").filter(col("l_returnflag") === "R")
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("l_returnflag"),
      s"expected partition filter in plan:\n$plan")
    assert(filtered.count() === l.filter(col("l_returnflag") === "R").count())
    // Only the matching partition directory is listed in the scan.
    assert(!plan.contains("l_returnflag=A"), "pruned partitions must not be scanned")
  }

  test("csv round-trip preserves values") {
    val dir = Files.createTempDirectory("graft-csv").toString
    val e = graft.sources.Tables(spark, sfDir, "events") // handles nanos ts
      .select("event_id", "user_id", "event_type", "value")
    e.write.mode("overwrite").option("header", "true").csv(s"$dir/e")
    val back = spark.read.option("header", "true")
      .schema(e.schema).csv(s"$dir/e")
    assert(back.count() === e.count())
    assert(back.agg(sum("value")).head().getDouble(0) ===
      e.agg(sum("value")).head().getDouble(0))
  }

  test("json lines round-trip preserves schema and values") {
    val dir = Files.createTempDirectory("graft-json").toString
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
    d.write.mode("overwrite").json(s"$dir/d")
    val back = spark.read.schema(d.schema).json(s"$dir/d")
    assert(back.count() === d.count())
    val a = back.orderBy("doc_id").collect()
    val b = d.orderBy("doc_id").collect()
    assert(a.sameElements(b))
  }
}
