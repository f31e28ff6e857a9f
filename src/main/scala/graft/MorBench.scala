package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * MoR native-read on/off measurement (the r11/r12 acceptance criterion
 * for plans/GraftMorNativeRead.scala): build an UNCOMPACTED PK table —
 * base upsert + delta upserts, so every SQL read pays the merge — then
 * time identical SQL reads with `spark.graft.morNativeRead.enabled`
 * true (spliced native columnar merge plan) vs false (V1 row bridge:
 * InternalRow→Row→InternalRow per row, codegen severed). Prints one
 * JSON line; min-of-N per mode, interleaved so ambient drift hits both
 * modes equally.
 *
 * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf1 sbt "runMain graft.MorBench"
 */
object MorBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = sys.env.get("SPARK_GRAFT_RUNS").map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val wh = java.nio.file.Files.createTempDirectory("graft-morbench-wh").toString
    spark.conf.set("spark.sql.catalog.g", "graft.sources.GraftSparkCatalog")
    spark.conf.set("spark.sql.catalog.g.warehouse", wh)
    val cat = new graft.sources.GraftCatalog(spark, wh)
    cat.createSchema("db")
    // Uncompacted MoR-pending corpus: the LARGEST fact table (lineitem,
    // 6M rows / 11 columns at the 10x scale), full base + two delta
    // waves touching ~53% of keys — three versions to merge for a third
    // of them, and enough row volume that the bridge's per-row
    // InternalRow→Row→InternalRow conversion actually shows.
    val d = graft.sources.Tables(spark, sfDir, "lineitem")
    cat.createTable("db", "mor", d.schema,
      primaryKey = Seq("l_orderkey", "l_linenumber"))
    cat.upsert("db", "mor", d)
    cat.upsert("db", "mor", d.filter(col("l_orderkey") % 3 === 0)
      .withColumn("l_returnflag", lit("D")))
    cat.upsert("db", "mor", d.filter(col("l_orderkey") % 5 === 0)
      .withColumn("l_quantity", col("l_quantity") + 1.0))
    val queries = Seq(
      "agg_all" -> ("SELECT count(*) AS n, sum(l_quantity) AS s, " +
        "sum(l_extendedprice) AS p FROM g.db.mor"),
      "filter_proj" -> ("SELECT l_orderkey, l_linenumber, l_quantity " +
        "FROM g.db.mor WHERE l_quantity > 25 AND l_returnflag <> 'D'"),
      "group_flag" -> ("SELECT l_returnflag, count(*) AS n, " +
        "avg(l_extendedprice) AS a FROM g.db.mor GROUP BY l_returnflag"))
    def time(mode: Boolean, q: String): Double = {
      spark.conf.set("spark.graft.morNativeRead.enabled", mode.toString)
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      spark.sql(q).queryExecution.toRdd.count()
      (System.nanoTime() - t0) / 1e9
    }
    // warmup both modes (JIT, footer caches)
    queries.foreach { case (_, q) => time(true, q); time(false, q) }
    val rows = queries.map { case (name, q) =>
      // alternate modes per repetition so a mid-query ambient drift step
      // hits both modes equally (an all-on-then-all-off block would bias
      // whichever mode ran during the quiet half)
      val pairs = (1 to runs).map(_ => (time(mode = true, q), time(mode = false, q)))
      val on = pairs.map(_._1).min
      val off = pairs.map(_._2).min
      name -> (on, off)
    }
    // plan-shape proof in the same process
    spark.conf.set("spark.graft.morNativeRead.enabled", "true")
    val pOn = spark.sql(queries.head._2).queryExecution.executedPlan.toString
    spark.conf.set("spark.graft.morNativeRead.enabled", "false")
    val pOff = spark.sql(queries.head._2).queryExecution.executedPlan.toString
    val nativeOk = !pOn.contains("GraftMorScanBuilder") &&
      pOff.contains("GraftMorScanBuilder")
    val qs = rows.map { case (n, (on, off)) =>
      f""""$n":{"native_sec":$on%.3f,"bridge_sec":$off%.3f,"speedup":${off / on}%.2f}"""
    }.mkString("{", ",", "}")
    val totOn = rows.map(_._2._1).sum
    val totOff = rows.map(_._2._2).sum
    val line = f"""{"metric":"mor_native_read","sf":"$sfDir","runs":$runs,""" +
      f""""queries":$qs,"total_native_sec":$totOn%.3f,""" +
      f""""total_bridge_sec":$totOff%.3f,"speedup":${totOff / totOn}%.2f,""" +
      s""""plan_shapes_differ":$nativeOk}"""
    println(line)
    val out = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "target/morbench.json"))
    if (out.getParent != null) java.nio.file.Files.createDirectories(out.getParent)
    java.nio.file.Files.writeString(out, line + "\n")
    spark.stop()
  }
}
