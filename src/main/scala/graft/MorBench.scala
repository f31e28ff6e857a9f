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
    // Uncompacted MoR-pending corpus: full documents base + two delta
    // waves touching ~30% of keys — three versions to merge for those.
    val d = graft.sources.Tables(spark, sfDir, "documents")
      .select("doc_id", "lang", "source", "n_chars", "text")
    cat.createTable("db", "mor", d.schema, primaryKey = Seq("doc_id"))
    cat.upsert("db", "mor", d)
    cat.upsert("db", "mor", d.filter(col("doc_id") % 3 === 0)
      .withColumn("lang", lit("d1")))
    cat.upsert("db", "mor", d.filter(col("doc_id") % 5 === 0)
      .withColumn("n_chars", col("n_chars") + 1L))
    val queries = Seq(
      "agg_all" -> "SELECT count(*) AS n, sum(n_chars) AS s FROM g.db.mor",
      "filter_proj" -> ("SELECT doc_id, lang, n_chars FROM g.db.mor " +
        "WHERE n_chars > 500 AND lang <> 'd1'"),
      "group_lang" -> ("SELECT lang, count(*) AS n, avg(n_chars) AS a " +
        "FROM g.db.mor GROUP BY lang"))
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
      val on = (1 to runs).map(_ => time(mode = true, q)).min
      val off = (1 to runs).map(_ => time(mode = false, q)).min
      // sanity: the plans actually differ
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
