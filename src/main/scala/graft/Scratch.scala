package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway measurement scratchpad (not committed). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try SparkEntry.queries("q1_agg")(spark, sfDir).count() catch { case _: Throwable => }
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[phase] $label ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    (1 to 2).foreach { round =>
      println(s"=== round $round ===")
      val wh = java.nio.file.Files.createTempDirectory("scratch-wh").toString
      val cat = new graft.sources.GraftCatalog(spark, wh)
      val d = graft.sources.Tables(spark, sfDir, "documents")
      cat.createSchema("q")
      t("createTable a")(cat.createTable("q", "ta", d.select("doc_id", "lang").schema,
        options = Map("bucket" -> "8"), primaryKey = Seq("doc_id")))
      t("createTable b")(cat.createTable("q", "tb", d.select("doc_id", "n_chars").schema,
        options = Map("bucket" -> "8"), primaryKey = Seq("doc_id")))
      t("upsert a full")(cat.upsert("q", "ta", d.select("doc_id", "lang")))
      t("upsert a 10%")(cat.upsert("q", "ta", d.filter(col("doc_id") % 10 === 0)
        .select(col("doc_id"), lit("UPDATED").as("lang"))))
      t("upsert b full")(cat.upsert("q", "tb", d.select("doc_id", "n_chars")))
      t("deleteWhere b")(cat.deleteWhere("q", "tb", col("doc_id") % 7 === 3))
      val j = t("bucketedJoin plan")(cat.bucketedJoin("q", "ta", "tb").orderBy("doc_id"))
      t("bucketedJoin exec")(j.queryExecution.toRdd.count())
    }
    spark.stop()
  }
}
