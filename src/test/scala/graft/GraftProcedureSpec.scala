package graft

import java.nio.file.Files

import graft.sources.GraftCatalog

/**
 * SQL `CALL` maintenance procedures (Spark 4 DSv2 ProcedureCatalog):
 * compact / sort_compact / compact_small / expire_snapshots / rollback /
 * tags / remove_orphan_files over the catalog's operational surface.
 */
class GraftProcedureSpec extends SparkSpecBase {

  private lazy val warehouse = Files.createTempDirectory("graft-prwh").toString
  private lazy val gc: GraftCatalog = new GraftCatalog(spark, warehouse)

  override def beforeAll(): Unit = {
    super.beforeAll()
    spark.conf.set("spark.sql.catalog.gp", "graft.sources.GraftSparkCatalog")
    spark.conf.set("spark.sql.catalog.gp.warehouse", warehouse)
    gc.createSchema("db")
  }

  private def mk(t: String): Unit = {
    import spark.implicits._
    gc.createTable("db", t, Seq((1L, "x")).toDF("id", "v").schema)
    (1 to 3).foreach(i => gc.append("db", t,
      (1L to 20L).map(j => (i * 100L + j, s"v$i-$j")).toDF("id", "v")))
  }

  test("compact and expire via CALL; defaults and named args") {
    mk("p1")
    val sid = spark.sql("CALL gp.sys.compact(table => 'db.p1')").head().getLong(0)
    assert(sid === 4L)
    assert(gc.read("db", "p1").count() === 60)
    // named arg + explicit retain
    val dropped = spark.sql(
      "CALL gp.sys.expire_snapshots(table => 'db.p1', retain_last => 1)")
      .head().getLong(0)
    assert(dropped === 3L)
    assert(gc.snapshots("db", "p1").map(_.id) === Seq(4L))
    // default retain_last (10) — nothing to drop
    assert(spark.sql("CALL gp.sys.expire_snapshots('db.p1')")
      .head().getLong(0) === 0L)
  }

  test("tags and rollback via CALL") {
    mk("p2")
    assert(spark.sql("CALL gp.sys.create_tag('db.p2', 'v1', 2)")
      .head().getLong(0) === 2L)
    // default snapshot_id = -1 → latest
    assert(spark.sql("CALL gp.sys.create_tag('db.p2', 'head')")
      .head().getLong(0) === 3L)
    assert(gc.tags("db", "p2") === Map("v1" -> 2L, "head" -> 3L))
    spark.sql("CALL gp.sys.delete_tag('db.p2', 'head')")
    assert(spark.sql("CALL gp.sys.rollback_to_tag('db.p2', 'v1')")
      .head().getLong(0) === 2L)
    assert(gc.read("db", "p2").count() === 40)
    // rolling past a pinned tag refuses; after deleting it, it proceeds
    intercept[Exception](spark.sql("CALL gp.sys.rollback('db.p2', 1)"))
    spark.sql("CALL gp.sys.delete_tag('db.p2', 'v1')")
    assert(spark.sql("CALL gp.sys.rollback('db.p2', 1)").head().getLong(0) === 1L)
    assert(gc.read("db", "p2").count() === 20)
  }

  test("sort_compact, compact_small, remove_orphan_files via CALL") {
    mk("p3")
    val sid = spark.sql(
      "CALL gp.sys.sort_compact(table => 'db.p3', order_by => 'id', ranges => 4)")
      .head().getLong(0)
    assert(sid === 4L)
    assert(gc.read("db", "p3").count() === 60)
    mk("p4")
    // every dir here is tiny → minor compaction merges them
    val sid2 = spark.sql(
      "CALL gp.sys.compact_small(table => 'db.p4')").head().getLong(0)
    assert(sid2 === 4L)
    assert(gc.read("db", "p4").count() === 60)
    assert(spark.sql("CALL gp.sys.remove_orphan_files('db.p4', 0)")
      .head().getLong(0) === 0L)
    // listProcedures via SHOW PROCEDURES
    val names = spark.sql("SHOW PROCEDURES IN gp.sys").collect()
      .map(_.toSeq.mkString(" ")).mkString(" ")
    assert(names.contains("compact") && names.contains("expire_snapshots"))
    // unknown procedure fails loudly
    val e = intercept[Exception](spark.sql("CALL gp.sys.nope('db.p4')"))
    assert(e.getMessage.contains("nope") || e.getMessage.contains("FAILED"))
  }

  test("expire_partitions via CALL drops date partitions before the mark") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    gc.createTable("db", "pexp", StructType(Seq(
      StructField("id", LongType), StructField("day", StringType))),
      partitionBy = Seq("day"))
    gc.append("db", "pexp", Seq(
      (1L, "2026-01-01"), (2L, "2026-08-01")).toDF("id", "day"))
    val n = spark.sql("CALL gp.sys.expire_partitions(table => 'db.pexp', " +
      "before_date => '2026-06-01')").head().getLong(0)
    assert(n === 1L)
    assert(gc.read("db", "pexp").select("id").as[Long].collect().toSeq === Seq(2L))
  }

  test("consumer procedures: set pins history through expiration, drop releases") {
    mk("p5")
    assert(spark.sql("CALL gp.sys.set_consumer('db.p5', 'etl', 2)")
      .head().getLong(0) === 2L)
    assert(gc.consumerOffsets("db", "p5") === Map("etl" -> 2L))
    // unread (>= 2) and the replay basis (1) survive; nothing drops here
    assert(spark.sql("CALL gp.sys.expire_snapshots('db.p5', 1)")
      .head().getLong(0) === 0L)
    spark.sql("CALL gp.sys.drop_consumer('db.p5', 'etl')")
    assert(gc.consumerOffsets("db", "p5").isEmpty)
    assert(spark.sql("CALL gp.sys.expire_snapshots('db.p5', 1)")
      .head().getLong(0) === 2L)
  }

  test("ANALYZE records column statistics; $statistics exposes them " +
      "with the analyzed snapshot id") {
    import spark.implicits._
    gc.createTable("db", "p6",
      Seq((1L, "x", 1.0)).toDF("id", "name", "score").schema)
    gc.append("db", "p6", Seq(
      (1L, "a", 1.5), (2L, "b", 2.5), (3L, null, 3.5), (4L, "a", null))
      .map { case (i, n, s) => (i, n,
        if (s == null) null else s.asInstanceOf[java.lang.Double]) }
      .toDF("id", "name", "score"))
    // before analyze: the view exists and is empty
    assert(spark.sql("SELECT * FROM gp.db.`p6$statistics`").count() === 0)
    val sid = spark.sql("CALL gp.sys.analyze('db.p6')").head().getLong(0)
    assert(sid === 1L)
    val st = spark.sql("SELECT * FROM gp.db.`p6$statistics`")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(st.keySet === Set("id", "name", "score"))
    val id = st("id")
    assert(id.getAs[Long]("row_count") === 4L)
    assert(id.getAs[Long]("null_count") === 0L)
    assert(id.getAs[Long]("ndv") === 4L) // HLL exact at tiny cardinality
    assert(id.getAs[String]("min") === "1" && id.getAs[String]("max") === "4")
    val nm = st("name")
    assert(nm.getAs[Long]("null_count") === 1L)
    assert(nm.getAs[Long]("ndv") === 2L) // nulls don't count toward NDV
    assert(nm.getAs[Double]("avg_len") === 1.0)
    assert(st("score").getAs[Long]("null_count") === 1L)
    assert(st.values.forall(_.getAs[Long]("snapshot_id") === 1L))
    assert(st.values.forall(!_.getAs[Boolean]("stale")))
    // re-analyze after more data: stats refresh and re-tag; in between,
    // the view SURFACES the staleness (r16 — the analyzed snapshot is no
    // longer the head, so scans are planning without these numbers)
    gc.append("db", "p6", Seq((5L, "ccc",
      Double.box(9.0))).toDF("id", "name", "score"))
    val stale = spark.sql("SELECT * FROM gp.db.`p6$statistics`").collect()
    assert(stale.nonEmpty && stale.forall(_.getAs[Boolean]("stale")))
    assert(spark.sql("CALL gp.sys.analyze('db.p6')").head().getLong(0) === 2L)
    val st2 = spark.sql("SELECT * FROM gp.db.`p6$statistics`")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(st2("id").getAs[Long]("row_count") === 5L)
    assert(st2("id").getAs[String]("max") === "5")
    assert(st2("name").getAs[Long]("snapshot_id") === 2L)
    assert(st2.values.forall(!_.getAs[Boolean]("stale")))
  }

  test("fast_forward_diff reports WHY a diverged branch is refused; a " +
      "clean branch reports fast_forwardable") {
    import spark.implicits._
    gc.createTable("db", "ffd", Seq((1L, "x")).toDF("id", "v").schema)
    gc.append("db", "ffd", Seq((1L, "a")).toDF("id", "v"))
    gc.createBranch("db", "ffd", "dev")
    // branch advances cleanly: one row, fast_forwardable
    gc.append("db", "ffd$branch_dev", Seq((2L, "b")).toDF("id", "v"))
    val clean = spark.sql(
      "CALL gp.sys.fast_forward_diff(table => 'db.ffd', branch => 'dev')")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(clean.length === 1 && clean.head._2 === "fast_forwardable",
      s"clean branch should be adoptable: ${clean.toSeq}")
    assert(clean.head._3.contains("1 snapshot"))
    // now the BASE advances too — diverged
    gc.append("db", "ffd", Seq((3L, "c")).toDF("id", "v"))
    val diff = spark.sql(
      "CALL gp.sys.fast_forward_diff(table => 'db.ffd', branch => 'dev')")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(diff.exists(_._2 == "dirs_differ"),
      s"diverged histories must name the differing snapshot: ${diff.toSeq}")
    val d = diff.find(_._2 == "dirs_differ").get
    assert(d._3.contains("base-only") && d._3.contains("branch-only"))
    // the refusal path still throws; the report is the WHY companion
    intercept[Exception] {
      spark.sql("CALL gp.sys.fast_forward(table => 'db.ffd', branch => 'dev')")
        .collect()
    }
  }
}
