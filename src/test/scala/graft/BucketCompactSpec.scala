package graft

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.GraftCatalog

/**
 * Per-bucket compaction — Paimon's actual compaction granularity (its
 * CompactManager folds one bucket's sorted runs when that bucket's run
 * count trips `num-sorted-run.compaction-trigger`; compaction is never
 * table-wide): fold ONLY the chosen buckets, leave every other bucket's
 * bytes untouched, keep time travel exact, and reclaim retired subtrees
 * at expiration.
 */
class BucketCompactSpec extends SparkSpecBase {

  private def freshCatalog(): (GraftCatalog, String) = {
    val wh = Files.createTempDirectory("graft-bc-wh").toString
    val c = new GraftCatalog(spark, wh)
    c.createSchema("db")
    (c, wh)
  }

  private def rows(n: Long, tag: String) =
    spark.range(0, n).selectExpr("id", s"concat('$tag', id) AS v")

  private def img(c: GraftCatalog, t: String): Seq[(Long, String)] = {
    import spark.implicits._
    c.read("db", t).as[(Long, String)].collect().toSeq.sorted
  }

  test("compacted buckets fold to one run; other buckets' dirs untouched; " +
      "merged image identical") {
    import spark.implicits._
    val (c, wh) = freshCatalog()
    c.createTable("db", "t1", rows(1, "a").schema,
      options = Map("bucket" -> "4"), primaryKey = Seq("id"))
    c.upsert("db", "t1", rows(1000, "a").toDF())
    c.upsert("db", "t1", rows(1000, "b").filter(col("id") % 3 === 0).toDF())
    c.deleteWhere("db", "t1", col("id") % 10 === 7)
    val pre = img(c, "t1")
    val runsPre = c.bucketSortedRuns("db", "t1")
    // 1000 ids hash into every bucket; each of the 3 commits (2 data +
    // 1 tombstone) contributes a run to each
    assert((0 until 4).forall(k => runsPre(k) === 3), s"runs: $runsPre")
    c.compactBuckets("db", "t1", Seq(0, 1))
    assert(img(c, "t1") === pre)
    val runs = c.bucketSortedRuns("db", "t1")
    assert(runs(0) === 1 && runs(1) === 1, s"runs after: $runs")
    assert(runs(2) === 3 && runs(3) === 3, s"untouched buckets changed: $runs")
    // the compacted dir holds ONLY buckets 0 and 1
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val newDir = c.filesTable("db", "t1").orderBy(desc("file_dir"))
      .select("file_dir").as[String].collect()
      .maxBy(d => d.stripPrefix("snap-").takeWhile(_.isDigit).toInt)
    val subs = fs.listStatus(new Path(s"$wh/db/t1/$newDir"))
      .map(_.getPath.getName).filter(_.startsWith("__bucket=")).sorted
    assert(subs.toSeq === Seq("__bucket=0", "__bucket=1"),
      s"compacted dir should hold only the folded buckets: ${subs.toSeq}")
    // prior dirs keep ALL their subdirs until expiration (time travel)
    val old = fs.listStatus(new Path(s"$wh/db/t1/snap-1"))
      .map(_.getPath.getName).filter(_.startsWith("__bucket=")).sorted
    assert(old.length === 4, s"pre-compact dir lost subdirs: ${old.toSeq}")
    // per-bucket reads agree with the merged image
    val viaBuckets = (0 until 4).flatMap(k =>
      c.readBucket("db", "t1", k).as[(Long, String)].collect()).sorted
    assert(viaBuckets === pre)
    // $files exposes the retirement
    val retired = c.filesTable("db", "t1")
      .select("file_dir", "retired_buckets").as[(String, String)]
      .collect().toMap
    assert(retired("snap-1") === "0,1" && retired(newDir) === "")
  }

  test("time travel resolves the pre-compact image; expiration reclaims " +
      "retired subtrees and reads stay exact") {
    val (c, wh) = freshCatalog()
    c.createTable("db", "t2", rows(1, "a").schema,
      options = Map("bucket" -> "2"), primaryKey = Seq("id"))
    c.upsert("db", "t2", rows(400, "a").toDF())
    c.upsert("db", "t2", rows(400, "b").filter(col("id") % 2 === 0).toDF())
    val preSnap = c.snapshots("db", "t2").map(_.id).max
    val pre = img(c, "t2")
    c.compactBuckets("db", "t2", Seq(0))
    assert(img(c, "t2") === pre)
    import spark.implicits._
    assert(c.read("db", "t2", snapshotId = Some(preSnap))
      .as[(Long, String)].collect().toSeq.sorted === pre)
    // expire everything below the compaction: bucket-0 subtrees of the
    // old dirs are dead to every retained reader — physically reclaimed
    c.expireSnapshots("db", "t2", keepLast = 1)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new Path(s"$wh/db/t2/snap-1/__bucket=0")),
      "retired subtree should be reclaimed once unreferenced")
    assert(fs.exists(new Path(s"$wh/db/t2/snap-1/__bucket=1")),
      "never-compacted bucket must survive")
    assert(img(c, "t2") === pre)
    assert(c.readBucket("db", "t2", 0).count() +
      c.readBucket("db", "t2", 1).count() === pre.size)
  }

  test("num-sorted-run.compaction-trigger auto-compacts hot buckets at " +
      "commit time; cold tables are untouched") {
    val (c, _) = freshCatalog()
    c.createTable("db", "t3", rows(1, "a").schema,
      options = Map("bucket" -> "2",
        "num-sorted-run.compaction-trigger" -> "4"),
      primaryKey = Seq("id"))
    (1 to 3).foreach(i => c.upsert("db", "t3", rows(100, s"w$i").toDF()))
    assert(c.snapshotsTable("db", "t3")
      .filter(col("commit_kind") === "compact").count() === 0,
      "below trigger: no auto compaction")
    val pre = img(c, "t3")
    c.upsert("db", "t3", rows(100, "w4").toDF()) // 4th run trips the trigger
    val kinds = c.snapshotsTable("db", "t3").select("commit_kind")
    import spark.implicits._
    assert(kinds.as[String].collect().count(_ == "compact") === 1)
    val runs = c.bucketSortedRuns("db", "t3")
    assert(runs.values.forall(_ === 1), s"post-trigger runs: $runs")
    assert(img(c, "t3") ===
      pre.map { case (id, _) => (id, s"w4$id") })
  }

  test("num-sorted-run trigger keeps firing on a LIVE deletion-vector " +
      "table: the auto fold builds + retires, reads stay merge-free") {
    val (c, _) = freshCatalog()
    c.createTable("db", "t3dv", rows(1, "a").schema,
      options = Map("bucket" -> "2", "deletion-vectors" -> "true",
        "num-sorted-run.compaction-trigger" -> "4"),
      primaryKey = Seq("id"))
    (1 to 2).foreach(i => c.upsert("db", "t3dv", rows(100, s"w$i").toDF()))
    c.buildDeletionVectors("db", "t3dv") // DVs now LIVE
    (3 to 4).foreach(i => c.upsert("db", "t3dv", rows(100, s"w$i").toDF()))
    // 4 data runs accumulated >= trigger: the auto per-bucket fold must
    // have fired DESPITE live DVs (pre-r15 it threw and was swallowed)
    val runs = c.bucketSortedRuns("db", "t3dv")
    assert(runs.values.forall(_ === 1), s"post-trigger runs: $runs")
    val df = c.read("db", "t3dv")
    assert(!df.queryExecution.executedPlan.toString.contains("Window"))
    assert(img(c, "t3dv") === (0L until 100L).map(id => (id, s"w4$id")))
    assert(c.countRows("db", "t3dv") === Some(100L))
  }

  test("a fully-dead bucket set (live rows all DV'd) still RETIRES its " +
      "bytes instead of no-op-looping forever (r17)") {
    import spark.implicits._
    val (c, wh) = freshCatalog()
    c.createTable("db", "dead", rows(1, "a").schema,
      options = Map("bucket" -> "2", "deletion-vectors" -> "true"),
      primaryKey = Seq("id"))
    c.upsert("db", "dead", rows(100, "a").toDF())
    c.deleteWhere("db", "dead", lit(true)) // every row dead
    c.buildDeletionVectors("db", "dead")
    val preId = c.snapshots("db", "dead").map(_.id).max
    // the fold has zero live rows but the buckets hold dead bytes: the
    // commit must land retirement marks (pre-r17 it returned the head id
    // and the dead subtrees were never reclaimable)
    val cid = c.compactBuckets("db", "dead", Seq(0, 1))
    assert(cid > preId, "retirement must commit, not no-op")
    assert(c.read("db", "dead").count() === 0)
    // a SECOND invocation is now the true no-op — the loop terminates
    assert(c.compactBuckets("db", "dead", Seq(0, 1)) === cid)
    // expiration reclaims the retired subtrees
    c.expireSnapshots("db", "dead", keepLast = 1)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    (0 to 1).foreach(b => assert(
      !fs.exists(new Path(s"$wh/db/dead/snap-1/__bucket=$b")),
      s"dead bucket $b's bytes must be reclaimed"))
    assert(c.read("db", "dead").count() === 0)
    // buckets that NEVER held rows stay a true no-op on the DV fold
    // path (no empty-snapshot churn)
    c.createTable("db", "hollow", rows(1, "a").schema,
      options = Map("bucket" -> "4", "deletion-vectors" -> "true"),
      primaryKey = Seq("id"))
    c.upsert("db", "hollow", rows(1, "a").toDF()) // id 0 → one bucket
    c.deleteWhere("db", "hollow", col("id") === 0)
    c.buildDeletionVectors("db", "hollow") // DVs live → DV fold path
    val h = c.snapshots("db", "hollow").map(_.id).max
    val neverHeld = (0 to 3).filter(b => !new java.io.File(
      s"$wh/db/hollow/snap-1/__bucket=$b").exists)
    assert(neverHeld.size === 3, s"one bucket holds id 0, got $neverHeld")
    assert(c.compactBuckets("db", "hollow", neverHeld) === h)
  }

  test("sequence.field arbitration survives per-bucket compaction: a late " +
      "small-sequence batch still loses to the compacted image") {
    import spark.implicits._
    val (c, _) = freshCatalog()
    val base = spark.range(0, 200).selectExpr(
      "id", "concat('v', id) AS v", "id + 1000 AS seq")
    def build(t: String, compactAt: Option[Seq[Int]]): Seq[(Long, String, Long)] = {
      c.createTable("db", t, base.schema,
        options = Map("bucket" -> "2", "sequence.field" -> "seq"),
        primaryKey = Seq("id"))
      c.upsert("db", t, base.toDF())
      c.upsert("db", t, base.filter(col("id") % 4 === 0)
        .withColumn("v", concat(lit("NEW"), col("id")))
        .withColumn("seq", col("seq") + 5000L))
      compactAt.foreach(bs => c.compactBuckets("db", t, bs))
      // LATE batch: strictly smaller sequence for every key — all lose,
      // whether the current winner sits in a compacted or raw run
      c.upsert("db", t, base.withColumn("v", lit("LATE"))
        .withColumn("seq", col("seq") - 900L))
      // genuinely newer versions for id % 5 == 0
      c.upsert("db", t, base.filter(col("id") % 5 === 0)
        .withColumn("v", concat(lit("W4"), col("id")))
        .withColumn("seq", col("seq") + 9000L))
      c.read("db", t).as[(Long, String, Long)].collect().toSeq.sorted
    }
    val got = build("t4", Some(Seq(0)))
    assert(got === build("t4ref", None))
    assert(got.count(_._2 == "LATE") === 0)
  }

  test("chained compactions of different buckets accumulate retirements; " +
      "partitioned + bucketed layout folds per bucket across partitions") {
    import spark.implicits._
    val (c, _) = freshCatalog()
    val d = spark.range(0, 300).selectExpr(
      "CASE WHEN id % 3 = 0 THEN 'x' WHEN id % 3 = 1 THEN 'y' ELSE 'z' END AS p",
      "id", "concat('v', id) AS v")
    def build(t: String, compact: Boolean): Seq[(String, Long, String)] = {
      c.createTable("db", t, d.schema, partitionBy = Seq("p"),
        options = Map("bucket" -> "2"), primaryKey = Seq("p", "id"))
      c.upsert("db", t, d.toDF())
      c.upsert("db", t, d.filter(col("id") % 2 === 0)
        .withColumn("v", concat(lit("w2-"), col("id"))).toDF())
      if (compact) c.compactBuckets("db", t, Seq(0))
      c.deleteWhere("db", t, col("id") % 7 === 3)
      if (compact) c.compactBuckets("db", t, Seq(1))
      c.upsert("db", t, d.filter(col("id") % 9 === 1)
        .withColumn("v", concat(lit("w3-"), col("id"))).toDF())
      c.read("db", t).as[(String, Long, String)].collect().toSeq.sorted
    }
    val got = build("t5", compact = true)
    assert(got === build("t5ref", compact = false))
    // snap-1 was first retired for bucket 0, then for bucket 1
    val retired = c.filesTable("db", "t5")
      .select("file_dir", "retired_buckets").as[(String, String)]
      .collect().toMap
    assert(retired("snap-1") === "0,1", s"retirements: $retired")
  }

  test("the compaction snapshot serializes as an O(1) delta: one added " +
      "entry plus an xbuckets list, never a re-serialized file list") {
    val (c, wh) = freshCatalog()
    c.createTable("db", "t6", rows(1, "a").schema,
      options = Map("bucket" -> "2"), primaryKey = Seq("id"))
    (1 to 6).foreach(i => c.upsert("db", "t6", rows(50, s"w$i").toDF()))
    val headBytesBefore = headManifestBytes(wh, "t6")
    c.compactBuckets("db", "t6", Seq(0))
    assert(c.lastManifestBytes.get() - headBytesBefore < 2500,
      s"per-bucket compaction head delta grew " +
        s"${c.lastManifestBytes.get() - headBytesBefore} bytes — not O(1)")
    // the serialized snapshot carries the delta fields
    val head = headManifestJson(wh, "t6")
    assert(head.contains("\"xbuckets\""), "compaction delta must carry xbuckets")
  }

  test("refusal matrix: dynamic bucket, append-only, non-bucketed PK, " +
      "out-of-range ids; hot-bucket sweep is a no-op off the layout") {
    val (c, _) = freshCatalog()
    c.createTable("db", "dyn", rows(1, "a").schema,
      options = Map("bucket" -> "-1"), primaryKey = Seq("id"))
    c.upsert("db", "dyn", rows(20, "a").toDF())
    intercept[IllegalArgumentException](c.compactBuckets("db", "dyn", Seq(0)))
    c.createTable("db", "ap", rows(1, "a").schema)
    c.append("db", "ap", rows(20, "a").toDF())
    intercept[IllegalArgumentException](c.compactBuckets("db", "ap", Seq(0)))
    c.createTable("db", "pk", rows(1, "a").schema, primaryKey = Seq("id"))
    c.upsert("db", "pk", rows(20, "a").toDF())
    intercept[IllegalArgumentException](c.compactBuckets("db", "pk", Seq(0)))
    c.createTable("db", "fx", rows(1, "a").schema,
      options = Map("bucket" -> "2"), primaryKey = Seq("id"))
    c.upsert("db", "fx", rows(20, "a").toDF())
    intercept[IllegalArgumentException](c.compactBuckets("db", "fx", Seq(2)))
    assert(c.compactHotBuckets("db", "ap") === None)
    assert(c.compactHotBuckets("db", "dyn") === None)
  }

  test("SQL surface: CALL sys.compact_buckets / compact_hot_buckets") {
    import spark.implicits._
    val (c, wh) = freshCatalog()
    spark.conf.set("spark.sql.catalog.gbc", "graft.sources.GraftSparkCatalog")
    spark.conf.set("spark.sql.catalog.gbc.warehouse", wh)
    c.createTable("db", "t7", rows(1, "a").schema,
      options = Map("bucket" -> "2"), primaryKey = Seq("id"))
    (1 to 5).foreach(i => c.upsert("db", "t7", rows(60, s"w$i").toDF()))
    val pre = img(c, "t7")
    val sid = spark.sql(
      "CALL gbc.sys.compact_buckets(table => 'db.t7', buckets => '0')")
      .as[Long].head()
    assert(sid > 0 && img(c, "t7") === pre)
    assert(c.bucketSortedRuns("db", "t7")(0) === 1)
    val sid2 = spark.sql(
      "CALL gbc.sys.compact_hot_buckets(table => 'db.t7', trigger => 5)")
      .as[Long].head()
    assert(sid2 > sid, "bucket 1 still has 5 runs — the sweep must fire")
    assert(c.bucketSortedRuns("db", "t7").values.forall(_ === 1))
    assert(img(c, "t7") === pre)
  }

  private def headManifestBytes(wh: String, t: String): Long = {
    val dir = new java.io.File(s"$wh/db/$t")
    dir.listFiles().filter(f => f.getName.startsWith("manifest-v") &&
      f.getName.endsWith(".json")).maxBy(f =>
      f.getName.stripPrefix("manifest-v").stripSuffix(".json").toLong).length()
  }

  private def headManifestJson(wh: String, t: String): String = {
    val dir = new java.io.File(s"$wh/db/$t")
    val f = dir.listFiles().filter(f => f.getName.startsWith("manifest-v") &&
      f.getName.endsWith(".json")).maxBy(f =>
      f.getName.stripPrefix("manifest-v").stripSuffix(".json").toLong)
    new String(java.nio.file.Files.readAllBytes(f.toPath),
      java.nio.charset.StandardCharsets.UTF_8)
  }
}
