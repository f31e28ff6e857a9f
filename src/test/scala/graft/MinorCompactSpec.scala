package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.sources.GraftCatalog

/**
 * Minor (small-file) compaction — the streaming-ingest maintenance op:
 * rewrite only the small data dirs, leave the large base untouched, keep
 * every read path (time travel, countRows, zone pruning, changelog,
 * deletion vectors) exact.
 */
class MinorCompactSpec extends SparkSpecBase {

  private lazy val warehouse = Files.createTempDirectory("graft-mcwh").toString
  private lazy val gc: GraftCatalog = new GraftCatalog(spark, warehouse)

  override def beforeAll(): Unit = {
    super.beforeAll()
    gc.createSchema("db")
  }

  private def rows(lo: Long, hi: Long) =
    spark.range(lo, hi + 1).selectExpr("id", "concat('v', id) AS v")

  test("compactSmall merges only the small dirs; base dir untouched") {
    gc.createTable("db", "t1", rows(0, 0).schema)
    gc.append("db", "t1", rows(0, 49999).toDF())          // large base (snap-1)
    (1 to 3).foreach(i =>
      gc.append("db", "t1", rows(100000L + i * 10, 100000L + i * 10 + 9).toDF()))
    val before = gc.read("db", "t1").count()
    val preSnap = gc.snapshots("db", "t1").map(_.id).max
    val id = gc.compactSmall("db", "t1", smallBytes = 64 << 10)
    assert(id.isDefined && id.get === preSnap + 1)
    // file list: the untouched base + ONE fresh dir
    val dirs = gc.filesTable("db", "t1").select("file_dir").collect()
      .map(_.getString(0)).sorted
    assert(dirs.length === 2, s"expected base + merged dir, got $dirs")
    assert(dirs.contains("snap-1"), "large base dir must be untouched")
    // content identical, metadata count exact, zones serve the new dir
    assert(gc.read("db", "t1").count() === before)
    assert(gc.countRows("db", "t1") === Some(before))
    assert(gc.readWhere("db", "t1", col("id") >= 100000L).count() === 30)
    // time travel: the pre-compact snapshot still resolves its dirs
    assert(gc.read("db", "t1", snapshotId = Some(preSnap)).count() === before)
    // changelog: the compaction snapshot re-emits NOTHING
    assert(gc.readChangelog("db", "t1", preSnap, id.get).count() === 0)
    // expiration reclaims the replaced dirs once unreferenced
    gc.expireSnapshots("db", "t1", keepLast = 1)
    val left = new java.io.File(s"$warehouse/db/t1").listFiles()
      .filter(_.getName.startsWith("snap-")).map(_.getName).sorted
    assert(left.toSeq === dirs.toSeq,
      s"replaced dirs must be reclaimed after expiration, disk has $left")
    assert(gc.read("db", "t1").count() === before)
  }

  test("compactSmall skips DV-dirty dirs and needs two clean candidates") {
    gc.createTable("db", "t2", rows(0, 0).schema,
      options = Map("deletion-vectors" -> "true"))
    (1 to 3).foreach(i =>
      gc.append("db", "t2", rows(i * 100L, i * 100L + 9).toDF()))
    // dirty snap-1: delete one of its rows via a deletion vector
    gc.deleteWhere("db", "t2", col("id") === 100L)
    val before = gc.read("db", "t2").count() // 29
    val id = gc.compactSmall("db", "t2", smallBytes = 64 << 10)
    assert(id.isDefined)
    val dirs = gc.filesTable("db", "t2").select("file_dir", "kind").collect()
      .map(r => (r.getString(0), r.getString(1)))
    // dirty snap-1 and its DV dir survive; snap-2 + snap-3 merged
    assert(dirs.exists(_._1 == "snap-1"), s"DV-dirty dir must be skipped: $dirs")
    assert(dirs.count(_._2 == "data") === 2, s"expected dirty + merged: $dirs")
    assert(gc.read("db", "t2").count() === before)
    assert(gc.countRows("db", "t2") === Some(before))
    // with only ONE clean small dir left, another run is a no-op
    assert(gc.compactSmall("db", "t2", smallBytes = 64 << 10) === None)
  }

  test("compactSmall refuses PK tables; full compact still serves them") {
    gc.createTable("db", "t3", rows(0, 0).schema, primaryKey = Seq("id"))
    gc.upsert("db", "t3", rows(1, 10).toDF())
    val e = intercept[IllegalArgumentException](
      gc.compactSmall("db", "t3"))
    assert(e.getMessage.contains("primary key"), e.getMessage)
  }

  test("a concurrent commit aborts compactSmall, never the reverse") {
    gc.createTable("db", "t4", rows(0, 0).schema)
    (1 to 3).foreach(i =>
      gc.append("db", "t4", rows(i * 10L, i * 10L + 9).toDF()))
    val other = new GraftCatalog(spark, warehouse)
    var fired = false
    gc.commitTestHook = () => if (!fired) {
      fired = true
      other.append("db", "t4", rows(1000L, 1009L).toDF())
    }
    try {
      val e = intercept[java.util.ConcurrentModificationException](
        gc.compactSmall("db", "t4", smallBytes = 64 << 10))
      assert(e.getMessage.contains("concurrent"), e.getMessage)
    } finally gc.commitTestHook = () => ()
    // the concurrent append survived intact; re-run merges all four
    assert(gc.read("db", "t4").count() === 40)
    assert(gc.compactSmall("db", "t4", smallBytes = 64 << 10).isDefined)
    assert(gc.read("db", "t4").count() === 40)
    assert(gc.filesTable("db", "t4").count() === 1)
  }

  test("compactSmall survives schema evolution: old dirs map forward") {
    gc.createTable("db", "t5", rows(0, 0).schema)
    gc.append("db", "t5", rows(1, 10).toDF())
    gc.renameColumn("db", "t5", "v", "w")
    gc.append("db", "t5", rows(11, 20).toDF()
      .withColumnRenamed("v", "w"))
    val id = gc.compactSmall("db", "t5", smallBytes = 64 << 10)
    assert(id.isDefined)
    val out = gc.read("db", "t5")
    assert(out.columns.toSeq === Seq("id", "w"))
    assert(out.count() === 20)
    assert(out.filter(col("w") === "v5").count() === 1)
    // the merged dir is at the CURRENT schema version: no mixed-version
    // entries left, so the read-optimized path resolves
    assert(gc.resolvedSnapshotId("db", "t5").contains(id.get))
  }

  test("auto-compaction options trigger from commits; chain terminates") {
    import spark.implicits._
    // minor: 4 small appends accumulate, the 4th commit merges them
    gc.createTable("db", "ac", Seq((1L, "x")).toDF("id", "v").schema,
      options = Map("compaction.min.small-files" -> "4"))
    (1 to 3).foreach(i => gc.append("db", "ac", Seq((i.toLong, s"v$i")).toDF("id", "v")))
    assert(gc.snapshotFileEntries("db", "ac").size === 3) // below threshold
    gc.append("db", "ac", Seq((4L, "v4")).toDF("id", "v"))
    // the 4th commit triggered compactSmall: one merged dir remains
    assert(gc.snapshotFileEntries("db", "ac").size === 1)
    assert(gc.read("db", "ac").count() === 4)
    // full: dir count cap on a PK table
    gc.createTable("db", "ac2", Seq((1L, "x")).toDF("id", "v").schema,
      options = Map("compaction.max-file-dirs" -> "3"), primaryKey = Seq("id"))
    (1 to 4).foreach(i => gc.upsert("db", "ac2", Seq((i.toLong, s"v$i")).toDF("id", "v")))
    assert(gc.snapshotFileEntries("db", "ac2").size <= 3)
    assert(gc.read("db", "ac2").count() === 4)
    // validation
    intercept[IllegalArgumentException](gc.createTable("db", "acbad",
      Seq((1L, "x")).toDF("id", "v").schema,
      options = Map("compaction.min.small-files" -> "1")))
  }
}
