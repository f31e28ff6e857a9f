package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.sources.GraftCatalog

/**
 * Hierarchical manifest tier — the O(delta) commit-metadata contract
 * (Paimon's snapshot → manifest-list → manifest-file shape, which the
 * reference connector plans from via SnapshotReader): the head
 * `manifest-v<N>.json` carries only tiny delta-encoded snapshot entries
 * plus per-dir aggregates, per-FILE zones live in each dir's immutable
 * `.zones.json` sidecar, and commit metadata WRITE bytes therefore scale
 * with the commit, never with the table's total file count. Without this,
 * every streaming micro-batch commit on a 10⁵-file table would rewrite
 * O(table) JSON through the driver.
 */
class ManifestScaleSpec extends SparkSpecBase {

  private lazy val warehouse = Files.createTempDirectory("graft-mswh").toString
  private lazy val gc: GraftCatalog = new GraftCatalog(spark, warehouse)

  override def beforeAll(): Unit = {
    super.beforeAll()
    gc.createSchema("db")
  }

  private def rows(lo: Long, hi: Long) =
    spark.range(lo, hi + 1).selectExpr(
      "id", "id * 2 AS a", "id % 7 AS b", "concat('s', id) AS s")

  /** Append `n` rows split over `files` parquet files; returns the
    * (headBytes, sidecarBytes) this commit wrote. */
  private def appendFiles(table: String, lo: Long, files: Int): (Long, Long) = {
    val s0 = gc.sidecarBytesWritten.get()
    gc.append("db", table, rows(lo, lo + 99).repartition(files).toDF())
    (gc.lastManifestBytes.get(), gc.sidecarBytesWritten.get() - s0)
  }

  test("commit write bytes are O(commit), not O(table file count)") {
    gc.createTable("db", "t1", rows(0, 0).schema)
    // phase A: small commits (2 files each)
    val a = (0 until 5).map(i => appendFiles("t1", i * 1000L, files = 2))
    // phase B: 15× more files per commit — and a growing table behind it
    val b = (0 until 5).map(i => appendFiles("t1", 100000L + i * 1000L, files = 30))
    val headGrowthA = (1 until a.size).map(i => a(i)._1 - a(i - 1)._1)
    val headGrowthB = (1 until b.size).map(i => b(i)._1 - b(i - 1)._1)
    // HEAD growth per commit is flat: a delta snapshot entry + one
    // dir-level aggregate, independent of how many FILES the commit (or
    // the table) holds. The monolithic layout would grow the head by
    // ~files × cols × ~100 B per commit (≈10 KB+ at 30 files).
    (headGrowthA ++ headGrowthB).foreach { g =>
      assert(g >= 0 && g < 3000,
        s"head manifest grew $g bytes in one commit — not O(delta); " +
          s"A=$headGrowthA B=$headGrowthB")
    }
    assert(math.abs(headGrowthB.sum / headGrowthB.size -
        headGrowthA.sum / headGrowthA.size) < 1200,
      s"15× more files per commit changed per-commit head growth: " +
        s"A=$headGrowthA B=$headGrowthB")
    // the per-file payload went to the SIDECAR and scales with the
    // commit's own files — 30-file commits write substantially more
    // sidecar bytes than 2-file commits, and the head stays smaller than
    // the cumulative sidecar payload it replaced
    val sideA = a.map(_._2).sum / a.size
    val sideB = b.map(_._2).sum / b.size
    assert(sideB > 5 * sideA,
      s"sidecar bytes should scale with commit files: avg 2-file=$sideA, avg 30-file=$sideB")
  }

  test("replace-subset commits serialize {removed, added}, never the " +
      "surviving table list") {
    gc.createTable("db", "rs1", rows(0, 0).schema)
    // many dirs, two of them tiny — minor compaction replaces just those
    (0 until 12).foreach(i =>
      gc.append("db", "rs1", rows(i * 10000L, i * 10000L + 4999).toDF()))
    gc.append("db", "rs1", rows(500000L, 500001L).toDF())
    gc.append("db", "rs1", rows(600000L, 600001L).toDF())
    val before = gc.lastManifestBytes.get()
    val merged = gc.compactSmall("db", "rs1", smallBytes = 16 << 10)
    assert(merged.isDefined, "compactSmall must merge the two tiny dirs")
    val growth = gc.lastManifestBytes.get() - before
    assert(growth < 3000,
      s"replace-subset head growth $growth bytes — serialized the " +
        "surviving table list instead of the {removed, added} delta")
    // the serialized snapshot carries the delta form, not a files array
    val dir = new java.io.File(warehouse, "db/rs1")
    val head = dir.listFiles().filter(_.getName.startsWith("manifest-v"))
      .maxBy(f => f.getName.stripPrefix("manifest-v").stripSuffix(".json").toLong)
    val json = new String(java.nio.file.Files.readAllBytes(head.toPath))
    val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(json)
    val snaps = node.get("snapshots")
    val last = snaps.get(snaps.size() - 1)
    assert(last.has("removed") && last.has("added") && !last.has("files"),
      s"expected delta form on the replace snapshot, got: $last")
    // round trip: a fresh catalog materializes the same image
    val gc2 = new GraftCatalog(spark, warehouse)
    assert(gc2.read("db", "rs1").count() === 12 * 5000 + 4)
    // expiration dropping the replace commit's BASE re-materializes it
    gc.createTag("db", "rs1", "pin") // pin the head (the replace commit)
    gc.expireSnapshots("db", "rs1", keepLast = 1)
    assert(new GraftCatalog(spark, warehouse).read("db", "rs1").count()
      === 12 * 5000 + 4)
  }

  test("chained replace deltas inflate correctly; rollback across them " +
      "is clean") {
    import spark.implicits._
    val cat = gc
    cat.createTable("db", "rs2", rows(0, 0).schema,
      partitionBy = Seq("b"))
    // three appends over partitions 0..6 (b = id % 7)
    (0 until 3).foreach(i =>
      cat.append("db", "rs2", rows(i * 100L, i * 100L + 69).toDF()))
    // replace commit 1: expire partition b=0; replace commit 2: b=1 —
    // two CONSECUTIVE {removed, added} deltas chained on each other
    cat.expirePartitions("db", "rs2", col("b") === 0L)
    cat.expirePartitions("db", "rs2", col("b") === 1L)
    val expect = (0 until 3).flatMap(i => (i * 100L) to (i * 100L + 69))
      .filterNot(id => id % 7 == 0 || id % 7 == 1).toSet
    assert(new GraftCatalog(spark, warehouse).read("db", "rs2")
      .select("id").as[Long].collect().toSet === expect,
      "chained replace deltas must materialize through a fresh parse")
    // rollback to before the second replace: b=1 rows come back
    cat.rollbackTo("db", "rs2", 4L)
    val expect1 = (0 until 3).flatMap(i => (i * 100L) to (i * 100L + 69))
      .filterNot(id => id % 7 == 0).toSet
    assert(new GraftCatalog(spark, warehouse).read("db", "rs2")
      .select("id").as[Long].collect().toSet === expect1)
    // and time travel to the pre-expiration image still works
    assert(cat.read("db", "rs2", snapshotId = Some(3L)).count() === 210L)
  }

  test("snapshot log is delta-encoded: a dir serializes O(1) times") {
    gc.createTable("db", "t2", rows(0, 0).schema)
    (0 until 12).foreach(i => gc.append("db", "t2", rows(i * 10L, i * 10L + 9).toDF()))
    val dir = new java.io.File(s"$warehouse/db/t2")
    val head = dir.listFiles().filter(_.getName.matches("manifest-v\\d+\\.json"))
      .maxBy(_.getName.stripPrefix("manifest-v").stripSuffix(".json").toInt)
    val text = new String(Files.readAllBytes(head.toPath))
    // snap-3 is referenced by snapshots 3..12; the legacy full-list head
    // serialized it ~10 times. Delta form: once in snapshot 3's `added`,
    // once as its dirStats key.
    val hits = "\"snap-3\"".r.findAllIn(text).size
    assert(hits <= 3, s"snap-3 serialized $hits times — full lists leaked into the head")
    // and reads still see every cumulative image
    assert(gc.read("db", "t2").count() === 120)
    assert(gc.read("db", "t2", snapshotId = Some(3L)).count() === 30)
    assert(gc.snapshots("db", "t2").map(_.id) === (1L to 12L))
  }

  test("zone sidecars are read once per process and serve pruning") {
    gc.createTable("db", "t3", rows(0, 0).schema)
    (0 until 4).foreach(i =>
      gc.append("db", "t3", rows(i * 100L, i * 100L + 99).repartition(3).toDF()))
    val l0 = GraftCatalog.zoneSidecarLoads.get()
    // dir-level zones prune snap dirs; per-file zones (sidecar) refine
    val pruned = gc.readWhere("db", "t3", col("id") between (0, 50))
    assert(pruned.count() === 51)
    val l1 = GraftCatalog.zoneSidecarLoads.get()
    assert(l1 > l0, "per-file pruning should have loaded zone sidecars")
    // second query over the same manifest: all sidecars cached by token
    assert(gc.readWhere("db", "t3", col("id") between (100, 150)).count() === 51)
    assert(GraftCatalog.zoneSidecarLoads.get() === l1,
      "cached sidecars must not be re-opened")
    // countRows stays metadata-only from the head aggregates
    assert(gc.countRows("db", "t3") === Some(400L))
  }

  test("expiration reclaims zone and bloom sidecars with their dirs") {
    gc.createTable("db", "t4", rows(0, 0).schema,
      options = Map("file-index.bloom-filter.columns" -> "s"))
    (0 until 4).foreach(i =>
      gc.append("db", "t4", rows(i * 100L, i * 100L + 99).toDF()))
    gc.compact("db", "t4") // snapshot 5 references only the compacted dir
    def sidecarsUnder(): Seq[String] = {
      val out = scala.collection.mutable.ArrayBuffer[String]()
      def walk(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(walk)
        else if (f.getName == GraftCatalog.ZoneSidecar ||
          f.getParentFile.getName == ".bloomidx") out += f.getPath
      }
      walk(new java.io.File(s"$warehouse/db/t4"))
      out.toSeq
    }
    assert(sidecarsUnder().nonEmpty)
    gc.expireSnapshots("db", "t4", keepLast = 1)
    val left = sidecarsUnder()
    // every surviving sidecar lives in a dir a kept snapshot references
    val keptDirs = gc.snapshots("db", "t4").flatMap(s =>
      gc.filesTable("db", "t4", snapshotId = Some(s.id))
        .select("file_dir").collect().map(_.getString(0))).distinct
    left.foreach { p =>
      assert(keptDirs.exists(d => p.contains(s"/$d/")),
        s"orphaned sidecar survived expiration: $p (kept dirs: $keptDirs)")
    }
    assert(gc.read("db", "t4").count() === 400)
  }

  test("expiration keeping a tag-pinned middle snapshot round-trips") {
    gc.createTable("db", "t5", rows(0, 0).schema)
    (1 to 5).foreach(i => gc.append("db", "t5", rows(i * 10L, i * 10L + 9).toDF()))
    gc.createTag("db", "t5", "pin", Some(2L))
    // keep last 2 (4, 5) + pinned 2; snapshots 1 and 3 drop — snapshot
    // 4's delta base (3) is gone, so the next head write must
    // materialize its full list, and snapshot 2's base (1) likewise
    val dropped = gc.expireSnapshots("db", "t5", keepLast = 2)
    assert(dropped.toSet === Set(1L, 3L))
    assert(gc.snapshots("db", "t5").map(_.id) === Seq(2L, 4L, 5L))
    // every kept snapshot still resolves its cumulative image (2 kept
    // its inherited snap-1 dir entry even though snapshot 1 dropped —
    // wait: snap-1's DIR is still referenced by snapshot 2+, so it
    // survives dir deletion; only the snapshot ENTRY dropped)
    assert(gc.read("db", "t5", snapshotId = Some(2L)).count() === 20)
    assert(gc.read("db", "t5", snapshotId = Some(4L)).count() === 40)
    assert(gc.read("db", "t5").count() === 50)
    // a fresh commit on top of the re-based log still delta-encodes
    gc.append("db", "t5", rows(100L, 109L).toDF())
    assert(gc.read("db", "t5").count() === 60)
    assert(gc.snapshots("db", "t5").map(_.id) === Seq(2L, 4L, 5L, 6L))
    // and a cold reader (fresh catalog instance) inflates the same state
    val cold = new GraftCatalog(spark, warehouse)
    assert(cold.read("db", "t5").count() === 60)
    assert(cold.read("db", "t5", snapshotId = Some(4L)).count() === 40)
  }

  test("head cache: repeat reads skip the parse; drop+recreate never stale") {
    gc.createTable("db", "t8", rows(0, 0).schema)
    gc.append("db", "t8", rows(1, 10).toDF())
    assert(gc.read("db", "t8").count() === 10)
    val l0 = GraftCatalog.headCacheLoads.get()
    // repeat reads of the unchanged head hit the cache (the commit above
    // pre-warmed it) — no re-parse
    assert(gc.read("db", "t8").count() === 10)
    assert(gc.countRows("db", "t8") === Some(10L))
    assert(GraftCatalog.headCacheLoads.get() === l0,
      "unchanged head must be served from cache")
    // a second catalog instance in the same process shares the cache
    val other = new GraftCatalog(spark, warehouse)
    assert(other.read("db", "t8").count() === 10)
    assert(GraftCatalog.headCacheLoads.get() === l0)
    // the stale-cache trap: drop + recreate restarts version numbering
    // on the SAME manifest-v1.json path — the old table's head must
    // never serve the new table
    gc.dropTable("db", "t8")
    gc.createTable("db", "t8", rows(0, 0).schema)
    gc.append("db", "t8", rows(100, 104).toDF())
    assert(gc.read("db", "t8").count() === 5)
    assert(gc.read("db", "t8").agg(org.apache.spark.sql.functions.min("id"))
      .head.getLong(0) === 100L)
  }

  test("a corrupt delta chain fails loudly, never silently drops files") {
    gc.createTable("db", "t7", rows(0, 0).schema)
    gc.append("db", "t7", rows(1, 10).toDF())
    gc.append("db", "t7", rows(11, 20).toDF()) // delta vs snapshot 1
    val dir = new java.io.File(s"$warehouse/db/t7")
    def headFile = dir.listFiles()
      .filter(_.getName.matches("manifest-v\\d+\\.json"))
      .maxBy(_.getName.stripPrefix("manifest-v").stripSuffix(".json").toInt)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val m = mapper.readTree(headFile).asInstanceOf[
      com.fasterxml.jackson.databind.node.ObjectNode]
    // strip snapshot 1 from the serialized log: snapshot 2's {baseId: 1,
    // added} delta now has no resolvable base
    val snaps = m.get("snapshots").asInstanceOf[
      com.fasterxml.jackson.databind.node.ArrayNode]
    assert(snaps.get(1).has("baseId"), "precondition: snapshot 2 is a delta")
    snaps.remove(0)
    val v = m.get("commitVersion").asLong() + 1
    m.put("commitVersion", v)
    java.nio.file.Files.write(
      new java.io.File(dir, s"manifest-v$v.json").toPath,
      mapper.writeValueAsBytes(m))
    val e = intercept[IllegalArgumentException](gc.read("db", "t7"))
    assert(e.getMessage.contains("corrupt manifest"), e.getMessage)
  }

  test("rollback truncates the delta log cleanly and ordinal reuse is safe") {
    gc.createTable("db", "t6", rows(0, 0).schema)
    (1 to 4).foreach(i => gc.append("db", "t6", rows(i * 10L, i * 10L + 9).toDF()))
    gc.rollbackTo("db", "t6", 2L)
    assert(gc.read("db", "t6").count() === 20)
    // reused ordinals get fresh dirs + fresh sidecar tokens — stale
    // cached zones must not serve the new snap-3
    gc.append("db", "t6", rows(1000L, 1099L).toDF())
    assert(gc.read("db", "t6").count() === 120)
    assert(gc.readWhere("db", "t6", col("id") >= 1000L).count() === 100)
    assert(gc.countRows("db", "t6") === Some(120L))
  }

  test("$partitions answers from sidecar stats — zero driver footer opens") {
    import graft.sources.FileStats
    gc.createTable("db", "t10", rows(0, 0).schema)
    (0 until 3).foreach(i =>
      gc.append("db", "t10", rows(i * 100L, i * 100L + 99).repartition(4).toDF()))
    val f0 = FileStats.driverFooterReads.get()
    val parts = gc.partitionsTable("db", "t10").collect()
    assert(parts.map(_.getLong(4)).sum === 300) // exact row counts
    assert(parts.map(_.getLong(2)).sum === 12)  // 3 dirs × 4 files
    assert(FileStats.driverFooterReads.get() === f0,
      "partitionsTable opened parquet footers on the driver — the " +
        "sidecar row counts should have answered")
  }

  test("$manifests lists heads and live sidecars; expiration shrinks it") {
    gc.createTable("db", "t9", rows(0, 0).schema,
      options = Map("file-index.bloom-filter.columns" -> "id"))
    (1 to 3).foreach(i => gc.append("db", "t9", rows(i * 100L, i * 100L + 49).toDF()))
    def art(kind: String) = gc.manifestsTable("db", "t9")
      .filter(col("artifact") === kind).collect()
    val heads = art("head")
    assert(heads.nonEmpty && heads.forall(_.getLong(3) > 0))
    // head versions are the retained manifest chain, ascending
    val versions = heads.map(_.getLong(2)).toSeq
    assert(versions === versions.sorted)
    // one zone sidecar and one bloom tree per live data dir
    assert(art("zones").length === 3)
    assert(art("bloom").length === 3)
    assert(art("zones").forall(r => r.getString(1).endsWith(".zones.json")
      && r.getLong(2) == -1L && r.getLong(3) > 0))
    // SQL surface: the suffix view serves the same rows
    spark.conf.set("spark.sql.catalog.gms", "graft.sources.GraftSparkCatalog")
    spark.conf.set("spark.sql.catalog.gms.warehouse", warehouse)
    val viaSql = spark.sql("SELECT artifact, count(*) AS n FROM gms.db.`t9$manifests` " +
      "GROUP BY artifact ORDER BY artifact").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(viaSql("zones") === 3 && viaSql("bloom") === 3 && viaSql("head") >= 1)
    // overwrite drops the old dirs from the head; expiration reclaims
    // their sidecars and the view tracks it
    gc.overwrite("db", "t9", rows(0L, 49L).toDF())
    gc.expireSnapshots("db", "t9", keepLast = 1)
    assert(art("zones").length === 1)
    assert(art("bloom").length === 1)
  }

  test("heavy metadata writers stay O(commit) on the head: DV builds " +
      "(dvIndex), write-time changelog (coverage links), dynamic-bucket " +
      "index flags — each node grows by its own commit's entries only") {
    def headAfter(op: => Unit): Long = { op; gc.lastManifestBytes.get() }
    def check(name: String, heads: Seq[Long], bound: Long): Unit = {
      val g = (1 until heads.size).map(i => heads(i) - heads(i - 1))
      g.foreach(d => assert(d >= 0 && d < bound,
        s"$name head grew $d bytes in one round — not O(commit): $g"))
      // flat, not compounding: the last round's growth must not dwarf
      // the early rounds' (a node re-serializing O(history) per commit
      // would show super-linear growth here)
      assert(g.last < 3 * math.max(g.head, 500L),
        s"$name head growth compounds over rounds: $g")
    }
    // (1) DV-building PK table: each round overlaps 50 keys, so every
    // rebuild finds victims and appends a dvIndex entry
    gc.createTable("db", "hdv", rows(0, 0).schema,
      options = Map("deletion-vectors" -> "true"), primaryKey = Seq("id"))
    check("dvIndex", (0 until 6).map { i =>
      headAfter {
        gc.upsert("db", "hdv", rows(i * 50L, i * 50L + 99).toDF())
        gc.buildDeletionVectors("db", "hdv")
      }
    }, bound = 5000)
    // (2) lookup producer: every commit pairs a `-cl` dir + coverage link
    gc.createTable("db", "hcl", rows(0, 0).schema,
      options = Map("changelog-producer" -> "lookup"), primaryKey = Seq("id"))
    check("changelog", (0 until 6).map { i =>
      headAfter(gc.upsert("db", "hcl", rows(i * 50L, i * 50L + 99).toDF()))
    }, bound = 5000)
    // (3) dynamic bucket: every commit lands a `.dbidx` delta + dynIdx flag
    gc.createTable("db", "hdb", rows(0, 0).schema,
      options = Map("bucket" -> "-1"), primaryKey = Seq("id"))
    check("dynIdx", (0 until 6).map { i =>
      headAfter(gc.upsert("db", "hdb", rows(i * 50L, i * 50L + 99).toDF()))
    }, bound = 5000)
  }
}
