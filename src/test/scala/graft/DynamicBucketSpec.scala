package graft

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.GraftCatalog

/**
 * Dynamic bucket mode (Paimon's `bucket = -1`): key→bucket assignment
 * through the persisted hash index — buckets fill to
 * `dynamic-bucket.target-row-num` assigned keys, new buckets open as
 * needed, a key keeps its bucket for life, and the index rides each
 * commit as an immutable `.dbidx` parquet delta.
 */
class DynamicBucketSpec extends SparkSpecBase {

  private def freshCatalog(): (GraftCatalog, String) = {
    val wh = Files.createTempDirectory("graft-dynb-wh").toString
    (new GraftCatalog(spark, wh), wh)
  }

  private val kvSchema = StructType(Seq(
    StructField("id", LongType), StructField("v", StringType)))

  private def create(cat: GraftCatalog, table: String, target: Long): Unit = {
    cat.createSchema("db")
    cat.createTable("db", table, kvSchema, primaryKey = Seq("id"),
      options = Map("bucket" -> "-1",
        "dynamic-bucket.target-row-num" -> target.toString))
  }

  /** bucket id → distinct ids found in that bucket's data dirs, read
    * straight from the `__bucket=k` physical layout. */
  private def bucketContents(cat: GraftCatalog, wh: String,
      table: String): Map[Int, Set[Long]] = {
    import spark.implicits._
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val base = new Path(new Path(wh, "db"), table)
    val out = scala.collection.mutable.Map[Int, Set[Long]]()
      .withDefaultValue(Set.empty)
    cat.snapshotFileEntries("db", table).filter(_.kind == "data").foreach { fe =>
      val d = new Path(base, fe.dir)
      if (fs.exists(d)) fs.listStatus(d).foreach { st =>
        val nm = st.getPath.getName
        if (nm.startsWith("__bucket=")) {
          val k = nm.stripPrefix("__bucket=").toInt
          val ids = spark.read.parquet(st.getPath.toString)
            .select("id").as[Long].collect().toSet
          out(k) = out(k) ++ ids
        }
      }
    }
    out.toMap
  }

  test("new keys fill buckets to target-row-num and open fresh buckets; " +
      "existing keys keep their bucket across commits") {
    import spark.implicits._
    val (cat, wh) = freshCatalog()
    create(cat, "t", target = 10L)
    // 25 keys → 3 buckets (10 + 10 + 5 assigned keys)
    cat.upsert("db", "t", (1L to 25L).map(i => (i, s"v$i")).toDF("id", "v"))
    val c1 = bucketContents(cat, wh, "t")
    assert(c1.keySet === Set(0, 1, 2), s"expected 3 buckets, got ${c1.keySet}")
    assert(c1.values.map(_.size).sum === 25)
    assert(c1(0).size === 10 && c1(1).size === 10 && c1(2).size === 5)
    // updates: same keys land in the SAME buckets (no new assignment)
    cat.upsert("db", "t", (1L to 25L).map(i => (i, s"w$i")).toDF("id", "v"))
    val c2 = bucketContents(cat, wh, "t")
    assert(c2 === c1, "updates must not move keys")
    // merged read returns the latest version per key
    val img = cat.read("db", "t").as[(Long, String)].collect().toMap
    assert(img.size === 25 && img(7L) === "w7")
    // new keys fill bucket 2's remaining capacity, then open bucket 3
    cat.upsert("db", "t", (26L to 40L).map(i => (i, s"v$i")).toDF("id", "v"))
    val c3 = bucketContents(cat, wh, "t")
    assert(c3.keySet === Set(0, 1, 2, 3))
    assert(c3(2).size === 10, "bucket 2 must fill to target before 3 opens")
    assert(c3(3).size === 10)
    assert(cat.read("db", "t").count() === 40)
  }

  test("deletes route through the index; unknown-key tombstones are no-ops") {
    import spark.implicits._
    val (cat, wh) = freshCatalog()
    create(cat, "d", target = 8L)
    cat.upsert("db", "d", (1L to 20L).map(i => (i, s"v$i")).toDF("id", "v"))
    val before = bucketContents(cat, wh, "d")
    cat.deleteRowsByKey("db", "d", Seq(3L, 11L, 999L).toDF("id"))
    val img = cat.read("db", "d").select("id").as[Long].collect().toSet
    assert(img === ((1L to 20L).toSet -- Set(3L, 11L)))
    val bucketOf3 = before.collectFirst { case (k, s) if s.contains(3L) => k }.get
    // re-inserting a deleted key keeps its ORIGINAL bucket (index entries
    // survive deletes — slots are reclaimed only at compaction)
    cat.upsert("db", "d", Seq((3L, "back")).toDF("id", "v"))
    val after = bucketContents(cat, wh, "d")
    assert(after(bucketOf3).contains(3L), "re-inserted key must keep its bucket")
    assert(cat.read("db", "d").filter($"id" === 3L).select("v").as[String]
      .head() === "back")
  }

  test("compaction folds the index into the compacted dir and reclaims " +
      "dead keys' capacity; expiration then drops the old deltas safely") {
    import spark.implicits._
    val (cat, wh) = freshCatalog()
    create(cat, "c", target = 10L)
    cat.upsert("db", "c", (1L to 10L).map(i => (i, s"v$i")).toDF("id", "v"))
    cat.upsert("db", "c", (11L to 20L).map(i => (i, s"v$i")).toDF("id", "v"))
    cat.deleteRowsByKey("db", "c", (6L to 10L).toDF("id"))
    cat.compact("db", "c")
    cat.expireSnapshots("db", "c", keepLast = 1)
    // all pre-compact dirs (and their .dbidx deltas) are gone from disk;
    // routing still works off the folded index in the compacted dir
    assert(cat.read("db", "c").count() === 15)
    cat.upsert("db", "c", (21L to 26L).map(i => (i, s"v$i")).toDF("id", "v"))
    val c = bucketContents(cat, wh, "c")
    assert(cat.read("db", "c").count() === 21)
    // dead keys 6-10 released their slots at compaction: bucket 0 had 10
    // assigned, 5 live → 5 of the new keys refill it before a new bucket
    assert(c(0).size === 10, s"bucket 0 must refill to target, got ${c(0).size}")
    assert(c.values.map(_.size).sum === 21)
  }

  test("overwrite resets the index; point lookups route via dynamicBucketFor") {
    import spark.implicits._
    val (cat, wh) = freshCatalog()
    create(cat, "o", target = 6L)
    cat.upsert("db", "o", (1L to 12L).map(i => (i, s"v$i")).toDF("id", "v"))
    cat.overwrite("db", "o", (100L to 104L).map(i => (i, s"n$i")).toDF("id", "v"))
    val c = bucketContents(cat, wh, "o")
    assert(c.keySet === Set(0), "fresh index starts at bucket 0")
    assert(cat.read("db", "o").count() === 5)
    // point lookup: assigned key resolves to its bucket, absent key to None
    assert(cat.dynamicBucketFor("db", "o", Seq(102L)) === Some(0))
    assert(cat.dynamicBucketFor("db", "o", Seq(1L)) === None)
    assert(cat.readBucket("db", "o", 0).count() === 5)
    val img = cat.read("db", "o").filter($"id" === 102L)
      .as[(Long, String)].collect()
    assert(img.toSeq === Seq((102L, "n102")))
  }

  test("dynamic tables refuse fixed-bucket machinery and concurrent commits") {
    import spark.implicits._
    val (cat, wh) = freshCatalog()
    create(cat, "r", target = 5L)
    cat.upsert("db", "r", (1L to 8L).map(i => (i, s"v$i")).toDF("id", "v"))
    intercept[IllegalArgumentException](cat.rescaleBucket("db", "r", 4))
    intercept[IllegalArgumentException](cat.bucketFor("db", "r", Seq(1L)))
    intercept[IllegalArgumentException](cat.bucketedJoin("db", "r", "r"))
    // create-time validation
    intercept[IllegalArgumentException](cat.createTable("db", "bad", kvSchema,
      options = Map("bucket" -> "-2"), primaryKey = Seq("id")))
    intercept[IllegalArgumentException](cat.createTable("db", "bad2", kvSchema,
      options = Map("dynamic-bucket.target-row-num" -> "7"),
      primaryKey = Seq("id")))
    // a commit racing another writer ABORTS (index-derived routing is
    // never rebaseable), instead of rebasing like fixed-layout appends
    val cat2 = new GraftCatalog(spark, wh)
    cat.commitTestHook = () => {
      cat.commitTestHook = () => ()
      cat2.upsert("db", "r", Seq((100L, "race")).toDF("id", "v")); ()
    }
    try {
      intercept[java.util.ConcurrentModificationException] {
        cat.upsert("db", "r", Seq((200L, "mine")).toDF("id", "v"))
      }
    } finally cat.commitTestHook = () => ()
    // the winner's row landed; the loser's did not
    val ids = cat.read("db", "r").select("id").as[Long].collect().toSet
    assert(ids.contains(100L) && !ids.contains(200L))
  }

  test("routing fuzz: random upserts/deletes/compactions preserve the " +
      "image, bucket stability, and the capacity bound") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val (cat, wh) = freshCatalog()
    val target = 7L
    create(cat, "f", target)
    var model = Map[Long, String]()      // expected image
    var assigned = Map[Long, Int]()      // observed bucket per assigned key
    for (step <- 0 until 12) {
      rnd.nextInt(4) match {
        case 0 | 1 =>
          val ups = (0 until (1 + rnd.nextInt(12)))
            .map(_ => rnd.nextInt(60).toLong).distinct
            .map(k => (k, s"v$step-$k"))
          cat.upsert("db", "f", ups.toDF("id", "v"))
          model ++= ups
        case 2 if model.nonEmpty =>
          val victims = model.keys.toSeq.sorted
            .filter(_ => rnd.nextBoolean()).take(5)
          if (victims.nonEmpty) {
            cat.deleteRowsByKey("db", "f", victims.toDF("id"))
            model --= victims
            // index entries survive the delete — a re-insert before any
            // compaction must return to the SAME bucket, so keep the
            // observed assignment
          }
        case _ =>
          cat.compact("db", "f")
          // compaction folds only LIVE assignments: dead keys release
          // their slots and may re-assign anywhere later
          assigned = assigned.filter { case (k, _) => model.contains(k) }
      }
      val img = cat.read("db", "f").as[(Long, String)].collect().toMap
      assert(img === model, s"step $step: image mismatch")
      val bc = bucketContents(cat, wh, "f")
      val byKey = bc.toSeq.flatMap { case (b, ks) => ks.map(_ -> b) }
        .groupBy(_._1).map { case (k, bs) => k -> bs.map(_._2).distinct }
      byKey.foreach { case (k, bs) =>
        assert(bs.size === 1, s"step $step: key $k in buckets $bs")
      }
      // capacity: no bucket ever holds more ASSIGNED keys than target
      bc.foreach { case (b, ks) =>
        assert(ks.size <= target, s"step $step: bucket $b has ${ks.size} keys")
      }
      // stability: previously observed assignments never move
      val now = byKey.map { case (k, bs) => k -> bs.head }
      assigned.foreach { case (k, b) =>
        now.get(k).foreach(nb =>
          assert(nb === b, s"step $step: key $k moved $b -> $nb"))
      }
      assigned ++= now
    }
  }

  test("index delta bytes stay O(batch) as the table grows") {
    import spark.implicits._
    val (cat, wh) = freshCatalog()
    create(cat, "g", target = 1000L)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    def dbidxBytes(dir: String): Long = {
      val p = new Path(new Path(new Path(new Path(wh, "db"), "g"), dir), ".dbidx")
      if (fs.exists(p)) fs.getContentSummary(p).getLength else 0L
    }
    // 8 commits of 100 new keys each: every commit's index delta must
    // stay ~the size of the FIRST one (O(batch)), never grow with the
    // table — the commit-metadata contract of the hierarchical layout
    val sizes = (0 until 8).map { i =>
      cat.upsert("db", "g",
        (1L to 100L).map(j => (i * 1000L + j, s"v$j")).toDF("id", "v"))
      val dirs = cat.snapshotFileEntries("db", "g").filter(_.kind == "data")
      dbidxBytes(dirs.last.dir)
    }
    assert(sizes.forall(_ > 0), s"every commit writes a delta: $sizes")
    assert(sizes.max <= sizes.head * 2,
      s"index delta grew with table size: $sizes")
    // an update-only commit (no new keys) writes NO delta at all
    cat.upsert("db", "g", (1L to 100L).map(j => (j, "upd")).toDF("id", "v"))
    val dirs = cat.snapshotFileEntries("db", "g").filter(_.kind == "data")
    assert(dbidxBytes(dirs.last.dir) === 0L, "update-only commit wrote a delta")
  }

  test("index-only fold consolidates .dbidx deltas without rewriting any " +
      "data bytes; auto-triggers on the delta-count option") {
    import spark.implicits._
    val (cat, wh) = freshCatalog()
    cat.createSchema("db")
    cat.createTable("db", "f", kvSchema, primaryKey = Seq("id"),
      options = Map("bucket" -> "-1",
        "dynamic-bucket.target-row-num" -> "50",
        "dynamic-bucket.index-fold.deltas" -> "0")) // manual first
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    (0 until 6).foreach { i =>
      cat.upsert("db", "f",
        (1L to 20L).map(j => (i * 100L + j, s"v$j")).toDF("id", "v"))
    }
    assert(cat.dynIdxDeltaCount("db", "f") === 6)
    val dataDirsBefore = cat.snapshotFileEntries("db", "f")
      .filter(_.kind == "data").map(_.dir)
    val mtimes = dataDirsBefore.map { d =>
      d -> fs.getFileStatus(new Path(new Path(new Path(wh, "db"), "f"), d))
        .getModificationTime
    }.toMap
    val foldId = cat.foldDynamicBucketIndex("db", "f")
    assert(foldId > 0, "fold should commit a snapshot")
    // ONE delta dir now backs routing reads
    assert(cat.dynIdxDeltaCount("db", "f") === 1, "fold must leave one delta")
    // zero data rewrites: every data dir survives byte-identical (same
    // dirs, untouched mtimes), and the folded routing stays exact
    val dataDirsAfter = cat.snapshotFileEntries("db", "f")
      .filter(_.kind == "data").map(_.dir)
    assert(dataDirsAfter === dataDirsBefore, "fold must not touch data dirs")
    dataDirsAfter.foreach { d =>
      val t = fs.getFileStatus(
        new Path(new Path(new Path(wh, "db"), "f"), d)).getModificationTime
      assert(t === mtimes(d), s"fold rewrote data dir $d")
    }
    assert(cat.read("db", "f").count() === 120)
    // routing after the fold: existing keys keep their buckets
    val before = bucketContents(cat, wh, "f")
    cat.upsert("db", "f", Seq((1L, "UPD"), (501L, "new")).toDF("id", "v"))
    val after = bucketContents(cat, wh, "f")
    before.foreach { case (k, ids) =>
      assert(ids.subsetOf(after(k)), s"fold moved keys out of bucket $k")
    }
    assert(cat.read("db", "f").filter(col("id") === 1L)
      .head().getString(1) === "UPD")
    // repeated folds don't stack index-only dirs: at most one idx entry
    cat.foldDynamicBucketIndex("db", "f")
    val idxDirs = cat.snapshotFileEntries("db", "f").filter(_.kind == "idx")
    assert(idxDirs.size <= 1, s"index-only dirs accumulated: $idxDirs")
    // auto-trigger: with the option at 3, the third delta folds back to 1
    cat.createTable("db", "fa", kvSchema, primaryKey = Seq("id"),
      options = Map("bucket" -> "-1",
        "dynamic-bucket.target-row-num" -> "50",
        "dynamic-bucket.index-fold.deltas" -> "3"))
    (0 until 3).foreach { i =>
      cat.upsert("db", "fa",
        (1L to 10L).map(j => (i * 100L + j, s"v$j")).toDF("id", "v"))
    }
    assert(cat.dynIdxDeltaCount("db", "fa") === 1,
      "auto fold should have consolidated the index at the threshold")
    assert(cat.read("db", "fa").count() === 30)
  }

  test("oversized batches route through the shuffle path identically") {
    import spark.implicits._
    // Force the backfill arm: with the broadcast cap at 0 every join in
    // dynamicRoute runs un-hinted (shuffle), the path a table-sized key
    // set takes at 100 TB. Routing must be bit-identical to the
    // broadcast arm since only join strategy differs.
    val (catA, whA) = freshCatalog()
    val (catB, whB) = freshCatalog()
    create(catA, "t", 5)
    create(catB, "t", 5)
    val batch1 = (0L until 17L).map(i => (i, s"v$i")).toDF("id", "v")
    val batch2 = (10L until 25L).map(i => (i, s"w$i")).toDF("id", "v")
    catA.upsert("db", "t", batch1)
    catA.upsert("db", "t", batch2)
    spark.conf.set("graft.dynamic-bucket.broadcast-keys", "0")
    try {
      catB.upsert("db", "t", batch1)
      catB.upsert("db", "t", batch2)
    } finally spark.conf.unset("graft.dynamic-bucket.broadcast-keys")
    assert(bucketContents(catA, whA, "t") === bucketContents(catB, whB, "t"),
      "shuffle-path routing must equal broadcast-path routing")
    val a = catA.read("db", "t").orderBy("id").collect().toSeq
    val b = catB.read("db", "t").orderBy("id").collect().toSeq
    assert(a === b)
  }

  test("changelog streaming works over a dynamic-bucket table") {
    import spark.implicits._
    val (cat, _) = freshCatalog()
    create(cat, "s", target = 4L)
    cat.upsert("db", "s", (1L to 6L).map(i => (i, s"v$i")).toDF("id", "v"))
    cat.upsert("db", "s", Seq((2L, "u2"), (7L, "v7")).toDF("id", "v"))
    cat.deleteRowsByKey("db", "s", Seq(5L).toDF("id"))
    val seen = scala.collection.mutable.ArrayBuffer[(Long, String)]()
    val q = cat.readChangelogStream("db", "s")
      .writeStream
      .option("checkpointLocation",
        Files.createTempDirectory("graft-dynb-ckpt").toString)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val rows = b.select("id", GraftCatalog.RowKindCol).collect()
          .map(r => (r.getLong(0), r.getString(1)))
        seen.synchronized { seen ++= rows }; ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    val byId = seen.synchronized(seen.toSeq).groupBy(_._1)
    assert(byId(5L).map(_._2).contains("-D"))
    // upsert-mode kinds carry no before image: a later-batch upsert is
    // +U whether the key is new or updated
    assert(byId(7L).map(_._2).forall(Set("+I", "+U")))
    assert(byId.keySet === (1L to 7L).toSet)
  }

  test("lookup producer on a dynamic-bucket table resolves the before " +
      "image bucket-pruned: a small commit reads O(touched buckets) (r15)") {
    import spark.implicits._
    val (cat, _) = freshCatalog()
    cat.createSchema("db")
    def mkT(t: String, producer: Option[String]): Unit =
      cat.createTable("db", t, kvSchema, primaryKey = Seq("id"),
        options = Map("bucket" -> "-1",
          "dynamic-bucket.target-row-num" -> "500") ++
          producer.map("changelog-producer" -> _))
    mkT("dprod", Some("lookup")); mkT("dtwin", None)
    // 10k keys over ~20 buckets
    Seq("dprod", "dtwin").foreach(t => cat.upsert("db", t,
      (1L to 10000L).map(i => (i, s"v$i")).toDF("id", "v")))
    // small delta: 3 keys — sticky assignment pins them to ≤3 buckets,
    // so the producer's before-image resolve must read ≤3 bucket legs
    // (~500 rows each), never the 10k-row image. Measured as the
    // MARGINAL cost over an identical producer-less commit (the upsert
    // itself pays a .dbidx routing probe either way).
    def smallCommit(t: String): Long = recordsScanned {
      cat.upsert("db", t, Seq((10L, "u10"), (20L, "u20"),
        (5000L, "u5000")).toDF("id", "v"))
    }
    val twin = smallCommit("dtwin")
    val prod = smallCommit("dprod")
    assert(prod - twin < 4000L,
      s"producer resolve cost: $prod vs twin $twin — more than the " +
        "touched buckets' rows, the before image was not bucket-pruned")
    // and the persisted pairs are exactly right (resolved before images)
    val cl = cat.readChangelogFull("db", "dprod", 1, 2)
    assert(!cl.queryExecution.executedPlan.toString.contains("Join"))
    assert(cl.collect().map(_.toString).sorted.toSeq === Seq(
      "[10,u10,+U]", "[10,v10,-U]", "[20,u20,+U]", "[20,v20,-U]",
      "[5000,u5000,+U]", "[5000,v5000,-U]"))
  }
}
