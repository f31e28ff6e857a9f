package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.EventStreams
import graft.streaming.EventStreams.{Ev, Session}

/** Drives the streaming transforms through real readStream execution
  * (MemoryStream source) and checks them against batch semantics. */
class StreamingSpec extends SparkSpecBase {

  private def ts(minute: Int): Timestamp = new Timestamp(minute * 60000L)

  test("windowed aggregation: streaming result equals batch result") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val events = Seq(
      Ev(1, ts(5), 1, "click", 1.0), Ev(2, ts(20), 1, "view", 2.0),
      Ev(3, ts(65), 2, "click", 3.0), Ev(4, ts(70), 2, "click", 4.0),
      Ev(5, ts(130), 1, "view", 5.0))
    val stream = MemoryStream[Ev]
    val query = EventStreams.windowedCounts(stream.toDF())
      .writeStream.format("memory").queryName("win_out")
      .outputMode("complete").start()
    try {
      stream.addData(events.take(3))
      query.processAllAvailable()
      stream.addData(events.drop(3))
      query.processAllAvailable()
      val streamed = spark.table("win_out")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
      val batch = EventStreams.windowedCounts(events.toDF())
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
      assert(streamed === batch)
      assert(batch.exists { case (w, t, n, _) => w == 3600 && t == "click" && n == 2 })
    } finally query.stop()
  }

  test("stateful sessionization closes sessions across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Ev]
    val query = EventStreams.sessionizeStateful(stream.toDS(), gapMinutes = 30)
      .writeStream.format("memory").queryName("sess_out")
      .outputMode("append").start()
    try {
      // user 1: two events close together, then a 40-minute gap.
      stream.addData(Seq(Ev(1, ts(0), 1, "a", 1.0), Ev(2, ts(10), 1, "a", 2.0)))
      query.processAllAvailable()
      assert(spark.table("sess_out").count() === 0) // session still open
      stream.addData(Seq(Ev(3, ts(50), 1, "a", 4.0)))
      query.processAllAvailable()
      val sessions = spark.table("sess_out").as[Session].collect()
      assert(sessions.length === 1)
      val s = sessions.head
      assert(s.user_id === 1 && s.n_events === 2)
      assert(s.start_ms === 0L && s.end_ms === 600000L)
      assert(s.total_value === 3.0)
    } finally query.stop()
  }

  test("streaming dedup drops duplicate ids across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Ev]
    val query = EventStreams.dedupStream(stream.toDF())
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      stream.addData(Seq(Ev(1, ts(1), 1, "a", 1.0), Ev(2, ts(2), 1, "a", 2.0)))
      query.processAllAvailable()
      // same ids again (a replay) plus one new id
      stream.addData(Seq(Ev(1, ts(1), 1, "a", 1.0), Ev(2, ts(2), 1, "a", 2.0),
        Ev(3, ts(3), 1, "a", 3.0)))
      query.processAllAvailable()
      val ids = spark.table("dedup_out").select("event_id")
        .collect().map(_.getLong(0)).sorted
      assert(ids.toSeq === Seq(1L, 2L, 3L))
    } finally query.stop()
  }

  test("streaming near-dedup drops simhash near-copies across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, Timestamp, String)]
    val query = EventStreams.nearDedupStream(
        stream.toDF().toDF("doc_id", "ts", "text"))
      .writeStream.format("memory").queryName("near_dedup_out")
      .outputMode("append").start()
    try {
      val boiler = "the quick brown fox jumps over the lazy dog again and again"
      stream.addData(Seq(
        (1L, ts(1000), boiler),
        (2L, ts(1001), "a genuinely different document about spark engines")))
      query.processAllAvailable()
      // batch 2: an exact repost and a token-reorder near-copy (same
      // token multiset → same simhash) both drop; a new doc survives
      stream.addData(Seq(
        (3L, ts(1010), boiler),
        (4L, ts(1011), "again and again the quick brown fox jumps over the lazy dog"),
        (5L, ts(1012), "completely novel content that matches nothing else here")))
      query.processAllAvailable()
      val ids = spark.table("near_dedup_out").select("doc_id")
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(ids === Seq(1L, 2L, 5L))
    } finally query.stop()
  }

  test("stream-stream join pairs clicks with in-window purchases") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // modern timestamps: near-epoch event times collide with the initial
    // watermark and get state-pruned before they can match
    val base = 1000
    val clicks = MemoryStream[Ev]
    val purchases = MemoryStream[Ev]
    val query = EventStreams.clickToPurchase(
        clicks.toDF(), purchases.toDF(), withinMinutes = 30)
      .writeStream.format("memory").queryName("ss_join_out")
      .outputMode("append").start()
    try {
      clicks.addData(Seq(
        Ev(1, ts(base + 0), 1, "click", 0.0),
        Ev(4, ts(base + 5), 2, "click", 0.0)))     // user 2: no purchase
      purchases.addData(Seq(
        Ev(2, ts(base + 10), 1, "purchase", 9.99), // within 30 min of click 1
        Ev(3, ts(base + 50), 1, "purchase", 5.0))) // outside the window
      query.processAllAvailable()
      val rows = spark.table("ss_join_out")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(rows === Set((1L, 1L, 2L)))
    } finally query.stop()
  }

  test("streaming ingestion into the catalog creates time-travelable snapshots") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val cat = new graft.sources.GraftCatalog(spark,
      java.nio.file.Files.createTempDirectory("graft-stream-wh").toString)
    cat.createSchema("db")
    cat.createTable("db", "t", org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("event_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("value", org.apache.spark.sql.types.DoubleType))))
    val stream = MemoryStream[(Long, Double)]
    val query = cat.streamAppend("db", "t",
      stream.toDF().toDF("event_id", "value"),
      java.nio.file.Files.createTempDirectory("graft-stream-ckpt").toString)
    try {
      stream.addData(Seq((1L, 1.0), (2L, 2.0)))
      query.processAllAvailable()
      stream.addData(Seq((3L, 3.0)))
      query.processAllAvailable()
      assert(cat.snapshots("db", "t").map(_.id) === Seq(1L, 2L))
      assert(cat.read("db", "t").count() === 3)
      assert(cat.read("db", "t", snapshotId = Some(1L)).count() === 2)
      // compaction adds a third snapshot with identical contents
      cat.compact("db", "t")
      assert(cat.snapshots("db", "t").map(_.id) === Seq(1L, 2L, 3L))
      assert(cat.read("db", "t").count() === 3)
      assert(cat.read("db", "t", snapshotId = Some(2L)).count() === 3)
    } finally query.stop()
  }

  test("changelog stream of a bucketed PK table: row kinds, restart exactly-once, compaction skipped") {
    import org.apache.spark.sql.types._
    val wh = java.nio.file.Files.createTempDirectory("graft-cdc-wh").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-cdc-ckpt").toString
    val cat = new graft.sources.GraftCatalog(spark, wh)
    cat.createSchema("db")
    cat.createTable("db", "src", StructType(Seq(
      StructField("id", LongType), StructField("name", StringType))),
      options = Map("bucket" -> "4"), primaryKey = Seq("id"))
    // exactly-once sink: another catalog table via appendStreamBatch
    cat.createTable("db", "out", StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("_row_kind", StringType))))
    import spark.implicits._
    cat.upsert("db", "src", Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "name"))
    cat.deleteWhere("db", "src", org.apache.spark.sql.functions.col("id") === 2L)

    def runOnce(): Unit = {
      val q = cat.readChangelogStream("db", "src").writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
          if (!batch.isEmpty) { cat.appendStreamBatch("db", "out", batch.toDF(), batchId); () }
        }
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    runOnce()
    def image(): Set[(Long, Option[String], String)] =
      cat.read("db", "out").collect()
        .map(r => (r.getLong(0), Option(r.getString(1)), r.getString(2))).toSet
    // one batch covering snapshots (0,2]: key 2's latest change is the
    // tombstone (-D with non-key columns null); 1 and 3 are upserts
    assert(image() === Set((1L, Some("a"), "+U"), (3L, Some("c"), "+U"),
      (2L, None, "-D")))
    // restart from the same checkpoint with new commits: only the delta
    cat.upsert("db", "src", Seq((2L, "back"), (4L, "d")).toDF("id", "name"))
    runOnce()
    assert(image() === Set((1L, Some("a"), "+U"), (3L, Some("c"), "+U"),
      (2L, None, "-D"), (2L, Some("back"), "+U"), (4L, Some("d"), "+U")))
    // a replayed restart with no new snapshots adds nothing (exactly-once)
    runOnce()
    assert(image().size === 5)
    // compaction rewrites bytes, not content: the changelog must skip it
    cat.compact("db", "src")
    runOnce()
    assert(image().size === 5)
    // and a post-compaction commit still streams (delta vs the compacted image)
    cat.deleteWhere("db", "src", org.apache.spark.sql.functions.col("id") === 1L)
    runOnce()
    assert(image().contains((1L, None, "-D")) && image().size === 6)
  }

  test("full changelog: +I/-U/+U/-D with before images across restart; applyChangelog ignores -U") {
    import org.apache.spark.sql.types._
    import spark.implicits._
    val wh = java.nio.file.Files.createTempDirectory("graft-cdcf-wh").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-cdcf-ckpt").toString
    val cat = new graft.sources.GraftCatalog(spark, wh)
    cat.createSchema("db")
    cat.createTable("db", "src", StructType(Seq(
      StructField("id", LongType), StructField("name", StringType))),
      options = Map("bucket" -> "2"), primaryKey = Seq("id"))
    cat.createTable("db", "out", StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("_row_kind", StringType))))
    cat.upsert("db", "src", Seq((1L, "a"), (2L, "b")).toDF("id", "name"))
    def runOnce(): Unit = {
      val q = cat.readChangelogStream("db", "src", mode = "full").writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
          if (!batch.isEmpty) { cat.appendStreamBatch("db", "out", batch.toDF(), batchId); () }
        }
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    def image(): Set[(Long, String, String)] = cat.read("db", "out").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    // batch 1 covers (0,1]: empty before image → every key is a true +I
    runOnce()
    assert(image() === Set((1L, "a", "+I"), (2L, "b", "+I")))
    // restart with an update, an insert, and a delete: batch 2 covers
    // (1,3] and consults the snapshot-1 image — the update retracts its
    // old row, the delete carries the pre-delete row (not a null shell)
    cat.upsert("db", "src", Seq((2L, "b2"), (3L, "c")).toDF("id", "name"))
    cat.deleteWhere("db", "src", org.apache.spark.sql.functions.col("id") === 1L)
    runOnce()
    assert(image() === Set(
      (1L, "a", "+I"), (2L, "b", "+I"),
      (2L, "b", "-U"), (2L, "b2", "+U"), (3L, "c", "+I"), (1L, "a", "-D")))
    // exactly-once: a no-new-data restart adds nothing
    runOnce()
    assert(image().size === 6)
    // applyChangelog on a full changelog: -U images are ignored, the
    // replica converges to the source image
    cat.createTable("db", "dst", StructType(Seq(
      StructField("id", LongType), StructField("name", StringType))),
      primaryKey = Seq("id"))
    val latest = cat.snapshots("db", "src").last.id
    cat.applyChangelog("db", "dst",
      cat.readChangelogFull("db", "src", 0L, latest))
    assert(cat.read("db", "dst").collect().map(r => (r.getLong(0), r.getString(1))).toSet
      === Set((2L, "b2"), (3L, "c")))
    // append-only tables have no before image: full mode refuses
    cat.createTable("db", "ap", StructType(Seq(StructField("id", LongType))))
    intercept[IllegalArgumentException] {
      cat.readChangelogFull("db", "ap", 0L, 0L)
    }
  }

  test("full changelog spans schema evolution: before images map to the current schema") {
    import org.apache.spark.sql.types._
    import spark.implicits._
    val wh = java.nio.file.Files.createTempDirectory("graft-cdfe-wh").toString
    val cat = new graft.sources.GraftCatalog(spark, wh)
    cat.createSchema("db")
    cat.createTable("db", "ev", StructType(Seq(
      StructField("id", LongType), StructField("name", StringType))),
      options = Map("bucket" -> "2"), primaryKey = Seq("id"))
    cat.upsert("db", "ev", Seq((1L, "a"), (2L, "b")).toDF("id", "name")) // snap 1
    cat.addColumn("db", "ev", StructField("score", LongType))
    cat.upsert("db", "ev", Seq((1L, "a2", 10L)).toDF("id", "name", "score")) // snap 2
    // before image written at the OLD schema version: the -U row carries
    // a null score (field-id mapping), the +U row the new value
    val rows = cat.readChangelogFull("db", "ev", 1L, 2L).collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)), r.getString(3))).toSet
    assert(rows === Set(
      (1L, "a", None, "-U"), (1L, "a2", Some(10L), "+U")))
  }

  test("changelog stream rate limit: maxSnapshotsPerTrigger bounds each batch") {
    import org.apache.spark.sql.types._
    import spark.implicits._
    val wh = java.nio.file.Files.createTempDirectory("graft-cdc2-wh").toString
    val cat = new graft.sources.GraftCatalog(spark, wh)
    cat.createSchema("db")
    cat.createTable("db", "s2", StructType(Seq(
      StructField("id", LongType), StructField("v", LongType))),
      primaryKey = Seq("id"))
    (1 to 3).foreach(i => cat.upsert("db", "s2", Seq((i.toLong, i.toLong)).toDF("id", "v")))
    val batches = scala.collection.mutable.ArrayBuffer[Long]()
    val q = cat.readChangelogStream("db", "s2", maxSnapshotsPerTrigger = Some(1))
      .writeStream
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-cdc2-ckpt").toString)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        batches.synchronized { batches += batch.count() }; ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    // one snapshot per trigger: three one-row batches, never one three-row batch
    assert(batches.synchronized(batches.toSeq) === Seq(1L, 1L, 1L))
  }

  test("streaming dedup ingestion: cross-batch near-dups drop against " +
      "the persisted signature table, both tables land exactly-once") {
    import org.apache.spark.sql.types._
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val vocab = Array("alpha", "bravo", "charlie", "delta", "echo", "foxtrot",
      "golf", "hotel", "india", "juliet", "kilo", "lima", "mike", "november")
    def doc(seed: Int): String = {
      val rnd = new scala.util.Random(seed)
      Array.fill(50)(vocab(rnd.nextInt(vocab.length))).mkString(" ")
    }
    val wh = java.nio.file.Files.createTempDirectory("graft-sdedup-wh").toString
    val cat = new graft.sources.GraftCatalog(spark, wh)
    cat.createSchema("db")
    cat.createTable("db", "docs", StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType))))
    cat.createTable("db", "sigs", StructType(Seq(
      StructField("doc_id", LongType),
      StructField("shh", ArrayType(LongType)),
      StructField("sig", ArrayType(LongType)))))
    val stream = MemoryStream[(Long, String)]
    val q = cat.streamDedupAppend("db", "docs", "sigs",
      stream.toDF().toDF("doc_id", "text"),
      java.nio.file.Files.createTempDirectory("graft-sdedup-ckpt").toString,
      "doc_id", "text", tau = 0.6)
    try {
      // batch 1: two distinct docs + an exact in-batch dup (keep-first)
      stream.addData(Seq((1L, doc(1)), (2L, doc(2)), (3L, doc(1))))
      q.processAllAvailable()
      assert(cat.read("db", "docs").select("doc_id").as[Long].collect().toSet
        === Set(1L, 2L))
      // batch 2: a copy of batch-1's doc 2 (cross-batch dup -> drops
      // against the signature table) + one genuinely new doc
      stream.addData(Seq((10L, doc(2)), (11L, doc(99))))
      q.processAllAvailable()
      assert(cat.read("db", "docs").select("doc_id").as[Long].collect().toSet
        === Set(1L, 2L, 11L))
      // the signature table tracks exactly the kept docs
      assert(cat.read("db", "sigs").select("doc_id").as[Long].collect().toSet
        === Set(1L, 2L, 11L))
    } finally q.stop()
    // batchId idempotence: replaying batch 1 through the raw API is a
    // no-op on BOTH tables (the crash-between-appends recovery story)
    assert(!cat.appendStreamBatch("db", "docs",
      Seq((1L, doc(1))).toDF("doc_id", "text"), 0L))
    assert(cat.read("db", "docs").count() === 3L)
  }

  test("scanMode=latest streams only post-start commits; " +
      "from-timestamp starts at the first commit at/after the mark") {
    import org.apache.spark.sql.types._
    import spark.implicits._
    val wh = java.nio.file.Files.createTempDirectory("graft-scanmode-wh").toString
    val cat = new graft.sources.GraftCatalog(spark, wh)
    cat.createSchema("db")
    cat.createTable("db", "sm", StructType(Seq(
      StructField("id", LongType), StructField("v", LongType))),
      primaryKey = Seq("id"))
    cat.upsert("db", "sm", Seq((1L, 1L)).toDF("id", "v"))
    Thread.sleep(15) // distinct commit millis so a between-commits mark exists
    cat.upsert("db", "sm", Seq((2L, 2L)).toDF("id", "v"))

    // latest: history invisible, only the commit made after stream start lands
    val seen = scala.collection.mutable.ArrayBuffer[Long]()
    val q = cat.readChangelogStream("db", "sm", scanMode = "latest")
      .writeStream
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-scanmode-ckpt").toString)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val ids = b.select("id").as[Long].collect()
        seen.synchronized { seen ++= ids }; ()
      }
      .start()
    try {
      q.processAllAvailable()
      assert(seen.synchronized(seen.toSeq).isEmpty) // pre-start history skipped
      cat.upsert("db", "sm", Seq((3L, 3L)).toDF("id", "v"))
      q.processAllAvailable()
      assert(seen.synchronized(seen.toSeq) === Seq(3L))
    } finally q.stop()

    // from-timestamp at snapshot-2's commit time: 2 and 3 replay, 1 does not
    val snaps = cat.snapshots("db", "sm")
    assert(snaps.size === 3)
    val mark = snaps(1).timestampMillis
    assert(snaps.head.timestampMillis < mark) // the sleep made them distinct
    val seen2 = scala.collection.mutable.ArrayBuffer[Long]()
    val q2 = cat.readChangelogStream("db", "sm",
        scanMode = "from-timestamp", fromTimestampMillis = Some(mark))
      .writeStream
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-scanmode-ckpt2").toString)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val ids = b.select("id").as[Long].collect()
        seen2.synchronized { seen2 ++= ids }; ()
      }
      .start()
    try q2.processAllAvailable() finally q2.stop()
    assert(seen2.synchronized(seen2.toSet) === Set(2L, 3L))

    // a mark PAST every commit streams nothing (only the future)
    val seen3 = scala.collection.mutable.ArrayBuffer[Long]()
    val q3 = cat.readChangelogStream("db", "sm",
        scanMode = "from-timestamp",
        fromTimestampMillis = Some(snaps.last.timestampMillis + 60000L))
      .writeStream
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-scanmode-ckpt3").toString)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val ids = b.select("id").as[Long].collect()
        seen3.synchronized { seen3 ++= ids }; ()
      }
      .start()
    try q3.processAllAvailable() finally q3.stop()
    assert(seen3.synchronized(seen3.toSeq).isEmpty)

    // conflicting startup options refuse at source construction (the
    // error surfaces on the stream thread, so observe it via the query)
    val q4 = cat.readChangelogStream("db", "sm", fromSnapshotId = 1L,
      scanMode = "latest").writeStream.format("noop").start()
    val err = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      try q4.processAllAvailable() finally q4.stop()
    }
    assert(err.getMessage.contains("conflicts"))
  }

  test("streaming lookup join enriches each batch against the dim table's " +
      "LATEST image and lands exactly-once") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.types._
    val wh = java.nio.file.Files.createTempDirectory("graft-lookup-wh").toString
    val cat = new graft.sources.GraftCatalog(spark, wh)
    cat.createSchema("db")
    cat.createTable("db", "dim", StructType(Seq(
      StructField("k", LongType), StructField("name", StringType))),
      primaryKey = Seq("k"))
    cat.createTable("db", "enriched", StructType(Seq(
      StructField("k", LongType), StructField("amount", LongType),
      StructField("name", StringType))))
    cat.upsert("db", "dim", Seq((1L, "one"), (2L, "two")).toDF("k", "name"))
    val stream = MemoryStream[(Long, Long)]
    val q = cat.streamLookupAppend("db", "dim", "enriched",
      stream.toDF().toDF("k", "amount"),
      java.nio.file.Files.createTempDirectory("graft-lookup-ckpt").toString,
      joinKeys = Seq("k"))
    try {
      val resolves0 = graft.sources.GraftCatalog.lookupDimResolves.get()
      stream.addData(Seq((1L, 10L), (2L, 20L), (3L, 30L)))
      q.processAllAvailable()
      // batch 1: dim as of now — key 3 unmatched (left join keeps it)
      val r1 = cat.read("db", "enriched").as[(Long, Long, String)]
        .collect().toSet
      assert(r1 === Set((1L, 10L, "one"), (2L, 20L, "two"), (3L, 30L, null)))
      assert(graft.sources.GraftCatalog.lookupDimResolves.get() === resolves0 + 1)
      // QUIET dim: a second batch with no dim commit in between reuses
      // the cached image — no re-resolve, no re-plan (r14)
      stream.addData(Seq((1L, 11L)))
      q.processAllAvailable()
      assert(graft.sources.GraftCatalog.lookupDimResolves.get() === resolves0 + 1,
        "quiet-dim batch re-resolved the dim image")
      assert(cat.read("db", "enriched").as[(Long, Long, String)].collect().toSet
        === r1 + ((1L, 11L, "one")))
      // dim UPDATE between batches: the next batch sees the new image —
      // the refresh-per-batch freshness contract of a lookup join
      cat.upsert("db", "dim", Seq((2L, "TWO"), (3L, "three")).toDF("k", "name"))
      stream.addData(Seq((2L, 21L), (3L, 31L)))
      q.processAllAvailable()
      val r2 = cat.read("db", "enriched").as[(Long, Long, String)]
        .collect().toSet
      assert(r2 === r1 ++ Set((1L, 11L, "one"), (2L, 21L, "TWO"), (3L, 31L, "three")))
      assert(graft.sources.GraftCatalog.lookupDimResolves.get() === resolves0 + 2)
      // ROLLBACK + re-commit reuses the head snapshot ORDINAL — the cache
      // must key on commitVersion too, or it serves the pre-rollback
      // image (r15 ADVICE)
      val headBefore = cat.chosenSnapshotId("db", "dim").get
      cat.rollbackTo("db", "dim", headBefore - 1)
      cat.upsert("db", "dim", Seq((2L, "deux")).toDF("k", "name"))
      assert(cat.chosenSnapshotId("db", "dim").get === headBefore,
        "test premise: rollback + re-commit reuses the head ordinal")
      stream.addData(Seq((2L, 22L)))
      q.processAllAvailable()
      assert(graft.sources.GraftCatalog.lookupDimResolves.get() === resolves0 + 3,
        "rolled-back-and-recommitted dim served a stale cached image")
      assert(cat.read("db", "enriched").as[(Long, Long, String)].collect().toSet
        .contains((2L, 22L, "deux")))
    } finally q.stop()
  }

  test("bucketed streaming lookup join: zero-Exchange enrichment against a " +
      "bucketed dim — no broadcast, no shuffle of the dim") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.types._
    val wh = java.nio.file.Files.createTempDirectory("graft-blookup-wh").toString
    val cat = new graft.sources.GraftCatalog(spark, wh)
    cat.createSchema("db")
    cat.createTable("db", "bdim", StructType(Seq(
      StructField("k", LongType), StructField("name", StringType))),
      options = Map("bucket" -> "4"), primaryKey = Seq("k"))
    cat.upsert("db", "bdim",
      (1L to 40L).map(i => (i, s"n$i")).toDF("k", "name"))
    // plan shape: the enrichment joins in-task per bucket — NO
    // BroadcastExchange and NO shuffle Exchange anywhere in the plan
    val batch = Seq((1L, 10L), (7L, 70L), (99L, 990L)).toDF("k", "amount")
    val enriched = cat.bucketedLookup("db", "bdim", batch, Seq("k"))
    val plan = enriched.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastExchange"),
      s"bucketed lookup must not broadcast the dim:\n$plan")
    assert(!plan.contains("Exchange hashpartitioning") &&
      !plan.contains("ShuffleExchange"),
      s"bucketed lookup must not shuffle:\n$plan")
    assert(enriched.collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getString(2))).toSet ===
      Set((1L, 10L, "n1"), (7L, 70L, "n70".replace("70", "7")), (99L, 990L, null)),
      "bucketed lookup image wrong")
    // duplicate batch keys each probe independently
    val dup = cat.bucketedLookup("db", "bdim",
      Seq((5L, 1L), (5L, 2L)).toDF("k", "amount"), Seq("k"))
    assert(dup.collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .toSet === Set((5L, 1L, "n5"), (5L, 2L, "n5")))
    // end-to-end: the streaming route with bucketedDim = true enriches
    // each micro-batch against the LATEST dim image
    cat.createTable("db", "benriched", StructType(Seq(
      StructField("k", LongType), StructField("amount", LongType),
      StructField("name", StringType))))
    val stream = MemoryStream[(Long, Long)]
    val q = cat.streamLookupAppend("db", "bdim", "benriched",
      stream.toDF().toDF("k", "amount"),
      java.nio.file.Files.createTempDirectory("graft-blookup-ckpt").toString,
      joinKeys = Seq("k"), bucketedDim = true)
    try {
      stream.addData(Seq((2L, 20L), (50L, 500L)))
      q.processAllAvailable()
      val r1 = cat.read("db", "benriched").as[(Long, Long, String)]
        .collect().toSet
      assert(r1 === Set((2L, 20L, "n2"), (50L, 500L, null)))
      cat.upsert("db", "bdim", Seq((50L, "fifty")).toDF("k", "name"))
      stream.addData(Seq((50L, 501L)))
      q.processAllAvailable()
      assert(cat.read("db", "benriched").as[(Long, Long, String)]
        .collect().toSet === r1 + ((50L, 501L, "fifty")))
    } finally q.stop()
  }

  test("from-timestamp at/below the retention floor clamps the start to a " +
      "retained snapshot instead of planning an expired one") {
    import org.apache.spark.sql.types._
    import spark.implicits._
    val wh = java.nio.file.Files.createTempDirectory("graft-scanfloor-wh").toString
    val cat = new graft.sources.GraftCatalog(spark, wh)
    cat.createSchema("db")
    cat.createTable("db", "fl", StructType(Seq(
      StructField("id", LongType), StructField("v", LongType))),
      primaryKey = Seq("id"))
    (1L to 4L).foreach { i =>
      cat.upsert("db", "fl", Seq((i, i * 10)).toDF("id", "v"))
      Thread.sleep(15)
    }
    cat.expireSnapshots("db", "fl", keepLast = 2)
    val retained = cat.snapshots("db", "fl")
    assert(retained.map(_.id) === Seq(3L, 4L))
    // the backfill case: a mark at (and another before) the earliest
    // RETAINED commit — the naive `first.id - 1` start names an EXPIRED
    // snapshot and the first micro-batch would die in changelogEntries'
    // exists() check; the clamp starts the stream at the floor instead.
    // The floor snapshot replays as its FULL image (keys 1-3 at their
    // latest versions — expiration re-materialized its entry, so its own
    // delta is unrecoverable and the superset is what keeps a CDC
    // replica convergent), then snapshot 4 replays as a normal delta.
    for (mark <- Seq(retained.head.timestampMillis,
        retained.head.timestampMillis - 3600000L)) {
      val seen = scala.collection.mutable.ArrayBuffer[Long]()
      val q = cat.readChangelogStream("db", "fl",
          scanMode = "from-timestamp", fromTimestampMillis = Some(mark))
        .writeStream
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("graft-scanfloor-ckpt").toString)
        .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          val ids = b.select("id").as[Long].collect()
          seen.synchronized { seen ++= ids }; ()
        }
        .start()
      try q.processAllAvailable() finally q.stop()
      assert(seen.synchronized(seen.toSet) === Set(1L, 2L, 3L, 4L),
        s"mark=$mark must replay the floor image plus retained deltas")
    }
  }

  test("consumer-id: offsets advance durably, a checkpoint-less restart " +
      "resumes from the consumer, expiration keeps unread history") {
    import org.apache.spark.sql.types._
    import spark.implicits._
    val wh = java.nio.file.Files.createTempDirectory("graft-cons-wh").toString
    val cat = new graft.sources.GraftCatalog(spark, wh)
    cat.createSchema("db")
    cat.createTable("db", "c1", StructType(Seq(
      StructField("id", LongType), StructField("v", LongType))),
      primaryKey = Seq("id"))
    (1 to 3).foreach(i => cat.upsert("db", "c1", Seq((i.toLong, i.toLong)).toDF("id", "v")))
    def run(expectRows: Seq[Long]): Unit = {
      val batches = scala.collection.mutable.ArrayBuffer[Long]()
      // FRESH checkpoint each run: resume position must come from the
      // durable consumer offset, not Spark state
      val q = cat.readChangelogStream("db", "c1",
          maxSnapshotsPerTrigger = Some(1), consumerId = Some("etl"))
        .writeStream
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("graft-cons-ckpt").toString)
        .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          batches.synchronized { batches += b.select("id").head().getLong(0) }; ()
        }
        .start()
      try q.processAllAvailable() finally q.stop()
      assert(batches.synchronized(batches.toSeq) === expectRows)
    }
    run(Seq(1L, 2L, 3L)) // first run: everything
    // the engine commits source offsets with a one-batch lag, so the
    // durable consumer offset is AT-LEAST-ONCE: snapshot 3 may replay
    assert(cat.consumerOffsets("db", "c1") === Map("etl" -> 3L))
    (4 to 5).foreach(i => cat.upsert("db", "c1", Seq((i.toLong, i.toLong)).toDF("id", "v")))
    // fresh checkpoint, same consumer: replays the uncommitted tail
    // batch, then only the new delta — never the whole history
    run(Seq(3L, 4L, 5L))
    assert(cat.consumerOffsets("db", "c1") === Map("etl" -> 5L))
    // a lagging consumer pins history: reset it behind, then expire.
    // Unread snapshots (>= 3) AND the replay basis (2 = next-1) survive
    cat.commitConsumerOffset("db", "c1", "etl", 3L)
    cat.expireSnapshots("db", "c1", keepLast = 1)
    assert(cat.snapshots("db", "c1").map(_.id).min === 2L)
    run(Seq(3L, 4L, 5L)) // replays from the pinned offset
    // consumer.ignore-progress: the consumer's recorded position is NOT
    // the start (scanMode decides — here full history; the first batch
    // lands the retained floor's cumulative image, since older snapshots
    // expired), but batch commits still advance the durable offset. Also
    // exercises gap-stepping: the log's earliest retained id is 2, so the
    // per-snapshot rate limiter must not plan the expired id 1.
    cat.commitConsumerOffset("db", "c1", "etl", 4L)
    val seen = scala.collection.mutable.ArrayBuffer[Seq[Long]]()
    val q2 = cat.readChangelogStream("db", "c1",
        maxSnapshotsPerTrigger = Some(1), consumerId = Some("etl"),
        consumerIgnoreProgress = true)
      .writeStream
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-cons-ckpt2").toString)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val ids = b.select("id").as[Long].collect().sorted.toSeq
        seen.synchronized { seen += ids }; ()
      }
      .start()
    try q2.processAllAvailable() finally q2.stop()
    assert(seen.synchronized(seen.toList) ===
      List(Seq(1L, 2L), Seq(3L), Seq(4L), Seq(5L)),
      "ignore-progress must re-read history (floor image first), " +
        s"got ${seen.synchronized(seen.toList)}")
    assert(cat.consumerOffsets("db", "c1") === Map("etl" -> 5L),
      "commits still advance the consumer under ignore-progress")
  }

  test("changelog rate limit: maxRowsPerTrigger packs small snapshots, " +
      "lands an oversized one whole") {
    import org.apache.spark.sql.types._
    import spark.implicits._
    val wh = java.nio.file.Files.createTempDirectory("graft-cdc3-wh").toString
    val cat = new graft.sources.GraftCatalog(spark, wh)
    cat.createSchema("db")
    cat.createTable("db", "s3", StructType(Seq(
      StructField("id", LongType), StructField("v", LongType))))
    // snapshot 1: a bulk backfill far over the cap; 2–4: small commits
    cat.append("db", "s3",
      spark.range(0, 100).selectExpr("id", "id AS v"))
    (1 to 3).foreach(i => cat.append("db", "s3",
      Seq((1000L + i, i.toLong)).toDF("id", "v")))
    // drive the Source directly — deterministic batch planning, no engine
    val src = new graft.sources.GraftChangelogSource(spark, wh, "db", "s3",
      fromSnapshotId = 0L, maxSnapshotsPerTrigger = None,
      mode = "upsert", maxRowsPerTrigger = Some(10L))
    import org.apache.spark.sql.execution.streaming.runtime.LongOffset
    def off(o: Option[org.apache.spark.sql.execution.streaming.Offset]): Long =
      o.get.asInstanceOf[LongOffset].offset
    // batch 1: the oversized snapshot lands ALONE (atomic unit), whole
    val o1 = off(src.getOffset)
    assert(o1 === 1L, s"oversized snapshot must land alone, got offset $o1")
    src.getBatch(None, LongOffset(o1)) // advances the planned floor
    assert(cat.readChangelog("db", "s3", 0L, o1).count() === 100L)
    // batch 2: the three small snapshots pack under the 10-row cap
    val o2 = off(src.getOffset)
    assert(o2 === 4L, s"small snapshots should pack into one batch, got $o2")
    src.getBatch(Some(LongOffset(o1)), LongOffset(o2))
    assert(cat.readChangelog("db", "s3", o1, o2).count() === 3L)
    // nothing left: the offset stays at 4 (engine reads that as no new data)
    val o3 = src.getOffset
    assert(o3.forall(o => o.asInstanceOf[LongOffset].offset === 4L))
    // the advisory planner's metadata view matches what was committed
    assert(cat.snapshotDeltaRows("db", "s3", 0L, 4L) ===
      Seq((1L, 100L), (2L, 1L), (3L, 1L), (4L, 1L)))
  }

  test("CDC mirror: streamChangelogApply keeps a PK replica in sync across restarts") {
    import org.apache.spark.sql.types._
    import spark.implicits._
    val wh = java.nio.file.Files.createTempDirectory("graft-cdc3-wh").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-cdc3-ckpt").toString
    val cat = new graft.sources.GraftCatalog(spark, wh)
    cat.createSchema("db")
    val sch = StructType(Seq(StructField("id", LongType), StructField("name", StringType)))
    cat.createTable("db", "src", sch, options = Map("bucket" -> "2"), primaryKey = Seq("id"))
    cat.createTable("db", "dst", sch, primaryKey = Seq("id"))
    cat.upsert("db", "src", Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "name"))
    cat.deleteWhere("db", "src", org.apache.spark.sql.functions.col("id") === 2L)
    def sync(): Unit = {
      val q = cat.streamChangelogApply("db", "src", "db", "dst", ckpt)
      try q.processAllAvailable() finally q.stop()
    }
    def image(t: String): Set[(Long, String)] = cat.read("db", t).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    sync()
    assert(image("dst") === image("src") && image("dst") === Set((1L, "a"), (3L, "c")))
    // more churn, restart from the same checkpoint: replica converges
    cat.upsert("db", "src", Seq((2L, "back"), (4L, "d")).toDF("id", "name"))
    cat.deleteWhere("db", "src", org.apache.spark.sql.functions.col("id") === 1L)
    sync()
    assert(image("dst") === image("src") &&
      image("dst") === Set((2L, "back"), (3L, "c"), (4L, "d")))
    // idempotent: a no-new-data restart commits nothing
    val snaps = cat.snapshots("db", "dst").size
    sync()
    assert(cat.snapshots("db", "dst").size === snaps)
  }

  test("DV deletes changelog as full-image -D retractions; CDC replica converges") {
    import org.apache.spark.sql.types._
    import spark.implicits._
    val wh = java.nio.file.Files.createTempDirectory("graft-dvcl-wh").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-dvcl-ckpt").toString
    val cat = new graft.sources.GraftCatalog(spark, wh)
    cat.createSchema("db")
    val sch = StructType(Seq(StructField("id", LongType), StructField("name", StringType)))
    cat.createTable("db", "src", sch, options = Map("deletion-vectors" -> "true"))
    cat.createTable("db", "dst", sch, primaryKey = Seq("id"))
    cat.append("db", "src", Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "name")) // snap-1
    cat.deleteWhere("db", "src", col("id") === 2L)                                   // snap-2 (dv)
    // the DV commit alone is a pure retraction batch with the FULL image
    val batch = cat.readChangelog("db", "src", 1L, 2L).collect()
    assert(batch.map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
      === Set((2L, "b", "-D")))
    // net-zero elision: a row added AND DV-deleted inside one range vanishes
    cat.append("db", "src", Seq((4L, "d"), (5L, "e")).toDF("id", "name"))            // snap-3
    cat.deleteWhere("db", "src", col("id") === 4L)                                   // snap-4 (dv)
    val ranged = cat.readChangelog("db", "src", 2L, 4L).collect()
    assert(ranged.map(r => (r.getLong(0), r.getString(2))).toSet === Set((5L, "+I")))
    // stream end-to-end (refusal removed): replica converges to the
    // DV-applied image
    def sync(): Unit = {
      val q = cat.streamChangelogApply("db", "src", "db", "dst", ckpt)
      try q.processAllAvailable() finally q.stop()
    }
    def image(t: String): Set[(Long, String)] = cat.read("db", t).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    sync()
    assert(image("dst") === image("src") &&
      image("dst") === Set((1L, "a"), (3L, "c"), (5L, "e")))
    // a DV delete mid-stream produces the retraction on restart too
    cat.deleteWhere("db", "src", col("id") === 1L)
    sync()
    assert(image("dst") === image("src") &&
      image("dst") === Set((3L, "c"), (5L, "e")))
  }

  test("batch sessionization splits on the gap and aggregates per session") {
    import spark.implicits._
    val df = Seq(
      (1L, 1L, 1.0, 0L), (2L, 1L, 2.0, 10L),  // session 1: minutes 0,10
      (3L, 1L, 4.0, 50L),                      // session 2: minute 50 (gap 40)
      (4L, 2L, 8.0, 5L))                       // user 2: one session
      .map { case (id, u, v, m) => (id, u, v, m * 60000000000L) }
      .toDF("event_id", "user_id", "value", "ts_ns")
    val out = EventStreams.sessionizeBatch(df, gapMinutes = 30)
      .orderBy("user_id", "session_id").collect()
    assert(out.length === 3)
    assert(out(0).getAs[Long]("n_events") === 2)
    assert(out(0).getAs[Double]("total_value") === 3.0)
    assert(out(1).getAs[Long]("n_events") === 1)
    assert(out(2).getAs[Long]("user_id") === 2)
  }
}
