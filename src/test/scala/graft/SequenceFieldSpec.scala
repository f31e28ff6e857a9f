package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.sources.GraftCatalog

/**
 * `sequence.field` (Paimon's CoreOption of the same name, exposed via DDL
 * like every option the reference plumbs through TrinoTableOptionUtils):
 * a user column decides which version of a key wins — largest value
 * first, commit order breaks ties, NULL sorts smallest. The out-of-order
 * CDC contract: a late-arriving batch must not clobber newer state.
 */
class SequenceFieldSpec extends SparkSpecBase {

  private lazy val warehouse = Files.createTempDirectory("graft-seqwh").toString
  private lazy val gc: GraftCatalog = new GraftCatalog(spark, warehouse)

  override def beforeAll(): Unit = {
    super.beforeAll()
    gc.createSchema("db")
  }

  private def mk(t: String, opts: Map[String, String] = Map.empty): Unit = {
    import spark.implicits._
    gc.createTable("db", t,
      Seq((1L, "x", 10L)).toDF("id", "v", "seq").schema,
      options = opts + ("sequence.field" -> "seq"), primaryKey = Seq("id"))
  }

  private def img(t: String): Seq[(Long, String, Long)] = {
    import spark.implicits._
    gc.read("db", t).as[(Long, String, Long)].collect().sortBy(_._1).toSeq
  }

  test("late batch loses the version race; newer sequence wins") {
    import spark.implicits._
    mk("t1")
    gc.upsert("db", "t1", Seq((1L, "v10", 10L), (2L, "w10", 10L)).toDF("id", "v", "seq"))
    // LATE batch: smaller sequence — must not clobber
    gc.upsert("db", "t1", Seq((1L, "late", 5L)).toDF("id", "v", "seq"))
    // genuinely newer version
    gc.upsert("db", "t1", Seq((2L, "w20", 20L)).toDF("id", "v", "seq"))
    assert(img("t1") === Seq((1L, "v10", 10L), (2L, "w20", 20L)))
  }

  test("tombstones carry the victim's sequence: delete lands, stale " +
    "update stays dead, higher sequence resurrects") {
    import spark.implicits._
    mk("t2")
    gc.upsert("db", "t2", Seq((1L, "a", 10L), (2L, "b", 10L)).toDF("id", "v", "seq"))
    gc.deleteWhere("db", "t2", col("id") === 1L)
    assert(img("t2") === Seq((2L, "b", 10L)))
    // a LATE update (seq 5 < tombstone's carried 10) must stay dead
    gc.upsert("db", "t2", Seq((1L, "late", 5L)).toDF("id", "v", "seq"))
    assert(img("t2") === Seq((2L, "b", 10L)))
    // a genuinely newer version resurrects the key
    gc.upsert("db", "t2", Seq((1L, "back", 15L)).toDF("id", "v", "seq"))
    assert(img("t2") === Seq((1L, "back", 15L), (2L, "b", 10L)))
  }

  test("bucketed tables: the in-task merge honors the sequence field") {
    import spark.implicits._
    mk("t3", Map("bucket" -> "4"))
    gc.upsert("db", "t3", (1L to 40L).map(i => (i, s"v$i", 100L)).toDF("id", "v", "seq"))
    // late batch for every even key — all must lose
    gc.upsert("db", "t3", (1L to 40L).filter(_ % 2 == 0)
      .map(i => (i, "LATE", 50L)).toDF("id", "v", "seq"))
    // newer batch for every key divisible by 5
    gc.upsert("db", "t3", (1L to 40L).filter(_ % 5 == 0)
      .map(i => (i, "NEW", 200L)).toDF("id", "v", "seq"))
    val got = img("t3")
    assert(got.size === 40)
    got.foreach { case (i, v, s) =>
      if (i % 5 == 0) assert((v, s) === ("NEW", 200L), s"key $i")
      else assert((v, s) === (s"v$i", 100L), s"key $i")
    }
    // bucketed delete + stale resurrection attempt
    gc.deleteWhere("db", "t3", col("id") === 4L)
    gc.upsert("db", "t3", Seq((4L, "late", 10L)).toDF("id", "v", "seq"))
    assert(!img("t3").exists(_._1 == 4L))
  }

  test("compaction materializes winners; later late batches still lose") {
    import spark.implicits._
    mk("t4")
    gc.upsert("db", "t4", Seq((1L, "hi", 100L)).toDF("id", "v", "seq"))
    gc.compact("db", "t4")
    // post-compaction the winner sits at a HIGHER ordinal than any
    // earlier commit — the sequence value, not the ordinal, must decide
    gc.upsert("db", "t4", Seq((1L, "late", 50L)).toDF("id", "v", "seq"))
    assert(img("t4") === Seq((1L, "hi", 100L)))
    gc.compact("db", "t4")
    assert(img("t4") === Seq((1L, "hi", 100L)))
  }

  test("CDC replica with the same sequence.field converges under " +
    "out-of-order changelog batches") {
    import spark.implicits._
    mk("src")
    mk("dst")
    gc.upsert("db", "src", Seq((1L, "a10", 10L), (2L, "b10", 10L)).toDF("id", "v", "seq"))
    gc.upsert("db", "src", Seq((1L, "late", 5L)).toDF("id", "v", "seq")) // loses at src
    gc.deleteWhere("db", "src", col("id") === 2L)
    gc.upsert("db", "src", Seq((2L, "stale", 3L)).toDF("id", "v", "seq")) // stays dead
    // apply each snapshot's changelog in commit order — the upsert-mode
    // stream emits raw in-range winners; the replica's own sequence
    // resolution must reject the stale ones
    (1L to 4L).foreach { sid =>
      val batch = gc.readChangelog("db", "src", sid - 1, sid)
      gc.applyChangelog("db", "dst", batch, batchId = Some(sid))
    }
    assert(img("dst") === img("src"))
    assert(img("dst") === Seq((1L, "a10", 10L)))
  }

  test("full changelog: a losing late batch is net-zero, not a stale -U/+U") {
    import spark.implicits._
    mk("t5")
    gc.upsert("db", "t5", Seq((1L, "a10", 10L)).toDF("id", "v", "seq")) // snap 1
    gc.upsert("db", "t5", Seq((1L, "late", 5L)).toDF("id", "v", "seq")) // snap 2
    val cl = gc.readChangelogFull("db", "t5", 1L, 2L)
    assert(cl.count() === 0L, "late batch changed nothing — no rows expected")
    // a genuine update still emits the -U/+U pair
    gc.upsert("db", "t5", Seq((1L, "a20", 20L)).toDF("id", "v", "seq")) // snap 3
    val cl2 = gc.readChangelogFull("db", "t5", 2L, 3L).orderBy("_row_kind").collect()
    assert(cl2.map(_.getString(3)).toSeq === Seq("+U", "-U"))
    // a stale tombstone is net-zero too: deleteWhere carries the CURRENT
    // sequence so it lands; simulate staleness via mergeCommit with an
    // explicit old sequence value
    gc.mergeCommit("db", "t5",
      upserts = spark.emptyDataset[(Long, String, Long)].toDF("id", "v", "seq"),
      deleteKeys = Seq((1L, 4L)).toDF("id", "seq")) // snap 4, stale
    assert(img("t5") === Seq((1L, "a20", 20L)))
    assert(gc.readChangelogFull("db", "t5", 3L, 4L).count() === 0L)
  }

  test("NULL sequence sorts smallest: null rows lose to any non-null") {
    import spark.implicits._
    gc.createTable("db", "tn",
      Seq((1L, "x", Option(1L))).toDF("id", "v", "seq").schema,
      options = Map("sequence.field" -> "seq"), primaryKey = Seq("id"))
    gc.upsert("db", "tn", Seq((1L, "has-seq", Option(5L))).toDF("id", "v", "seq"))
    // later commit with NULL sequence: loses despite the newer ordinal
    gc.upsert("db", "tn", Seq((1L, "null-seq", Option.empty[Long]))
      .toDF("id", "v", "seq"))
    assert(gc.read("db", "tn").head().getString(1) === "has-seq")
    // among two null-sequence versions, the later ordinal wins
    gc.upsert("db", "tn", Seq((2L, "n1", Option.empty[Long])).toDF("id", "v", "seq"))
    gc.upsert("db", "tn", Seq((2L, "n2", Option.empty[Long])).toDF("id", "v", "seq"))
    assert(gc.read("db", "tn").filter(col("id") === 2L).head().getString(1) === "n2")
  }

  test("within-batch duplicate keys fold deterministically at write") {
    import spark.implicits._
    // with a sequence field: the batch's highest sequence wins
    mk("tb")
    gc.upsert("db", "tb", Seq(
      (1L, "low", 5L), (1L, "high", 9L), (1L, "mid", 7L),
      (2L, "only", 1L)).toDF("id", "v", "seq"))
    assert(img("tb") === Seq((1L, "high", 9L), (2L, "only", 1L)))
    // without one: largest remaining-row struct — arbitrary but STABLE
    // (identical result regardless of partitioning), proven by running
    // the same shuffled batch twice into two tables
    gc.createTable("db", "tb2", Seq((1L, "x")).toDF("id", "v").schema,
      primaryKey = Seq("id"))
    gc.createTable("db", "tb3", Seq((1L, "x")).toDF("id", "v").schema,
      primaryKey = Seq("id"))
    val batch = (1L to 50L).flatMap(i => Seq((i, s"a$i"), (i, s"b$i"), (i, s"c$i")))
    gc.upsert("db", "tb2", batch.toDF("id", "v").repartition(7))
    gc.upsert("db", "tb3", scala.util.Random.shuffle(batch).toDF("id", "v")
      .repartition(3))
    val r2 = gc.read("db", "tb2").orderBy("id").collect().map(_.getString(1)).toSeq
    val r3 = gc.read("db", "tb3").orderBy("id").collect().map(_.getString(1)).toSeq
    assert(r2 === r3)
    assert(r2.forall(_.startsWith("c"))) // max struct picks the c-variant
  }

  test("validation: option shape and DDL guards") {
    import spark.implicits._
    val sch = Seq((1L, "x", 10L)).toDF("id", "v", "seq").schema
    intercept[IllegalArgumentException] { // no PK
      gc.createTable("db", "bad1", sch, options = Map("sequence.field" -> "seq"))
    }
    intercept[IllegalArgumentException] { // unknown column
      gc.createTable("db", "bad2", sch,
        options = Map("sequence.field" -> "nope"), primaryKey = Seq("id"))
    }
    intercept[IllegalArgumentException] { // PK column
      gc.createTable("db", "bad3", sch,
        options = Map("sequence.field" -> "id"), primaryKey = Seq("id"))
    }
    intercept[IllegalArgumentException] { // non-deduplicate engine
      gc.createTable("db", "bad4", sch,
        options = Map("sequence.field" -> "seq", "merge-engine" -> "first-row"),
        primaryKey = Seq("id"))
    }
    // rename tracks the option; drop refuses
    mk("t6")
    gc.renameColumn("db", "t6", "seq", "event_seq")
    assert(gc.sequenceFieldOf("db", "t6") === Some("event_seq"))
    gc.upsert("db", "t6", Seq((1L, "a", 10L)).toDF("id", "v", "event_seq"))
    gc.upsert("db", "t6", Seq((1L, "late", 5L)).toDF("id", "v", "event_seq"))
    assert(gc.read("db", "t6").head().getString(1) === "a")
    intercept[IllegalArgumentException] {
      gc.dropColumn("db", "t6", "event_seq")
    }
  }

  test("deletion vectors compose with sequence.field: builds race on " +
      "(sequence, ordinal) and a late lower-sequence delta stays dead " +
      "across the merge-free base (r15)") {
    import spark.implicits._
    mk("tdv", Map("deletion-vectors" -> "true"))
    def noWindow(): org.apache.spark.sql.DataFrame = {
      val df = gc.read("db", "tdv")
      assert(!df.queryExecution.executedPlan.toString.contains("Window"),
        "DV-covered read planned a keep-latest window")
      df
    }
    gc.upsert("db", "tdv", Seq((1L, "v10", 10L), (2L, "w10", 10L),
      (3L, "z10", 10L)).toDF("id", "v", "seq"))                    // snap 1
    gc.upsert("db", "tdv", Seq((1L, "v20", 20L)).toDF("id", "v", "seq"))
    gc.deleteWhere("db", "tdv", col("id") === 3)                   // snap 3
    gc.buildDeletionVectors("db", "tdv")                           // snap 4
    assert(img("tdv") === Seq((1L, "v20", 20L), (2L, "w10", 10L)))
    noWindow()
    // LATE post-build delta: lower sequence must lose to the DV-built
    // base (the hybrid read's arbitration, not ordinal order)
    gc.upsert("db", "tdv", Seq((1L, "late", 5L)).toDF("id", "v", "seq"))
    assert(img("tdv") === Seq((1L, "v20", 20L), (2L, "w10", 10L)))
    // genuinely newer sequence wins as usual
    gc.upsert("db", "tdv", Seq((2L, "w30", 30L)).toDF("id", "v", "seq"))
    assert(img("tdv") === Seq((1L, "v20", 20L), (2L, "w30", 30L)))
    // incremental REBUILD arbitrates both directions: key 1's late bytes
    // become victims (base won), key 2's base bytes do (delta won)
    gc.buildDeletionVectors("db", "tdv")
    assert(img("tdv") === Seq((1L, "v20", 20L), (2L, "w30", 30L)))
    noWindow()
    assert(gc.countRows("db", "tdv") === Some(2L))
    // delete + stale resurrect attempt inside one post-build delta: the
    // tombstone carries seq 20, the stale row's 15 loses in-delta
    gc.deleteWhere("db", "tdv", col("id") === 1)
    gc.upsert("db", "tdv", Seq((1L, "old", 15L)).toDF("id", "v", "seq"))
    assert(img("tdv") === Seq((2L, "w30", 30L)))
    gc.buildDeletionVectors("db", "tdv")
    assert(img("tdv") === Seq((2L, "w30", 30L)))
    noWindow()
    // a genuinely newer row re-inserts the key after the build
    gc.upsert("db", "tdv", Seq((1L, "new", 25L)).toDF("id", "v", "seq"))
    assert(img("tdv") === Seq((1L, "new", 25L), (2L, "w30", 30L)))
    // time travel to each pre-build image still resolves exactly
    assert(gc.read("db", "tdv", snapshotId = Some(2))
      .as[(Long, String, Long)].collect().sortBy(_._1).toSeq ===
      Seq((1L, "v20", 20L), (2L, "w10", 10L), (3L, "z10", 10L)))
  }
}
