package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.sources.GraftCatalog

/**
 * Write-time changelog materialization (Paimon's `changelog-producer`,
 * surfaced by the reference through TrinoTableOptionUtils's option
 * mapping): `input` persists each commit's rows kinded as written,
 * `lookup` persists full -U/+U/-D retraction pairs per commit (the
 * before-image resolve paid ONCE at write), `full-compaction` persists
 * the accumulated diff at each compact(). Consumers then read
 * O(changelog files) per batch — the file-served ranges plan NO
 * before-image join, asserted below.
 */
class ChangelogProducerSpec extends SparkSpecBase {

  private lazy val warehouse = Files.createTempDirectory("graft-clwh").toString
  private lazy val gc: GraftCatalog = new GraftCatalog(spark, warehouse)

  override def beforeAll(): Unit = {
    super.beforeAll()
    gc.createSchema("db")
  }

  private def batch(lo: Long, hi: Long) = spark.range(lo, hi + 1)
    .selectExpr("id", "concat('n', id) AS name", "CAST(id % 7 AS INT) AS grp")

  /** Same three-commit history on any PK table. */
  private def history(t: String): Unit = {
    gc.upsert("db", t, batch(1, 50).toDF())                        // snap 1
    gc.upsert("db", t, batch(10, 20).toDF()                        // snap 2
      .withColumn("name", concat(lit("u"), col("id"))))
    gc.deleteWhere("db", t, col("id") % 5 === 0)                   // snap 3
  }

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("lookup producer: per-commit files equal the read-computed changelog") {
    gc.createTable("db", "tl", batch(0, 0).schema,
      options = Map("changelog-producer" -> "lookup"), primaryKey = Seq("id"))
    gc.createTable("db", "tn", batch(0, 0).schema, primaryKey = Seq("id"))
    history("tl"); history("tn")
    // every single-snapshot range: file-served == read-computed, exactly
    (1L to 3L).foreach { i =>
      assert(rows(gc.readChangelogFull("db", "tl", i - 1, i)) ===
        rows(gc.readChangelogFull("db", "tn", i - 1, i)), s"range (${i - 1}, $i]")
    }
    // the files exist, one per data commit
    val clDirs = new java.io.File(s"$warehouse/db/tl").listFiles()
      .map(_.getName).filter(_.endsWith("-cl")).sorted
    assert(clDirs.toSeq === Seq("snap-1-cl", "snap-2-cl", "snap-3-cl"))
  }

  test("lookup producer: file-served batches plan NO before-image join") {
    val served = gc.readChangelogFull("db", "tl", 0, 3)
    assert(!served.queryExecution.executedPlan.toString.contains("Join"),
      served.queryExecution.executedPlan.toString)
    // the none-producer table pays the join at read
    val computed = gc.readChangelogFull("db", "tn", 1, 2)
    assert(computed.queryExecution.executedPlan.toString.contains("Join"))
    // multi-snapshot file-served range: per-commit granularity — a
    // replica applying it converges to the same image as the source
    gc.createTable("db", "repl", batch(0, 0).schema, primaryKey = Seq("id"))
    gc.applyChangelog("db", "repl", served)
    assert(rows(gc.read("db", "repl")) === rows(gc.read("db", "tl")))
  }

  test("lookup producer: upsert-mode fast path drops -U and converges") {
    val up = gc.readChangelog("db", "tl", 0, 3)
    assert(!up.queryExecution.executedPlan.toString.contains("Join"))
    val kinds = up.select(GraftCatalog.RowKindCol).distinct()
      .collect().map(_.getString(0)).toSet
    assert(!kinds.contains("-U"))
    gc.createTable("db", "repl2", batch(0, 0).schema, primaryKey = Seq("id"))
    gc.applyChangelog("db", "repl2", up)
    assert(rows(gc.read("db", "repl2")) === rows(gc.read("db", "tl")))
  }

  test("lookup producer: full-mode changelog STREAM serves from files") {
    import org.apache.spark.sql.streaming.Trigger
    val out = Files.createTempDirectory("graft-clstream")
    val q = gc.readChangelogStream("db", "tl", mode = "full")
      .writeStream.format("memory").queryName("cl_prod_stream")
      .option("checkpointLocation", s"$out/cp")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val streamed = spark.sql("SELECT * FROM cl_prod_stream")
    assert(rows(streamed) === rows(gc.readChangelogFull("db", "tl", 0, 3)))
  }

  test("input producer: commit rows persist kinded, replica converges") {
    gc.createTable("db", "ti", batch(0, 0).schema,
      options = Map("changelog-producer" -> "input"), primaryKey = Seq("id"))
    history("ti")
    val cl = gc.readChangelog("db", "ti", 0, 3)
    assert(!cl.queryExecution.executedPlan.toString.contains("Join"))
    val byKind = cl.groupBy(GraftCatalog.RowKindCol).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // files record rows AS WRITTEN; the served range collapses to the
    // last event per key: 10 deleted keys, 40 surviving inserts
    assert(byKind === Map("+I" -> 40L, "-D" -> 10L))
    gc.createTable("db", "repl3", batch(0, 0).schema, primaryKey = Seq("id"))
    gc.applyChangelog("db", "repl3", cl)
    assert(rows(gc.read("db", "repl3")) === rows(gc.read("db", "ti")))
    // full mode has no before images in input files — read-time resolve
    val full = gc.readChangelogFull("db", "ti", 1, 2)
    assert(full.queryExecution.executedPlan.toString.contains("Join"))
    assert(rows(full) === rows(gc.readChangelogFull("db", "tn", 1, 2)))
  }

  test("full-compaction producer: carrier at compact, file-served range") {
    gc.createTable("db", "tf", batch(0, 0).schema,
      options = Map("changelog-producer" -> "full-compaction"),
      primaryKey = Seq("id"))
    gc.createTable("db", "tf_twin", batch(0, 0).schema, primaryKey = Seq("id"))
    history("tf"); history("tf_twin")
    // data commits carry NO files in this mode
    assert(new java.io.File(s"$warehouse/db/tf").listFiles()
      .forall(f => !f.getName.endsWith("-cl")))
    val c = gc.compact("db", "tf")                                 // snap 4
    gc.compact("db", "tf_twin")                                    // ids align
    assert(new java.io.File(s"$warehouse/db/tf/snap-$c-cl").exists())
    val served = gc.readChangelogFull("db", "tf", 0, c)
    assert(!served.queryExecution.executedPlan.toString.contains("Join"))
    assert(rows(served) === rows(gc.readChangelogFull("db", "tf_twin", 0, 3)))
    // second round: the next carrier covers exactly (c, c2]
    gc.upsert("db", "tf", batch(100, 110).toDF())                  // snap 5
    gc.deleteWhere("db", "tf", col("id") === 1)                    // snap 6
    gc.upsert("db", "tf_twin", batch(100, 110).toDF())
    gc.deleteWhere("db", "tf_twin", col("id") === 1)
    val c2 = gc.compact("db", "tf")
    val c2t = gc.compact("db", "tf_twin")
    val served2 = gc.readChangelogFull("db", "tf", c, c2)
    assert(!served2.queryExecution.executedPlan.toString.contains("Join"))
    assert(rows(served2) ===
      rows(gc.readChangelogFull("db", "tf_twin", 4, c2t - 1)))
  }

  test("schema evolution: persisted changelog maps forward by field id") {
    gc.addColumn("db", "tl", org.apache.spark.sql.types
      .StructField("extra", org.apache.spark.sql.types.LongType))
    val cl = gc.readChangelogFull("db", "tl", 0, 3)
    assert(cl.columns.contains("extra"))
    assert(cl.filter(col("extra").isNotNull).count() === 0)
    assert(cl.count() > 0)
  }

  test("expiration reclaims changelog dirs with their snapshots") {
    gc.createTable("db", "te", batch(0, 0).schema,
      options = Map("changelog-producer" -> "lookup"), primaryKey = Seq("id"))
    gc.upsert("db", "te", batch(1, 10).toDF())
    gc.upsert("db", "te", batch(5, 15).toDF())
    gc.upsert("db", "te", batch(12, 20).toDF())
    gc.expireSnapshots("db", "te", keepLast = 2)
    val dirs = new java.io.File(s"$warehouse/db/te").listFiles()
      .map(_.getName).filter(_.endsWith("-cl")).sorted
    assert(dirs.toSeq === Seq("snap-2-cl", "snap-3-cl"))
    // the surviving covered range still serves from files
    val served = gc.readChangelogFull("db", "te", 1, 3)
    assert(!served.queryExecution.executedPlan.toString.contains("Join"))
    assert(served.count() > 0)
    // the expired range falls back loudly (snapshot gone), not silently
    intercept[Exception](gc.readChangelogFull("db", "te", 0, 1).collect())
  }

  test("guards: PK-only, deduplicate-only, immutable") {
    val e1 = intercept[IllegalArgumentException](
      gc.createTable("db", "bad1", batch(0, 0).schema,
        options = Map("changelog-producer" -> "lookup")))
    assert(e1.getMessage.contains("primary-key"))
    // `input` stays deduplicate-only (a patch row is not the changelog
    // image); lookup/full-compaction serve field-wise engines since r15
    val e2 = intercept[IllegalArgumentException](
      gc.createTable("db", "bad2", batch(0, 0).schema,
        options = Map("changelog-producer" -> "input",
          "merge-engine" -> "partial-update"), primaryKey = Seq("id")))
    assert(e2.getMessage.contains("deduplicate"))
    val e3 = intercept[IllegalArgumentException](
      gc.createTable("db", "bad3", batch(0, 0).schema,
        options = Map("changelog-producer" -> "sometimes"),
        primaryKey = Seq("id")))
    assert(e3.getMessage.contains("changelog-producer"))
    val e4 = intercept[IllegalArgumentException](
      gc.setTableOptions("db", "tl", Map("changelog-producer" -> "none")))
    assert(e4.getMessage.toLowerCase.contains("immutable"))
  }

  test("lookup producer on a partial-update table (+ sequence group): " +
      "file-served batches plan NO resolve join, parity with read-time") {
    val sch = spark.range(1).selectExpr("id", "CAST(NULL AS STRING) AS a",
      "CAST(NULL AS BIGINT) AS b", "CAST(NULL AS BIGINT) AS sb").schema
    def mk(t: String, producer: Option[String]): Unit =
      gc.createTable("db", t, sch,
        options = Map("merge-engine" -> "partial-update",
          "fields.sb.sequence-group" -> "b") ++
          producer.map("changelog-producer" -> _),
        primaryKey = Seq("id"))
    mk("pu_l", Some("lookup")); mk("pu_n", None)
    def up(t: String, sqlRows: String): Unit =
      gc.upsert("db", t, spark.sql(
        s"SELECT CAST(id AS BIGINT) id, CAST(a AS STRING) a, " +
          s"CAST(b AS BIGINT) b, CAST(sb AS BIGINT) sb " +
          s"FROM VALUES $sqlRows AS t(id, a, b, sb)"))
    def hist(t: String): Unit = {
      up(t, "(1, 'x', 10, 1), (2, 'y', 20, 1)")                    // snap 1
      // patches: null fields keep prior values; b guarded by group seq sb
      // (stale seq 0 on key 1 → b keeps 10); key 3 is a true insert
      up(t, "(1, NULL, 99, 0), (2, 'Y', NULL, 2), (3, 'z', 30, 1)") // snap 2
      // net-zero patch: all-null for an existing key emits NOTHING
      up(t, "(1, NULL, NULL, NULL)")                               // snap 3
    }
    hist("pu_l"); hist("pu_n")
    // tables resolve identically
    assert(rows(gc.read("db", "pu_l")) === rows(gc.read("db", "pu_n")))
    // per-commit parity: file-served == read-computed, exactly
    (1L to 3L).foreach { i =>
      assert(rows(gc.readChangelogFull("db", "pu_l", i - 1, i)) ===
        rows(gc.readChangelogFull("db", "pu_n", i - 1, i)), s"range (${i - 1}, $i]")
    }
    // the net-zero commit materialized an EMPTY changelog
    assert(gc.readChangelogFull("db", "pu_l", 2, 3).count() === 0)
    // file-served full range: no before-image resolve join in the plan
    val served = gc.readChangelogFull("db", "pu_l", 0, 3)
    assert(!served.queryExecution.executedPlan.toString.contains("Join"),
      served.queryExecution.executedPlan.toString)
    // the producer-less twin pays the resolve at read
    assert(gc.readChangelogFull("db", "pu_n", 1, 2)
      .queryExecution.executedPlan.toString.contains("Join"))
    // the sequence-group guard survived materialization: b stayed 10
    assert(served.filter(col("id") === 1 && col(GraftCatalog.RowKindCol) === "+I")
      .head().getLong(2) === 10L)
  }

  test("cross-commit net-zero collapse: a patch applied then reverted " +
      "emits NOTHING over the covered range, parity with read-time") {
    val sch = spark.range(1).selectExpr("id",
      "CAST(NULL AS STRING) AS a", "CAST(NULL AS BIGINT) AS b").schema
    def mk(t: String, producer: Option[String]): Unit =
      gc.createTable("db", t, sch,
        options = Map("merge-engine" -> "partial-update") ++
          producer.map("changelog-producer" -> _),
        primaryKey = Seq("id"))
    mk("puz_l", Some("lookup")); mk("puz_n", None)
    def up(t: String, sqlRows: String): Unit =
      gc.upsert("db", t, spark.sql(
        s"SELECT CAST(id AS BIGINT) id, CAST(a AS STRING) a, " +
          s"CAST(b AS BIGINT) b FROM VALUES $sqlRows AS t(id, a, b)"))
    def hist(t: String): Unit = {
      up(t, "(1, 'x', 5), (2, 'y', 7)") // snap 1
      up(t, "(1, NULL, 6)")             // snap 2: b 5 -> 6 (pair persisted)
      up(t, "(1, NULL, 5)")             // snap 3: b 6 -> 5 (back where it was)
    }
    hist("puz_l"); hist("puz_n")
    // per-commit ranges still emit their pairs (each commit DID change b)
    assert(gc.readChangelogFull("db", "puz_l", 1, 2).count() === 2)
    assert(gc.readChangelogFull("db", "puz_l", 2, 3).count() === 2)
    // the spanning range nets to zero for key 1 — file-served (lookup)
    // and read-time (producer-less) agree: NOTHING emitted
    assert(rows(gc.readChangelogFull("db", "puz_n", 1, 3)) === Seq.empty)
    assert(rows(gc.readChangelogFull("db", "puz_l", 1, 3)) === Seq.empty)
    // from genesis the key nets to a single +I of its final image, both paths
    assert(rows(gc.readChangelogFull("db", "puz_l", 0, 3)) ===
      rows(gc.readChangelogFull("db", "puz_n", 0, 3)))
    // DEDUPLICATE parity is the opposite contract: an upsert rewriting
    // the identical row IS a logical event — the covered collapse keeps
    // the -U/+U pair exactly like read-time pairWithPreImage
    def mkd(t: String, producer: Option[String]): Unit =
      gc.createTable("db", t, sch, options =
        producer.map("changelog-producer" -> _).toMap, primaryKey = Seq("id"))
    mkd("ddz_l", Some("lookup")); mkd("ddz_n", None)
    def histd(t: String): Unit = {
      up(t, "(1, 'x', 5)") // snap 1
      up(t, "(1, 'x', 5)") // snap 2: identical rewrite
      up(t, "(1, 'x', 5)") // snap 3: identical rewrite
    }
    histd("ddz_l"); histd("ddz_n")
    val dl = rows(gc.readChangelogFull("db", "ddz_l", 1, 3))
    assert(dl === rows(gc.readChangelogFull("db", "ddz_n", 1, 3)))
    assert(dl.size === 2, dl.toString) // -U/+U pair survives on deduplicate
  }

  test("lookup producer on an aggregation table: persisted pairs fold " +
      "sums exactly and a replica of images converges") {
    val sch = spark.range(1).selectExpr("id",
      "CAST(NULL AS BIGINT) AS total").schema
    gc.createTable("db", "ag_l", sch,
      options = Map("merge-engine" -> "aggregation",
        "fields.total.aggregate-function" -> "sum",
        "changelog-producer" -> "lookup"),
      primaryKey = Seq("id"))
    gc.createTable("db", "ag_n", sch,
      options = Map("merge-engine" -> "aggregation",
        "fields.total.aggregate-function" -> "sum"),
      primaryKey = Seq("id"))
    import spark.implicits._
    def hist(t: String): Unit = {
      gc.upsert("db", t, Seq((1L, 5L), (2L, 7L)).toDF("id", "total"))
      gc.upsert("db", t, Seq((1L, 3L), (3L, 1L)).toDF("id", "total"))
      gc.upsert("db", t, Seq((1L, 0L)).toDF("id", "total")) // net-zero sum
    }
    hist("ag_l"); hist("ag_n")
    (1L to 3L).foreach { i =>
      assert(rows(gc.readChangelogFull("db", "ag_l", i - 1, i)) ===
        rows(gc.readChangelogFull("db", "ag_n", i - 1, i)), s"range (${i - 1}, $i]")
    }
    // sum of 0 leaves the image unchanged → empty materialization
    assert(gc.readChangelogFull("db", "ag_l", 2, 3).count() === 0)
    val served = gc.readChangelogFull("db", "ag_l", 0, 2)
    assert(!served.queryExecution.executedPlan.toString.contains("Join"))
    // pairs carry RESOLVED images: id 1 collapses over (0,2] to a +I
    // whose final image is the FOLDED sum 5+3
    assert(served.filter(col("id") === 1 &&
      col(GraftCatalog.RowKindCol) === "+I").head().getLong(1) === 8L)
  }

  test("full-compaction producer on a field-wise table: carrier diff at " +
      "compact equals the read-computed resolved-image pairs") {
    val sch = spark.range(1).selectExpr("id",
      "CAST(NULL AS BIGINT) AS total").schema
    gc.createTable("db", "ag_f", sch,
      options = Map("merge-engine" -> "aggregation",
        "fields.total.aggregate-function" -> "sum",
        "changelog-producer" -> "full-compaction"),
      primaryKey = Seq("id"))
    import spark.implicits._
    gc.upsert("db", "ag_f", Seq((1L, 5L), (2L, 7L)).toDF("id", "total"))
    gc.upsert("db", "ag_f", Seq((1L, 3L)).toDF("id", "total"))
    val c = gc.compact("db", "ag_f")
    val served = gc.readChangelogFull("db", "ag_f", 0, c)
    assert(!served.queryExecution.executedPlan.toString.contains("Join"))
    // first carrier: whole image as +I with RESOLVED values
    assert(rows(served) === Seq("[1,8,+I]", "[2,7,+I]"))
    gc.upsert("db", "ag_f", Seq((2L, -2L)).toDF("id", "total"))
    val c2 = gc.compact("db", "ag_f")
    val served2 = gc.readChangelogFull("db", "ag_f", c, c2)
    assert(rows(served2) === Seq("[2,5,+U]", "[2,7,-U]"))
  }

  test("remove-record-on-delete × lookup producer (r17): tombstones emit " +
      "-D with the full before image, CDC replica converges") {
    val sch = spark.range(1).selectExpr("id",
      "CAST(NULL AS BIGINT) AS total").schema
    def mk(t: String, producer: Option[String]): Unit =
      gc.createTable("db", t, sch,
        options = Map("merge-engine" -> "aggregation",
          "fields.total.aggregate-function" -> "sum",
          "aggregation.remove-record-on-delete" -> "true") ++
          producer.map("changelog-producer" -> _),
        primaryKey = Seq("id"))
    mk("agd_l", Some("lookup")); mk("agd_n", None)
    import spark.implicits._
    def hist(t: String): Unit = {
      gc.upsert("db", t, Seq((1L, 5L), (2L, 7L), (3L, 2L)).toDF("id", "total"))
      gc.upsert("db", t, Seq((1L, 3L)).toDF("id", "total"))       // snap 2
      gc.deleteWhere("db", t, col("id") === 1)                    // snap 3
      gc.upsert("db", t, Seq((1L, 100L), (2L, 1L)).toDF("id", "total")) // 4
    }
    hist("agd_l"); hist("agd_n")
    assert(rows(gc.read("db", "agd_l")) === rows(gc.read("db", "agd_n")))
    // the delete commit PERSISTED a -D carrying the folded before image
    // (5+3) — the r16 gap: this key used to vanish from the changelog
    val del = gc.readChangelogFull("db", "agd_l", 2, 3)
    assert(!del.queryExecution.executedPlan.toString.contains("Join"))
    assert(rows(del) === Seq("[1,8,-D]"))
    // read-time parity on the producer-less twin (full-outer -D arm)
    assert(rows(gc.readChangelogFull("db", "agd_n", 2, 3)) === Seq("[1,8,-D]"))
    (1L to 4L).foreach { i =>
      assert(rows(gc.readChangelogFull("db", "agd_l", i - 1, i)) ===
        rows(gc.readChangelogFull("db", "agd_n", i - 1, i)),
        s"range (${i - 1}, $i]")
    }
    // a replica applying per-commit batches converges — deleted keys
    // now REACH the consumer instead of living forever
    gc.createTable("db", "agd_repl", sch, primaryKey = Seq("id"))
    (1L to 4L).foreach { i =>
      gc.applyChangelog("db", "agd_repl",
        gc.readChangelogFull("db", "agd_l", i - 1, i))
    }
    assert(rows(gc.read("db", "agd_repl")) === rows(gc.read("db", "agd_l")))
    // collapsed full range: key 1's insert→delete→re-insert nets to one
    // +I at the final image (the fold restarted after the tombstone)
    assert(gc.readChangelogFull("db", "agd_l", 0, 4)
      .filter(col("id") === 1).collect().map(_.toString).toSeq ===
      Seq("[1,100,+I]"))
    // a key deleted with NO later versions nets to -D over a spanning range
    gc.deleteWhere("db", "agd_l", col("id") === 3)                 // snap 5
    assert(rows(gc.readChangelogFull("db", "agd_l", 2, 5))
      .filter(_.startsWith("[3,")) === Seq("[3,2,-D]"))
  }

  test("partial-update.remove-record-on-delete × lookup producer (r17): " +
      "deleteWhere and -D rowkind rows materialize -D images") {
    val sch = spark.range(1).selectExpr("id", "CAST(NULL AS STRING) AS a",
      "CAST(NULL AS BIGINT) AS b").schema
    def mk(t: String, producer: Option[String]): Unit =
      gc.createTable("db", t, sch,
        options = Map("merge-engine" -> "partial-update",
          "partial-update.remove-record-on-delete" -> "true") ++
          producer.map("changelog-producer" -> _),
        primaryKey = Seq("id"))
    mk("pud_l", Some("lookup")); mk("pud_n", None)
    def up(t: String, sqlRows: String): Unit =
      gc.upsert("db", t, spark.sql(
        s"SELECT CAST(id AS BIGINT) id, CAST(a AS STRING) a, " +
          s"CAST(b AS BIGINT) b FROM VALUES $sqlRows AS t(id, a, b)"))
    def hist(t: String): Unit = {
      up(t, "(1, 'x', 10), (2, 'y', 20)")                          // snap 1
      up(t, "(1, NULL, 99)")                                       // snap 2
      gc.deleteWhere("db", t, col("id") === 1)                     // snap 3
      up(t, "(1, 'fresh', 7)")                                     // snap 4
    }
    hist("pud_l"); hist("pud_n")
    assert(rows(gc.read("db", "pud_l")) === rows(gc.read("db", "pud_n")))
    // the tombstone's -D carries the PATCHED image (a kept from snap 1)
    val del = gc.readChangelogFull("db", "pud_l", 2, 3)
    assert(!del.queryExecution.executedPlan.toString.contains("Join"))
    assert(rows(del) === Seq("[1,x,99,-D]"))
    (1L to 4L).foreach { i =>
      assert(rows(gc.readChangelogFull("db", "pud_l", i - 1, i)) ===
        rows(gc.readChangelogFull("db", "pud_n", i - 1, i)),
        s"range (${i - 1}, $i]")
    }
    // the re-insert after the tombstone patches from SCRATCH (no ghost
    // of the deleted row) and its +U/+I carries the fresh image
    assert(rows(gc.readChangelogFull("db", "pud_l", 3, 4)) ===
      Seq("[1,fresh,7,+I]"))
  }

  test("full-compaction producer (r17): a field-wise carrier diff spans " +
      "remove-record-on-delete tombstones") {
    val sch = spark.range(1).selectExpr("id",
      "CAST(NULL AS BIGINT) AS total").schema
    gc.createTable("db", "agd_f", sch,
      options = Map("merge-engine" -> "aggregation",
        "fields.total.aggregate-function" -> "sum",
        "aggregation.remove-record-on-delete" -> "true",
        "changelog-producer" -> "full-compaction"),
      primaryKey = Seq("id"))
    import spark.implicits._
    gc.upsert("db", "agd_f", Seq((1L, 5L), (2L, 7L)).toDF("id", "total"))
    val c = gc.compact("db", "agd_f")
    gc.deleteWhere("db", "agd_f", col("id") === 1)
    gc.upsert("db", "agd_f", Seq((2L, 3L)).toDF("id", "total"))
    val c2 = gc.compact("db", "agd_f")
    val served = gc.readChangelogFull("db", "agd_f", c, c2)
    assert(!served.queryExecution.executedPlan.toString.contains("Join"))
    assert(rows(served) === Seq("[1,5,-D]", "[2,10,+U]", "[2,7,-U]"))
  }
}
