package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.sources.GraftCatalog

/**
 * PK-table merge engines (Paimon's `merge-engine` option): partial-update,
 * aggregation, first-row — plus the deduplicate-only guards on tombstone /
 * changelog / incremental paths.
 */
class MergeEngineSpec extends SparkSpecBase {

  private lazy val warehouse = Files.createTempDirectory("graft-mewh").toString
  private lazy val gc: GraftCatalog = new GraftCatalog(spark, warehouse)

  override def beforeAll(): Unit = {
    super.beforeAll()
    spark.conf.set("spark.sql.catalog.gm", "graft.sources.GraftSparkCatalog")
    spark.conf.set("spark.sql.catalog.gm.warehouse", warehouse)
    gc.createSchema("db")
  }

  private def rows(t: String): Seq[(Long, Any, Any)] =
    gc.read("db", t).orderBy("id").collect()
      .map(r => (r.getLong(0), r.get(1), r.get(2))).toSeq

  test("partial-update: latest non-null field value wins per key") {
    import spark.implicits._
    gc.createTable("db", "pu", Seq((1L, "x", 1L)).toDF("id", "a", "b").schema,
      options = Map("merge-engine" -> "partial-update"), primaryKey = Seq("id"))
    gc.upsert("db", "pu", Seq[(Long, Option[String], Option[Long])](
      (1L, Some("x"), Some(1L)), (2L, Some("y"), Some(5L))).toDF("id", "a", "b"))
    // patch row: null fields leave the current value in place
    gc.upsert("db", "pu", Seq((1L, Option.empty[String], Some(7L)),
      (3L, Some("z"), Option.empty[Long])).toDF("id", "a", "b"))
    assert(rows("pu") === Seq((1L, "x", 7L), (2L, "y", 5L), (3L, "z", null)))
    // a later non-null overwrites; null still doesn't
    gc.upsert("db", "pu", Seq[(Long, Option[String], Option[Long])](
      (1L, Some("x2"), None)).toDF("id", "a", "b"))
    assert(rows("pu") === Seq((1L, "x2", 7L), (2L, "y", 5L), (3L, "z", null)))
    // SQL reads resolve through the same engine
    assert(spark.sql("SELECT a FROM gm.db.pu WHERE id = 1").head().getString(0) === "x2")
    // compaction materializes the merged image; later patches still merge
    gc.compact("db", "pu")
    assert(rows("pu") === Seq((1L, "x2", 7L), (2L, "y", 5L), (3L, "z", null)))
    gc.upsert("db", "pu", Seq((3L, Option.empty[String], Some(9L)))
      .toDF("id", "a", "b"))
    assert(rows("pu") === Seq((1L, "x2", 7L), (2L, "y", 5L), (3L, "z", 9L)))
  }

  test("aggregation: per-field sum/max/last_non_null fold versions") {
    import spark.implicits._
    gc.createTable("db", "ag",
      Seq((1L, 1L, 1L, "s")).toDF("id", "total", "hi", "note").schema,
      options = Map("merge-engine" -> "aggregation",
        "fields.total.aggregate-function" -> "sum",
        "fields.hi.aggregate-function" -> "max"),
      primaryKey = Seq("id"))
    gc.upsert("db", "ag", Seq((1L, 10L, 3L, "a"), (2L, 20L, 9L, "b"))
      .toDF("id", "total", "hi", "note"))
    gc.upsert("db", "ag", Seq((1L, 5L, 8L, "a2"), (2L, 1L, 2L, "b2"))
      .toDF("id", "total", "hi", "note"))
    val got = gc.read("db", "ag").orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSeq
    assert(got === Seq((1L, 15L, 8L, "a2"), (2L, 21L, 9L, "b2")))
  }

  test("aggregation: bool_and/bool_or fold boolean fields") {
    import spark.implicits._
    gc.createTable("db", "agb",
      Seq((1L, true, true)).toDF("id", "all_ok", "any_flag").schema,
      options = Map("merge-engine" -> "aggregation",
        "fields.all_ok.aggregate-function" -> "bool_and",
        "fields.any_flag.aggregate-function" -> "bool_or"),
      primaryKey = Seq("id"))
    gc.upsert("db", "agb", Seq((1L, true, false), (2L, true, true))
      .toDF("id", "all_ok", "any_flag"))
    gc.upsert("db", "agb", Seq((1L, false, true), (2L, true, false))
      .toDF("id", "all_ok", "any_flag"))
    val got = gc.read("db", "agb").orderBy("id").collect()
      .map(r => (r.getLong(0), r.getBoolean(1), r.getBoolean(2))).toSeq
    assert(got === Seq((1L, false, true), (2L, true, true)))
    // non-boolean field refuses at create
    intercept[IllegalArgumentException](gc.createTable("db", "agbad",
      Seq((1L, 1L)).toDF("id", "v").schema,
      options = Map("merge-engine" -> "aggregation",
        "fields.v.aggregate-function" -> "bool_and"), primaryKey = Seq("id")))
  }

  test("aggregation: listagg/product/first_value/first_non_null/last_value") {
    import spark.implicits._
    gc.createTable("db", "agx",
      Seq((1L, "s", 1L, Option("f"), Option("fn"), Option("lv")))
        .toDF("id", "tags", "prod", "fv", "fnn", "lv").schema,
      options = Map("merge-engine" -> "aggregation",
        "fields.tags.aggregate-function" -> "listagg",
        "fields.prod.aggregate-function" -> "product",
        "fields.fv.aggregate-function" -> "first_value",
        "fields.fnn.aggregate-function" -> "first_non_null",
        "fields.lv.aggregate-function" -> "last_value"),
      primaryKey = Seq("id"))
    gc.upsert("db", "agx", Seq(
      (1L, Option("a"), 3L, Option.empty[String], Option.empty[String], Option("x1")))
      .toDF("id", "tags", "prod", "fv", "fnn", "lv"))
    gc.upsert("db", "agx", Seq(
      (1L, Option("b"), 4L, Option("late-f"), Option("first-nn"), Option.empty[String]))
      .toDF("id", "tags", "prod", "fv", "fnn", "lv"))
    def row1() = gc.read("db", "agx").orderBy("id").collect().map(r =>
      (r.getString(1), r.getLong(2), r.get(3), r.get(4), r.get(5))).head
    // listagg joins in commit order; product folds; first_value keeps the
    // EARLIEST value even when null; first_non_null skips it; last_value
    // takes the LATEST even when null
    assert(row1() === ("a,b", 12L, null, "first-nn", null))
    // compaction materializes the folded row; later versions keep folding
    // associatively onto the compacted partial
    gc.compact("db", "agx")
    assert(row1() === ("a,b", 12L, null, "first-nn", null))
    gc.upsert("db", "agx", Seq(
      (1L, Option("c"), 2L, Option("later"), Option("later"), Option("back")))
      .toDF("id", "tags", "prod", "fv", "fnn", "lv"))
    assert(row1() === ("a,b,c", 24L, null, "first-nn", "back"))
    // type guards
    intercept[IllegalArgumentException](gc.createTable("db", "agxbad",
      Seq((1L, 1L)).toDF("id", "v").schema,
      options = Map("merge-engine" -> "aggregation",
        "fields.v.aggregate-function" -> "listagg"), primaryKey = Seq("id")))
    intercept[IllegalArgumentException](gc.createTable("db", "agxbad2",
      Seq((1L, "s")).toDF("id", "v").schema,
      options = Map("merge-engine" -> "aggregation",
        "fields.v.aggregate-function" -> "product"), primaryKey = Seq("id")))
  }

  test("aggregation: collect concatenates array versions in commit order; " +
      "distinct dedups; merge_map folds maps entry-wise newest-wins") {
    import spark.implicits._
    gc.createTable("db", "agc",
      Seq((1L, Seq("a"), Seq("a"), Map("k" -> 1L)))
        .toDF("id", "tags", "dtags", "attrs").schema,
      options = Map("merge-engine" -> "aggregation",
        "fields.tags.aggregate-function" -> "collect",
        "fields.dtags.aggregate-function" -> "collect",
        "fields.dtags.distinct" -> "true",
        "fields.attrs.aggregate-function" -> "merge_map"),
      primaryKey = Seq("id"))
    gc.upsert("db", "agc", Seq(
      (1L, Option(Seq("a", "b")), Option(Seq("a", "b")),
        Option(Map("k1" -> 1L, "k2" -> 2L))),
      (2L, Option.empty[Seq[String]], Option.empty[Seq[String]],
        Option.empty[Map[String, Long]]))
      .toDF("id", "tags", "dtags", "attrs"))
    gc.upsert("db", "agc", Seq(
      (1L, Option(Seq("b", "c")), Option(Seq("b", "c")),
        Option(Map("k2" -> 20L, "k3" -> 3L))))
      .toDF("id", "tags", "dtags", "attrs"))
    def img() = gc.read("db", "agc").orderBy("id").collect().map { r =>
      (r.getLong(0), Option(r.get(1)).map(_ => r.getSeq[String](1).toList),
        Option(r.get(2)).map(_ => r.getSeq[String](2).toList),
        Option(r.get(3)).map(_ => r.getMap[String, Long](3).toMap))
    }.toSeq
    assert(img() === Seq(
      (1L, Some(Seq("a", "b", "b", "c")), Some(Seq("a", "b", "c")),
        Some(Map("k1" -> 1L, "k2" -> 20L, "k3" -> 3L))),
      (2L, None, None, None)))
    // associative over a compacted partial: fold, then keep folding
    gc.compact("db", "agc")
    gc.upsert("db", "agc", Seq(
      (1L, Option(Seq("d")), Option(Seq("a")),
        Option(Map("k1" -> 100L))),
      (2L, Option(Seq("z")), Option(Seq("z")), Option(Map("n" -> 9L))))
      .toDF("id", "tags", "dtags", "attrs"))
    assert(img() === Seq(
      (1L, Some(Seq("a", "b", "b", "c", "d")), Some(Seq("a", "b", "c")),
        Some(Map("k1" -> 100L, "k2" -> 20L, "k3" -> 3L))),
      (2L, Some(Seq("z")), Some(Seq("z")), Some(Map("n" -> 9L)))))
    // type + option guards
    intercept[IllegalArgumentException](gc.createTable("db", "agcbad",
      Seq((1L, "s")).toDF("id", "v").schema,
      options = Map("merge-engine" -> "aggregation",
        "fields.v.aggregate-function" -> "collect"), primaryKey = Seq("id")))
    intercept[IllegalArgumentException](gc.createTable("db", "agcbad2",
      Seq((1L, "s")).toDF("id", "v").schema,
      options = Map("merge-engine" -> "aggregation",
        "fields.v.aggregate-function" -> "merge_map"), primaryKey = Seq("id")))
    intercept[IllegalArgumentException](gc.createTable("db", "agcbad3",
      Seq((1L, Seq("s"))).toDF("id", "v").schema,
      options = Map("merge-engine" -> "aggregation",
        "fields.v.distinct" -> "true"), primaryKey = Seq("id")))
  }

  test("aggregation: collect and first/last work on UNORDERABLE value " +
      "types (array<map>, map) — the version sort compares ordinals only") {
    import spark.implicits._
    gc.createTable("db", "agu",
      Seq((1L, Seq(Map("k" -> 1L)), Map("m" -> 1L), Map("m" -> 1L)))
        .toDF("id", "evs", "fst", "lst").schema,
      options = Map("merge-engine" -> "aggregation",
        "fields.evs.aggregate-function" -> "collect",
        "fields.fst.aggregate-function" -> "first_non_null",
        "fields.lst.aggregate-function" -> "last_value"),
      primaryKey = Seq("id"))
    gc.upsert("db", "agu", Seq(
      (1L, Option(Seq(Map("a" -> 1L))), Option.empty[Map[String, Long]],
        Option(Map("x" -> 1L))))
      .toDF("id", "evs", "fst", "lst"))
    gc.upsert("db", "agu", Seq(
      (1L, Option(Seq(Map("b" -> 2L), Map("c" -> 3L))), Option(Map("f" -> 9L)),
        Option.empty[Map[String, Long]]))
      .toDF("id", "evs", "fst", "lst"))
    def img() = gc.read("db", "agu").collect().map { r =>
      (r.getLong(0), r.getSeq[Map[String, Long]](1).map(_.toMap).toList,
        Option(r.get(2)).map(_ => r.getMap[String, Long](2).toMap),
        Option(r.get(3)).map(_ => r.getMap[String, Long](3).toMap))
    }.head
    assert(img() === ((1L, List(Map("a" -> 1L), Map("b" -> 2L), Map("c" -> 3L)),
      Some(Map("f" -> 9L)), None)))
    // fold stays associative over a compacted partial
    gc.compact("db", "agu")
    gc.upsert("db", "agu", Seq(
      (1L, Option(Seq(Map("d" -> 4L))), Option(Map("late" -> 0L)),
        Option(Map("y" -> 2L))))
      .toDF("id", "evs", "fst", "lst"))
    assert(img() === ((1L,
      List(Map("a" -> 1L), Map("b" -> 2L), Map("c" -> 3L), Map("d" -> 4L)),
      Some(Map("f" -> 9L)), Some(Map("y" -> 2L)))))
  }

  test("aggregation: rbm32/rbm64 OR serialized roaring bitmaps — exact " +
      "membership, associative over compacted partials, range-checked") {
    import spark.implicits._
    import graft.plans.kernels
    def df(rows: Seq[(Long, Seq[Long])]) =
      rows.toDF("id", "vs").select(col("id"),
        kernels.rbmBuild(col("vs"), bits64 = false).as("bm"),
        // 64-bit members deliberately above int range
        kernels.rbmBuild(transform(col("vs"), x => x + 5000000000L),
          bits64 = true).as("bm64"))
    gc.createTable("db", "rbm", df(Seq((1L, Seq(1L)))).schema,
      options = Map("merge-engine" -> "aggregation",
        "fields.bm.aggregate-function" -> "rbm32",
        "fields.bm64.aggregate-function" -> "rbm64"),
      primaryKey = Seq("id"))
    gc.upsert("db", "rbm", df(Seq((1L, Seq(1L, 2L, 3L)), (2L, Seq(10L)))))
    gc.upsert("db", "rbm", df(Seq((1L, Seq(3L, 4L)), (2L, Seq(10L, 11L)))))
    def img() = gc.read("db", "rbm").select(col("id"),
        kernels.rbmToArray(col("bm"), bits64 = false).as("a"),
        kernels.rbmCardinality(col("bm64"), bits64 = true).as("c64"))
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toList, r.getLong(2))).toSeq
    val expect2 = Seq((1L, List(1L, 2L, 3L, 4L), 4L), (2L, List(10L, 11L), 2L))
    assert(img() === expect2)
    // compaction materializes the OR; later deltas fold onto the partial
    gc.compact("db", "rbm")
    assert(img() === expect2)
    gc.upsert("db", "rbm", df(Seq((1L, Seq(2L, 9L)))))
    assert(img() === Seq((1L, List(1L, 2L, 3L, 4L, 9L), 5L),
      (2L, List(10L, 11L), 2L)))
    // rbm32 build refuses values outside int range — loud, not truncated
    val e = intercept[Exception] {
      Seq((9L, Seq(5000000000L))).toDF("id", "vs")
        .select(kernels.rbmBuild(col("vs"), bits64 = false)).collect()
    }
    assert(e.getMessage != null)
  }

  test("aggregation: hll_sketch folds DataSketches HLL by union — within " +
      "5% of exact, deterministic, invariant under compaction") {
    val src = spark.range(1, 5001)
      .select((col("id") % 3).as("b"), lit(1L).as("k"), col("id"))
    def batch(b: Int) = src.filter(col("b") === b).groupBy("k")
      .agg(hll_sketch_agg(col("id")).as("sk"))
      .select(col("k"), col("sk"))
    gc.createTable("db", "hll", batch(0).schema,
      options = Map("merge-engine" -> "aggregation",
        "fields.sk.aggregate-function" -> "hll_sketch"),
      primaryKey = Seq("k"))
    (0 to 2).foreach(b => gc.upsert("db", "hll", batch(b)))
    def est(): Long = gc.read("db", "hll")
      .select(hll_sketch_estimate(col("sk"))).head().getLong(0)
    val e1 = est()
    assert(math.abs(e1 - 5000L) <= 250L, s"HLL estimate $e1 off >5% from 5000")
    assert(est() === e1, "HLL estimate not deterministic across reads")
    // compaction materializes the union of the same version set — the
    // estimate must be bit-identical, and later deltas still fold
    gc.compact("db", "hll")
    assert(est() === e1, "compaction changed the HLL estimate")
    gc.upsert("db", "hll", spark.range(5001, 6001).groupBy(lit(1L).as("k"))
      .agg(hll_sketch_agg(col("id")).as("sk")).select(col("k"), col("sk")))
    val e2 = est()
    assert(math.abs(e2 - 6000L) <= 300L, s"post-delta estimate $e2 off >5%")
  }

  test("aggregation: nested_update upserts array<row> elements by " +
      "nested-key; without a key versions append") {
    def df(valuesSql: String) =
      spark.sql(s"SELECT * FROM VALUES $valuesSql AS t(id, lines, notes)")
    val v1 = df("(1L, array(named_struct('k', 1L, 'v', 'a'), " +
      "named_struct('k', 2L, 'v', 'b')), array(named_struct('t', 'n1')))")
    gc.createTable("db", "nu", v1.schema,
      options = Map("merge-engine" -> "aggregation",
        "fields.lines.aggregate-function" -> "nested_update",
        "fields.lines.nested-key" -> "k",
        "fields.notes.aggregate-function" -> "nested_update"),
      primaryKey = Seq("id"))
    gc.upsert("db", "nu", v1)
    gc.upsert("db", "nu", df("(1L, array(named_struct('k', 2L, 'v', 'B2'), " +
      "named_struct('k', 3L, 'v', 'c')), array(named_struct('t', 'n2')))"))
    def img() = gc.read("db", "nu").selectExpr("id",
        "array_sort(transform(lines, e -> concat(e.k, ':', e.v)))",
        "transform(notes, e -> e.t)")
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getSeq[String](1).toList,
        r.getSeq[String](2).toList)).toSeq
    // keyed: element 2 REPLACED, 3 added; keyless: commit-order append
    val expect = Seq((1L, List("1:a", "2:B2", "3:c"), List("n1", "n2")))
    assert(img() === expect)
    // associative over a compacted partial
    gc.compact("db", "nu")
    assert(img() === expect)
    gc.upsert("db", "nu", df("(1L, array(named_struct('k', 1L, 'v', 'A3')), " +
      "CAST(NULL AS array<struct<t: string>>))"))
    assert(img() === Seq((1L, List("1:A3", "2:B2", "3:c"),
      List("n1", "n2"))))
  }

  test("partial-update sequence-groups: per-group version columns") {
    import spark.implicits._
    // columns: pk id | group (ga: a1, a2 versioned by sa) | plain p
    gc.createTable("db", "sg",
      Seq((1L, Option(1L), Option("x"), Option("y"), Option("p")))
        .toDF("id", "sa", "a1", "a2", "p").schema,
      options = Map("merge-engine" -> "partial-update",
        "fields.sa.sequence-group" -> "a1,a2"),
      primaryKey = Seq("id"))
    gc.upsert("db", "sg", Seq(
      (1L, Option(10L), Option("a1v1"), Option("a2v1"), Option("p1")))
      .toDF("id", "sa", "a1", "a2", "p"))
    // LOWER group sequence: group fields must NOT update (even though
    // this row is newer by commit order); plain field p still updates
    // by latest-non-null
    gc.upsert("db", "sg", Seq(
      (1L, Option(5L), Option("stale"), Option("stale"), Option("p2")))
      .toDF("id", "sa", "a1", "a2", "p"))
    def row1() = gc.read("db", "sg").collect().map(r =>
      (r.get(1), r.get(2), r.get(3), r.get(4))).head
    assert(row1() === (10L, "a1v1", "a2v1", "p2"))
    // HIGHER group sequence updates the group — INCLUDING nulling a
    // member (unlike latest-non-null); null group seq leaves it alone
    gc.upsert("db", "sg", Seq(
      (1L, Option(20L), Option("a1v2"), Option.empty[String], Option.empty[String]))
      .toDF("id", "sa", "a1", "a2", "p"))
    assert(row1() === (20L, "a1v2", null, "p2"))
    gc.upsert("db", "sg", Seq(
      (1L, Option.empty[Long], Option("ignored"), Option("ignored"), Option("p4")))
      .toDF("id", "sa", "a1", "a2", "p"))
    assert(row1() === (20L, "a1v2", null, "p4"))
    // compaction materializes; group folding stays associative
    gc.compact("db", "sg")
    assert(row1() === (20L, "a1v2", null, "p4"))
    gc.upsert("db", "sg", Seq(
      (1L, Option(15L), Option("late"), Option("late"), Option.empty[String]))
      .toDF("id", "sa", "a1", "a2", "p"))
    assert(row1() === (20L, "a1v2", null, "p4"))
    // DDL guards: drop of group column or member refuses; rename tracks
    intercept[IllegalArgumentException](gc.dropColumn("db", "sg", "sa"))
    intercept[IllegalArgumentException](gc.dropColumn("db", "sg", "a1"))
    gc.renameColumn("db", "sg", "a1", "a1x")
    assert(gc.tableOptions("db", "sg")("fields.sa.sequence-group") === "a1x,a2")
    // validation refusals
    intercept[IllegalArgumentException](gc.createTable("db", "sgbad",
      Seq((1L, 1L, "x")).toDF("id", "s", "v").schema,
      options = Map("fields.s.sequence-group" -> "v"), primaryKey = Seq("id")))
    intercept[IllegalArgumentException](gc.createTable("db", "sgbad2",
      Seq((1L, 1L, "x")).toDF("id", "s", "v").schema,
      options = Map("merge-engine" -> "partial-update",
        "fields.s.sequence-group" -> "nope"), primaryKey = Seq("id")))
  }

  test("full changelog on field-wise engines: resolved-image pairs") {
    import spark.implicits._
    import org.apache.spark.sql.Row
    gc.createTable("db", "pucl",
      Seq((1L, Option("x"), Option(1L))).toDF("id", "a", "b").schema,
      options = Map("merge-engine" -> "partial-update"), primaryKey = Seq("id"))
    gc.upsert("db", "pucl", Seq((1L, Option("a1"), Option(1L)),
      (2L, Option("b1"), Option(2L))).toDF("id", "a", "b"))        // snap 1
    gc.upsert("db", "pucl", Seq((1L, Option.empty[String], Option(7L)))
      .toDF("id", "a", "b"))                                       // snap 2: patch
    gc.upsert("db", "pucl", Seq((2L, Option.empty[String], Option.empty[Long]))
      .toDF("id", "a", "b"))                                       // snap 3: no-op patch
    def cl(from: Long, to: Long): Seq[Row] =
      gc.readChangelogFull("db", "pucl", from, to)
        .orderBy("id", "_row_kind").collect().toSeq
    assert(cl(0, 1).map(r => (r.getLong(0), r.getString(3))) ===
      Seq((1L, "+I"), (2L, "+I")))
    // the pair carries RESOLVED images, not the raw patch (a stays "a1")
    assert(cl(1, 2).map(r =>
      (r.getLong(0), r.get(1), r.get(2), r.getString(3))) ===
      Seq((1L, "a1", 7L, "+U"), (1L, "a1", 1L, "-U")))
    // an all-null patch leaves the resolved image unchanged → net zero
    assert(cl(2, 3).isEmpty)
    // aggregation engine: the pair retracts the old SUM, adds the new
    gc.createTable("db", "agcl",
      Seq((1L, 1L)).toDF("id", "total").schema,
      options = Map("merge-engine" -> "aggregation",
        "fields.total.aggregate-function" -> "sum"),
      primaryKey = Seq("id"))
    gc.upsert("db", "agcl", Seq((1L, 10L)).toDF("id", "total"))   // snap 1
    gc.upsert("db", "agcl", Seq((1L, 5L)).toDF("id", "total"))    // snap 2
    assert(gc.readChangelogFull("db", "agcl", 1L, 2L)
      .orderBy("_row_kind").collect()
      .map(r => (r.getLong(1), r.getString(2))).toSeq ===
      Seq((15L, "+U"), (10L, "-U")))
    // end-to-end: full-mode stream into a plain deduplicate replica
    // converges to the RESOLVED partial-update image
    gc.createTable("db", "puclr",
      Seq((1L, Option("x"), Option(1L))).toDF("id", "a", "b").schema,
      primaryKey = Seq("id"))
    val q = gc.readChangelogStream("db", "pucl", mode = "full").writeStream
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-pucl-ckpt").toString)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[Row], id: Long) =>
        if (!b.isEmpty) { gc.applyChangelog("db", "puclr", b.toDF(), Some(id)); () }
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    assert(gc.read("db", "puclr").orderBy("id").collect().map(r =>
      (r.getLong(0), r.get(1), r.get(2))).toSeq ===
      Seq((1L, "a1", 7L), (2L, "b1", 2L)))
    // upsert-mode stream still refuses field-wise engines
    intercept[IllegalArgumentException](
      gc.readChangelogStream("db", "pucl"))
  }

  test("first-row: earliest version wins per key") {
    import spark.implicits._
    gc.createTable("db", "fr", Seq((1L, "x", 0L)).toDF("id", "a", "b").schema,
      options = Map("merge-engine" -> "first-row"), primaryKey = Seq("id"))
    gc.upsert("db", "fr", Seq((1L, "first", 1L)).toDF("id", "a", "b"))
    gc.upsert("db", "fr", Seq((1L, "later", 2L), (2L, "new", 3L))
      .toDF("id", "a", "b"))
    assert(rows("fr") === Seq((1L, "first", 1L), (2L, "new", 3L)))
  }

  test("merge engines resolve across schema evolution by field id") {
    import spark.implicits._
    gc.createTable("db", "puev", Seq((1L, "x")).toDF("id", "a").schema,
      options = Map("merge-engine" -> "partial-update"), primaryKey = Seq("id"))
    gc.upsert("db", "puev", Seq((1L, "x"), (2L, "y")).toDF("id", "a"))
    gc.addColumn("db", "puev",
      org.apache.spark.sql.types.StructField("b",
        org.apache.spark.sql.types.LongType))
    gc.renameColumn("db", "puev", "a", "a2")
    // pre-evolution rows surface null for b; the patch fills it per key
    gc.upsert("db", "puev", Seq[(Long, Option[String], Option[Long])](
      (1L, None, Some(7L)), (3L, Some("z"), Some(9L))).toDF("id", "a2", "b"))
    val got = gc.read("db", "puev").orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.get(2))).toSeq
    assert(got === Seq((1L, "x", 7L), (2L, "y", null), (3L, "z", 9L)))
  }

  test("deduplicate-only operations refuse the field-wise engines") {
    import spark.implicits._
    intercept[IllegalArgumentException](gc.deleteWhere("db", "pu", col("id") === 1L))
    intercept[IllegalArgumentException](gc.mergeCommit("db", "pu",
      Seq[(Long, Option[String], Option[Long])]((9L, Some("q"), Some(1L)))
        .toDF("id", "a", "b"),
      Seq(Tuple1(1L)).toDF("id")))
    intercept[IllegalArgumentException](gc.readChangelog("db", "pu", 0L, 1L))
    intercept[IllegalArgumentException](gc.readChangelogStream("db", "pu"))
    intercept[IllegalArgumentException](gc.readIncremental("db", "pu", 1L, 2L))
  }

  test("createTable validates engine names, bucket exclusivity, field options") {
    import spark.implicits._
    val sch = Seq((1L, 1L)).toDF("id", "v").schema
    intercept[IllegalArgumentException](gc.createTable("db", "bad1", sch,
      options = Map("merge-engine" -> "upsert"), primaryKey = Seq("id")))
    intercept[IllegalArgumentException](gc.createTable("db", "bad2", sch,
      options = Map("merge-engine" -> "partial-update")))
    intercept[IllegalArgumentException](gc.createTable("db", "bad3", sch,
      options = Map("merge-engine" -> "partial-update", "bucket" -> "4"),
      primaryKey = Seq("id")))
    intercept[IllegalArgumentException](gc.createTable("db", "bad4", sch,
      options = Map("merge-engine" -> "partial-update",
        "fields.v.aggregate-function" -> "sum"), primaryKey = Seq("id")))
    intercept[IllegalArgumentException](gc.createTable("db", "bad5", sch,
      options = Map("merge-engine" -> "aggregation",
        "fields.id.aggregate-function" -> "sum"), primaryKey = Seq("id")))
    intercept[IllegalArgumentException](gc.createTable("db", "bad6", sch,
      options = Map("merge-engine" -> "aggregation",
        "fields.v.aggregate-function" -> "avg"), primaryKey = Seq("id")))
    // sum over a non-numeric field fails at CREATE, not first read
    val strSch = Seq((1L, "s")).toDF("id", "note").schema
    intercept[IllegalArgumentException](gc.createTable("db", "bad7", strSch,
      options = Map("merge-engine" -> "aggregation",
        "fields.note.aggregate-function" -> "sum"), primaryKey = Seq("id")))
  }

  // ---- r16: retraction on the aggregation engine ----

  test("aggregation retract: -U subtracts sums and removes collected " +
      "elements; state survives compaction exactly") {
    import spark.implicits._
    val d = Seq((1L, 10L, Seq("a")), (2L, 20L, Seq("b")))
      .toDF("id", "v", "tags").withColumn("op", lit("+I"))
    gc.createTable("db", "ret", d.schema,
      options = Map("merge-engine" -> "aggregation",
        "fields.v.aggregate-function" -> "sum",
        "fields.tags.aggregate-function" -> "collect",
        "rowkind.field" -> "op"),
      primaryKey = Seq("id"))
    gc.upsert("db", "ret", d)
    gc.upsert("db", "ret", Seq((1L, 5L, Seq("c")), (2L, 7L, Seq("b")))
      .toDF("id", "v", "tags").withColumn("op", lit("+U")))
    // accumulate: v = 15/27, tags = [a,c]/[b,b]
    gc.upsert("db", "ret", Seq((1L, 5L, Seq("a")), (2L, 27L, Seq("b")))
      .toDF("id", "v", "tags").withColumn("op", lit("-U")))
    def img() = gc.read("db", "ret").orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[String](2).toList)).toSeq
    // retract: key 1 v 15-5=10, tags [a,c] minus one 'a' = [c];
    // key 2 v 27-27=0, tags [b,b] minus one 'b' = [b]
    assert(img() === Seq((1L, 10L, List("c")), (2L, 0L, List("b"))))
    // compaction materializes; a post-compaction retract stays exact
    // (sum subtracts from the folded value, collect removes from the
    // folded array — the associative-over-a-compacted-prefix contract)
    gc.compact("db", "ret")
    assert(img() === Seq((1L, 10L, List("c")), (2L, 0L, List("b"))))
    gc.upsert("db", "ret", Seq((1L, 4L, Seq("c")))
      .toDF("id", "v", "tags").withColumn("op", lit("-D")))
    assert(img() === Seq((1L, 6L, List()), (2L, 0L, List("b"))))
    // retracting an element that is not in the array leaves it unchanged
    gc.upsert("db", "ret", Seq((2L, 0L, Seq("zz")))
      .toDF("id", "v", "tags").withColumn("op", lit("-U")))
    assert(img() === Seq((1L, 6L, List()), (2L, 0L, List("b"))))
    // SQL reads resolve through the same inverted fold
    assert(spark.sql("SELECT v FROM gm.db.ret WHERE id = 1").head().getLong(0) === 6L)
  }

  test("aggregation retract refusal matrix: non-retractable functions " +
      "reject -U/-D loudly; create-time gate names the alternatives") {
    import spark.implicits._
    val d = Seq((1L, 10L)).toDF("id", "v").withColumn("op", lit("+I"))
    // max has no exact retraction: rowkind.field + aggregation refuses
    // at CREATE unless remove-record-on-delete or ignore-delete is set
    val e = intercept[IllegalArgumentException](gc.createTable("db", "retbad",
      d.schema, options = Map("merge-engine" -> "aggregation",
        "fields.v.aggregate-function" -> "max", "rowkind.field" -> "op"),
      primaryKey = Seq("id")))
    assert(e.getMessage.contains("remove-record-on-delete"))
    // with remove-record-on-delete, -D works but -U still refuses (max
    // cannot resurrect values a compacted prefix discarded)
    gc.createTable("db", "retmax", d.schema,
      options = Map("merge-engine" -> "aggregation",
        "fields.v.aggregate-function" -> "max", "rowkind.field" -> "op",
        "aggregation.remove-record-on-delete" -> "true"),
      primaryKey = Seq("id"))
    gc.upsert("db", "retmax", d)
    val u = intercept[IllegalArgumentException](gc.upsert("db", "retmax",
      Seq((1L, 10L)).toDF("id", "v").withColumn("op", lit("-U"))))
    assert(u.getMessage.contains("no exact retraction"))
    // option validation
    intercept[IllegalArgumentException](gc.createTable("db", "retbad2",
      d.schema, options = Map("merge-engine" -> "deduplicate",
        "aggregation.remove-record-on-delete" -> "true"),
      primaryKey = Seq("id")))
    intercept[IllegalArgumentException](gc.createTable("db", "retbad3",
      d.schema, options = Map("merge-engine" -> "aggregation",
        "fields.v.aggregate-function" -> "sum",
        "ignore-delete" -> "true",
        "aggregation.remove-record-on-delete" -> "true"),
      primaryKey = Seq("id")))
  }

  test("collect retract gate (r17): unorderable element types refuse " +
      "-U at the WRITE — an accepted retract would poison every read") {
    import spark.implicits._
    // array<map<string,bigint>>: collect concatenates fine insert-only
    // (ordinal-only comparator), but the retract fold's array_position
    // removal needs ordering-based equality, which maps don't have
    val d = spark.sql("SELECT CAST(1 AS BIGINT) id, " +
      "array(map('k', CAST(1 AS BIGINT))) ms, '+I' op")
    // create-time gate: rowkind.field + collect-on-unorderable refuses
    // without remove-record-on-delete / ignore-delete
    val e = intercept[IllegalArgumentException](gc.createTable("db", "cmap0",
      d.schema, options = Map("merge-engine" -> "aggregation",
        "fields.ms.aggregate-function" -> "collect", "rowkind.field" -> "op"),
      primaryKey = Seq("id")))
    assert(e.getMessage.contains("remove-record-on-delete"))
    // with remove-record-on-delete: -D (whole-row removal) is fine, but
    // a -U retract refuses loudly and the table stays READABLE after
    gc.createTable("db", "cmap", d.schema,
      options = Map("merge-engine" -> "aggregation",
        "fields.ms.aggregate-function" -> "collect", "rowkind.field" -> "op",
        "aggregation.remove-record-on-delete" -> "true"),
      primaryKey = Seq("id"))
    gc.upsert("db", "cmap", d)
    val u = intercept[IllegalArgumentException](gc.upsert("db", "cmap",
      d.withColumn("op", lit("-U"))))
    assert(u.getMessage.contains("no exact retraction"))
    assert(gc.read("db", "cmap").count() === 1, "refused write left no poison")
    gc.upsert("db", "cmap", d.withColumn("op", lit("-D")))
    assert(gc.read("db", "cmap").count() === 0)
    gc.compact("db", "cmap")
    // orderable element types still pass the create gate without rrod
    val d2 = Seq((1L, Seq("a"), "+I")).toDF("id", "tags", "op")
    gc.createTable("db", "cstr_ok", d2.schema,
      options = Map("merge-engine" -> "aggregation",
        "fields.tags.aggregate-function" -> "collect",
        "rowkind.field" -> "op"),
      primaryKey = Seq("id"))
  }

  test("partial-update remove-record-on-delete: -D tombstones the key, " +
      "later patches re-build from scratch; -U refuses loudly") {
    import spark.implicits._
    val d = Seq[(Long, Option[String], Option[Long], String)](
      (1L, Some("a"), Some(10L), "+I"), (2L, Some("b"), Some(20L), "+I"))
      .toDF("id", "v", "w", "op")
    gc.createTable("db", "purrod", d.schema,
      options = Map("merge-engine" -> "partial-update",
        "rowkind.field" -> "op",
        "partial-update.remove-record-on-delete" -> "true"),
      primaryKey = Seq("id"))
    gc.upsert("db", "purrod", d)
    // patch key 1's w only
    gc.upsert("db", "purrod", Seq[(Long, Option[String], Option[Long], String)](
      (1L, None, Some(77L), "+U")).toDF("id", "v", "w", "op"))
    def img() = gc.read("db", "purrod").orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.get(2))).toSeq
    assert(img() === Seq((1L, "a", 77L), (2L, "b", 20L)))
    // -D removes the key; the earlier patches do NOT resurrect
    gc.upsert("db", "purrod", Seq[(Long, Option[String], Option[Long], String)](
      (1L, None, None, "-D")).toDF("id", "v", "w", "op"))
    assert(img() === Seq((2L, "b", 20L)))
    // a later patch re-builds key 1 from scratch (v is null again)
    gc.upsert("db", "purrod", Seq[(Long, Option[String], Option[Long], String)](
      (1L, None, Some(5L), "+U")).toDF("id", "v", "w", "op"))
    assert(img() === Seq((1L, null, 5L), (2L, "b", 20L)))
    // deleteWhere lands through the same gate; compaction materializes
    gc.deleteWhere("db", "purrod", col("id") === 2L)
    gc.compact("db", "purrod")
    assert(img() === Seq((1L, null, 5L)))
    // -U refuses loudly (no retraction on partial-update)
    val e = intercept[IllegalArgumentException](gc.upsert("db", "purrod",
      Seq[(Long, Option[String], Option[Long], String)](
        (1L, None, Some(5L), "-U")).toDF("id", "v", "w", "op")))
    assert(e.getMessage.contains("no retraction"))
    // without the option, rowkind.field on partial-update still refuses
    val c = intercept[IllegalArgumentException](gc.createTable("db", "pubad",
      d.schema, options = Map("merge-engine" -> "partial-update",
        "rowkind.field" -> "op"), primaryKey = Seq("id")))
    assert(c.getMessage.contains("remove-record-on-delete"))
  }

  test("aggregation remove-record-on-delete: -D and deleteWhere remove " +
      "the key; a later insert re-aggregates from scratch; time travel " +
      "sees each image") {
    import spark.implicits._
    val d = Seq((1L, 10L), (2L, 20L), (3L, 30L))
      .toDF("id", "v").withColumn("op", lit("+I"))
    gc.createTable("db", "rrod", d.schema,
      options = Map("merge-engine" -> "aggregation",
        "fields.v.aggregate-function" -> "sum", "rowkind.field" -> "op",
        "aggregation.remove-record-on-delete" -> "true"),
      primaryKey = Seq("id"))
    gc.upsert("db", "rrod", d)                                       // snap 1
    gc.upsert("db", "rrod", Seq((2L, 0L)).toDF("id", "v")
      .withColumn("op", lit("-D"))
      .unionByName(Seq((1L, 1L)).toDF("id", "v")
        .withColumn("op", lit("+U"))))                               // snap 2
    def img() = gc.read("db", "rrod").orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(img() === Seq((1L, 11L), (3L, 30L)))
    // re-insert AFTER the tombstone: the fold resets (sum 99, not 119)
    gc.upsert("db", "rrod", Seq((2L, 99L)).toDF("id", "v")
      .withColumn("op", lit("+I")))                                  // snap 3
    assert(img() === Seq((1L, 11L), (2L, 99L), (3L, 30L)))
    // deleteWhere lands a tombstone through the same gate
    gc.deleteWhere("db", "rrod", col("id") === 3L)                   // snap 4
    assert(img() === Seq((1L, 11L), (2L, 99L)))
    // time travel: each historical image resolves under its own fold
    assert(gc.read("db", "rrod", snapshotId = Some(1)).count() === 3)
    assert(gc.read("db", "rrod", snapshotId = Some(2)).orderBy("id")
      .collect().map(_.getLong(1)).toSeq === Seq(11L, 30L))
    // compaction materializes the post-tombstone state
    gc.compact("db", "rrod")
    assert(img() === Seq((1L, 11L), (2L, 99L)))
  }
}
