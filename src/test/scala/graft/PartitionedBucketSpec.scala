package graft

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.GraftCatalog

/**
 * Partitioned + bucketed PK tables (Paimon's standard production layout,
 * `part=v/__bucket=k` dirs): partition columns must be part of the
 * primary key, so a key lives in exactly one partition and each bucket
 * leg merges key-disjoint slices across partitions.
 */
class PartitionedBucketSpec extends SparkSpecBase {

  private def freshCatalog(): (GraftCatalog, String) = {
    val wh = Files.createTempDirectory("graft-pb-wh").toString
    (new GraftCatalog(spark, wh), wh)
  }

  private val pkvSchema = StructType(Seq(
    StructField("part", StringType), StructField("id", LongType),
    StructField("v", StringType)))

  private def create(cat: GraftCatalog, table: String, buckets: Int = 4): Unit = {
    cat.createSchema("db")
    cat.createTable("db", table, pkvSchema, partitionBy = Seq("part"),
      options = Map("bucket" -> buckets.toString),
      primaryKey = Seq("part", "id"))
  }

  private def rows(parts: Seq[String], n: Long, tag: String) =
    for (p <- parts; i <- 1L to n) yield (p, i, s"$tag-$p-$i")

  test("layout nests buckets under partitions; MoR resolves updates and " +
      "tombstones across the combined layout") {
    import spark.implicits._
    val (cat, wh) = freshCatalog()
    create(cat, "t")
    cat.upsert("db", "t", rows(Seq("a", "b"), 20, "v").toDF("part", "id", "v"))
    // physical layout: part=a/__bucket=k
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val dir0 = cat.snapshotFileEntries("db", "t").head.dir
    val pa = new Path(new Path(new Path(new Path(wh, "db"), "t"), dir0), "part=a")
    assert(fs.exists(pa), "partition dir missing")
    assert(fs.listStatus(pa).exists(_.getPath.getName.startsWith("__bucket=")),
      "bucket dirs must nest under partitions")
    // update a slice of partition a, delete across both partitions
    cat.upsert("db", "t",
      rows(Seq("a"), 5, "u").toDF("part", "id", "v"))
    cat.deleteWhere("db", "t", col("id") === 7L)
    val img = cat.read("db", "t").as[(String, Long, String)].collect().toSet
    val expect = (rows(Seq("a", "b"), 20, "v").toMap2 ++
      rows(Seq("a"), 5, "u").toMap2)
      .filterNot { case ((_, i), _) => i == 7L }
      .map { case ((p, i), v) => (p, i, v) }.toSet
    assert(img === expect)
    // same key id in DIFFERENT partitions stays distinct (partition ∈ pk)
    assert(img.count(_._2 == 1L) === 2)
  }

  private implicit class Rows2(rs: Seq[(String, Long, String)]) {
    def toMap2: Map[(String, Long), String] =
      rs.map { case (p, i, v) => (p, i) -> v }.toMap
  }

  test("readBucket unions every partition's slice of the bucket; " +
      "compact and rescale preserve the image; time travel resolves " +
      "under the old layout") {
    import spark.implicits._
    val (cat, _) = freshCatalog()
    create(cat, "c")
    cat.upsert("db", "c", rows(Seq("a", "b", "cc"), 15, "v").toDF("part", "id", "v"))
    val preDelete = cat.snapshots("db", "c").last.id
    cat.deleteWhere("db", "c", col("id") % 5 === 0)
    // the four buckets partition the key space exactly
    val byBucket = (0 until 4).map(k =>
      cat.readBucket("db", "c", k).as[(String, Long, String)].collect().toSet)
    assert(byBucket.map(_.size).sum === byBucket.flatten.toSet.size,
      "buckets must be disjoint")
    assert(byBucket.flatten.toSet === cat.read("db", "c")
      .as[(String, Long, String)].collect().toSet)
    // time travel: pre-delete image still resolves (45 rows)
    assert(cat.read("db", "c", snapshotId = Some(preDelete)).count() === 45)
    // compact materializes the merged image; layout survives
    cat.compact("db", "c")
    assert(cat.read("db", "c").count() === 36)
    // rescale 4 -> 2 buckets: image identical under the new layout
    cat.rescaleBucket("db", "c", 2)
    assert(cat.bucketCountOf("db", "c") === Some(2))
    assert(cat.read("db", "c").count() === 36)
    assert(cat.readBucket("db", "c", 0).count() +
      cat.readBucket("db", "c", 1).count() === 36)
  }

  test("validation: fixed buckets require partition in the primary key; " +
      "cross-partition mode restrictions; partition replacement refuses " +
      "PK tables") {
    import spark.implicits._
    val (cat, _) = freshCatalog()
    cat.createSchema("db")
    intercept[IllegalArgumentException](cat.createTable("db", "bad", pkvSchema,
      partitionBy = Seq("part"), options = Map("bucket" -> "4"),
      primaryKey = Seq("id")))
    // dynamic bucket + partition ⊆ PK is the ordinary per-partition
    // dynamic layout — legal
    cat.createTable("db", "dynok", pkvSchema,
      partitionBy = Seq("part"), options = Map("bucket" -> "-1"),
      primaryKey = Seq("part", "id"))
    // cross-partition mode (pk excludes partition): sequence.field and
    // non-deduplicate merge engines are refused — commit order is the only
    // arbiter a move tombstone can respect
    intercept[IllegalArgumentException](cat.createTable("db", "bad2", pkvSchema,
      partitionBy = Seq("part"),
      options = Map("bucket" -> "-1", "sequence.field" -> "v"),
      primaryKey = Seq("id")))
    intercept[IllegalArgumentException](cat.createTable("db", "bad3", pkvSchema,
      partitionBy = Seq("part"),
      options = Map("bucket" -> "-1", "merge-engine" -> "partial-update"),
      primaryKey = Seq("id")))
    create(cat, "g")
    cat.upsert("db", "g", rows(Seq("a"), 5, "v").toDF("part", "id", "v"))
    // partition expiration / dynamic overwrite route through
    // replacePartitions, which refuses PK tables (tombstones, not
    // partition drops, are the PK deletion mechanism)
    intercept[IllegalArgumentException](
      cat.expirePartitions("db", "g", col("part") === "a"))
  }

  test("SQL surface: CREATE + INSERT upserts + SELECT resolves + full-PK " +
      "point lookup routes through the bucket") {
    import spark.implicits._
    val (cat, wh) = freshCatalog()
    spark.conf.set("spark.sql.catalog.gpb", "graft.sources.GraftSparkCatalog")
    spark.conf.set("spark.sql.catalog.gpb.warehouse", wh)
    spark.sql("CREATE NAMESPACE gpb.db")
    spark.sql("CREATE TABLE gpb.db.sq (part STRING, id BIGINT, v STRING) " +
      "PARTITIONED BY (part) " +
      "TBLPROPERTIES ('primary-key'='part,id', 'bucket'='2')")
    spark.sql("INSERT INTO gpb.db.sq VALUES " +
      "('a', 1, 'a1'), ('a', 2, 'a2'), ('b', 1, 'b1'), ('b', 2, 'b2')")
    spark.sql("INSERT INTO gpb.db.sq VALUES ('a', 2, 'A2')") // upsert
    assert(spark.sql("SELECT v FROM gpb.db.sq ORDER BY part, id")
      .as[String].collect().toSeq === Seq("a1", "A2", "b1", "b2"))
    // full-PK equality: the scan prunes to the key's single bucket
    // (readBucket unions that bucket across partitions)
    assert(spark.sql(
      "SELECT v FROM gpb.db.sq WHERE part = 'a' AND id = 2")
      .as[String].collect().toSeq === Seq("A2"))
    spark.sql("DELETE FROM gpb.db.sq WHERE part = 'b' AND id = 1")
    assert(spark.sql("SELECT count(*) FROM gpb.db.sq").head().getLong(0) === 3L)
  }

  test("changelog streaming over a partitioned bucketed table") {
    import spark.implicits._
    val (cat, _) = freshCatalog()
    create(cat, "s", buckets = 2)
    cat.upsert("db", "s", rows(Seq("a", "b"), 3, "v").toDF("part", "id", "v"))
    cat.upsert("db", "s", Seq(("a", 2L, "u"), ("b", 9L, "n")).toDF("part", "id", "v"))
    cat.deleteWhere("db", "s", col("part") === "a" && col("id") === 1L)
    val seen = scala.collection.mutable.ArrayBuffer[(String, Long, String)]()
    val q = cat.readChangelogStream("db", "s")
      .writeStream
      .option("checkpointLocation",
        Files.createTempDirectory("graft-pb-ckpt").toString)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val rs = b.select("part", "id", GraftCatalog.RowKindCol).collect()
          .map(r => (r.getString(0), r.getLong(1), r.getString(2)))
        seen.synchronized { seen ++= rs }; ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    val all = seen.synchronized(seen.toSeq)
    assert(all.contains(("a", 1L, "-D")))
    assert(all.contains(("b", 9L, "+U")) || all.contains(("b", 9L, "+I")))
    assert(all.map(r => (r._1, r._2)).toSet ===
      (for (p <- Seq("a", "b"); i <- 1L to 3L) yield (p, i)).toSet + (("b", 9L)))
  }

  test("dynamic bucket (-1) + partitioned with partition in the PK: " +
      "upsert/delete/point-lookup/compact over the combined layout") {
    import spark.implicits._
    val (cat, wh) = freshCatalog()
    cat.createSchema("db")
    cat.createTable("db", "dyn", pkvSchema, partitionBy = Seq("part"),
      options = Map("bucket" -> "-1", "dynamic-bucket.target-row-num" -> "20"),
      primaryKey = Seq("part", "id"))
    // enough keys per partition to force multiple dynamic buckets
    cat.upsert("db", "dyn", rows(Seq("a", "b"), 50, "v1").toDF("part", "id", "v"))
    // second commit: updates to existing keys + brand-new keys (routing
    // must honor the persisted index for old keys, assign for new)
    cat.upsert("db", "dyn", (rows(Seq("a"), 10, "v2") ++
      rows(Seq("b"), 5, "v2") ++ Seq(("a", 900L, "v2-a-900"), ("b", 901L, "v2-b-901")))
      .toDF("part", "id", "v"))
    def img() = cat.read("db", "dyn").as[(String, Long, String)].collect().toSet
    val expected1 =
      (for (i <- 1L to 50L) yield ("a", i, if (i <= 10) s"v2-a-$i" else s"v1-a-$i")).toSet ++
      (for (i <- 1L to 50L) yield ("b", i, if (i <= 5) s"v2-b-$i" else s"v1-b-$i")).toSet +
      (("a", 900L, "v2-a-900")) + (("b", 901L, "v2-b-901"))
    assert(img() === expected1)
    // tombstone deletes across both partitions
    cat.deleteWhere("db", "dyn", col("id") > 45L && col("id") < 100L)
    val expected2 = expected1.filterNot(r => r._2 > 45L && r._2 < 100L)
    assert(img() === expected2)
    // point lookup routes through the persisted hash index: the assigned
    // bucket's single-leg read contains the key
    val b = cat.dynamicBucketFor("db", "dyn", Seq("a", 7L))
    assert(b.isDefined)
    assert(cat.readBucket("db", "dyn", b.get).filter(
      col("part") === "a" && col("id") === 7L).count() === 1)
    // never-assigned key reports None
    assert(cat.dynamicBucketFor("db", "dyn", Seq("a", 123456L)).isEmpty)
    // SQL point lookup on the full PK (bucket-pruned merge read).
    // Fresh catalog name: the CatalogManager caches instances per name,
    // so reusing `gpb` would pin the earlier test's warehouse.
    spark.conf.set("spark.sql.catalog.gpbdyn", "graft.sources.GraftSparkCatalog")
    spark.conf.set("spark.sql.catalog.gpbdyn.warehouse", wh)
    assert(spark.sql(
      "SELECT v FROM gpbdyn.db.dyn WHERE part = 'a' AND id = 7").head().getString(0)
      === "v2-a-7")
    // compact folds the layout; image unchanged; further upserts keep merging
    cat.compact("db", "dyn")
    assert(img() === expected2)
    cat.upsert("db", "dyn", Seq(("b", 3L, "v3-b-3")).toDF("part", "id", "v"))
    assert(img() === (expected2 - (("b", 3L, "v2-b-3")) + (("b", 3L, "v3-b-3"))))
  }
}
