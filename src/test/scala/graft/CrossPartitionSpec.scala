package graft

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.GraftCatalog

/**
 * Cross-partition upsert (Paimon's partitioned PK table whose primary
 * key does NOT contain the partition columns — legal only under dynamic
 * bucket, `bucket = -1`): the persisted index records each key's current
 * (partition, bucket); an upsert whose partition differs from the
 * recorded one MOVES the key — its new image lands in the new partition
 * while a synthesized tombstone kills the old residence in the SAME
 * atomic snapshot; deletes resolve their victim's residence from the
 * index. Reference surface: Paimon cross-partition update mode (the
 * Trino connector reads such tables through the same merge-on-read
 * path, TrinoPageSourceBase merges what the index routed).
 */
class CrossPartitionSpec extends SparkSpecBase {

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("region", StringType),
    StructField("v", StringType)))

  private def fresh(target: Long = 1000L): (GraftCatalog, String) = {
    val wh = Files.createTempDirectory("graft-xpart-wh").toString
    val cat = new GraftCatalog(spark, wh)
    cat.createSchema("db")
    cat.createTable("db", "t", schema, partitionBy = Seq("region"),
      primaryKey = Seq("id"),
      options = Map("bucket" -> "-1",
        "dynamic-bucket.target-row-num" -> target.toString))
    (cat, wh)
  }

  private def rows(cat: GraftCatalog): Set[(Long, String, String)] = {
    import spark.implicits._
    cat.read("db", "t").as[(Long, String, String)].collect().toSet
  }

  test("an upsert with a changed partition MOVES the key: new image " +
      "lives, old partition holds no live row, one atomic snapshot") {
    val (cat, _) = fresh()
    import spark.implicits._
    cat.upsert("db", "t", Seq((1L, "eu", "a"), (2L, "eu", "b"),
      (3L, "us", "c")).toDF("id", "region", "v"))
    val before = cat.snapshotFileEntries("db", "t").size
    // key 2 moves eu -> us (value updated too); key 3 updates in place
    cat.upsert("db", "t", Seq((2L, "us", "b2"), (3L, "us", "c2"))
      .toDF("id", "region", "v"))
    assert(rows(cat) === Set((1L, "eu", "a"), (2L, "us", "b2"),
      (3L, "us", "c2")))
    // partition-scoped reads must not resurrect the old residence
    assert(cat.read("db", "t").filter(col("region") === "eu")
      .select("id").collect().map(_.getLong(0)).toSet === Set(1L))
    assert(cat.read("db", "t").filter(col("region") === "us")
      .select("id").collect().map(_.getLong(0)).toSet === Set(2L, 3L))
    // the move landed as ONE snapshot: data dir + tombstone dir pair
    val entries = cat.snapshotFileEntries("db", "t")
    assert(entries.size === before + 2,
      s"expected data+tombstone pair, got ${entries.map(_.dir)}")
    assert(entries.count(_.kind == "delete") === 1)
  }

  test("a move's tombstone lands in the OLD partition's merge group: " +
      "time travel still shows the pre-move residence") {
    val (cat, _) = fresh()
    import spark.implicits._
    cat.upsert("db", "t", Seq((1L, "eu", "a")).toDF("id", "region", "v"))
    val s1 = cat.snapshots("db", "t").last.id
    cat.upsert("db", "t", Seq((1L, "us", "a2")).toDF("id", "region", "v"))
    assert(rows(cat) === Set((1L, "us", "a2")))
    import spark.implicits._
    assert(cat.read("db", "t", snapshotId = Some(s1))
      .as[(Long, String, String)].collect().toSet === Set((1L, "eu", "a")))
  }

  test("deleteWhere and mergeCommit deletes resolve the victim's " +
      "residence from the index; unknown keys are no-ops") {
    val (cat, _) = fresh()
    import spark.implicits._
    cat.upsert("db", "t", Seq((1L, "eu", "a"), (2L, "us", "b"),
      (3L, "ap", "c")).toDF("id", "region", "v"))
    cat.deleteWhere("db", "t", col("id") === 2L)
    assert(rows(cat) === Set((1L, "eu", "a"), (3L, "ap", "c")))
    // mergeCommit: upsert key 1 (move eu->ap) + delete key 3 + unknown 99
    cat.mergeCommit("db", "t",
      Seq((1L, "ap", "a2")).toDF("id", "region", "v"),
      Seq(Tuple1(3L), Tuple1(99L)).toDF("id"))
    assert(rows(cat) === Set((1L, "ap", "a2")))
  }

  test("moves keep their bucket; the index delta re-records only new " +
      "and moved keys; dynamicLocationFor reports the new residence") {
    val (cat, wh) = fresh()
    import spark.implicits._
    cat.upsert("db", "t", (0L until 20L).map(i =>
      (i, if (i % 2 == 0) "eu" else "us", s"v$i")).toDF("id", "region", "v"))
    val b0 = cat.dynamicBucketFor("db", "t", Seq(4L))
    assert(b0.isDefined)
    assert(cat.dynamicLocationFor("db", "t", Seq(4L)).get._1 === Seq("eu"))
    // move key 4 eu -> us plus one brand-new key 100
    cat.upsert("db", "t", Seq((4L, "us", "moved"), (100L, "ap", "new"))
      .toDF("id", "region", "v"))
    assert(cat.dynamicBucketFor("db", "t", Seq(4L)) === b0)
    assert(cat.dynamicLocationFor("db", "t", Seq(4L)).get._1 === Seq("us"))
    assert(cat.dynamicLocationFor("db", "t", Seq(100L)).get._1 === Seq("ap"))
    assert(cat.dynamicLocationFor("db", "t", Seq(999L)).isEmpty)
    // the second commit's .dbidx holds exactly the new + moved keys
    val last = cat.snapshotFileEntries("db", "t")
      .filter(_.kind == "data").map(_.dir).maxBy(
        _.stripPrefix("snap-").takeWhile(_.isDigit).toLong)
    val delta = spark.read.parquet(
      new Path(new Path(new Path(wh, "db"), "t"),
        s"$last/${GraftCatalog.DynIdxDir}").toString)
    assert(delta.count() === 2L)
  }

  test("compaction folds the table, retires tombstones, and re-records " +
      "the live index; reads agree before and after") {
    val (cat, _) = fresh()
    import spark.implicits._
    cat.upsert("db", "t", (0L until 30L).map(i =>
      (i, "eu", s"v$i")).toDF("id", "region", "v"))
    cat.upsert("db", "t", (0L until 30L by 3).map(i =>
      (i, "us", s"m$i")).toDF("id", "region", "v"))
    cat.deleteWhere("db", "t", col("id") % 7 === 1)
    val before = rows(cat)
    cat.compact("db", "t")
    assert(rows(cat) === before)
    assert(cat.snapshotFileEntries("db", "t").forall(_.kind == "data"))
    // moved key still resolves to its post-move residence after the fold
    assert(cat.dynamicLocationFor("db", "t", Seq(3L)).get._1 === Seq("us"))
    // and further moves keep working against the folded index
    cat.upsert("db", "t", Seq((3L, "ap", "again")).toDF("id", "region", "v"))
    assert(cat.dynamicLocationFor("db", "t", Seq(3L)).get._1 === Seq("ap"))
    assert(rows(cat).contains((3L, "ap", "again")))
  }

  test("UPDATE assigning the partition column is a legal move on a " +
      "cross-partition table") {
    val (cat, _) = fresh()
    import spark.implicits._
    cat.upsert("db", "t", Seq((1L, "eu", "a"), (2L, "eu", "b"))
      .toDF("id", "region", "v"))
    cat.update("db", "t", col("id") === 1L,
      Map("region" -> lit("us"), "v" -> concat(col("v"), lit("!"))))
    assert(rows(cat) === Set((1L, "us", "a!"), (2L, "eu", "b")))
    assert(cat.read("db", "t").filter(col("region") === "eu")
      .count() === 1L)
  }

  test("broadcast and shuffle routing paths move identically") {
    import spark.implicits._
    def build(): Set[(Long, String, String)] = {
      val wh = Files.createTempDirectory("graft-xpart-par").toString
      val cat = new GraftCatalog(spark, wh)
      cat.createSchema("db")
      cat.createTable("db", "t", schema, partitionBy = Seq("region"),
        primaryKey = Seq("id"),
        options = Map("bucket" -> "-1",
          "dynamic-bucket.target-row-num" -> "50"))
      cat.upsert("db", "t", (0L until 120L).map(i =>
        (i, if (i % 3 == 0) "eu" else "us", s"v$i")).toDF("id", "region", "v"))
      cat.upsert("db", "t", (0L until 120L by 5).map(i =>
        (i, "ap", s"m$i")).toDF("id", "region", "v"))
      cat.deleteWhere("db", "t", col("id") % 11 === 2)
      rows(cat)
    }
    val viaBroadcast = build()
    spark.conf.set("graft.dynamic-bucket.broadcast-keys", "1")
    val viaShuffle = try build()
      finally spark.conf.unset("graft.dynamic-bucket.broadcast-keys")
    assert(viaBroadcast === viaShuffle)
    assert(viaBroadcast.nonEmpty)
  }

  test("validation: fixed bucket refuses partition outside pk; " +
      "sequence.field refuses; changelog/incremental readers refuse") {
    val wh = Files.createTempDirectory("graft-xpart-val").toString
    val cat = new GraftCatalog(spark, wh)
    cat.createSchema("db")
    val e1 = intercept[IllegalArgumentException] {
      cat.createTable("db", "bad1", schema, partitionBy = Seq("region"),
        primaryKey = Seq("id"), options = Map("bucket" -> "4"))
    }
    assert(e1.getMessage.contains("cross-partition"))
    val e2 = intercept[IllegalArgumentException] {
      cat.createTable("db", "bad2", schema, partitionBy = Seq("region"),
        primaryKey = Seq("id"),
        options = Map("bucket" -> "-1", "sequence.field" -> "v"))
    }
    assert(e2.getMessage.contains("sequence.field"))
    cat.createTable("db", "t", schema, partitionBy = Seq("region"),
      primaryKey = Seq("id"), options = Map("bucket" -> "-1"))
    import spark.implicits._
    cat.upsert("db", "t", Seq((1L, "eu", "a")).toDF("id", "region", "v"))
    val e3 = intercept[IllegalArgumentException] {
      cat.readChangelog("db", "t", 0L, 1L)
    }
    assert(e3.getMessage.contains("cross-partition"))
    val e4 = intercept[IllegalArgumentException] {
      cat.readIncremental("db", "t", 0L, 1L)
    }
    assert(e4.getMessage.contains("cross-partition"))
    val e5 = intercept[IllegalArgumentException] {
      cat.readChangelogStream("db", "t")
    }
    assert(e5.getMessage.contains("cross-partition"))
  }

  test("a batch is its own latest residence: duplicate keys across " +
      "partitions inside ONE batch fold deterministically before routing") {
    val (cat, _) = fresh()
    import spark.implicits._
    // within-batch fold picks the largest (v, …) struct per key —
    // deterministic, so the winning partition is fixed: "z9" > "a1"
    cat.upsert("db", "t", Seq((1L, "eu", "a1"), (1L, "us", "z9"))
      .toDF("id", "region", "v"))
    assert(rows(cat) === Set((1L, "us", "z9")))
    assert(cat.dynamicLocationFor("db", "t", Seq(1L)).get._1 === Seq("us"))
  }
}
