package graft.sources

import scala.collection.mutable

import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import GraftCatalog._

/**
 * Dynamic-bucket mode (Paimon's `bucket = -1`) — split from
 * GraftCatalog.scala (continuing the r13/r14 seam; behavior unchanged):
 * the key→bucket hash index (`.dbidx` parquet deltas + fold), routing
 * for upserts/tombstones, point lookups, and the cross-partition global
 * residence index. Same-package trait mixed into [[GraftCatalog]].
 */
trait GraftDynamicBucket { self: GraftCatalog =>

  // ---- dynamic bucket (Paimon's bucket = -1) -----------------------------

  /** Keys-per-bucket target of a dynamic-bucket table (Paimon's
    * `dynamic-bucket.target-row-num`, same default). */
  private def dynamicTargetRows(m: ObjectNode): Long = {
    val opts = m.get("options").asInstanceOf[ObjectNode]
    if (opts != null && opts.has("dynamic-bucket.target-row-num"))
      opts.get("dynamic-bucket.target-row-num").asText().toLong
    else 2000000L
  }

  private def dynIdxSchema = StructType(Seq(
    StructField("__kh", org.apache.spark.sql.types.LongType),
    StructField("__b", org.apache.spark.sql.types.IntegerType)))

  /** Cross-partition upsert mode (Paimon's partitioned PK table whose
    * primary key does NOT contain the partition columns — legal only
    * under dynamic bucket): the index tracks each key's current
    * partition and upserts may MOVE a key, tombstoning its old
    * residence. */
  private[sources] def crossPartition(m: ObjectNode): Boolean = {
    val parts = partitionColumns(m)
    val pk = primaryKey(m)
    parts.nonEmpty && pk.nonEmpty && !parts.forall(pk.contains)
  }

  /** Index storage columns for a cross-partition table's partition
    * values: POSITIONAL names (`__p0`, `__p1`, …) so a partition-column
    * rename never strands old `.dbidx` files (the partitions list keeps
    * its order across renames). */
  private def dynIdxPartFields(m: ObjectNode): Seq[StructField] = {
    val byName = currentFields(m).map(f => f.name -> f).toMap
    partitionColumns(m).zipWithIndex.map { case (c, i) =>
      StructField(s"__p$i", TypeMapping.toSparkType(byName(c).trinoType))
    }
  }

  private def dynIdxSchemaFor(m: ObjectNode): StructType =
    if (!crossPartition(m)) dynIdxSchema
    else StructType(dynIdxSchema.fields ++ dynIdxPartFields(m))

  /**
   * The persisted key→bucket hash index of a dynamic-bucket table
   * (Paimon's dynamic-bucket hash index files): a DataFrame of
   * `(__kh = xxhash64(primary key), __b = bucket)`, the union of the
   * immutable per-commit `.dbidx` parquet deltas inside every data dir
   * the CURRENT snapshot references and the manifest flags. Deltas are
   * key-disjoint by construction — a commit records only the keys it
   * newly assigned; compaction re-records the live fold in its own dir,
   * so expired pre-compact dirs take their deltas with them safely.
   * O(keys) bytes read DISTRIBUTED, never collected to the driver.
   */
  private def readDynamicIndex(schema: String, table: String,
      m: ObjectNode): DataFrame = {
    val dirs: Seq[String] =
      if (!m.has("dynIdx")) Seq.empty
      else {
        val dn = m.get("dynIdx").asInstanceOf[ObjectNode]
        val snaps = m.get("snapshots").asInstanceOf[ArrayNode]
        if (snaps.size() == 0) Seq.empty
        else filesOf(snaps.get(snaps.size() - 1))
          .filter(fe => (fe.kind == "data" || fe.kind == "idx") &&
            dn.has(fe.dir)).map(_.dir)
      }
    val idxSchema = dynIdxSchemaFor(m)
    if (dirs.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        if (!crossPartition(m)) idxSchema
        else StructType(idxSchema.fields :+
          StructField("__io", org.apache.spark.sql.types.LongType)))
    else {
      val raw = spark.read.schema(idxSchema).parquet(
        dirs.map(d => new Path(dirPath(schema, table, d),
          DynIdxDir).toString): _*)
      if (!crossPartition(m)) raw
      else
        // Cross-partition deltas are NOT key-disjoint: a move RE-RECORDS
        // its key with the new partition, superseding the older entry.
        // Stamp each row with its dir ordinal (from the immutable
        // `snap-<id>` path segment) so callers resolve latest-wins; the
        // plain-bucket contract (disjoint deltas) stays stamp-free.
        raw.withColumn("__io",
          org.apache.spark.sql.functions.regexp_extract(
            col("_metadata.file_path"), "/snap-(\\d+)", 1).cast("long"))
    }
  }

  /** Number of `.dbidx` delta dirs the CURRENT snapshot's index reads
    * union — the fragmentation metric the index-only fold triggers on. */
  def dynIdxDeltaCount(schema: String, table: String): Int = {
    val m = readManifest(schema, table)
    if (!m.has("dynIdx")) return 0
    val dn = m.get("dynIdx").asInstanceOf[ObjectNode]
    val snaps = m.get("snapshots").asInstanceOf[ArrayNode]
    if (snaps.size() == 0) 0
    else filesOf(snaps.get(snaps.size() - 1)).count(fe => dn.has(fe.dir))
  }

  /**
   * Index-only fold for dynamic-bucket tables — the minor-compaction
   * analog for the key→bucket hash index. Streaming ingest lands one
   * immutable `.dbidx` delta per commit, so routing reads fragment to
   * O(commits) files between full compactions; this folds the CURRENT
   * live assignment set into a single consolidated delta carried by an
   * index-only snapshot dir (kind "idx") and rebuilds the manifest flag
   * to it alone. O(live keys) read+write, ZERO data bytes rewritten;
   * superseded index-only dirs leave the file list and reclaim on
   * expiration. Auto-triggered after data commits once
   * `dynamic-bucket.index-fold.deltas` (default 32; 0 disables) deltas
   * accumulate. Cross-partition tables fold latest-wins (the new dir's
   * ordinal supersedes every prior record). Derived-content commit: a
   * concurrent write aborts it loudly rather than losing assignments.
   * Returns the fold snapshot id, or -1 when there is nothing to fold.
   */
  def foldDynamicBucketIndex(schema: String, table: String): Long = {
    val m = readManifest(schema, table)
    require(bucketCount(m).contains(-1),
      s"$schema.$table is not a dynamic-bucket table")
    if (dynIdxDeltaCount(schema, table) <= 1) return -1L
    val idx = readDynamicIndex(schema, table, m)
    val folded =
      if (!crossPartition(m)) idx // key-disjoint: the fold IS the union
      else dynIdxLatest(m, idx) // resolve moves; new ordinal re-stamps
    val keys = folded.count()
    if (keys == 0) return -1L
    val basis = if (m.has("commitVersion")) m.get("commitVersion").asLong() else 0L
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      currentSchema(schema, table))
    commit(schema, table, empty, keepExisting = true, kind = "idx",
      compaction = true, basisVersion = Some(basis),
      dynIdxFold = Some((folded, keys)))
  }

  /** Latest index record per key of a cross-partition table — apply
    * AFTER any batch-key semi join so a micro-batch never shuffles the
    * whole index through the latest-wins aggregate. */
  private def dynIdxLatest(m: ObjectNode, idx: DataFrame): DataFrame = {
    val partIdx = dynIdxPartFields(m).map(_.name)
    val payload = org.apache.spark.sql.functions.struct(
      (col("__io") +: col("__b") +: partIdx.map(col)): _*)
    idx.groupBy("__kh")
      .agg(org.apache.spark.sql.functions.max(payload).as("__best"))
      .select(col("__kh") +: col("__best.__b").as("__b") +:
        partIdx.map(p => col(s"__best.$p").as(p)): _*)
  }

  /**
   * Route a dynamic-bucket commit through the hash index — Paimon's
   * dynamic-bucket assigner, expressed as joins: existing keys go to
   * their recorded bucket; NEW keys (data commits only) fill the
   * lowest-numbered buckets with free capacity up to
   * `dynamic-bucket.target-row-num` assigned keys each, then open fresh
   * buckets. Tombstones for never-assigned keys are no-ops and drop.
   *
   * Scale shape: the batch key set is SIZE-ADAPTIVE — a micro-batch's
   * keys broadcast against the distributed index scan (the index never
   * shuffles), while a bulk backfill / compaction fold (whose "batch"
   * keys are table-sized) falls back to a shuffle join instead of
   * broadcasting a table-sized key set. Per-bucket assigned-key counts
   * collect O(buckets) rows to the driver; new-key ranking is a
   * DISTRIBUTED two-phase global rank (range-shuffle on key hash,
   * per-partition local ranks + O(partitions) collected offsets) — no
   * single-partition window, which beats Paimon's single assigner
   * operator on huge backfills. The batch-key-sized assignment table is
   * local-checkpointed eagerly so no index-lineage cache leaks past the
   * commit.
   *
   * `fold` (compaction): the returned delta is the full LIVE assignment
   * set — the compacted dir becomes the index's sole basis and dead
   * keys' slots are reclaimed. `reset` (overwrite): the previous index
   * is ignored and every key assigns fresh from bucket 0.
   *
   * Returns (routed main frame, routed delete frame, index delta with
   * its key count — None when the commit assigns nothing new).
   */
  private[sources] def dynamicRoute(schema: String, table: String, m: ObjectNode,
      df: DataFrame, deleteDf: Option[DataFrame], kind: String,
      fold: Boolean, reset: Boolean):
      (DataFrame, Option[DataFrame], Option[(DataFrame, Long)]) = {
    val pk = primaryKey(m)
    val hash = xxhash64(pk.map(col): _*)
    val crossPart = crossPartition(m)
    val partCols = partitionColumns(m)
    val index = (if (reset)
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          if (!crossPart) dynIdxSchema
          else StructType(dynIdxSchemaFor(m).fields :+
            StructField("__io", org.apache.spark.sql.types.LongType)))
      else readDynamicIndex(schema, table, m)).persist()
    val allKeys = (Seq(df) ++ deleteDf.toSeq)
      .map(_.select(hash.as("__kh"))).reduce(_ unionByName _)
      .distinct().persist()
    // Size-adaptive join strategy: only hint broadcast when the batch's
    // key set is executor-memory-safe; above the cap (a backfill or a
    // compaction fold routing the whole table) the joins shuffle — the
    // one extra job here is a delta-sized distinct count.
    val nKeys = allKeys.count()
    val smallBatch = nKeys <= spark.conf
      .getOption("graft.dynamic-bucket.broadcast-keys")
      .map(_.toLong).getOrElse(DynBroadcastKeys)
    def sized(d: DataFrame): DataFrame =
      if (smallBatch) org.apache.spark.sql.functions.broadcast(d) else d
    // Cross-partition tables: the batch-keyed index subset, resolved
    // latest-wins to each key's CURRENT (bucket, partition) — the
    // latest-wins aggregate runs on the batch-sized subset, never the
    // whole index (a micro-batch stays broadcast-cheap). `__p<i>` carry
    // the recorded partition values for move detection and tombstone
    // synthesis below.
    val knownLoc: Option[DataFrame] =
      if (!crossPart) None
      else Some(dynIdxLatest(m, index.join(sized(allKeys), Seq("__kh")))
        .persist())
    val known = knownLoc.map(_.select("__kh", "__b"))
      .getOrElse(index.join(sized(allKeys), Seq("__kh")))
    var rankCache: Option[DataFrame] = None
    val (assignment, newAssigned, nNew) =
      if (kind != "data") (known, None, 0L)
      else {
        val newKeys = df.select(hash.as("__kh")).distinct()
          .join(index, Seq("__kh"), "left_anti")
        val n = newKeys.count()
        if (n == 0) (known, None, 0L)
        else {
          val target = dynamicTargetRows(m)
          // O(buckets) rows — the table-layout metadata scale, same
          // class as a partition census. Cross-partition deltas may
          // RE-RECORD a key on a move (same bucket, new partition), so
          // count distinct keys per bucket there; plain deltas are
          // key-disjoint and count raw.
          val countsBase = if (crossPart)
            index.select("__kh", "__b").distinct() else index
          val counts = countsBase.groupBy("__b")
            .agg(org.apache.spark.sql.functions.count(lit(1)).as("c"))
            .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
          val maxB = counts.keys.maxOption.getOrElse(-1)
          val slots = mutable.ArrayBuffer[(Int, Long, Long)]()
          var need = n
          var lo = 1L
          var b = 0
          while (need > 0) {
            val free = if (b > maxB) target
              else math.max(0L, target - counts.getOrElse(b, 0L))
            if (free > 0) {
              val take = math.min(free, need)
              slots += ((b, lo, lo + take - 1)); lo += take; need -= take
            }
            b += 1
          }
          val slotsDf = spark.createDataFrame(slots.toSeq)
            .toDF("__b", "__lo", "__hi")
          // New-key GLOBAL rank, size-adaptive like the join strategy
          // above. Micro-batches (the broadcast-safe size class) rank in
          // ONE single-partition window — batch-bound by the same
          // contract that lets them broadcast, and three Spark jobs
          // cheaper. Backfills rank in TWO distributed phases: range-
          // shuffle on __kh (RangePartitioner gives ascending partitions
          // ascending ids), rank locally WITHIN each partition, then add
          // the exclusive prefix sum of earlier partitions' counts —
          // collected O(shuffle-partitions) rows, never the keys. Both
          // equal rank-by-__kh exactly (hashes are distinct and totally
          // ordered; DynamicBucketSpec asserts route parity), so
          // assignment stays deterministic — and no single-partition
          // window bottlenecks a billion-new-key backfill.
          val ranked =
            if (smallBatch)
              newKeys.withColumn("__rank", row_number().over(
                org.apache.spark.sql.expressions.Window.orderBy("__kh"))
                .cast("long"))
            else {
              val ranked0 = newKeys.repartitionByRange(col("__kh"))
                .withColumn("__pid", org.apache.spark.sql.functions
                  .spark_partition_id())
                .withColumn("__lr", row_number().over(
                  org.apache.spark.sql.expressions.Window
                    .partitionBy("__pid").orderBy("__kh")))
                .persist()
              rankCache = Some(ranked0)
              val pidCounts = ranked0.groupBy("__pid")
                .agg(org.apache.spark.sql.functions.count(lit(1)).as("c"))
                .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
              val offsets = pidCounts.keys.toSeq.sorted.foldLeft(
                (Map.empty[Int, Long], 0L)) { case ((acc, run), pid) =>
                (acc + (pid -> run), run + pidCounts(pid))
              }._1
              val offDf = spark.createDataFrame(offsets.toSeq)
                .toDF("__pid", "__off")
              ranked0
                .join(org.apache.spark.sql.functions.broadcast(offDf),
                  Seq("__pid"))
                .withColumn("__rank", col("__off") + col("__lr"))
            }
          // LAZY local checkpoint: `asg`'s eager checkpoint below computes
          // every partition of this frame in the same job, persisting its
          // blocks then — one job launch instead of two (r18), still
          // before any cache below is released, so the delta never
          // recomputes through the index lineage.
          val assigned = ranked
            .join(org.apache.spark.sql.functions.broadcast(slotsDf),
              col("__rank") >= col("__lo") && col("__rank") <= col("__hi"))
            .select(col("__kh"), col("__b"))
            .localCheckpoint(false)
          (known.unionByName(assigned), Some(assigned), n)
        }
      }
    // eager local checkpoint: batch-key-sized (two longs per key); all
    // index reads complete here so its cache releases deterministically
    // (this job also materializes the lazy `assigned` checkpoint above)
    val asg = assignment.localCheckpoint(true)
    rankCache.foreach(_.unpersist())
    val newAsg = newAssigned
    def route(frame: DataFrame): DataFrame = {
      val cols = frame.columns
      // |asg| <= |allKeys| — the same size class, so reuse the decision
      frame.withColumn("__kh", hash)
        .join(sized(asg), Seq("__kh"))
        .select((cols.map(col) :+ col("__b").as(BucketCol)): _*)
    }
    if (!crossPart) {
      index.unpersist()
      allKeys.unpersist()
      val delta: Option[(DataFrame, Long)] =
        if (kind != "data") None
        else if (fold || reset) {
          val liveKeys = asg.count()
          if (liveKeys == 0) None else Some((asg, liveKeys))
        }
        else newAsg.filter(_ => nNew > 0).map(a => (a, nNew))
      return (route(df), deleteDf.map(route), delta)
    }
    // ---- cross-partition upsert (partition not in primary key) ----------
    // Every tombstone must land in the key's RECORDED partition: user
    // deletes resolve their residence from the index, and a data row
    // whose partition differs from the recorded one is a MOVE — the new
    // image lands in its own partition while a synthesized tombstone
    // kills the old residence in the SAME atomic snapshot (Paimon's
    // cross-partition update). All joins here are batch-keyed against
    // the already-resolved `knownLoc` subset, so a micro-batch stays
    // broadcast-cheap; every produced frame is delta-sized and eagerly
    // local-checkpointed so no index lineage survives the commit.
    val loc = knownLoc.get
    val oldPartCols = partCols.zipWithIndex.map { case (c, i) =>
      col(s"__p$i").as(c) }
    val userDel: Option[DataFrame] = deleteDf.map { d =>
      d.select(pk.map(col): _*).withColumn("__kh", hash)
        .join(sized(loc), Seq("__kh"))
        .select(pk.map(col) ++ oldPartCols: _*).localCheckpoint(true)
    }
    // Move detection only on incremental data commits: a compaction fold
    // routes the resolved image (residences already current) and a reset
    // starts from an empty index — neither can move a key.
    val (movesTomb, movedKeys): (Option[DataFrame], Option[DataFrame]) =
      if (kind != "data" || fold || reset) (None, None)
      else {
        val movedPred = partCols.zipWithIndex.map { case (c, i) =>
          !(col(c) <=> col(s"__p$i")) }.reduce(_ || _)
        val moved = df.withColumn("__kh", hash)
          .join(sized(loc), Seq("__kh")).filter(movedPred)
          .select((col("__kh") +: pk.map(col)) ++ oldPartCols: _*)
          .localCheckpoint(true)
        if (moved.isEmpty) (None, None)
        else (Some(moved.drop("__kh")), Some(moved.select("__kh")))
      }
    // Index delta: new keys AND moved keys re-record (kh, bucket, new
    // partition); a fold/reset records the full live set. Later records
    // supersede older ones via the read-side `__io` latest-wins.
    val delta: Option[(DataFrame, Long)] =
      if (kind != "data") None
      else {
        val dfLoc = df.select((hash.as("__kh") +: partCols.map(col)): _*)
        val recordKeys: DataFrame =
          if (fold || reset) asg
          else {
            val nk = newAsg.getOrElse(spark.createDataFrame(
              spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
              dynIdxSchema))
            // disjoint by construction: moved keys are known, new aren't
            movedKeys.map(mk => nk.unionByName(mk.join(asg, Seq("__kh"))))
              .getOrElse(nk)
          }
        // lazy checkpoint: the count right below materializes the blocks
        // in the SAME job (r18 — the eager variant paid one extra job
        // launch per commit on this path)
        val deltaDf = recordKeys.join(dfLoc, Seq("__kh"))
          .select(col("__kh") +: col("__b") +:
            partCols.zipWithIndex.map { case (c, i) => col(c).as(s"__p$i") }: _*)
          .localCheckpoint(false)
        val nRec = deltaDf.count()
        if (nRec == 0) None else Some((deltaDf, nRec))
      }
    val routedDel: Option[DataFrame] = (userDel, movesTomb) match {
      case (Some(u), Some(mv)) => Some(u.unionByName(mv))
      case (a, b) => a.orElse(b)
    }
    index.unpersist()
    allKeys.unpersist()
    loc.unpersist()
    (route(df), routedDel.map(route), delta)
  }

  /**
   * The bucket the index assigns to a concrete primary-key tuple of a
   * DYNAMIC-bucket table — the point-lookup router (the dynamic analog
   * of [[bucketFor]]'s modular hash). None = the key was never assigned,
   * i.e. the table has no such key. One index read with `__kh = v`
   * pushed into the parquet scan (deltas are hash-sorted, so row-group
   * stats skip non-matching files).
   */
  def dynamicBucketFor(schema: String, table: String,
      values: Seq[Any]): Option[Int] = {
    val m = readManifest(schema, table)
    require(bucketCount(m).contains(-1),
      s"$schema.$table is not a dynamic-bucket table")
    val pk = primaryKey(m)
    require(values.length == pk.length, s"expected ${pk.length} pk values")
    val cur = currentFields(m).map(f => f.name -> f.trinoType).toMap
    val row = spark.range(1).select(pk.zip(values).map { case (c, v) =>
      lit(v).cast(TypeMapping.toSparkType(cur(c))).as(c)
    }: _*)
    val kh = row.select(xxhash64(pk.map(col): _*).as("h")).head().getLong(0)
    val hits = readDynamicIndex(schema, table, m).filter(col("__kh") === kh)
    if (!crossPartition(m))
      hits.select("__b").collect().headOption.map(_.getInt(0))
    else
      // superseded move records share the key — latest dir ordinal wins
      hits.orderBy(col("__io").desc).select("__b").collect()
        .headOption.map(_.getInt(0))
  }

  /**
   * A cross-partition key's CURRENT residence: (partition values in
   * declared order, bucket) — the point-lookup against the global index
   * (`__kh = v` pushes into the hash-sorted parquet deltas; the newest
   * record wins, so a moved key reports its new partition). None = the
   * key was never assigned.
   */
  def dynamicLocationFor(schema: String, table: String,
      values: Seq[Any]): Option[(Seq[Any], Int)] = {
    val m = readManifest(schema, table)
    require(crossPartition(m),
      s"$schema.$table is not a cross-partition upsert table — " +
        "use dynamicBucketFor / bucketFor")
    val pk = primaryKey(m)
    require(values.length == pk.length, s"expected ${pk.length} pk values")
    val cur = currentFields(m).map(f => f.name -> f.trinoType).toMap
    val row = spark.range(1).select(pk.zip(values).map { case (c, v) =>
      lit(v).cast(TypeMapping.toSparkType(cur(c))).as(c)
    }: _*)
    val kh = row.select(xxhash64(pk.map(col): _*).as("h")).head().getLong(0)
    val nParts = partitionColumns(m).length
    readDynamicIndex(schema, table, m).filter(col("__kh") === kh)
      .orderBy(col("__io").desc).collect().headOption.map { r =>
        ((0 until nParts).map(i => r.get(r.fieldIndex(s"__p$i"))),
          r.getInt(r.fieldIndex("__b")))
      }
  }
}
