package graft.sources

import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.StructType

/**
 * Structured Streaming source for catalog changelog reads — the
 * Spark-native analog of Paimon's streaming table consumption (the
 * reference connector reads tables a Flink stream maintains; here the
 * stream follows the catalog's own snapshot log). Offsets ARE snapshot
 * ids: `getOffset` is one manifest read, each micro-batch is
 * [[GraftCatalog.readChangelog]] over the newly committed snapshot range
 * — O(delta) files opened, never the table image — and replaying a batch
 * after restart recomputes the identical rows because snapshots are
 * immutable. The V1 `Source` interface is used deliberately: `getBatch`
 * returns a DataFrame, so the whole merge-on-read delta resolution stays
 * a Catalyst plan instead of a hand-rolled DSv2 partition reader.
 *
 * Options: `warehouse`, `schema`, `table` (required);
 * `fromSnapshotId` (exclusive start, default 0 = from the beginning);
 * `maxSnapshotsPerTrigger` (rate limit per micro-batch);
 * `maxRowsPerTrigger` (ADVISORY data-volume rate limit: the batch range
 * stops before the snapshot that would push its cumulative new-row count
 * — read from head manifest aggregates, zero file I/O — past the cap.
 * The SNAPSHOT stays the atomic unit: a single bulk-backfill snapshot
 * larger than the cap still lands as one micro-batch, with a warning —
 * splitting it would expose a half-applied commit to downstream
 * consumers, which no rate limit is worth);
 * `mode` (`upsert` default, or `full` for -U/+U retraction pairs via
 * [[GraftCatalog.readChangelogFull]]);
 * `consumerId` (Paimon's consumer-id: batch-commit callbacks advance the
 * named durable offset, expiration pins unread history, and a fresh
 * stream without an explicit `fromSnapshotId` resumes from the consumer's
 * recorded position — checkpoint state, when present, still wins);
 * `scanMode` (Paimon's `scan.mode` / the reference's StartupMode enum,
 * surfaced through TrinoTableOptionUtils' CoreOptions reflection):
 * `full` (default — history from the beginning), `latest` (only changes
 * committed AFTER the stream starts: the start offset is pinned to the
 * table head at source construction), `from-timestamp` (start at the
 * first snapshot whose commit time ≥ `fromTimestampMillis` — resolved
 * once from the snapshot log's id+timestamp pairs, one manifest-head
 * read, no file I/O), `from-snapshot` (alias for an explicit
 * `fromSnapshotId`). Precedence when several are given: a Spark
 * checkpoint always wins (offsets replay through getBatch); then an
 * explicit `fromSnapshotId`; then a registered consumer's durable
 * offset; then `scanMode`.
 */
class GraftChangelogProvider extends StreamSourceProvider with DataSourceRegister {

  override def shortName(): String = "graft-changelog"

  private def opts(parameters: Map[String, String]): Map[String, String] =
    parameters.map { case (k, v) => k.toLowerCase(java.util.Locale.ROOT) -> v }

  private def required(p: Map[String, String], k: String): String =
    p.getOrElse(k, throw new IllegalArgumentException(
      s"graft-changelog requires option '$k'"))

  override def sourceSchema(ctx: SQLContext, schemaOpt: Option[StructType],
      providerName: String, parameters: Map[String, String]): (String, StructType) = {
    val p = opts(parameters)
    val gc = new GraftCatalog(ctx.sparkSession, required(p, "warehouse"))
    (shortName(),
      gc.changelogSchemaOf(required(p, "schema"), required(p, "table")))
  }

  override def createSource(ctx: SQLContext, metadataPath: String,
      schemaOpt: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source = {
    val p = opts(parameters)
    val mode = p.getOrElse("mode", "upsert")
    // validate HERE, not only in the readChangelogStream helper: a typo'd
    // mode on a directly-wired source must not silently drop retractions
    require(mode == "upsert" || mode == "full",
      s"graft-changelog mode must be 'upsert' or 'full', got '$mode'")
    val scanMode = p.getOrElse("scanmode", "full")
    val fromTs = p.get("fromtimestampmillis").map(_.toLong)
    val fromId = p.get("fromsnapshotid").map(_.toLong).getOrElse(0L)
    require(Set("full", "latest", "from-timestamp", "from-snapshot")(scanMode),
      s"graft-changelog scanMode must be full|latest|from-timestamp|" +
        s"from-snapshot, got '$scanMode'")
    // refuse ambiguous combinations at stream definition, not first batch
    require(scanMode != "from-timestamp" || fromTs.nonEmpty,
      "scanMode=from-timestamp requires option 'fromTimestampMillis'")
    require(fromTs.isEmpty || scanMode == "from-timestamp" || scanMode == "full",
      s"fromTimestampMillis conflicts with scanMode=$scanMode")
    require(scanMode != "from-snapshot" || fromId != 0L,
      "scanMode=from-snapshot requires a non-zero 'fromSnapshotId'")
    require(fromId == 0L || scanMode == "from-snapshot" || scanMode == "full",
      s"fromSnapshotId conflicts with scanMode=$scanMode")
    new GraftChangelogSource(ctx.sparkSession, required(p, "warehouse"),
      required(p, "schema"), required(p, "table"),
      fromId,
      p.get("maxsnapshotspertrigger").map(_.toInt),
      mode,
      p.get("maxrowspertrigger").map(_.toLong),
      p.get("consumerid"),
      // fromTimestampMillis alone implies from-timestamp
      if (fromTs.nonEmpty) "from-timestamp" else scanMode,
      fromTs,
      p.get("consumerignoreprogress").exists(_.toBoolean))
  }
}

class GraftChangelogSource(spark: SparkSession, warehouse: String,
    schemaName: String, tableName: String, fromSnapshotId: Long,
    maxSnapshotsPerTrigger: Option[Int],
    mode: String = "upsert",
    maxRowsPerTrigger: Option[Long] = None,
    consumerId: Option[String] = None,
    scanMode: String = "full",
    fromTimestampMillis: Option[Long] = None,
    // Paimon's consumer.ignore-progress: keep COMMITTING to the named
    // consumer (expiration pins, offset advances) but do not RESUME from
    // it — the start position comes from scanMode/fromSnapshotId as if
    // no consumer existed. For re-reading history under a live consumer
    // registration (backfill, debugging) without losing its pins.
    consumerIgnoreProgress: Boolean = false) extends Source {

  private val gc = new GraftCatalog(spark, warehouse)

  // Consumer-id resume (Paimon's consumer-id contract): with a consumer
  // registered and NO explicit fromSnapshotId, a fresh stream (no
  // checkpoint — Spark replays checkpointed offsets through getBatch
  // without consulting this) resumes from the consumer's durable
  // next-unprocessed offset instead of the table head/beginning — the
  // cross-restart resume that survives a LOST checkpoint. The registered
  // offset also pins expiration (expireSnapshots keeps unread history).
  // With neither, the startup mode (Paimon scan.mode) picks the start:
  // `latest` pins to the head AT SOURCE CONSTRUCTION (resolved once —
  // commits racing stream startup land after the pin, so none are
  // skipped mid-stream), `from-timestamp` scans the snapshot log's
  // (id, timestampMillis) pairs for the first commit at/after the
  // requested time and starts just before it (one manifest-head read).
  private val startSnapshotId: Long =
    consumerId.filter(_ => fromSnapshotId == 0L && !consumerIgnoreProgress)
      .flatMap(cid => gc.consumerOffsets(schemaName, tableName).get(cid))
      .map(next => math.max(0L, next - 1))
      .getOrElse {
        if (fromSnapshotId != 0L) fromSnapshotId
        else scanMode match {
          case "latest" =>
            gc.snapshots(schemaName, tableName).lastOption.map(_.id).getOrElse(0L)
          case "from-timestamp" =>
            val ts = fromTimestampMillis.getOrElse(throw new IllegalArgumentException(
              "scanMode=from-timestamp requires fromTimestampMillis"))
            val snaps = gc.snapshots(schemaName, tableName)
            snaps.find(_.timestampMillis >= ts) match {
              // The start offset is an EXCLUSIVE bound that must name a
              // RETAINED snapshot (or 0): when `first` is the earliest
              // retained commit — the common backfill case, a mark at or
              // before the retention floor — `first.id - 1` was expired
              // and planning it would die in changelogEntries' exists()
              // check. Clamp to the latest retained id strictly below
              // first.id (0 when none), which excludes exactly the same
              // pre-`first` history.
              case Some(first) =>
                snaps.takeWhile(_.id < first.id).lastOption
                  .map(_.id).getOrElse(0L)
              // every existing commit predates ts: stream only the future
              case None => snaps.lastOption.map(_.id).getOrElse(0L)
            }
          case _ => 0L
        }
      }

  override val schema: StructType = gc.changelogSchemaOf(schemaName, tableName)

  // Highest snapshot id already handed to the engine — the rate limit's
  // floor. Advanced by getBatch too, so a restart (which replays the
  // pending batch through getBatch before any getOffset call) resumes
  // the cap from the checkpointed position, not from scratch.
  private var lastPlanned: Long = startSnapshotId

  override def getOffset: Option[Offset] = {
    // Rate-limit along EXISTING snapshot ids, not id arithmetic: the log
    // can have gaps (expiration keeps tag/consumer-pinned middles and
    // drops around them; a fresh full read of a partially-expired table
    // starts before the retained floor), and planning an expired id as a
    // batch boundary would fail its entriesAt lookup.
    val ids = gc.snapshots(schemaName, tableName).map(_.id)
    val latest = ids.lastOption.getOrElse(0L)
    var capped = maxSnapshotsPerTrigger match {
      case Some(n) =>
        val ahead = ids.filter(_ > lastPlanned)
        if (ahead.isEmpty) lastPlanned else ahead.take(n).last
      case None => latest
    }
    // Advisory data-volume cap: shrink the snapshot range so cumulative
    // NEW rows (head-aggregate metadata, no file I/O) stay under the
    // cap. The first snapshot is always taken — the snapshot is the
    // atomic unit — so an oversized bulk-backfill commit lands whole,
    // loudly, instead of being torn across batches.
    maxRowsPerTrigger.foreach { cap =>
      if (capped > lastPlanned) {
        val deltas = gc.snapshotDeltaRows(schemaName, tableName, lastPlanned, capped)
        var acc = 0L
        var upTo = lastPlanned
        val it = deltas.iterator
        var stop = false
        while (!stop && it.hasNext) {
          val (id, r) = it.next()
          if (upTo == lastPlanned || acc + r <= cap) { acc += r; upTo = id }
          else stop = true
        }
        if (upTo > lastPlanned) {
          if (acc > cap) System.err.println(
            s"[graft-changelog] WARN $schemaName.$tableName: snapshot " +
              s"$upTo alone carries $acc rows (> maxRowsPerTrigger=$cap); " +
              "a snapshot is the atomic batch unit — it lands as one " +
              "oversized micro-batch")
          capped = upTo
        }
      }
    }
    if (capped <= startSnapshotId) None
    else {
      lastPlanned = math.max(lastPlanned, capped)
      Some(LongOffset(capped))
    }
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val from = start.map(asLong).getOrElse(startSnapshotId)
    val to = asLong(end)
    lastPlanned = math.max(lastPlanned, to)
    // The engine requires streaming leaves in the returned plan (the same
    // contract FileStreamSource satisfies via isStreaming = true).
    GraftColumnBridge.streamingDataFrame(spark,
      if (mode == "full") gc.readChangelogFull(schemaName, tableName, from, to)
      else gc.readChangelog(schemaName, tableName, from, to))
  }

  /** Offsets come back from the checkpoint log as SerializedOffset;
    * LongOffset's json is the bare number either way. */
  private def asLong(o: Offset): Long = o match {
    case l: LongOffset => l.offset
    case other => other.json.trim.toLong
  }

  /** Spark calls this when a batch is DURABLY committed downstream:
    * advance the named consumer's offset (next unprocessed = end + 1) so
    * expiration keeps unread history pinned and a checkpoint-less restart
    * resumes here. The engine invokes commit with a ONE-BATCH lag (the
    * final batch's commit fires when the next batch is constructed), so
    * the durable offset is AT-LEAST-ONCE: a resume may replay the last
    * committed batch — safe, because changelog batches are idempotent
    * downstream (batchId-skipping sinks, upsert apply). Offset commits
    * race ingest commits by design — commitConsumerOffset rebases and
    * retries internally. */
  override def commit(end: Offset): Unit =
    consumerId.foreach(cid => gc.commitConsumerOffset(
      schemaName, tableName, cid, asLong(end) + 1))

  override def stop(): Unit = ()

  override def toString: String =
    s"GraftChangelogSource[$schemaName.$tableName@$warehouse]"
}
