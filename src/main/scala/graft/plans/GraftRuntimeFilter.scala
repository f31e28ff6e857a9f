package graft.plans

import java.util.concurrent.atomic.AtomicLong

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.expressions.{And => CatalystAnd, AttributeReference, EqualTo, Expression, In, Literal}
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference, Literal => V2Literal}
import org.apache.spark.sql.connector.expressions.aggregate.Aggregation
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.connector.read.{Batch, Scan, ScanBuilder, Statistics, SupportsPushDownAggregates, SupportsPushDownRequiredColumns, SupportsPushDownVariantExtractions, SupportsReportStatistics, SupportsRuntimeV2Filtering, VariantExtraction}
import org.apache.spark.sql.execution.datasources.InMemoryFileIndex
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan
import org.apache.spark.sql.internal.connector.SupportsPushDownCatalystFilters
import org.apache.spark.sql.types.StructType

import graft.sources.{BloomIndex, FileStats, GraftSqlTable}

/**
 * SQL-path runtime (dynamic) filtering for graft scans — the engine-level
 * analog of what the reference connector receives from Trino for free:
 * Trino evaluates the build side of a join, hands the connector a
 * `DynamicFilter` of observed key values, and the split manager drops
 * splits whose stats refute them (TrinoSplitManager.java:37,
 * TrinoPageSourceProvider.java:52). Spark's counterpart is
 * [[SupportsRuntimeV2Filtering]]: the `PartitionPruning` rule plants a
 * dynamic-pruning subquery on the fact scan of a broadcast equi-join, and
 * at execution `BatchScanExec` hands the build side's distinct keys to
 * [[GraftRuntimeScan.filter]] as an IN predicate — BEFORE input
 * partitions are planned. The scan re-prunes its file list through the
 * SAME manifest zone maps and per-file bloom sidecars the static path
 * uses ([[GraftZonePrune]] / `GraftCatalog.readWhere`), so a plain
 * `spark.sql("SELECT ... fact JOIN dim ON ...")` over graft tables now
 * reads O(matching files), like the library-level
 * `GraftCatalog.dynamicFilterJoin` — no API opt-in needed.
 *
 * Wired through `GraftSqlTable.newScanBuilder`: [[GraftScanBuilder]]
 * delegates every pushdown interface to the engine's parquet builder and
 * wraps the built [[ParquetScan]], so the mixin is visible to
 * `PartitionPruning` when it decides which scans can take a dynamic
 * filter (a rule injected before scan pushdown couldn't be — the scan
 * doesn't exist yet; one injected after couldn't either — no extension
 * point sits between pushdown and PartitionPruning).
 *
 * Scope mirrors GraftZonePrune's file-expansion gate: unpartitioned
 * tables only (file-level path lists would lose the `col=value` segments
 * a partitioned scan derives partition columns from); partitioned graft
 * tables keep Spark's own DPP semantics. All pruning is conservative —
 * zones refute ranges, blooms refute membership, anything inconclusive
 * keeps the file; the join re-applies exact semantics regardless.
 */
private[graft] class GraftScanBuilder(d: ScanBuilder, gt: GraftSqlTable)
  extends ScanBuilder
    with SupportsPushDownCatalystFilters
    with SupportsPushDownRequiredColumns
    with SupportsPushDownAggregates
    with SupportsPushDownVariantExtractions {

  private def cf = d.asInstanceOf[SupportsPushDownCatalystFilters]
  override def pushFilters(filters: Seq[Expression]): Seq[Expression] =
    cf.pushFilters(filters)
  override def pushedFilters: Array[Predicate] = cf.pushedFilters
  override def pruneColumns(requiredSchema: StructType): Unit =
    d.asInstanceOf[SupportsPushDownRequiredColumns].pruneColumns(requiredSchema)
  override def supportCompletePushDown(agg: Aggregation): Boolean =
    d.asInstanceOf[SupportsPushDownAggregates].supportCompletePushDown(agg)
  override def pushAggregation(agg: Aggregation): Boolean =
    d.asInstanceOf[SupportsPushDownAggregates].pushAggregation(agg)
  override def pushVariantExtractions(
      extractions: Array[VariantExtraction]): Array[Boolean] =
    d.asInstanceOf[SupportsPushDownVariantExtractions]
      .pushVariantExtractions(extractions)

  override def build(): Scan = d.build() match {
    // Aggregate-pushdown scans return pre-aggregated rows — never under a
    // join, so a runtime filter can't reach them; leave those unwrapped.
    case ps: ParquetScan if ps.pushedAggregate.isEmpty &&
        (gt.zoneStats.exists(_.nonEmpty) || gt.bloomInfo.nonEmpty ||
          gt.cboStats.isDefined) =>
      new GraftRuntimeScan(ps, gt.zoneStats.getOrElse(Map.empty),
        gt.fileZones.getOrElse(Map.empty), gt.bloomInfo, gt.cboStats)
    case other => other
  }
}

private[graft] object GraftRuntimeScan {
  /** Runtime re-prunes that strictly shrank a scan's file list — lets
    * tests prove the dynamic path actually fired. */
  val runtimePrunes = new AtomicLong(0L)
}

/**
 * [[ParquetScan]] wrapper adding [[SupportsRuntimeV2Filtering]]. All scan
 * behavior delegates; [[filter]] swaps the delegate for a copy over a
 * zone+bloom-pruned file index, which `BatchScanExec` then re-plans
 * partitions from. Driver cost is O(candidate files) map lookups plus one
 * sidecar open per bloom-checked candidate — no data I/O, no job.
 */
private[graft] class GraftRuntimeScan(
    @volatile private var delegate: ParquetScan,
    zoneStats: Map[String, FileStats.DirStats],
    fileZones: Map[String, Map[String, FileStats.DirStats]],
    bloomInfo: Map[String, (String, Set[String])],
    cboStats: Option[graft.sources.GraftCboStats.Stats] = None)
  extends Scan with SupportsRuntimeV2Filtering with SupportsReportStatistics {

  /** The (possibly runtime-pruned) underlying file scan — test/ops
    * visibility, and how plan helpers see through the wrapper. */
  private[graft] def currentDelegate: ParquetScan = delegate

  /** The PLANNING-TIME delegate, frozen at construction. Identity
    * (equals/hashCode) is based on this, never on the mutable pruned
    * delegate: the scan may already sit in hash-keyed plan structures
    * (AQE stage cache, exchange-reuse maps) when filter() swaps the
    * delegate, and a shifting hashCode there would silently break
    * lookups. Two wrappers over equal planned scans stay equal even if
    * one was runtime-pruned — reuse decisions were made at planning
    * time, and a reused pruned scan is only ever a sound subset. */
  private[graft] val plannedDelegate: ParquetScan = delegate

  // Value equality delegating to the wrapped planning-time ParquetScan:
  // Spark's ReuseExchange / scan-reuse compares Scan instances, and a
  // reference-equality wrapper would defeat reuse for self-joins over
  // the same graft table.
  override def equals(other: Any): Boolean = other match {
    case o: GraftRuntimeScan => plannedDelegate == o.plannedDelegate
    case _ => false
  }
  override def hashCode(): Int = plannedDelegate.hashCode()

  override def readSchema(): StructType = delegate.readSchema()
  override def toBatch: Batch = delegate.toBatch
  override def description(): String =
    s"GraftRuntimeFilter ${delegate.description()}"
  // ANALYZE statistics beat the delegate's compressed-file-size estimate:
  // exact rows, logical (avgLen-weighted) width over the projected
  // schema, per-column NDV/null counts for CBO join estimation (r14).
  // ANALYZE numbers are WHOLE-TABLE, while the delegate's estimate
  // reflects partition/file pruning from pushed filters (which Catalyst
  // removes from the logical plan, so nothing downstream re-applies the
  // factor): scale rows by the pruned/full physical-bytes ratio so a
  // partition-pruned scan keeps its pruning factor (r15 ADVICE). Both
  // sides of the ratio are compressed on-disk bytes — apples to apples.
  override def estimateStatistics(): Statistics = cboStats match {
    case Some((rows, cols)) =>
      // Raw on-disk bytes of the files the (partition-pruned, possibly
      // runtime-pruned) delegate will actually scan vs the table's full
      // file set — deliberately NOT the delegate's estimateStatistics(),
      // which also folds in a projected-column fraction that must not
      // masquerade as a pruning factor.
      val fullBytes =
        scala.util.Try(plannedDelegate.fileIndex.sizeInBytes).getOrElse(0L)
      val prunedBytes = scala.util.Try(
        delegate.fileIndex
          .listFiles(delegate.partitionFilters, delegate.dataFilters)
          .iterator.flatMap(_.files).map(_.getLen).sum).getOrElse(fullBytes)
      val frac =
        if (fullBytes > 0L && prunedBytes < fullBytes)
          prunedBytes.toDouble / fullBytes
        else 1.0
      val scaledRows =
        if (frac >= 1.0) rows
        else math.max(math.min(rows, 1L), (rows * frac).round)
      graft.sources.GraftCboStats.toV2(scaledRows, readSchema(), cols)
    case None => delegate.estimateStatistics()
  }
  override def supportedCustomMetrics = delegate.supportedCustomMetrics()
  override def reportDriverMetrics = delegate.reportDriverMetrics()
  override def columnarSupportMode = delegate.columnarSupportMode()

  /** Columns some zone map or bloom index can actually refute on — the
    * only attributes worth planting a dynamic filter for. Restricted to
    * the PROJECTED schema: Spark resolves these refs against the scan
    * relation's output, and a pruned-away column would fail resolution. */
  override def filterAttributes(): Array[NamedReference] = {
    val prunable = zoneStats.values.flatMap(_.cols.keys).toSet ++
      fileZones.values.flatMap(_.values.flatMap(_.cols.keys)) ++
      bloomInfo.values.flatMap(_._2)
    delegate.readSchema().fields
      .filter(f => prunable.contains(f.name.toLowerCase))
      .map(f => Expressions.column(f.name))
  }

  private def colOf(e: org.apache.spark.sql.connector.expressions.Expression)
      : Option[AttributeReference] = e match {
    case nr: NamedReference if nr.fieldNames().length == 1 =>
      delegate.dataSchema.fields
        .find(_.name.equalsIgnoreCase(nr.fieldNames()(0)))
        .map(f => AttributeReference(f.name, f.dataType)())
    case _ => None
  }

  /** The shapes `BatchScanExec.translateRuntimeFilterV2` emits: `IN`
    * over the build side's distinct keys (values are Catalyst-internal,
    * which is exactly what the zone/bloom literal canonicalization
    * expects from `Literal`). Unknown shapes are ignored — sound. */
  private def toCatalyst(p: Predicate): Option[Expression] = p.name() match {
    case "IN" =>
      val kids = p.children()
      if (kids.isEmpty) None
      else colOf(kids.head).flatMap { a =>
        val lits = kids.tail.toSeq.collect {
          case lv: V2Literal[_] => Literal(lv.value, lv.dataType)
        }
        if (lits.size == kids.length - 1) Some(In(a, lits)) else None
      }
    case "=" => p.children() match {
      case Array(c, lv: V2Literal[_]) =>
        colOf(c).map(a => EqualTo(a, Literal(lv.value, lv.dataType)))
      case _ => None
    }
    case _ => None
  }

  /** Scheme-free path key: the scan's file index reports QUALIFIED roots
    * (`file:/tmp/...`) while the table's zone/bloom maps are keyed by the
    * raw path strings the catalog built (`/tmp/...`) — normalize both. */
  private def norm(p: String): String = new Path(p).toUri.getPath
  private lazy val zoneByKey = zoneStats.map { case (k, v) => norm(k) -> v }
  private lazy val fileZonesByKey =
    fileZones.map { case (k, v) => norm(k) -> v }
  private lazy val bloomByKey =
    bloomInfo.map { case (k, v) => norm(k) -> v }

  override def filter(predicates: Array[Predicate]): Unit = {
    val exprs = predicates.flatMap(toCatalyst)
    if (exprs.isEmpty) return
    val cond = exprs.reduceLeft[Expression](CatalystAnd(_, _))
    val constraints = FileStats.eqConstraints(cond)
    lazy val hadoopConf = delegate.sparkSession.sessionState.newHadoopConf()
    val roots = delegate.fileIndex.rootPaths.map(_.toString)
    var changed = false
    val kept: Seq[String] = roots.flatMap { p =>
      val key = norm(p)
      if (!zoneByKey.get(key).forall(FileStats.mightMatch(_, cond))) {
        changed = true; Seq.empty
      } else fileZonesByKey.get(key).filter(_.nonEmpty) match {
        case Some(files) =>
          val zKept = files.filter { case (_, z) => FileStats.mightMatch(z, cond) }
          val bKept = bloomByKey.get(key) match {
            case Some((token, cols)) if constraints.exists(c => cols(c._1)) =>
              val dirPath = new Path(p)
              val fs = dirPath.getFileSystem(hadoopConf)
              val relOf = zKept.keys.map(abs =>
                abs -> norm(abs).stripPrefix(key).stripPrefix("/")).toMap
              val kept = BloomIndex.filterMightMatch(fs, dirPath, token, cols,
                relOf.values.toSeq.sorted, constraints).toSet
              zKept.filter { case (abs, _) => kept(relOf(abs)) }
            case _ => zKept
          }
          if (bKept.size < files.size) { changed = true; bKept.keys.toSeq.sorted }
          else Seq(p)
        case None => Seq(p)
      }
    }
    if (changed) {
      GraftRuntimeScan.runtimePrunes.incrementAndGet()
      // A partitioned scan derives its partition columns from the file
      // index's PartitionSpec — a path-only replacement would drop them.
      // Re-attach the delegate's spec: the new index's listing groups the
      // kept files back under their col=value dirs, so partition values
      // survive the file-level cut (and DPP's partition pruning composes
      // with this file pruning instead of replacing it).
      val spec = Option(delegate.fileIndex.partitionSpec())
        .filter(_.partitionColumns.nonEmpty)
      delegate = delegate.copy(fileIndex = new InMemoryFileIndex(
        delegate.sparkSession, kept.map(new Path(_)),
        Map.empty[String, String], None,
        userSpecifiedPartitionSpec = spec))
    }
  }
}
