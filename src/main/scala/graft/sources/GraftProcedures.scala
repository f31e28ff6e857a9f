package graft.sources

import java.util.{Iterator => JIterator}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure,
  Procedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * SQL maintenance procedures (`CALL cat.sys.compact(table => 'db.t')`) over
 * the catalog's operational surface — the Spark-native analog of the
 * procedure set Paimon ships for its Spark/Flink integrations (the
 * reference connector predates Trino's procedure SPI for Paimon; the
 * OPERATIONS themselves — compact / expire / rollback / tags / orphan
 * sweep — are the ones its `TrinoMetadataBase` catalog manages). Built on
 * Spark 4's DSv2 `ProcedureCatalog`/`BoundProcedure` API.
 *
 * Every procedure returns a one-row result (ids/counts) through a
 * driver-local [[LocalScan]] — maintenance is manifest-orchestrated; any
 * heavy lifting (compaction rewrites) runs as ordinary distributed jobs
 * inside the catalog call, never through the procedure result path.
 */
object GraftProcedures {

  /** Namespace the procedures live under: `CALL cat.sys.<name>(...)`. */
  val Namespace: Array[String] = Array("sys")

  private case class Spec(name: String, description: String,
      params: Seq[(String, DataType, Option[String])],
      out: StructType,
      body: (GraftCatalog, Seq[Any]) => Seq[Any],
      // report-style procedures return MULTIPLE rows; when set, `body`
      // is ignored and each inner Seq becomes one output row
      multiRows: Option[(GraftCatalog, Seq[Any]) => Seq[Seq[Any]]] = None)

  private def p(name: String, dt: DataType): (String, DataType, Option[String]) =
    (name, dt, None)
  private def pd(name: String, dt: DataType, default: String)
      : (String, DataType, Option[String]) = (name, dt, Some(default))

  private def one(name: String, dt: DataType) = StructType(Seq(StructField(name, dt)))

  /** 'db.t' → (db, t). */
  private def split(qualified: String): (String, String) = {
    val i = qualified.indexOf('.')
    require(i > 0 && i < qualified.length - 1,
      s"table must be 'schema.table', got '$qualified'")
    (qualified.substring(0, i), qualified.substring(i + 1))
  }

  private val specs: Seq[Spec] = Seq(
    Spec("compact", "full compaction: materialize the merged image as one snapshot",
      Seq(p("table", StringType)), one("snapshot_id", LongType),
      (gc, args) => { val (s, t) = split(args.head.asInstanceOf[String])
        Seq(gc.compact(s, t)) }),
    Spec("compact_small",
      "minor compaction: rewrite only data dirs under small_bytes",
      Seq(p("table", StringType), pd("small_bytes", LongType, "33554432")),
      one("snapshot_id", LongType),
      (gc, args) => { val (s, t) = split(args.head.asInstanceOf[String])
        Seq(gc.compactSmall(s, t, args(1).asInstanceOf[Long])
          .getOrElse(-1L)) }),
    Spec("sort_compact",
      "sort-compaction: rewrite the image range-clustered (or z-ordered) by the given columns",
      Seq(p("table", StringType), p("order_by", StringType),
        pd("ranges", IntegerType, "16"), pd("zorder", BooleanType, "false")),
      one("snapshot_id", LongType),
      (gc, args) => { val (s, t) = split(args.head.asInstanceOf[String])
        val by = args(1).asInstanceOf[String].split(',').map(_.trim)
          .filter(_.nonEmpty).toSeq
        Seq(gc.sortCompact(s, t, by, args(2).asInstanceOf[Int],
          args(3).asInstanceOf[Boolean])) }),
    Spec("expire_snapshots", "drop old snapshots, keeping the last retain_last " +
      "(tags, consumer-unread history, and replay bases always survive)",
      Seq(p("table", StringType), pd("retain_last", IntegerType, "10")),
      one("dropped", LongType),
      (gc, args) => { val (s, t) = split(args.head.asInstanceOf[String])
        Seq(gc.expireSnapshots(s, t, args(1).asInstanceOf[Int]).size.toLong) }),
    Spec("rollback", "drop every snapshot newer than snapshot_id",
      Seq(p("table", StringType), p("snapshot_id", LongType)),
      one("snapshot_id", LongType),
      (gc, args) => { val (s, t) = split(args.head.asInstanceOf[String])
        val id = args(1).asInstanceOf[Long]
        gc.rollbackTo(s, t, id); Seq(id) }),
    Spec("rollback_to_tag", "roll back to the snapshot a tag pins",
      Seq(p("table", StringType), p("tag", StringType)),
      one("snapshot_id", LongType),
      (gc, args) => { val (s, t) = split(args.head.asInstanceOf[String])
        val tag = args(1).asInstanceOf[String]
        gc.rollbackToTag(s, t, tag); Seq(gc.tags(s, t)(tag)) }),
    Spec("create_tag", "pin a snapshot under a name (latest when snapshot_id = -1)",
      Seq(p("table", StringType), p("tag", StringType),
        pd("snapshot_id", LongType, "-1")),
      one("snapshot_id", LongType),
      (gc, args) => { val (s, t) = split(args.head.asInstanceOf[String])
        val sid = args(2).asInstanceOf[Long]
        Seq(gc.createTag(s, t, args(1).asInstanceOf[String],
          if (sid < 0) None else Some(sid))) }),
    Spec("delete_tag", "remove a tag (its snapshot becomes expirable)",
      Seq(p("table", StringType), p("tag", StringType)),
      one("deleted", BooleanType),
      (gc, args) => { val (s, t) = split(args.head.asInstanceOf[String])
        gc.deleteTag(s, t, args(1).asInstanceOf[String]); Seq(true) }),
    Spec("set_consumer",
      "record a named consumer's next unprocessed snapshot (pins history)",
      Seq(p("table", StringType), p("consumer_id", StringType),
        p("next_snapshot_id", LongType)),
      one("next_snapshot_id", LongType),
      (gc, args) => { val (s, t) = split(args.head.asInstanceOf[String])
        val next = args(2).asInstanceOf[Long]
        gc.commitConsumerOffset(s, t, args(1).asInstanceOf[String], next)
        Seq(next) }),
    Spec("drop_consumer", "retire a consumer (its history becomes expirable)",
      Seq(p("table", StringType), p("consumer_id", StringType)),
      one("dropped", BooleanType),
      (gc, args) => { val (s, t) = split(args.head.asInstanceOf[String])
        gc.dropConsumer(s, t, args(1).asInstanceOf[String]); Seq(true) }),
    Spec("rescale",
      "rewrite a bucketed PK table under a new bucket count " +
        "(layout and option flip in one atomic snapshot)",
      Seq(p("table", StringType), p("buckets", IntegerType)),
      one("snapshot_id", LongType),
      (gc, args) => { val (s, t) = split(args.head.asInstanceOf[String])
        Seq(gc.rescaleBucket(s, t, args(1).asInstanceOf[Int])) }),
    Spec("expire_partitions",
      "drop every partition whose `column` date value is before " +
        "before_date (yyyy-MM-dd); '' = the first partition column",
      Seq(p("table", StringType), p("before_date", StringType),
        pd("column", StringType, "''")),
      one("expired", LongType),
      (gc, args) => { val (s, t) = split(args.head.asInstanceOf[String])
        val colName = Some(args(2).asInstanceOf[String]).filter(_.nonEmpty)
          .orElse(gc.partitionColumnsOf(s, t).headOption)
          .getOrElse(throw new IllegalArgumentException(
            s"$s.$t is not partitioned"))
        import org.apache.spark.sql.functions.{col, lit}
        Seq(gc.expirePartitions(s, t,
          col(colName).cast(DateType) <
            lit(args(1).asInstanceOf[String]).cast(DateType)).size.toLong) }),
    Spec("analyze",
      "compute per-column statistics (nulls/NDV/min/max/avg length) over " +
        "the resolved image and record them in the manifest ($statistics)",
      Seq(p("table", StringType)), one("snapshot_id", LongType),
      (gc, args) => { val (s, t) = split(args.head.asInstanceOf[String])
        Seq(gc.analyzeTable(s, t)) }),
    Spec("create_branch",
      "branch the table at snapshot_id (or the tag; default the head) — " +
        "O(metadata), zero data copied; read/write it as `t$branch_<name>`",
      Seq(p("table", StringType), p("branch", StringType),
        pd("snapshot_id", LongType, "-1"), pd("tag", StringType, "''")),
      one("created", BooleanType),
      (gc, args) => { val (s, t) = split(args.head.asInstanceOf[String])
        val sid = args(2).asInstanceOf[Long]
        val tag = Some(args(3).asInstanceOf[String]).filter(_.nonEmpty)
        gc.createBranch(s, t, args(1).asInstanceOf[String],
          if (sid < 0) None else Some(sid), tag)
        Seq(true) }),
    Spec("delete_branch",
      "remove a branch lineage (refused while fast-forwarded history is " +
        "still referenced by the base)",
      Seq(p("table", StringType), p("branch", StringType)),
      one("deleted", BooleanType),
      (gc, args) => { val (s, t) = split(args.head.asInstanceOf[String])
        gc.deleteBranch(s, t, args(1).asInstanceOf[String]); Seq(true) }),
    Spec("fast_forward",
      "adopt a branch's history into the base (git fast-forward: the " +
        "base must not have diverged) — one manifest CAS, zero data moved",
      Seq(p("table", StringType), p("branch", StringType)),
      one("snapshot_id", LongType),
      (gc, args) => { val (s, t) = split(args.head.asInstanceOf[String])
        Seq(gc.fastForward(s, t, args(1).asInstanceOf[String])) }),
    Spec("fast_forward_diff",
      "diverged-history report for fast_forward: one row per base/branch " +
        "disagreement (ids, per-snapshot dir diffs, schema drift) — the " +
        "WHY behind a refused fast_forward; metadata-only",
      Seq(p("table", StringType), p("branch", StringType)),
      StructType(Seq(StructField("position", LongType),
        StructField("status", StringType), StructField("detail", StringType))),
      (_, _) => Seq.empty,
      multiRows = Some((gc, args) => {
        val (s, t) = split(args.head.asInstanceOf[String])
        gc.fastForwardDiff(s, t, args(1).asInstanceOf[String])
          .map { case (pos, status, detail) => Seq(pos, status, detail) }
      })),
    Spec("compact_buckets",
      "per-bucket compaction: fold only the named buckets' sorted runs " +
        "(comma-separated ids); other buckets' bytes untouched",
      Seq(p("table", StringType), p("buckets", StringType)),
      one("snapshot_id", LongType),
      (gc, args) => { val (s, t) = split(args.head.asInstanceOf[String])
        val bs = args(1).asInstanceOf[String].split(',').map(_.trim)
          .filter(_.nonEmpty).map(_.toInt).toSeq
        Seq(gc.compactBuckets(s, t, bs)) }),
    Spec("compact_hot_buckets",
      "compact every bucket whose sorted-run count reached trigger " +
        "(num-sorted-run.compaction-trigger shape); -1 when none is hot",
      Seq(p("table", StringType), pd("trigger", IntegerType, "5")),
      one("snapshot_id", LongType),
      (gc, args) => { val (s, t) = split(args.head.asInstanceOf[String])
        Seq(gc.compactHotBuckets(s, t, args(1).asInstanceOf[Int])
          .getOrElse(-1L)) }),
    Spec("remove_orphan_files",
      "reclaim claimed-but-never-landed dirs older than grace_millis",
      Seq(p("table", StringType), pd("grace_millis", LongType, "3600000")),
      one("removed_dirs", LongType),
      (gc, args) => { val (s, t) = split(args.head.asInstanceOf[String])
        Seq(gc.sweepOrphanDirs(s, t, args(1).asInstanceOf[Long]).size.toLong) }))

  private val byName: Map[String, Spec] = specs.map(s => s.name -> s).toMap

  def names: Seq[String] = specs.map(_.name)

  def load(gc: GraftCatalog, ident: Identifier): UnboundProcedure = {
    require(ident.namespace.isEmpty ||
      ident.namespace.sameElements(Namespace),
      s"unknown procedure namespace ${ident.namespace.mkString(".")}")
    val spec = byName.getOrElse(ident.name,
      throw new IllegalArgumentException(
        s"unknown procedure ${ident.name}; available: ${names.mkString(", ")}"))
    new UnboundProcedure {
      override def name(): String = spec.name
      override def description(): String = spec.description
      override def bind(inputType: StructType): BoundProcedure = new BoundProcedure {
        override def name(): String = spec.name
        override def description(): String = spec.description
        override def isDeterministic: Boolean = false // mutates the catalog
        override def parameters(): Array[ProcedureParameter] =
          spec.params.map { case (n, dt, default) =>
            val b = ProcedureParameter.in(n, dt)
            default.foreach(b.defaultValue)
            b.build()
          }.toArray
        override def call(input: InternalRow): JIterator[Scan] = {
          val args = spec.params.zipWithIndex.map { case ((_, dt, _), i) =>
            require(!input.isNullAt(i), s"${spec.params(i)._1} must not be null")
            dt match {
              case StringType => input.getUTF8String(i).toString
              case LongType => input.getLong(i)
              case IntegerType => input.getInt(i)
              case BooleanType => input.getBoolean(i)
              case other => throw new IllegalStateException(s"unsupported $other")
            }
          }
          val resultRows: Seq[Seq[Any]] = spec.multiRows match {
            case Some(f) => f(gc, args)
            case None => Seq(spec.body(gc, args))
          }
          val outRows = resultRows.map(r => InternalRow.fromSeq(r.map {
            case s: String => UTF8String.fromString(s)
            case v => v
          })).toArray
          val scan: Scan = new LocalScan {
            override def rows(): Array[InternalRow] = outRows
            override def readSchema(): StructType = spec.out
          }
          java.util.Collections.singletonList(scan).iterator()
        }
      }
    }
  }
}
