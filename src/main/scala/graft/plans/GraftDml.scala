package graft.plans

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, AttributeSet, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{DeleteAction, InsertAction, LogicalPlan, MergeIntoTable, UpdateAction, UpdateTable}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.functions.{col, expr, lit}
import org.apache.spark.sql.GraftColumnBridge
import graft.sources.{GraftCatalog, GraftSqlTable}

/**
 * SQL `UPDATE` for graft tables, via a resolution rule instead of the
 * DSv2 row-level-operation API: Spark's group-based `ReplaceData` path
 * demands a V2 `BatchWrite` (a from-scratch executor-side parquet commit
 * protocol), while the catalog already has the better primitive —
 * [[GraftCatalog.update]] commits ONE upsert snapshot holding only the
 * updated rows (merge-on-read), instead of copy-on-write rewriting every
 * group. The analyzed `UpdateTable` node is rewritten to a runnable
 * command that routes back into the owning catalog — the same pattern
 * Delta Lake used for DML before the row-level API existed.
 *
 * The rewritten expressions travel as SQL text (`Expression.sql` of the
 * analyzed forms): a command carrying live unresolved expressions would
 * fail CheckAnalysis, while text re-parses and re-resolves against the
 * catalog's own read of the table inside `update`.
 */
class GraftUpdateRewrite extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan resolveOperators {
    case u: UpdateTable if u.resolved =>
      u.table.collectFirst { case r: DataSourceV2Relation => r.table } match {
        case Some(t: GraftSqlTable) if t.coords.isDefined =>
          val (wh, s, tb) = t.coords.get
          GraftUpdateCommand(wh, s, tb,
            u.assignments.map(a => (GraftDml.nameOf(a.key), sqlOf(a.value))),
            u.condition.map(sqlOf))
        case _ => u
      }
  }

  /** SQL text with catalog qualifiers stripped, so the expression
    * re-resolves against the bare column names of the catalog's read. */
  private def sqlOf(e: Expression): String = {
    GraftDml.requireSerializable(e)
    e.transform { case a: AttributeReference => a.withQualifier(Seq.empty) }.sql
  }
}

/**
 * SQL `MERGE INTO` for graft PK tables, same rewrite strategy as
 * [[GraftUpdateRewrite]]: the analyzed MergeIntoTable becomes a command
 * that computes the action deltas with DataFrame joins and lands them as
 * ONE atomic snapshot via [[GraftCatalog.mergeCommit]] (updates+inserts
 * paired with tombstones at the same ordinal) — merge-on-read, no
 * copy-on-write group rewrite.
 *
 * Expression plumbing: the merge/action conditions and assignment values
 * reference BOTH relations, so attributes are re-qualified by side
 * (target → `__t`, source → `__s`), serialized as SQL text, and
 * re-resolved in the command against aliased DataFrames. The source
 * subplan itself rides along as a plain (non-child) field: it is already
 * analyzed, the optimizer leaves non-child fields untouched, and the
 * command re-plans it through `Dataset.ofRows` at execution.
 */
class GraftMergeRewrite extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan resolveOperators {
    case m: MergeIntoTable if m.resolved && !m.withSchemaEvolution =>
      m.targetTable.collectFirst { case r: DataSourceV2Relation => r.table } match {
        case Some(t: GraftSqlTable) if t.coords.isDefined =>
          val (wh, s, tb) = t.coords.get
          val srcAttrs = m.sourceTable.outputSet
          def sqlOf(e: Expression): String = GraftDml.sideQualifiedSql(e, srcAttrs)
          def actions(as: Seq[org.apache.spark.sql.catalyst.plans.logical.MergeAction])
              : Seq[(String, Option[String], Seq[(String, String)])] = as.map {
            case UpdateAction(c, assigns, _) => ("update", c.map(sqlOf),
              assigns.map(a => (GraftDml.nameOf(a.key), sqlOf(a.value))))
            case DeleteAction(c) => ("delete", c.map(sqlOf), Seq.empty)
            case InsertAction(c, assigns) => ("insert", c.map(sqlOf),
              assigns.map(a => (GraftDml.nameOf(a.key), sqlOf(a.value))))
            case other => throw new UnsupportedOperationException(s"MERGE action $other")
          }
          GraftMergeCommand(wh, s, tb, m.sourceTable, sqlOf(m.mergeCondition),
            actions(m.matchedActions), actions(m.notMatchedActions),
            actions(m.notMatchedBySourceActions))
        case _ => m
      }
  }
}

private[plans] object GraftDml {
  def nameOf(e: Expression): String = e match {
    case a: AttributeReference => a.name
    case other => throw new UnsupportedOperationException(
      s"only top-level columns can be assigned, got $other")
  }

  /** The SQL-text transport cannot round-trip subqueries (`Expression.sql`
    * renders a ListQuery as `listquery()`, which re-parses as an unknown
    * function at execution) — refuse them up front with a clear error. */
  def requireSerializable(e: Expression): Unit =
    e.foreach {
      case s: org.apache.spark.sql.catalyst.expressions.SubqueryExpression =>
        throw new UnsupportedOperationException(
          "subqueries are not supported in graft UPDATE/MERGE conditions " +
            s"or assignments: ${s.sql}")
      case _ => ()
    }

  /** SQL text with every attribute re-qualified to its side: source
    * attributes become `__s`.`name`, everything else `__t`.`name`. */
  def sideQualifiedSql(e: Expression, sourceAttrs: AttributeSet): String = {
    requireSerializable(e)
    e.transform {
      case a: AttributeReference if sourceAttrs.contains(a) =>
        a.withQualifier(Seq("__s"))
      case a: AttributeReference => a.withQualifier(Seq("__t"))
    }.sql
  }
}

/** Executes the rewritten MERGE: per-action deltas by join, one atomic
  * mergeCommit. Action order is honored by guarding each action with the
  * negation of every earlier action's condition (first match wins). */
case class GraftMergeCommand(warehouse: String, schemaName: String,
    tableName: String, source: LogicalPlan, condSql: String,
    matched: Seq[(String, Option[String], Seq[(String, String)])],
    notMatched: Seq[(String, Option[String], Seq[(String, String)])],
    notMatchedBySource: Seq[(String, Option[String], Seq[(String, String)])])
  extends LeafRunnableCommand {

  override def run(spark: SparkSession): Seq[Row] = {
    val gc = new GraftCatalog(spark, warehouse)
    val pk = gc.primaryKeyOf(schemaName, tableName)
    require(pk.nonEmpty, s"MERGE INTO needs a primary-key table, " +
      s"$schemaName.$tableName has none")
    val cur = gc.currentSchema(schemaName, tableName)
    // Mirror GraftCatalog.update's guard: an UPDATE action assigning a PK
    // column would land the row under the NEW key while the old key is
    // never tombstoned — both rows stay visible. (The cardinality check
    // below groups by POST-update keys, so it cannot catch this.)
    (matched ++ notMatchedBySource).foreach { case (kind, _, assigns) =>
      if (kind == "update") {
        val bad = assigns.map(_._1).filter(pk.contains)
        require(bad.isEmpty, "MERGE UPDATE may not assign primary-key " +
          s"column(s) ${bad.mkString(", ")} of $schemaName.$tableName — " +
          "delete and re-insert instead")
      }
    }
    // The presence markers and side aliases below are reserved names: a
    // relation already carrying them would break the matched/src-only/
    // tgt-only partitioning or make the re-parsed side-qualified SQL
    // ambiguous. Reject up front with a clear error.
    locally {
      val reserved = Set("__tp", "__sp", "__t", "__s")
      val clash = (cur.fieldNames ++ source.output.map(_.name))
        .filter(reserved.contains).distinct
      require(clash.isEmpty, "MERGE INTO reserves column names " +
        s"__tp/__sp/__t/__s; rename ${clash.mkString(", ")} first")
    }
    val cond = expr(condSql)
    val emptyFull = spark.createDataFrame(spark.sparkContext.emptyRDD[Row], cur)
    val emptyKeys = spark.createDataFrame(spark.sparkContext.emptyRDD[Row],
      org.apache.spark.sql.types.StructType(pk.map(cur(_))))

    /** Rows produced by the given action list over `base`, honoring
      * first-match-wins ordering; `rowOf` renders one action's output and
      * `seed` is the matching-schema empty frame to accumulate into. */
    def applyActions(base: DataFrame,
        as: Seq[(String, Option[String], Seq[(String, String)])],
        wanted: String, seed: DataFrame,
        rowOf: Seq[(String, String)] => Seq[Column]): DataFrame = {
      var guard: Column = lit(false)
      var out = seed
      as.foreach { case (kind, c, assigns) =>
        val own = c.map(expr).getOrElse(lit(true))
        if (kind == wanted)
          out = out.unionByName(base.filter(own && !guard).select(rowOf(assigns): _*))
        guard = guard || own
      }
      out
    }

    def updatedRow(assigns: Seq[(String, String)]): Seq[Column] = {
      val byName = assigns.toMap
      cur.fields.toSeq.map(f =>
        byName.get(f.name).map(expr).getOrElse(col(s"__t.${f.name}"))
          .cast(f.dataType).as(f.name))
    }
    def insertedRow(assigns: Seq[(String, String)]): Seq[Column] = {
      val byName = assigns.toMap
      cur.fields.toSeq.map(f =>
        byName.get(f.name).map(expr).getOrElse(lit(null))
          .cast(f.dataType).as(f.name))
    }
    def keyRow: Seq[Column] = pk.map(p => col(s"__t.$p").as(p))

    // ONE full-outer join feeds all three merge legs (matched,
    // source-only, target-only) via presence markers — the target's
    // MoR-resolved read and the source plan each execute once, not once
    // per leg as separate inner/anti joins would cost at scale.
    val joined = gc.read(schemaName, tableName).withColumn("__tp", lit(true))
      .alias("__t")
      .join(GraftColumnBridge.dataFrame(spark, source)
        .withColumn("__sp", lit(true)).alias("__s"), cond, "full_outer")
      .persist()
    val matchedRows = joined.filter(col("__tp").isNotNull && col("__sp").isNotNull)
    val srcOnly = joined.filter(col("__tp").isNull)
    val tgtOnly = joined.filter(col("__sp").isNull)

    val upserts = applyActions(matchedRows, matched, "update", emptyFull, updatedRow)
      .unionByName(applyActions(srcOnly, notMatched, "insert", emptyFull, insertedRow))
      .unionByName(applyActions(tgtOnly, notMatchedBySource, "update", emptyFull, updatedRow))
    val deletes = applyActions(matchedRows, matched, "delete", emptyKeys, _ => keyRow)
      .unionByName(applyActions(tgtOnly, notMatchedBySource, "delete", emptyKeys, _ => keyRow))

    // Persist the deltas: the cardinality check below and the two write
    // jobs inside mergeCommit would otherwise each recompute the joins.
    upserts.persist(); deletes.persist()
    try {
      // SQL MERGE cardinality rule: a target row matched by >1 source row
      // is an error, and the upsert batch must be PK-unique regardless
      val dupes = upserts.select(pk.map(col): _*).unionByName(deletes)
        .groupBy(pk.map(col): _*).count().filter(col("count") > 1)
      require(dupes.isEmpty,
        "MERGE matched a target row more than once (cardinality violation)")
      gc.mergeCommit(schemaName, tableName, upserts, deletes)
    } finally { upserts.unpersist(); deletes.unpersist(); joined.unpersist(); () }
    Seq.empty
  }
}

/** Executes the rewritten UPDATE: one merge-on-read upsert snapshot of
  * the updated rows via [[GraftCatalog.update]]. */
case class GraftUpdateCommand(warehouse: String, schemaName: String,
    tableName: String, assignments: Seq[(String, String)],
    condition: Option[String]) extends LeafRunnableCommand {

  override def run(spark: SparkSession): Seq[Row] = {
    val gc = new GraftCatalog(spark, warehouse)
    gc.update(schemaName, tableName,
      condition.map(org.apache.spark.sql.functions.expr).getOrElse(lit(true)),
      assignments.map { case (n, e) =>
        n -> org.apache.spark.sql.functions.expr(e)
      }.toMap)
    Seq.empty
  }
}
