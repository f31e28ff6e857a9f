package graft.plans

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UpdateTable}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.functions.lit
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
            u.assignments.map(a => (nameOf(a.key), sqlOf(a.value))),
            u.condition.map(sqlOf))
        case _ => u
      }
  }

  private def nameOf(e: Expression): String = e match {
    case a: AttributeReference => a.name
    case other => throw new UnsupportedOperationException(
      s"only top-level columns can be assigned, got $other")
  }

  /** SQL text with catalog qualifiers stripped, so the expression
    * re-resolves against the bare column names of the catalog's read. */
  private def sqlOf(e: Expression): String =
    e.transform { case a: AttributeReference => a.withQualifier(Seq.empty) }.sql
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
