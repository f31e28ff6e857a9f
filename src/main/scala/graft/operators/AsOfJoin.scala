package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * AS-OF join: for each left row, attach the most recent right row with the
 * same key and right.time ≤ left.time (ties at equal time broken by the
 * highest tie-break value). Spark has no native as-of operator; the naive
 * formulation (key-join → per-left-row ranking) materializes the full
 * key-match product.
 *
 * This implementation uses the union + carry-forward pattern instead:
 * tag both sides, union them, order within each key by (time, tag,
 * tie-break) and carry the latest right row forward as a single struct
 * with `last(..., ignoreNulls)` (struct carry keeps all right columns
 * atomic — they always come from the same row). Cost: ONE shuffle on the
 * key over |L|+|R| rows — no product, no per-row subquery — which is what
 * survives at 100 TB.
 */
object AsOfJoin {

  /**
   * @param rightVals right columns to carry, as (rightColumn, outputName)
   * @param rightTieBreak right column ordering ties at equal time (max wins)
   * @return all left columns + carried right columns (null when no match yet)
   */
  def asof(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      rightVals: Seq[(String, String)],
      rightTieBreak: String): DataFrame = {

    val leftCols = left.columns.toSeq
    val payload = struct(rightVals.map { case (c, out) => col(c).as(out) }: _*)
    // Right rows get tag 0 so they order BEFORE left rows at equal time
    // (inclusive ≤ semantics); tie-break ascends so last() takes the max.
    // NULL keys never match in an equality join (and in DuckDB's ASOF JOIN),
    // but Window.partitionBy groups NULLs together — so drop null-key right
    // rows up front; null-key left rows then carry nothing, as they should.
    val taggedRight = right.filter(col(rightKey).isNotNull).select(
      (col(rightKey).as("__k") +: col(rightTime).as("__t") +: lit(0).as("__tag") +:
        col(rightTieBreak).as("__tie") +: payload.as("__r") +:
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c))): _*)
    val nullPayload = lit(null).cast(
      right.select(payload).schema.head.dataType)
    val taggedLeft = left.select(
      (col(leftKey).as("__k") +: col(leftTime).as("__t") +: lit(1).as("__tag") +:
        lit(null).cast(right.schema(rightTieBreak).dataType).as("__tie") +:
        nullPayload.as("__r") +:
        leftCols.map(col)): _*)

    val w = Window.partitionBy("__k").orderBy(col("__t"), col("__tag"), col("__tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    taggedRight.unionByName(taggedLeft)
      .withColumn("__carried", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)
      .select(leftCols.map(col) ++
        rightVals.map { case (_, out) => col(s"__carried.$out").as(out) }: _*)
  }
}
