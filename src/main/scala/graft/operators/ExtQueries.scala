package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.sources.Tables.dsum

/**
 * Extended operator pack: JSON extraction, pivot, HLL approximate
 * distinct, and the as-of join ([[AsOfJoin]]). `agg_approx` registers
 * without an oracle (sketch internals are engine-specific; accuracy is
 * asserted in ExtSpec instead).
 */
object ExtQueries {

  private val EventTypes = Seq("click", "error", "purchase", "signup", "view")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // JSON column processing (events.props carries {"k": int}).
    "expr_json" -> ((s, dir) => {
      val e = Tables(s, dir, "events")
      e.select(
          e("event_id"),
          get_json_object(e("props"), "$.k").cast("int").as("k_val"))
        .orderBy("event_id")
    }),
    // Pivot: per-user event-type counts as fixed columns.
    "agg_pivot" -> ((s, dir) => {
      val e = Tables(s, dir, "events")
      e.groupBy("user_id")
        .pivot("event_type", EventTypes)
        .agg(count(lit(1)))
        .na.fill(0L, EventTypes)
        .orderBy("user_id")
    }),
    // HLL sketch (no oracle: sketch estimates are engine-specific).
    "agg_approx" -> ((s, dir) => {
      val l = Tables(s, dir, "lineitem")
      l.groupBy("l_returnflag")
        .agg(approx_count_distinct("l_partkey").as("approx_parts"))
        .orderBy("l_returnflag")
    }),
    // As-of join: latest order (by date, then orderkey) of the mapped
    // customer at-or-before each event's timestamp.
    "join_asof" -> ((s, dir) => {
      val e = Tables(s, dir, "events")
        .select(col("event_id"), (col("user_id") + 1).as("custkey"), col("ts"))
      val o = Tables(s, dir, "orders")
      AsOfJoin.asof(e, o,
          leftKey = "custkey", rightKey = "o_custkey",
          leftTime = "ts", rightTime = "o_orderdate",
          rightVals = Seq("o_orderkey" -> "last_orderkey", "o_totalprice" -> "last_totalprice"),
          rightTieBreak = "o_orderkey")
        .select("event_id", "custkey", "last_orderkey", "last_totalprice")
        .orderBy("event_id")
    }),
  )

  def oracle: Map[String, String] = Map(
    "expr_json" ->
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_val
        |FROM events ORDER BY event_id""".stripMargin,
    "agg_pivot" ->
      """SELECT user_id,
        |  count(*) FILTER (WHERE event_type = 'click') AS click,
        |  count(*) FILTER (WHERE event_type = 'error') AS error,
        |  count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
        |  count(*) FILTER (WHERE event_type = 'signup') AS signup,
        |  count(*) FILTER (WHERE event_type = 'view') AS view
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "join_asof" ->
      """SELECT event_id, custkey, last_orderkey, last_totalprice FROM (
        |  SELECT e.event_id, e.user_id + 1 AS custkey,
        |    o.o_orderkey AS last_orderkey, o.o_totalprice AS last_totalprice,
        |    row_number() OVER (PARTITION BY e.event_id
        |      ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
        |  FROM events e
        |  LEFT JOIN orders o
        |    ON o.o_custkey = e.user_id + 1 AND o.o_orderdate <= e.ts) t
        |WHERE rn = 1 ORDER BY event_id""".stripMargin,
  )
}
