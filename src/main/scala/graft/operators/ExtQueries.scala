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
    // Approximate quantile sketch (no oracle: engine-specific sketch).
    "agg_approx_quantile" -> ((s, dir) => {
      val l = Tables(s, dir, "lineitem")
      l.groupBy("l_returnflag")
        .agg(percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000)).as("approx_median"))
        .orderBy("l_returnflag")
    }),
    // Correlated scalar subquery: orders above their own customer's mean.
    "subquery_correlated" -> ((s, dir) => {
      Tables(s, dir, "orders").createOrReplaceTempView("g_orders")
      s.sql(
        """SELECT o_orderkey, o_custkey, o_totalprice FROM g_orders o
          |WHERE o_totalprice > 1.5 * (
          |  SELECT CAST(sum(CAST(i.o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
          |         / count(*)
          |  FROM g_orders i WHERE i.o_custkey = o.o_custkey)
          |ORDER BY o_orderkey""".stripMargin)
    }),
    // Null semantics: nulls manufactured via nullif, then counted/summed.
    "expr_nulls" -> ((s, dir) => {
      val l = Tables(s, dir, "lineitem")
      val maybe = nullif(l("l_returnflag"), lit("N"))
      l.groupBy("l_linestatus")
        .agg(
          count(lit(1)).as("n_rows"),
          count(maybe).as("n_flagged"),
          (count(lit(1)) - count(maybe)).as("n_null"),
          countDistinct(maybe).as("n_flag_kinds"),
          max(coalesce(maybe, lit("zz"))).as("max_or_zz"))
        .orderBy("l_linestatus")
    }),
    // The capstone composition: the full cleaning pipeline end-to-end.
    "pipeline_clean_corpus" -> ((s, dir) =>
      Pipelines.cleanCorpus(Tables(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")),
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
    // Mirrors Pipelines.cleanCorpus stage by stage. The near-dup stage is
    // all-pairs exact Jaccard >= tau, sound against the Spark LSH path for
    // the same reason as the dedup_minhash oracle (miss prob ~1e-15/pair).
    "pipeline_clean_corpus" ->
      """WITH normalized AS (
        |  SELECT doc_id,
        |    trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
        |         ' +', ' ', 'g')) AS norm_text
        |  FROM documents),
        |quality AS (
        |  SELECT doc_id, norm_text,
        |    CAST(len(regexp_extract_all(norm_text, '[a-z]+')) AS INTEGER) AS n_tokens
        |  FROM normalized
        |  WHERE len(regexp_extract_all(norm_text, '[a-z]+')) >= 20),
        |exact_kept AS (
        |  SELECT doc_id, norm_text, n_tokens, digest FROM (
        |    SELECT *, md5(norm_text) AS digest,
        |      row_number() OVER (PARTITION BY md5(norm_text) ORDER BY doc_id) AS rn
        |    FROM quality) t
        |  WHERE rn = 1),
        |sh AS (
        |  SELECT doc_id, list_distinct(list_transform(
        |    range(1, greatest(len(regexp_extract_all(norm_text, '[a-z]+')) - 1, 1)),
        |    i -> array_to_string(regexp_extract_all(norm_text, '[a-z]+')[i:i+2], ' '))) AS s
        |  FROM exact_kept
        |  WHERE len(regexp_extract_all(norm_text, '[a-z]+')) >= 3),
        |u AS (SELECT doc_id, unnest(s) AS g FROM sh),
        |sizes AS (SELECT doc_id, count(*) AS n FROM u GROUP BY 1),
        |inter AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS c
        |          FROM u a JOIN u b ON a.g = b.g AND a.doc_id < b.doc_id
        |          GROUP BY 1, 2),
        |near_drop AS (
        |  SELECT DISTINCT d2 FROM inter
        |  JOIN sizes sa ON d1 = sa.doc_id
        |  JOIN sizes sb ON d2 = sb.doc_id
        |  WHERE c * 1.0 / (sa.n + sb.n - c) >= 0.75)
        |SELECT doc_id, norm_text, n_tokens, digest
        |FROM exact_kept
        |WHERE doc_id NOT IN (SELECT d2 FROM near_drop)
        |ORDER BY doc_id""".stripMargin,
    "subquery_correlated" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders o
        |WHERE o_totalprice > 1.5 * (
        |  SELECT CAST(sum(CAST(i.o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
        |         / count(*)
        |  FROM orders i WHERE i.o_custkey = o.o_custkey)
        |ORDER BY o_orderkey""".stripMargin,
    "expr_nulls" ->
      """SELECT l_linestatus, count(*) AS n_rows,
        |  count(nullif(l_returnflag, 'N')) AS n_flagged,
        |  count(*) - count(nullif(l_returnflag, 'N')) AS n_null,
        |  count(DISTINCT nullif(l_returnflag, 'N')) AS n_flag_kinds,
        |  max(coalesce(nullif(l_returnflag, 'N'), 'zz')) AS max_or_zz
        |FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin,
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
