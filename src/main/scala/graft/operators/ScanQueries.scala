package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/**
 * Scan-path coverage: projection, filter (=, range, IN, null tests,
 * compound AND/OR), and limit — the Spark-native counterpart of the
 * reference's pushdown surface:
 *   - filters:    TrinoFilterConverter.java:81–215, TrinoMetadataBase.java:345
 *   - projection: TrinoMetadataBase.java:383
 *   - limit:      TrinoMetadataBase.java:419, TrinoTableHandle.java:54
 * Here pushdown is not hand-rolled: declaring the predicate/projection on
 * the DataFrame lets Catalyst push it into the parquet scan (PushedFilters /
 * ReadSchema — audited in PLANS.md).
 */
object ScanQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "scan_projection" -> ((s, dir) => {
      Tables(s, dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy("l_orderkey", "l_linenumber", "l_extendedprice")
    }),
    "scan_filter_eq" -> ((s, dir) => {
      val l = Tables(s, dir, "lineitem")
      l.filter(l("l_returnflag") === "R")
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber", "l_quantity")
    }),
    // prefix LIKE: pushes as StringStartsWith into the parquet scan
    "scan_filter_like" -> ((s, dir) => {
      val c = Tables(s, dir, "customer")
      c.filter(c("c_name").startsWith("Customer#00000012"))
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    }),
    "scan_filter_range" -> ((s, dir) => {
      val l = Tables(s, dir, "lineitem")
      l.filter(l("l_quantity") >= 10 && l("l_quantity") < 20 &&
          l("l_shipdate") >= lit("1996-01-01").cast("timestamp"))
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_discount")
        .orderBy("l_orderkey", "l_linenumber", "l_quantity", "l_discount")
    }),
    "scan_filter_in" -> ((s, dir) => {
      val l = Tables(s, dir, "lineitem")
      l.filter(l("l_returnflag").isin("A", "N") && l("l_linenumber").isin(1, 2, 3))
        .select("l_orderkey", "l_linenumber", "l_returnflag")
        .orderBy("l_orderkey", "l_linenumber", "l_returnflag")
    }),
    "scan_filter_null" -> ((s, dir) => {
      val e = Tables(s, dir, "events")
      e.filter(e("props").isNotNull && e("event_type") === "error")
        .select("event_id", "user_id", "value")
        .orderBy("event_id")
    }),
    "scan_filter_compound" -> ((s, dir) => {
      val l = Tables(s, dir, "lineitem")
      l.filter((l("l_returnflag") === "R" || l("l_linestatus") === "F") &&
          l("l_discount") > 0.05)
        .select("l_orderkey", "l_linenumber", "l_returnflag", "l_linestatus")
        .orderBy("l_orderkey", "l_linenumber", "l_returnflag", "l_linestatus")
    }),
    "scan_limit" -> ((s, dir) => {
      Tables(s, dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_partkey")
        .orderBy("l_orderkey", "l_linenumber", "l_partkey")
        .limit(100)
    }),
  )

  def oracle: Map[String, String] = Map(
    "scan_projection" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, l_extendedprice""".stripMargin,
    "scan_filter_eq" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        |WHERE l_returnflag = 'R' ORDER BY l_orderkey, l_linenumber, l_quantity""".stripMargin,
    "scan_filter_like" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE c_name LIKE 'Customer#00000012%'
        |ORDER BY c_custkey""".stripMargin,
    "scan_filter_range" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_discount FROM lineitem
        |WHERE l_quantity >= 10 AND l_quantity < 20
        |  AND l_shipdate >= TIMESTAMP '1996-01-01'
        |ORDER BY l_orderkey, l_linenumber, l_quantity, l_discount""".stripMargin,
    "scan_filter_in" ->
      """SELECT l_orderkey, l_linenumber, l_returnflag FROM lineitem
        |WHERE l_returnflag IN ('A','N') AND l_linenumber IN (1,2,3)
        |ORDER BY l_orderkey, l_linenumber, l_returnflag""".stripMargin,
    "scan_filter_null" ->
      """SELECT event_id, user_id, value FROM events
        |WHERE props IS NOT NULL AND event_type = 'error' ORDER BY event_id""".stripMargin,
    "scan_filter_compound" ->
      """SELECT l_orderkey, l_linenumber, l_returnflag, l_linestatus FROM lineitem
        |WHERE (l_returnflag = 'R' OR l_linestatus = 'F') AND l_discount > 0.05
        |ORDER BY l_orderkey, l_linenumber, l_returnflag, l_linestatus""".stripMargin,
    "scan_limit" ->
      """SELECT l_orderkey, l_linenumber, l_partkey FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, l_partkey LIMIT 100""".stripMargin,
  )
}
