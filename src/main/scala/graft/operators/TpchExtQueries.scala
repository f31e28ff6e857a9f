package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.sources.Tables
import graft.sources.Tables.{davg, dsum}

/**
 * TPC-H analogs Q8/Q13/Q15/Q17/Q19/Q21/Q22 over the synthetic schema —
 * with Q1/Q3/Q4/Q5/Q6/Q7/Q10/Q12/Q14/Q18 in RelationalQueries this
 * covers every TPC-H query expressible without `partsupp` (Q2, Q9, Q11,
 * Q16, Q20 need it) and without per-line commit/receipt dates (Q4/Q21
 * adapt "late" to shipped ≥60 days after the order date). Columns the
 * synthetic tables lack are adapted: no `c_phone` → country code is
 * `c_nationkey`; no `o_comment`/`p_container` → priority/size filters.
 *
 * Scale notes: every dimension side (nation, region, the one-row
 * average) is broadcast; fact-fact joins shuffle on their natural keys;
 * Q21's exists/not-exists legs are semi/anti joins on l_orderkey — no
 * row explosion ever reaches the driver.
 */
object TpchExtQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Q8: national market share — NATION_1 suppliers' share of AMERICA
    // customers' ECONOMY-part revenue, per order year. Two decimal sums
    // per year, ONE double division (oracle-parity division rule).
    "q8_market_share" -> ((s, dir) => {
      val c = Tables(s, dir, "customer")
      val o = Tables(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      val l = Tables(s, dir, "lineitem")
      val su = Tables(s, dir, "supplier")
      val p = Tables(s, dir, "part").filter(col("p_type") === "ECONOMY")
      val n1 = Tables(s, dir, "nation")
      val n2 = Tables(s, dir, "nation")
        .select(col("n_nationkey").as("n2_key"), col("n_name").as("supp_nation"))
      val r = Tables(s, dir, "region").filter(col("r_name") === "AMERICA")
      val vol = (col("l_extendedprice") * (lit(1) - col("l_discount")))
        .cast(DecimalType(18, 4))
      l.join(broadcast(p), l("l_partkey") === p("p_partkey"))
        .join(o, l("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(n1), c("c_nationkey") === n1("n_nationkey"))
        .join(broadcast(r), n1("n_regionkey") === r("r_regionkey"))
        .join(broadcast(su), l("l_suppkey") === su("s_suppkey"))
        .join(broadcast(n2), su("s_nationkey") === col("n2_key"))
        .groupBy(year(o("o_orderdate")).as("o_year"))
        .agg((sum(when(col("supp_nation") === "NATION_1", vol)
            .otherwise(lit(0).cast(DecimalType(18, 4)))).cast("double") /
          sum(vol).cast("double")).as("mkt_share"))
        .orderBy("o_year")
    }),
    // Q13: customer order-count distribution — LEFT join keeps
    // zero-order customers (c_count 0); the priority filter rides the
    // join condition (the o_comment analog).
    "q13_custdist" -> ((s, dir) => {
      val c = Tables(s, dir, "customer")
      val o = Tables(s, dir, "orders")
      c.join(o, c("c_custkey") === o("o_custkey") &&
          o("o_orderpriority") =!= "1-URGENT", "left")
        .groupBy(c("c_custkey"))
        .agg(count(o("o_orderkey")).as("c_count"))
        .groupBy("c_count")
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    }),
    // Q17: small-quantity-order revenue — the correlated per-part
    // average becomes a broadcast-able aggregate joined back on partkey
    // (computed over the SAME brand-filtered lines as the oracle, so
    // per-part averages agree bit-for-bit).
    "q17_small_quantity" -> ((s, dir) => {
      val p = Tables(s, dir, "part").filter(col("p_brand") === "Brand#11")
      val l = Tables(s, dir, "lineitem")
      val branded = l.join(broadcast(p), l("l_partkey") === p("p_partkey"))
      val avgq = branded.groupBy(col("l_partkey").as("ap_key"))
        .agg(davg(col("l_quantity")).as("avg_qty"))
      branded.join(broadcast(avgq), col("l_partkey") === col("ap_key"))
        .filter(col("l_quantity") < lit(0.2) * col("avg_qty"))
        .agg((dsum(col("l_extendedprice")) / 7.0).as("avg_yearly"))
    }),
    // Q19: discounted revenue over three OR'd (brand, size, quantity)
    // branches — ONE keyed join, the disjunction is a residual filter
    // (never a cartesian branch per arm).
    "q19_discounted" -> ((s, dir) => {
      val p = Tables(s, dir, "part")
      val l = Tables(s, dir, "lineitem")
      val cond =
        (col("p_brand") === "Brand#12" && col("p_size").between(1, 5) &&
          col("l_quantity").between(1, 11)) ||
        (col("p_brand") === "Brand#13" && col("p_size").between(1, 10) &&
          col("l_quantity").between(10, 20)) ||
        (col("p_brand") === "Brand#14" && col("p_size").between(1, 15) &&
          col("l_quantity").between(20, 30))
      l.join(broadcast(p), l("l_partkey") === p("p_partkey"))
        .filter(cond)
        .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("revenue"))
    }),
    // Q21: suppliers who kept orders waiting (adapted late rule) — the
    // EXISTS becomes a left-semi join (another supplier touched the
    // order), the NOT EXISTS a left-anti join (no OTHER supplier was
    // late), both on l_orderkey with residual conditions.
    "q21_waiting" -> ((s, dir) => {
      val l = Tables(s, dir, "lineitem")
      val o = Tables(s, dir, "orders").filter(col("o_orderstatus") === "F")
      val su = Tables(s, dir, "supplier")
      val n = Tables(s, dir, "nation").filter(col("n_name") === "NATION_3")
      val late = l("l_shipdate") >= o("o_orderdate") + expr("INTERVAL 60 DAYS")
      val base = l.join(o, l("l_orderkey") === o("o_orderkey") && late)
        .join(broadcast(su), l("l_suppkey") === su("s_suppkey"))
        .join(broadcast(n), su("s_nationkey") === n("n_nationkey"))
      val l2 = Tables(s, dir, "lineitem")
        .select(col("l_orderkey").as("l2_okey"), col("l_suppkey").as("l2_skey"))
      val l3 = Tables(s, dir, "lineitem")
        .select(col("l_orderkey").as("l3_okey"), col("l_suppkey").as("l3_skey"),
          col("l_shipdate").as("l3_ship"))
      base
        .join(l2, base("l_orderkey") === col("l2_okey") &&
          base("l_suppkey") =!= col("l2_skey"), "left_semi")
        .join(l3, base("l_orderkey") === col("l3_okey") &&
          base("l_suppkey") =!= col("l3_skey") &&
          col("l3_ship") >= base("o_orderdate") + expr("INTERVAL 60 DAYS"),
          "left_anti")
        .groupBy("s_name")
        .agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name").asc)
        .limit(100)
    }),
    // Q15: top supplier — quarterly revenue per supplier, keep the
    // max-revenue suppliers. The max is a one-row broadcast equality
    // (both sides of the comparison are the same decimal-sum-to-double
    // values, so float equality is deterministic here).
    "q15_top_supplier" -> ((s, dir) => {
      val l = Tables(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
      val su = Tables(s, dir, "supplier")
      val rev = l.groupBy(col("l_suppkey"))
        .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("total_revenue"))
      val maxRev = rev.agg(max(col("total_revenue")).as("max_revenue"))
      rev.crossJoin(broadcast(maxRev))
        .filter(col("total_revenue") === col("max_revenue"))
        .join(broadcast(su), col("l_suppkey") === su("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
        .orderBy("s_suppkey")
    }),
    // Q22: global sales opportunity (country code = c_nationkey) —
    // rich-but-dormant customers: above-average balance, never placed an
    // URGENT order (anti join — the no-recent-orders analog with a
    // non-empty answer on the synthetic order mix), in the selected
    // codes. The scalar average is a broadcast one-row cross join.
    "q22_dormant" -> ((s, dir) => {
      val codes = Seq(0, 5, 10, 15, 20)
      val c = Tables(s, dir, "customer")
        .filter(col("c_nationkey").isInCollection(codes))
      val o = Tables(s, dir, "orders").filter(col("o_orderpriority") === "1-URGENT")
      val avgBal = c.filter(col("c_acctbal") > 0.0)
        .agg(davg(col("c_acctbal")).as("avg_bal"))
      c.crossJoin(broadcast(avgBal))
        .filter(col("c_acctbal") > col("avg_bal"))
        .join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .groupBy(col("c_nationkey").as("cntrycode"))
        .agg(count(lit(1)).as("numcust"), dsum(col("c_acctbal")).as("totacctbal"))
        .orderBy("cntrycode")
    }),
  )

  def oracle: Map[String, String] = Map(
    "q8_market_share" ->
      """SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
        |  CAST(sum(CASE WHEN n2.n_name = 'NATION_1'
        |        THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))
        |        ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
        |  / CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE)
        |    AS mkt_share
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation n1 ON c_nationkey = n1.n_nationkey
        |JOIN region ON n1.n_regionkey = r_regionkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation n2 ON s_nationkey = n2.n_nationkey
        |WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q13_custdist" ->
      """SELECT c_count, count(*) AS custdist FROM (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer LEFT JOIN orders
        |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        |  GROUP BY c_custkey) t
        |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin,
    "q17_small_quantity" ->
      """WITH branded AS (
        |  SELECT l.* FROM lineitem l JOIN part ON l_partkey = p_partkey
        |  WHERE p_brand = 'Brand#11'),
        |pq AS (
        |  SELECT l_partkey,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / count(l_quantity) AS avg_qty
        |  FROM branded GROUP BY l_partkey)
        |SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / 7.0 AS avg_yearly
        |FROM branded b JOIN pq ON b.l_partkey = pq.l_partkey
        |WHERE b.l_quantity < 0.2 * pq.avg_qty""".stripMargin,
    "q19_discounted" ->
      """SELECT CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE)
        |    AS revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
        |       AND l_quantity BETWEEN 1 AND 11)
        |   OR (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 10
        |       AND l_quantity BETWEEN 10 AND 20)
        |   OR (p_brand = 'Brand#14' AND p_size BETWEEN 1 AND 15
        |       AND l_quantity BETWEEN 20 AND 30)""".stripMargin,
    "q21_waiting" ->
      """SELECT s_name, count(*) AS numwait
        |FROM lineitem l1
        |JOIN orders ON o_orderkey = l1.l_orderkey
        |JOIN supplier ON s_suppkey = l1.l_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE o_orderstatus = 'F' AND n_name = 'NATION_3'
        |  AND l1.l_shipdate >= o_orderdate + INTERVAL 60 DAY
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
        |      AND l3.l_shipdate >= o_orderdate + INTERVAL 60 DAY)
        |GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 100""".stripMargin,
    "q15_top_supplier" ->
      """WITH rev AS (
        |  SELECT l_suppkey,
        |    CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE)
        |      AS total_revenue
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |    AND l_shipdate < TIMESTAMP '1996-04-01'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, total_revenue
        |FROM supplier JOIN rev ON s_suppkey = l_suppkey
        |WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
        |ORDER BY s_suppkey""".stripMargin,
    "q22_dormant" ->
      """WITH ab AS (
        |  SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) / count(c_acctbal)
        |      AS avg_bal
        |  FROM customer WHERE c_acctbal > 0.0 AND c_nationkey IN (0, 5, 10, 15, 20))
        |SELECT c_nationkey AS cntrycode, count(*) AS numcust,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS totacctbal
        |FROM customer, ab
        |WHERE c_nationkey IN (0, 5, 10, 15, 20) AND c_acctbal > avg_bal
        |  AND NOT EXISTS (SELECT 1 FROM orders
        |    WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        |GROUP BY 1 ORDER BY 1""".stripMargin,
  )
}
