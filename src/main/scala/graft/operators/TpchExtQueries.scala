package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.sources.Tables
import graft.sources.Tables.{davg, dsum}

/**
 * TPC-H analogs Q2/Q8/Q9/Q11/Q13/Q15/Q16/Q17/Q19/Q20/Q21/Q22 over the
 * synthetic schema — with Q1/Q3/Q4/Q5/Q6/Q7/Q10/Q12/Q14/Q18 in
 * RelationalQueries this covers all 22 TPC-H queries. The partsupp
 * family (Q2/Q9/Q11/Q16/Q20) runs over [[partsupp]], a deterministic
 * dbgen-style derivation (the driver testdata ships no partsupp table);
 * queries without per-line commit/receipt dates adapt (Q4/Q21 define
 * "late" as shipped ≥60 days after the order date). Columns the
 * synthetic tables lack are adapted: no `c_phone` → country code is
 * `c_nationkey`; no `o_comment`/`p_container` → priority/size filters;
 * no `s_comment` → Q16's complaint suppliers are `s_acctbal < 0`.
 *
 * Scale notes: every dimension side (nation, region, the one-row
 * average) is broadcast; fact-fact joins shuffle on their natural keys;
 * Q21's exists/not-exists legs are semi/anti joins on l_orderkey — no
 * row explosion ever reaches the driver.
 */
object TpchExtQueries {

  /**
   * Deterministic `partsupp` derived from part × supplier-count, dbgen
   * style (reference spec: TPC-H dbgen assigns each part 4 suppliers at
   * stride S/4; cf. paimon-trino's TPC-H test fixtures): for replica
   * i ∈ 0..3, `ps_suppkey = (p_partkey + i·(S div 4 + 1)) mod S` (S =
   * supplier count, keys 0-based), availqty/supplycost from integer
   * hashes of the pair. Every expression is integer arithmetic (one
   * final exact /100.0), so Spark and the DuckDB oracle CTE
   * ([[psCte]]) produce bit-identical rows at any scale factor. Narrow
   * map over part × a broadcast one-row count — no shuffle, scales to
   * any |part|.
   */
  def partsupp(s: SparkSession, dir: String): DataFrame = {
    val sCnt = Tables(s, dir, "supplier").agg(count(lit(1)).as("s_cnt"))
    Tables(s, dir, "part").select("p_partkey")
      .crossJoin(broadcast(sCnt))
      .select(col("p_partkey"), col("s_cnt"),
        explode(sequence(lit(0), lit(3))).as("i"))
      .withColumn("ps_suppkey",
        (col("p_partkey") + col("i") * (expr("s_cnt div 4") + lit(1))) % col("s_cnt"))
      .select(
        col("p_partkey").as("ps_partkey"),
        col("ps_suppkey"),
        ((col("p_partkey") * 47 + col("ps_suppkey") * 31 + col("i") * 7) % 9999 + 1)
          .as("ps_availqty"),
        (((col("p_partkey") * 13 + col("ps_suppkey") * 19 + col("i") * 5) % 19900 + 100)
          .cast("double") / 100.0).as("ps_supplycost"))
  }

  /** DuckDB CTE mirroring [[partsupp]] bit-for-bit (prepended to the
    * partsupp-family oracles). */
  private val psCte: String =
    """WITH ps0 AS (
      |  SELECT p_partkey, i,
      |    (p_partkey + i * ((SELECT count(*) FROM supplier)//4 + 1))
      |      % (SELECT count(*) FROM supplier) AS ps_suppkey
      |  FROM part, (SELECT unnest(range(4)) AS i) r),
      |partsupp AS (
      |  SELECT p_partkey AS ps_partkey, ps_suppkey,
      |    (p_partkey * 47 + ps_suppkey * 31 + i * 7) % 9999 + 1 AS ps_availqty,
      |    CAST((p_partkey * 13 + ps_suppkey * 19 + i * 5) % 19900 + 100 AS DOUBLE)
      |      / 100.0 AS ps_supplycost
      |  FROM ps0)
      |""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Q2: min-cost supplier — the correlated "cheapest EUROPE supplier
    // of this part" subquery decorrelates to a per-part min over the
    // region-restricted partsupp, joined back on (partkey, cost).
    // Double equality is safe: min() returns one of the exact derived
    // values. Dim joins broadcast; the min join shuffles on partkey.
    "q2_min_cost_supplier" -> ((s, dir) => {
      val ps = partsupp(s, dir)
      val su = Tables(s, dir, "supplier")
      val n = Tables(s, dir, "nation")
      val r = Tables(s, dir, "region").filter(col("r_name") === "EUROPE")
      val p = Tables(s, dir, "part")
        .filter(col("p_size") <= 15 && col("p_type") === "LARGE")
        .select("p_partkey")
      val euro = ps.join(broadcast(su), col("ps_suppkey") === col("s_suppkey"))
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      val minCost = euro.groupBy(col("ps_partkey").as("m_key"))
        .agg(min(col("ps_supplycost")).as("m_cost"))
      euro.join(broadcast(p), col("ps_partkey") === col("p_partkey"), "left_semi")
        .join(minCost, col("ps_partkey") === col("m_key") &&
          col("ps_supplycost") === col("m_cost"))
        .select(col("s_acctbal"), col("s_name"), col("n_name"),
          col("ps_partkey").as("p_partkey"), col("ps_supplycost"))
        .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"), col("p_partkey"))
        .limit(100)
    }),
    // Q9: product-type profit — 6-way join; part filter broadcast, the
    // partsupp join shuffles on its composite natural key. Profit terms
    // cast to DECIMAL(18,4) pre-sum (oracle-parity aggregation rule).
    "q9_product_profit" -> ((s, dir) => {
      val ps = partsupp(s, dir)
      val l = Tables(s, dir, "lineitem")
      val p = Tables(s, dir, "part").filter(col("p_name").like("red%"))
        .select("p_partkey")
      val su = Tables(s, dir, "supplier")
      val o = Tables(s, dir, "orders")
      val n = Tables(s, dir, "nation")
      val amount = (col("l_extendedprice") * (lit(1) - col("l_discount")) -
        col("ps_supplycost") * col("l_quantity")).cast(DecimalType(18, 4))
      l.join(broadcast(p), col("l_partkey") === col("p_partkey"), "left_semi")
        .join(ps, col("l_partkey") === col("ps_partkey") &&
          col("l_suppkey") === col("ps_suppkey"))
        .join(broadcast(su), col("l_suppkey") === col("s_suppkey"))
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name").as("nation"), year(col("o_orderdate")).as("o_year"))
        .agg(sum(amount).cast("double").as("sum_profit"))
        .orderBy(col("nation"), col("o_year").desc)
    }),
    // Q11: important stock — value per part over two nations' suppliers,
    // kept when above 1.5× the mean per-part share (scale-invariant
    // analog of TPC-H's 0.0001/SF threshold). The threshold is a
    // broadcast one-row cross join, same shape as Q15/Q22.
    "q11_important_stock" -> ((s, dir) => {
      val ps = partsupp(s, dir)
      val su = Tables(s, dir, "supplier")
      val n = Tables(s, dir, "nation")
        .filter(col("n_name").isin("NATION_3", "NATION_18"))
      val filtered = ps.join(broadcast(su), col("ps_suppkey") === col("s_suppkey"))
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .select(col("ps_partkey"),
          (col("ps_supplycost") * col("ps_availqty")).as("v"))
      val byPart = filtered.groupBy("ps_partkey").agg(dsum(col("v")).as("value"))
      val thresh = filtered
        .agg((dsum(col("v")) / countDistinct(col("ps_partkey")) * lit(1.5)).as("thr"))
      byPart.crossJoin(broadcast(thresh))
        .filter(col("value") > col("thr"))
        .select("ps_partkey", "value")
        .orderBy(col("value").desc, col("ps_partkey"))
    }),
    // Q16: supplier count per (brand, type, size) — NOT IN over the
    // never-null complaint-supplier set is a left-anti join; distinct
    // count shuffles once on the grouping key.
    "q16_parts_suppliers" -> ((s, dir) => {
      val ps = partsupp(s, dir)
      val p = Tables(s, dir, "part").filter(col("p_brand") =!= "Brand#11" &&
        !col("p_type").like("MEDIUM%") &&
        col("p_size").isin(1, 4, 9, 14, 19, 24, 29, 34))
      val excl = Tables(s, dir, "supplier").filter(col("s_acctbal") < 0)
        .select("s_suppkey")
      ps.join(broadcast(excl), col("ps_suppkey") === col("s_suppkey"), "left_anti")
        .join(broadcast(p), col("ps_partkey") === col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(countDistinct(col("ps_suppkey")).as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))
    }),
    // Q20: promotion-candidate suppliers — the correlated "half of this
    // pair's shipped quantity" subquery becomes ONE lineitem aggregate
    // on (partkey, suppkey) inner-joined back (inner ≡ the oracle's
    // NULL-comparison exclusion when no lines match); nested INs become
    // semi joins.
    "q20_promotion" -> ((s, dir) => {
      val ps = partsupp(s, dir)
      val red = Tables(s, dir, "part").filter(col("p_name").like("red%"))
        .select("p_partkey")
      val qty = Tables(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
        .groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(dsum(col("l_quantity")).as("qty"))
      val cand = ps
        .join(broadcast(red), col("ps_partkey") === col("p_partkey"), "left_semi")
        .join(qty, col("ps_partkey") === col("l_partkey") &&
          col("ps_suppkey") === col("l_suppkey"))
        .filter(col("ps_availqty") > lit(0.5) * col("qty"))
        .select(col("ps_suppkey"))
      val su = Tables(s, dir, "supplier")
      val n = Tables(s, dir, "nation")
        .filter(col("n_name").isin("NATION_3", "NATION_8"))
      su.join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .join(cand, col("s_suppkey") === col("ps_suppkey"), "left_semi")
        .select(col("s_name"), col("s_acctbal"))
        .orderBy("s_name")
    }),
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
    // correlated EXISTS/NOT EXISTS both ask about the SAME order's line
    // set, so instead of re-scanning lineitem per leg (the textbook
    // 3-scan shape) ONE scan computes per-order supplier sets in a
    // window over l_orderkey: EXISTS another supplier ⇔ >1 distinct
    // suppliers; NOT EXISTS another LATE supplier ⇔ the late-supplier
    // set is exactly {mine} (my line is late, so ⇔ its size is 1). The
    // window's required distribution matches the orders join keys, so
    // no extra shuffle — one lineitem scan, one shuffle, two broadcasts.
    "q21_waiting" -> ((s, dir) => {
      val l = Tables(s, dir, "lineitem")
      val o = Tables(s, dir, "orders").filter(col("o_orderstatus") === "F")
      val su = Tables(s, dir, "supplier")
      val n = Tables(s, dir, "nation").filter(col("n_name") === "NATION_3")
      val w = org.apache.spark.sql.expressions.Window.partitionBy(col("l_orderkey"))
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .withColumn("__late",
          col("l_shipdate") >= col("o_orderdate") + expr("INTERVAL 60 DAYS"))
        .withColumn("__nsupp", size(collect_set(col("l_suppkey")).over(w)))
        .withColumn("__nlate",
          size(collect_set(when(col("__late"), col("l_suppkey"))).over(w)))
        .filter(col("__late") && col("__nsupp") > 1 && col("__nlate") === 1)
        .join(broadcast(su), col("l_suppkey") === su("s_suppkey"))
        .join(broadcast(n), su("s_nationkey") === n("n_nationkey"))
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
    "q2_min_cost_supplier" -> (psCte +
      """SELECT s_acctbal, s_name, n_name, p_partkey, ps_supplycost
        |FROM part
        |JOIN partsupp ON p_partkey = ps_partkey
        |JOIN supplier ON s_suppkey = ps_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE p_size <= 15 AND p_type = 'LARGE' AND r_name = 'EUROPE'
        |  AND ps_supplycost = (
        |    SELECT min(ps2.ps_supplycost) FROM partsupp ps2
        |    JOIN supplier s2 ON s2.s_suppkey = ps2.ps_suppkey
        |    JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
        |    JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
        |    WHERE ps2.ps_partkey = p_partkey AND r2.r_name = 'EUROPE')
        |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 100""".stripMargin),
    "q9_product_profit" -> (psCte +
      """SELECT nation, o_year, sum_profit FROM (
        |  SELECT n_name AS nation, CAST(year(o_orderdate) AS INTEGER) AS o_year,
        |    CAST(sum(CAST(l_extendedprice * (1 - l_discount)
        |        - ps_supplycost * l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_profit
        |  FROM lineitem
        |  JOIN partsupp ON ps_partkey = l_partkey AND ps_suppkey = l_suppkey
        |  JOIN part ON p_partkey = l_partkey
        |  JOIN supplier ON s_suppkey = l_suppkey
        |  JOIN orders ON o_orderkey = l_orderkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  WHERE p_name LIKE 'red%'
        |  GROUP BY 1, 2) t
        |ORDER BY nation, o_year DESC""".stripMargin),
    "q11_important_stock" -> (psCte +
      """, filtered AS (
        |  SELECT ps_partkey, ps_supplycost, ps_availqty FROM partsupp
        |  JOIN supplier ON s_suppkey = ps_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  WHERE n_name IN ('NATION_3', 'NATION_18'))
        |SELECT ps_partkey,
        |  CAST(sum(CAST(ps_supplycost * ps_availqty AS DECIMAL(18,4))) AS DOUBLE) AS value
        |FROM filtered GROUP BY ps_partkey
        |HAVING CAST(sum(CAST(ps_supplycost * ps_availqty AS DECIMAL(18,4))) AS DOUBLE) > (
        |  SELECT CAST(sum(CAST(ps_supplycost * ps_availqty AS DECIMAL(18,4))) AS DOUBLE)
        |         / count(DISTINCT ps_partkey) * 1.5 FROM filtered)
        |ORDER BY value DESC, ps_partkey""".stripMargin),
    "q16_parts_suppliers" -> (psCte +
      """SELECT p_brand, p_type, p_size, count(DISTINCT ps_suppkey) AS supplier_cnt
        |FROM partsupp JOIN part ON p_partkey = ps_partkey
        |WHERE p_brand <> 'Brand#11' AND p_type NOT LIKE 'MEDIUM%'
        |  AND p_size IN (1, 4, 9, 14, 19, 24, 29, 34)
        |  AND ps_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY p_brand, p_type, p_size
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin),
    "q20_promotion" -> (psCte +
      """SELECT s_name, s_acctbal FROM supplier
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE n_name IN ('NATION_3', 'NATION_8')
        |  AND s_suppkey IN (
        |    SELECT ps_suppkey FROM partsupp
        |    WHERE ps_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
        |      AND ps_availqty > (
        |        SELECT 0.5 * CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)
        |        FROM lineitem
        |        WHERE l_partkey = ps_partkey AND l_suppkey = ps_suppkey
        |          AND l_shipdate >= TIMESTAMP '1996-01-01'
        |          AND l_shipdate < TIMESTAMP '1997-01-01'))
        |ORDER BY s_name""".stripMargin),
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
