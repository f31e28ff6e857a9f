package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.sources.Tables
import graft.sources.Tables.{davg, dsum}

/**
 * Relational query surface — what Trino's engine executes on top of the
 * reference connector (joins, aggregation, sort, window, set ops). Expressed
 * Spark-first: declarative DataFrame plans so Catalyst picks shuffle vs
 * broadcast, pushes filters, and keeps everything in whole-stage codegen.
 *
 * Scale notes (100 TB):
 *  - `join_broadcast` explicitly broadcasts the O(100-row) dims
 *    (nation/region) so the fact side never shuffles.
 *  - `join_shuffle` is a key-partitioned sort-merge/shuffled-hash join on
 *    the join key with map-side partial aggregation after it.
 *  - Window queries partition by a high-cardinality key (customer/user), so
 *    state per partition stays bounded.
 */
object RelationalQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // TPC-H Q1-style pricing summary: multi-aggregate group-by.
    "q1_agg" -> ((s, dir) => {
      val l = Tables(s, dir, "lineitem")
      l.filter(l("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          dsum(l("l_quantity")).as("sum_qty"),
          dsum(l("l_extendedprice")).as("sum_base_price"),
          dsum(l("l_extendedprice") * (lit(1) - l("l_discount"))).as("sum_disc_price"),
          davg(l("l_quantity")).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }),
    "agg_multi" -> ((s, dir) => {
      val o = Tables(s, dir, "orders")
      o.groupBy("o_orderpriority")
        .agg(
          count(lit(1)).as("n_orders"),
          min("o_totalprice").as("min_price"),
          max("o_totalprice").as("max_price"),
          dsum(o("o_totalprice")).as("sum_price"),
          countDistinct("o_custkey").as("n_customers"))
        .orderBy("o_orderpriority")
    }),
    "agg_distinct" -> ((s, dir) => {
      Tables(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(countDistinct("l_partkey").as("n_parts"),
          countDistinct("l_suppkey").as("n_supps"))
        .orderBy("l_returnflag")
    }),
    // Fact ⋈ fact on the natural key: shuffle (sort-merge) join + partial agg.
    "join_shuffle" -> ((s, dir) => {
      val o = Tables(s, dir, "orders")
      val l = Tables(s, dir, "lineitem")
      o.join(l, o("o_orderkey") === l("l_orderkey"))
        .groupBy("o_orderstatus")
        .agg(
          dsum(l("l_extendedprice") * (lit(1) - l("l_discount"))).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy("o_orderstatus")
    }),
    // Dim joins: broadcast nation+region so customer never shuffles for the join.
    "join_broadcast" -> ((s, dir) => {
      val c = Tables(s, dir, "customer")
      val n = Tables(s, dir, "nation")
      val r = Tables(s, dir, "region")
      c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(count(lit(1)).as("n_customers"), dsum(c("c_acctbal")).as("sum_bal"))
        .orderBy("r_name", "n_name")
    }),
    "join_outer" -> ((s, dir) => {
      val c = Tables(s, dir, "customer")
      val o = Tables(s, dir, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(count(o("o_orderkey")).as("n_orders"))
        .orderBy("c_custkey")
    }),
    // FULL outer: customers without orders AND (synthetic) orders whose
    // customer is filtered away both survive with nulls on the bare side.
    "join_full_outer" -> ((s, dir) => {
      val c = Tables(s, dir, "customer").filter(col("c_custkey") % 3 =!= 0)
        .select("c_custkey", "c_name")
      val o = Tables(s, dir, "orders").filter(col("o_custkey") % 3 =!= 1)
        .groupBy("o_custkey").agg(count(lit(1)).as("n_orders"))
      c.join(o, c("c_custkey") === o("o_custkey"), "full_outer")
        .select(coalesce(c("c_custkey"), o("o_custkey")).as("key"),
          c("c_name").as("c_name"), o("n_orders").as("n_orders"))
        .orderBy("key")
    }),
    "join_semi" -> ((s, dir) => {
      val c = Tables(s, dir, "customer")
      val o = Tables(s, dir, "orders")
      val big = o.filter(o("o_totalprice") > 300000)
      c.join(big, c("c_custkey") === big("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    }),
    "join_anti" -> ((s, dir) => {
      val c = Tables(s, dir, "customer")
      val o = Tables(s, dir, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    }),
    "sort_multi" -> ((s, dir) => {
      val p = Tables(s, dir, "part")
      p.select("p_partkey", "p_brand", "p_size", "p_retailprice")
        .orderBy(col("p_brand").asc, col("p_retailprice").desc, col("p_partkey").asc)
    }),
    // Top-N: Catalyst turns sort+limit into TakeOrderedAndProject (no full sort).
    "topn" -> ((s, dir) => {
      Tables(s, dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(50)
    }),
    "window_rank" -> ((s, dir) => {
      val o = Tables(s, dir, "orders")
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      o.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
        .orderBy("o_custkey", "rn")
    }),
    "window_running" -> ((s, dir) => {
      // order by µs + event_id: DuckDB truncates parquet ns timestamps to
      // µs on read, so ns-exact ordering could disagree on same-µs ties
      val e = Tables(s, dir, "events").withColumn("ts_us", unix_micros(col("ts")))
      val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      e.withColumn("running_value",
          sum(e("value").cast(DecimalType(18, 4))).over(w).cast("double"))
        .select("user_id", "event_id", "running_value")
        .orderBy("user_id", "event_id")
    }),
    // Window family II: dense_rank / percent_rank / ntile / cume_dist.
    "window_ranks" -> ((s, dir) => {
      val o = Tables(s, dir, "orders")
      val w = Window.partitionBy("o_orderpriority")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      o.select(col("o_orderpriority"), col("o_orderkey"),
          dense_rank().over(w).as("drank"),
          percent_rank().over(w).as("prank"),
          ntile(4).over(w).as("quartile"),
          cume_dist().over(w).as("cdist"))
        .filter(col("drank") <= 20)
        .orderBy("o_orderpriority", "drank", "o_orderkey")
    }),
    // lead/lag/first/last navigation within a partition.
    "window_lead_lag" -> ((s, dir) => {
      // µs precision both sides: DuckDB truncates parquet ns timestamps to
      // µs on read, so ns-exact gaps can't hash-match.
      val e = Tables(s, dir, "events").withColumn("ts_us", unix_micros(col("ts")))
      val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
      e.select(col("user_id"), col("event_id"),
          lag("event_id", 1).over(w).as("prev_event"),
          lead("event_id", 1).over(w).as("next_event"),
          first("event_id").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)).as("first_event"),
          (col("ts_us") - lag("ts_us", 1).over(w)).as("gap_us"))
        .filter(col("user_id") < 10)
        .orderBy("user_id", "event_id")
    }),
    // RANGE frame: sum of nearby-priced orders per priority.
    "window_range_frame" -> ((s, dir) => {
      val o = Tables(s, dir, "orders")
      val w = Window.partitionBy("o_orderpriority").orderBy(col("o_totalprice"))
        .rangeBetween(-1000L, 1000L)
      o.select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"),
          count(lit(1)).over(w).as("n_nearby"))
        .filter(col("o_orderkey") < 2000)
        .orderBy("o_orderpriority", "o_orderkey")
    }),
    "agg_cube" -> ((s, dir) => {
      val o = Tables(s, dir, "orders")
      val base = o.select(col("o_orderstatus").as("st"), col("o_orderpriority").as("pr"))
      base.cube("st", "pr")
        .agg(count(lit(1)).as("n"), grouping(col("st")).as("g_s"), grouping(col("pr")).as("g_p"))
        .select(
          when(col("g_s") === 1, "(all)").otherwise(col("st")).as("status"),
          when(col("g_p") === 1, "(all)").otherwise(col("pr")).as("priority"),
          col("n"))
        .orderBy("status", "priority")
    }),
    "agg_rollup" -> ((s, dir) => {
      // DataFrame-API rollup + grouping() trips the self-join ambiguity
      // detector (Expand duplicates the grouping attrs); SQL form resolves
      // cleanly and produces the identical plan.
      Tables(s, dir, "customer").createOrReplaceTempView("g_customer")
      Tables(s, dir, "nation").createOrReplaceTempView("g_nation")
      Tables(s, dir, "region").createOrReplaceTempView("g_region")
      s.sql(
        """SELECT
          |  CASE WHEN grouping(r_name) = 1 THEN '(all)' ELSE r_name END AS region,
          |  CASE WHEN grouping(n_name) = 1 THEN '(all)' ELSE n_name END AS nation,
          |  count(*) AS n_customers
          |FROM g_customer
          |JOIN g_nation ON c_nationkey = n_nationkey
          |JOIN g_region ON n_regionkey = r_regionkey
          |GROUP BY ROLLUP (r_name, n_name)
          |ORDER BY region, nation""".stripMargin)
    }),
    "agg_having" -> ((s, dir) => {
      val l = Tables(s, dir, "lineitem")
      l.groupBy("l_partkey")
        .agg(count(lit(1)).as("n_items"), dsum(l("l_quantity")).as("sum_qty"))
        .filter(col("n_items") >= 20)
        .orderBy("l_partkey")
    }),
    "subquery_scalar" -> ((s, dir) => {
      val o = Tables(s, dir, "orders")
      val threshold = o.agg((max("o_totalprice") * 0.9).as("thr"))
      o.join(broadcast(threshold))
        .filter(o("o_totalprice") > col("thr"))
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy("o_orderkey")
    }),
    "set_union" -> ((s, dir) => {
      val e = Tables(s, dir, "events").select(col("event_type").as("v"))
      val o = Tables(s, dir, "orders").select(col("o_orderpriority").as("v"))
      e.union(o).groupBy("v").agg(count(lit(1)).as("n")).orderBy("v")
    }),
    // INTERSECT / EXCEPT set semantics over key projections.
    "set_intersect_except" -> ((s, dir) => {
      val c = Tables(s, dir, "customer").select(col("c_custkey").as("k"))
      val o = Tables(s, dir, "orders").select(col("o_custkey").as("k"))
      val both = c.intersect(o).withColumn("src", lit("both"))
      val only = c.except(o).withColumn("src", lit("customer_only"))
      both.union(only).orderBy("src", "k")
    }),
    "expr_case" -> ((s, dir) => {
      val o = Tables(s, dir, "orders")
      o.withColumn("bucket",
          when(o("o_totalprice") > 300000, "high")
            .when(o("o_totalprice") > 100000, "mid")
            .otherwise("low"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n"))
        .orderBy("bucket")
    }),
    // coalesce / nullif / least / greatest conditional family.
    "expr_cond" -> ((s, dir) => {
      val l = Tables(s, dir, "lineitem")
      l.select(col("l_orderkey"), col("l_linenumber"),
          coalesce(nullif(col("l_returnflag"), lit("N")), lit("none")).as("flag_or_none"),
          least(col("l_quantity"), col("l_discount") * 100).as("least_v"),
          greatest(col("l_quantity"), lit(25.0)).as("greatest_v"),
          nvl2(nullif(col("l_linestatus"), lit("O")), lit("closed"), lit("open")).as("status_kind"))
        .filter(col("l_orderkey") < 500)
        .orderBy("l_orderkey", "l_linenumber", "least_v")
    }),
    // date arithmetic: datediff / date_add / last_day / day extraction.
    "expr_datemath" -> ((s, dir) => {
      val o = Tables(s, dir, "orders")
      val d = to_date(col("o_orderdate"))
      o.select(col("o_orderkey"),
          datediff(lit("1999-01-01").cast("date"), d).as("days_to_1999"),
          date_format(date_add(d, 30), "yyyy-MM-dd").as("plus30"),
          date_format(last_day(d), "yyyy-MM-dd").as("month_end"),
          dayofmonth(d).as("dom"),
          quarter(d).as("qtr"))
        .filter(col("o_orderkey") < 2000)
        .orderBy("o_orderkey")
    }),
    "agg_median" -> ((s, dir) => {
      val o = Tables(s, dir, "orders")
      o.groupBy("o_orderpriority")
        .agg(
          percentile(o("o_totalprice"), lit(0.5)).as("median_price"),
          percentile(o("o_totalprice"), lit(0.9)).as("p90_price"))
        .orderBy("o_orderpriority")
    }),
    "expr_scalar" -> ((s, dir) => {
      val p = Tables(s, dir, "part")
      p.select(
          p("p_partkey"),
          upper(p("p_brand")).as("brand_u"),
          substring(p("p_name"), 1, 8).as("name_pfx"),
          length(p("p_name")).as("name_len"),
          concat_ws("-", p("p_brand"), p("p_type")).as("brand_type"),
          round(p("p_retailprice")).as("price_round"),
          floor(p("p_retailprice") / 100).cast("long").as("price_bucket"),
          abs(p("p_size") - 25).as("size_dist"),
          (p("p_partkey") % 7).as("key_mod"))
        .orderBy("p_partkey")
    }),
    // TPC-H Q6: forecasting-revenue-change — a pure scan-side filter +
    // single aggregate; every predicate pushes to parquet, no shuffle
    // beyond the 1-row partial-agg exchange.
    "q6_forecast" -> ((s, dir) => {
      val l = Tables(s, dir, "lineitem")
      l.filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
          col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
        .agg(sum((col("l_extendedprice") * col("l_discount"))
          .cast(DecimalType(24, 6))).cast("double").as("revenue"))
    }),
    // TPC-H Q4 (adapted: the synthetic lineitem has no commit/receipt
    // dates, so "late order" = any line shipped ≥60 days after the order
    // date): EXISTS → left-semi join, count per priority.
    "q4_priority" -> ((s, dir) => {
      val o = Tables(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-07-01").cast("timestamp") &&
          col("o_orderdate") < lit("1996-10-01").cast("timestamp"))
      val l = Tables(s, dir, "lineitem")
      o.join(l, o("o_orderkey") === l("l_orderkey") &&
          l("l_shipdate") >= o("o_orderdate") + expr("INTERVAL 60 DAYS"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("order_count"))
        .orderBy("o_orderpriority")
    }),
    // TPC-H Q12 (adapted: no l_shipmode column — l_linestatus groups):
    // high- vs low-priority line counts per group over a one-year window.
    "q12_shipmode" -> ((s, dir) => {
      val o = Tables(s, dir, "orders")
      val l = Tables(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      o.join(l, o("o_orderkey") === l("l_orderkey"))
        .groupBy("l_linestatus")
        .agg(
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
            .otherwise(0L)).as("high_line_count"),
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0L)
            .otherwise(1L)).as("low_line_count"))
        .orderBy("l_linestatus")
    }),
    // TPC-H Q14: promotion revenue share — part join + conditional
    // aggregate, one exact-decimal ratio.
    "q14_promo" -> ((s, dir) => {
      val p = Tables(s, dir, "part")
      val l = Tables(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-03-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
      val rev = (col("l_extendedprice") * (lit(1) - col("l_discount")))
        .cast(DecimalType(24, 6))
      l.join(p, l("l_partkey") === p("p_partkey"))
        .agg((sum(when(col("p_type") === "PROMO", rev).otherwise(lit(0)
            .cast(DecimalType(24, 6)))).cast("double") * 100.0 /
          sum(rev).cast("double")).as("promo_revenue"))
    }),
    // TPC-H Q3: shipping-priority top-10. Two fact joins on their natural
    // keys (shuffle at scale; AQE may broadcast the filtered customer side)
    // with all three filters pushed to the scans; sort+limit collapses to
    // TakeOrderedAndProject — no full sort of the aggregate output.
    "q3_shipping" -> ((s, dir) => {
      val c = Tables(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      val o = Tables(s, dir, "orders")
        .filter(col("o_orderdate") < lit("1997-06-01").cast("timestamp"))
      val l = Tables(s, dir, "lineitem")
        .filter(col("l_shipdate") > lit("1997-06-01").cast("timestamp"))
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .groupBy(l("l_orderkey"), o("o_orderdate"), o("o_orderpriority"))
        .agg(dsum(l("l_extendedprice") * (lit(1) - l("l_discount"))).as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey").asc)
        .limit(10)
    }),
    // TPC-H Q5: local-supplier revenue per nation. region/nation broadcast;
    // the customer=supplier nation constraint rides on the supplier join.
    "q5_local_supplier" -> ((s, dir) => {
      val c = Tables(s, dir, "customer")
      val o = Tables(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      val l = Tables(s, dir, "lineitem")
      val su = Tables(s, dir, "supplier")
      val n = Tables(s, dir, "nation")
      val r = Tables(s, dir, "region").filter(col("r_name") === "ASIA")
      c.join(o, c("c_custkey") === o("o_custkey"))
        .join(l, o("o_orderkey") === l("l_orderkey"))
        .join(su, l("l_suppkey") === su("s_suppkey") &&
          su("s_nationkey") === c("c_nationkey"))
        .join(broadcast(n), su("s_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy("n_name")
        .agg(dsum(l("l_extendedprice") * (lit(1) - l("l_discount"))).as("revenue"))
        .orderBy(col("revenue").desc, col("n_name").asc)
    }),
    // Range (non-equi band) join: fact rows matched to a broadcast band
    // table by value interval — broadcast nested-loop with 3 bands, never
    // a shuffle of the fact side.
    "join_range" -> ((s, dir) => {
      import s.implicits._
      val l = Tables(s, dir, "lineitem")
      val bands = Seq(("low", 0.0, 10.0), ("mid", 10.0, 30.0), ("high", 30.0, 51.0))
        .toDF("band", "lo", "hi")
      l.join(broadcast(bands), l("l_quantity") >= col("lo") && l("l_quantity") < col("hi"))
        .groupBy("band")
        .agg(count(lit(1)).as("n_items"), dsum(l("l_extendedprice")).as("sum_price"))
        .orderBy("band")
    }),
    // TPC-H Q10: returned-item losses per customer, top 20. Same join/
    // aggregate shape as Q3 with the nation dim broadcast.
    "q10_returned_items" -> ((s, dir) => {
      val c = Tables(s, dir, "customer")
      val o = Tables(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1996-04-01").cast("timestamp"))
      val l = Tables(s, dir, "lineitem").filter(col("l_returnflag") === "R")
      val n = Tables(s, dir, "nation")
      c.join(o, c("c_custkey") === o("o_custkey"))
        .join(l, o("o_orderkey") === l("l_orderkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(dsum(l("l_extendedprice") * (lit(1) - l("l_discount"))).as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey").asc)
        .limit(20)
    }),
    // IGNORE NULLS window navigation (gap-filling / carry-forward — the
    // sibling of the as-of join): last non-null value per order so far.
    "window_ignore_nulls" -> ((s, dir) => {
      val l = Tables(s, dir, "lineitem").filter(col("l_orderkey") < 2000)
      val x = when(col("l_returnflag") === "N", lit(null)).otherwise(col("l_extendedprice"))
      val w = Window.partitionBy("l_orderkey").orderBy("l_linenumber")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      l.select(col("l_orderkey"), col("l_linenumber"), x.as("x"))
        .withColumn("carried", last(col("x"), ignoreNulls = true).over(w))
        .orderBy("l_orderkey", "l_linenumber")
    }),
    // Bitwise expression family (&, |, xor, shifts, popcount).
    "expr_bitwise" -> ((s, dir) => {
      val o = Tables(s, dir, "orders").filter(col("o_orderkey") < 2000)
      o.select(col("o_orderkey"),
          col("o_orderkey").bitwiseAND(lit(255L)).as("k_and"),
          col("o_orderkey").bitwiseOR(lit(4096L)).as("k_or"),
          col("o_orderkey").bitwiseXOR(col("o_custkey")).as("k_xor"),
          shiftleft(col("o_orderkey").bitwiseAND(lit(15L)), 2).as("k_shl"),
          shiftright(col("o_orderkey"), 3).as("k_shr"),
          bit_count(col("o_orderkey")).as("n_bits"))
        .orderBy("o_orderkey")
    }),
    // Exact second-moment statistics (variance / stddev / correlation)
    // from integer sums: quantities are integral, prices quantized ×100,
    // so every sum is an exact decimal in any order; the closed-form
    // moments are then one fixed IEEE expression — unlike native
    // corr()/stddev(), whose float accumulation is order-dependent and
    // can never hash-match across engines (§4 discipline at work).
    "agg_stats_exact" -> ((s, dir) => {
      val l = Tables(s, dir, "lineitem")
      // floor before the decimal cast: double→decimal rounding modes
      // differ across engines, floor of an integral-valued double doesn't
      val x = col("l_quantity").cast("decimal(18,0)")
      val y = floor(col("l_extendedprice") * 100 + 0.5).cast("decimal(18,0)")
      val g = l.select(col("l_returnflag"), x.as("x"), y.as("y"))
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          sum(col("x")).cast("double").as("sx"),
          sum(col("y")).cast("double").as("sy"),
          sum((col("x") * col("x")).cast("decimal(38,0)")).cast("double").as("sxx"),
          sum((col("y") * col("y")).cast("decimal(38,0)")).cast("double").as("syy"),
          sum((col("x") * col("y")).cast("decimal(38,0)")).cast("double").as("sxy"))
      val n = col("n").cast("double")
      g.select(col("l_returnflag"), col("n"),
          ((col("sxx") * n - col("sx") * col("sx")) / (n * (n - 1))).as("var_x"),
          sqrt((col("sxx") * n - col("sx") * col("sx")) / (n * (n - 1))).as("stddev_x"),
          ((col("sxy") * n - col("sx") * col("sy")) /
            sqrt((col("sxx") * n - col("sx") * col("sx")) *
              (col("syy") * n - col("sy") * col("sy")))).as("corr_xy"))
        .orderBy("l_returnflag")
    }),
    // Event-time range join (the batch-parity form of the stream-stream
    // join): clicks within the hour before each purchase, same user.
    // The equi-key (user_id) makes this a hash join with the time range
    // as a residual predicate — per-user state only, never a time-cross
    // product (at stream runtime the same shape is the watermark-bounded
    // interval join in StreamingSpec).
    "join_event_range" -> ((s, dir) => {
      val e = Tables(s, dir, "events")
      val clicks = e.filter(col("event_type") === "click")
        .select(col("user_id").as("cu"), col("ts").as("cts"))
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      purchases.join(clicks,
          col("user_id") === col("cu") &&
            col("cts") >= col("ts") - expr("INTERVAL 1 HOUR") &&
            col("cts") <= col("ts"),
          "left")
        .groupBy("event_id", "user_id")
        .agg(count(col("cts")).as("n_clicks_1h"))
        .orderBy("event_id")
    }),
    // TPC-H Q7: trade volume between two nation pairs by ship year. Both
    // nation dims broadcast twice (supplier side, customer side); the
    // two fact joins shuffle on their natural keys; the pair filter
    // applies right after the broadcasts so the fact side shrinks early.
    "q7_nation_volume" -> ((s, dir) => {
      val l = Tables(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      val o = Tables(s, dir, "orders")
      val su = Tables(s, dir, "supplier")
      val c = Tables(s, dir, "customer")
      val n1 = Tables(s, dir, "nation").select(
        col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
      val n2 = Tables(s, dir, "nation").select(
        col("n_nationkey").as("cn_key"), col("n_name").as("cust_nation"))
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(su, l("l_suppkey") === su("s_suppkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(n1), su("s_nationkey") === col("sn_key"))
        .join(broadcast(n2), c("c_nationkey") === col("cn_key"))
        .filter((col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
          (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(l("l_shipdate")).as("l_year"))
        .agg(dsum(l("l_extendedprice") * (lit(1) - l("l_discount"))).as("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    }),
    // TPC-H Q18: large-volume customers — the shuffle-heavy "aggregate a
    // fact table, then join the aggregate back" shape. The pre-aggregation
    // shrinks lineitem ~4x before the join; both joins shuffle on their
    // natural keys; top-100 collapses to TakeOrderedAndProject.
    "q18_large_orders" -> ((s, dir) => {
      val l = Tables(s, dir, "lineitem")
      val big = l.groupBy("l_orderkey")
        .agg(dsum(l("l_quantity")).as("total_qty"))
        .filter(col("total_qty") > 150)
      val o = Tables(s, dir, "orders")
      val c = Tables(s, dir, "customer")
      c.join(o, c("c_custkey") === o("o_custkey"))
        .join(big, o("o_orderkey") === big("l_orderkey"))
        .select(c("c_name"), c("c_custkey"), o("o_orderkey"), o("o_orderdate"),
          o("o_totalprice"), col("total_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderdate").asc,
          col("o_orderkey").asc)
        .limit(100)
    }),
    // UNPIVOT (wide metrics -> long form): one Expand over the aggregate,
    // no extra shuffle beyond the group-by.
    "agg_unpivot" -> ((s, dir) => {
      val o = Tables(s, dir, "orders")
      o.groupBy("o_orderstatus")
        .agg(dsum(o("o_totalprice")).as("sum_price"),
          min("o_totalprice").as("min_price"),
          max("o_totalprice").as("max_price"))
        .unpivot(Array(col("o_orderstatus")),
          Array(col("sum_price"), col("min_price"), col("max_price")),
          "metric", "value")
        .orderBy("o_orderstatus", "metric")
    }),
    // String aggregation (listagg/string_agg): deterministic via
    // sort-before-join (array_sort + array_join == ORDER BY inside the agg).
    "agg_listagg" -> ((s, dir) => {
      val n = Tables(s, dir, "nation")
      val r = Tables(s, dir, "region")
      n.join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy("r_name")
        .agg(array_join(array_sort(collect_list(col("n_name"))), ",").as("nations"),
          count(lit(1)).as("n_nations"))
        .orderBy("r_name")
    }),
    // Explicit GROUPING SETS (beyond rollup/cube): three chosen groupings.
    "agg_grouping_sets" -> ((s, dir) => {
      Tables(s, dir, "orders").createOrReplaceTempView("g_orders_gs")
      s.sql(
        """SELECT
          |  CASE WHEN grouping(o_orderstatus) = 1 THEN '(all)' ELSE o_orderstatus END AS status,
          |  CASE WHEN grouping(o_orderpriority) = 1 THEN '(all)' ELSE o_orderpriority END AS priority,
          |  count(*) AS n,
          |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
          |FROM g_orders_gs
          |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority),
          |                        (o_orderstatus, o_orderpriority))
          |ORDER BY status, priority""".stripMargin)
    }),
  )

  def oracle: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / count(l_quantity) AS avg_qty,
        |  count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "agg_multi" ->
      """SELECT o_orderpriority, count(*) AS n_orders,
        |  min(o_totalprice) AS min_price, max(o_totalprice) AS max_price,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price,
        |  count(DISTINCT o_custkey) AS n_customers
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "agg_distinct" ->
      """SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts,
        |  count(DISTINCT l_suppkey) AS n_supps
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "join_shuffle" ->
      """SELECT o_orderstatus,
        |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |  count(*) AS n_items
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "join_broadcast" ->
      """SELECT r_name, n_name, count(*) AS n_customers,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS sum_bal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin,
    "join_outer" ->
      """SELECT c_custkey, count(o_orderkey) AS n_orders
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin,
    "join_full_outer" ->
      """WITH c AS (SELECT c_custkey, c_name FROM customer WHERE c_custkey % 3 <> 0),
        |o AS (SELECT o_custkey, count(*) AS n_orders FROM orders
        |      WHERE o_custkey % 3 <> 1 GROUP BY o_custkey)
        |SELECT coalesce(c_custkey, o_custkey) AS key, c_name, n_orders
        |FROM c FULL OUTER JOIN o ON c_custkey = o_custkey
        |ORDER BY key""".stripMargin,
    "join_semi" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_totalprice > 300000)
        |ORDER BY c_custkey""".stripMargin,
    "join_anti" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "sort_multi" ->
      """SELECT p_partkey, p_brand, p_size, p_retailprice FROM part
        |ORDER BY p_brand ASC, p_retailprice DESC, p_partkey ASC""".stripMargin,
    "topn" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 50""".stripMargin,
    "window_rank" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    CAST(row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey ASC) AS INTEGER) AS rn
        |  FROM orders) t
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,
    "window_running" ->
      """SELECT user_id, event_id,
        |  CAST(sum(CAST(value AS DECIMAL(18,4))) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS DOUBLE) AS running_value
        |FROM events ORDER BY user_id, event_id""".stripMargin,
    "window_ranks" ->
      """SELECT o_orderpriority, o_orderkey,
        |  CAST(dense_rank() OVER w AS INTEGER) AS drank,
        |  percent_rank() OVER w AS prank,
        |  CAST(ntile(4) OVER w AS INTEGER) AS quartile,
        |  cume_dist() OVER w AS cdist
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderpriority
        |             ORDER BY o_totalprice DESC, o_orderkey ASC)
        |QUALIFY dense_rank() OVER w <= 20
        |ORDER BY o_orderpriority, drank, o_orderkey""".stripMargin,
    "window_lead_lag" ->
      """SELECT user_id, event_id,
        |  lag(event_id, 1) OVER w AS prev_event,
        |  lead(event_id, 1) OVER w AS next_event,
        |  first_value(event_id) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_event,
        |  epoch_us(ts) - lag(epoch_us(ts), 1) OVER w AS gap_us
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
        |QUALIFY user_id < 10
        |ORDER BY user_id, event_id""".stripMargin,
    "window_range_frame" ->
      """SELECT o_orderpriority, o_orderkey, o_totalprice,
        |  count(*) OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice
        |    RANGE BETWEEN 1000 PRECEDING AND 1000 FOLLOWING) AS n_nearby
        |FROM orders
        |QUALIFY o_orderkey < 2000
        |ORDER BY o_orderpriority, o_orderkey""".stripMargin,
    "agg_cube" ->
      """SELECT
        |  CASE WHEN grouping(o_orderstatus) = 1 THEN '(all)' ELSE o_orderstatus END AS status,
        |  CASE WHEN grouping(o_orderpriority) = 1 THEN '(all)' ELSE o_orderpriority END AS priority,
        |  count(*) AS n
        |FROM orders
        |GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY status, priority""".stripMargin,
    "agg_rollup" ->
      """SELECT
        |  CASE WHEN grouping(r_name) = 1 THEN '(all)' ELSE r_name END AS region,
        |  CASE WHEN grouping(n_name) = 1 THEN '(all)' ELSE n_name END AS nation,
        |  count(*) AS n_customers
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP (r_name, n_name)
        |ORDER BY region, nation""".stripMargin,
    "agg_having" ->
      """SELECT l_partkey, count(*) AS n_items,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
        |FROM lineitem GROUP BY l_partkey HAVING count(*) >= 20
        |ORDER BY l_partkey""".stripMargin,
    "subquery_scalar" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |WHERE o_totalprice > (SELECT max(o_totalprice) * 0.9 FROM orders)
        |ORDER BY o_orderkey""".stripMargin,
    "set_union" ->
      """SELECT v, count(*) AS n FROM (
        |  SELECT event_type AS v FROM events
        |  UNION ALL
        |  SELECT o_orderpriority AS v FROM orders) t
        |GROUP BY v ORDER BY v""".stripMargin,
    "set_intersect_except" ->
      """SELECT k, 'both' AS src FROM
        |  (SELECT c_custkey AS k FROM customer INTERSECT SELECT o_custkey FROM orders) t1
        |UNION ALL
        |SELECT k, 'customer_only' AS src FROM
        |  (SELECT c_custkey AS k FROM customer EXCEPT SELECT o_custkey FROM orders) t2
        |ORDER BY src, k""".stripMargin,
    "expr_case" ->
      """SELECT CASE WHEN o_totalprice > 300000 THEN 'high'
        |            WHEN o_totalprice > 100000 THEN 'mid'
        |            ELSE 'low' END AS bucket, count(*) AS n
        |FROM orders GROUP BY 1 ORDER BY bucket""".stripMargin,
    "expr_cond" ->
      """SELECT l_orderkey, l_linenumber,
        |  coalesce(nullif(l_returnflag, 'N'), 'none') AS flag_or_none,
        |  least(l_quantity, l_discount * 100) AS least_v,
        |  greatest(l_quantity, 25.0) AS greatest_v,
        |  CASE WHEN nullif(l_linestatus, 'O') IS NOT NULL
        |       THEN 'closed' ELSE 'open' END AS status_kind
        |FROM lineitem WHERE l_orderkey < 500
        |ORDER BY l_orderkey, l_linenumber, least_v""".stripMargin,
    "expr_datemath" ->
      """SELECT o_orderkey,
        |  CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '1999-01-01') AS INTEGER) AS days_to_1999,
        |  strftime(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY, '%Y-%m-%d') AS plus30,
        |  strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end,
        |  CAST(day(o_orderdate) AS INTEGER) AS dom,
        |  CAST(quarter(o_orderdate) AS INTEGER) AS qtr
        |FROM orders WHERE o_orderkey < 2000
        |ORDER BY o_orderkey""".stripMargin,
    "agg_median" ->
      """SELECT o_orderpriority,
        |  quantile_cont(o_totalprice, 0.5) AS median_price,
        |  quantile_cont(o_totalprice, 0.9) AS p90_price
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "expr_scalar" ->
      """SELECT p_partkey, upper(p_brand) AS brand_u,
        |  substring(p_name, 1, 8) AS name_pfx,
        |  CAST(length(p_name) AS INTEGER) AS name_len,
        |  concat_ws('-', p_brand, p_type) AS brand_type,
        |  round(p_retailprice) AS price_round,
        |  CAST(floor(p_retailprice / 100) AS BIGINT) AS price_bucket,
        |  CAST(abs(p_size - 25) AS INTEGER) AS size_dist,
        |  p_partkey % 7 AS key_mod
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q6_forecast" ->
      """SELECT CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(24,6)))
        |         AS DOUBLE) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin,
    "q4_priority" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders o
        |WHERE o_orderdate >= TIMESTAMP '1996-07-01' AND o_orderdate < TIMESTAMP '1996-10-01'
        |  AND EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey
        |              AND l.l_shipdate >= o.o_orderdate + INTERVAL 60 DAY)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q12_shipmode" ->
      """SELECT l_linestatus,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |           THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |           THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
        |GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin,
    "q14_promo" ->
      """SELECT CAST(sum(CASE WHEN p_type = 'PROMO'
        |           THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(24,6))
        |           ELSE CAST(0 AS DECIMAL(24,6)) END) AS DOUBLE) * 100.0
        |       / CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(24,6)))
        |           AS DOUBLE) AS promo_revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1996-03-01' AND l_shipdate < TIMESTAMP '1996-04-01'""".stripMargin,
    "q3_shipping" ->
      """SELECT l_orderkey, o_orderdate, o_orderpriority,
        |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1997-06-01'
        |  AND l_shipdate > TIMESTAMP '1997-06-01'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, l_orderkey ASC LIMIT 10""".stripMargin,
    "q5_local_supplier" ->
      """SELECT n_name,
        |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name ASC""".stripMargin,
    "join_range" ->
      """SELECT band, count(*) AS n_items,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
        |FROM lineitem
        |JOIN (VALUES ('low', 0.0, 10.0), ('mid', 10.0, 30.0), ('high', 30.0, 51.0))
        |  b(band, lo, hi) ON l_quantity >= lo AND l_quantity < hi
        |GROUP BY band ORDER BY band""".stripMargin,
    "q10_returned_items" ->
      """SELECT c_custkey, c_name, n_name,
        |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1996-04-01'
        |  AND l_returnflag = 'R'
        |GROUP BY c_custkey, c_name, n_name
        |ORDER BY revenue DESC, c_custkey ASC LIMIT 20""".stripMargin,
    "window_ignore_nulls" ->
      """SELECT l_orderkey, l_linenumber,
        |  CASE WHEN l_returnflag = 'N' THEN NULL ELSE l_extendedprice END AS x,
        |  last_value(CASE WHEN l_returnflag = 'N' THEN NULL ELSE l_extendedprice END
        |    IGNORE NULLS) OVER (
        |    PARTITION BY l_orderkey ORDER BY l_linenumber
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS carried
        |FROM lineitem WHERE l_orderkey < 2000
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "expr_bitwise" ->
      """SELECT o_orderkey,
        |  o_orderkey & 255 AS k_and,
        |  o_orderkey | 4096 AS k_or,
        |  xor(o_orderkey, o_custkey) AS k_xor,
        |  (o_orderkey & 15) << 2 AS k_shl,
        |  o_orderkey >> 3 AS k_shr,
        |  CAST(bit_count(o_orderkey) AS INTEGER) AS n_bits
        |FROM orders WHERE o_orderkey < 2000
        |ORDER BY o_orderkey""".stripMargin,
    "agg_stats_exact" ->
      """WITH q AS (
        |  SELECT l_returnflag,
        |    CAST(l_quantity AS DECIMAL(18,0)) AS x,
        |    CAST(floor(l_extendedprice * 100 + 0.5) AS DECIMAL(18,0)) AS y
        |  FROM lineitem),
        |s AS (
        |  SELECT l_returnflag, count(*) AS n,
        |    CAST(sum(x) AS DOUBLE) AS sx, CAST(sum(y) AS DOUBLE) AS sy,
        |    CAST(sum(CAST(x * x AS DECIMAL(38,0))) AS DOUBLE) AS sxx,
        |    CAST(sum(CAST(y * y AS DECIMAL(38,0))) AS DOUBLE) AS syy,
        |    CAST(sum(CAST(x * y AS DECIMAL(38,0))) AS DOUBLE) AS sxy
        |  FROM q GROUP BY 1)
        |SELECT l_returnflag, n,
        |  (sxx * n - sx * sx) / (n * (n - 1)) AS var_x,
        |  sqrt((sxx * n - sx * sx) / (n * (n - 1))) AS stddev_x,
        |  (sxy * n - sx * sy)
        |    / sqrt((sxx * n - sx * sx) * (syy * n - sy * sy)) AS corr_xy
        |FROM s ORDER BY l_returnflag""".stripMargin,
    "join_event_range" ->
      """WITH c AS (
        |  SELECT user_id AS cu, ts AS cts FROM events WHERE event_type = 'click'),
        |p AS (
        |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase')
        |SELECT event_id, user_id, count(cts) AS n_clicks_1h
        |FROM p LEFT JOIN c
        |  ON user_id = cu AND cts >= ts - INTERVAL 1 HOUR AND cts <= ts
        |GROUP BY event_id, user_id
        |ORDER BY event_id""".stripMargin,
    "q7_nation_volume" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |  CAST(year(l_shipdate) AS INTEGER) AS l_year,
        |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-01-01'
        |  AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        |    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        |GROUP BY 1, 2, 3
        |ORDER BY supp_nation, cust_nation, l_year""".stripMargin,
    "q18_large_orders" ->
      """SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, total_qty
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN (SELECT l_orderkey,
        |        CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS total_qty
        |      FROM lineitem GROUP BY 1
        |      HAVING CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) > 150
        |     ) b ON o_orderkey = b.l_orderkey
        |ORDER BY o_totalprice DESC, o_orderdate ASC, o_orderkey ASC
        |LIMIT 100""".stripMargin,
    "agg_unpivot" ->
      """WITH b AS (
        |  SELECT o_orderstatus,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price,
        |    min(o_totalprice) AS min_price,
        |    max(o_totalprice) AS max_price
        |  FROM orders GROUP BY 1)
        |SELECT o_orderstatus, 'sum_price' AS metric, sum_price AS value FROM b
        |UNION ALL
        |SELECT o_orderstatus, 'min_price' AS metric, min_price AS value FROM b
        |UNION ALL
        |SELECT o_orderstatus, 'max_price' AS metric, max_price AS value FROM b
        |ORDER BY o_orderstatus, metric""".stripMargin,
    "agg_listagg" ->
      """SELECT r_name,
        |  string_agg(n_name, ',' ORDER BY n_name) AS nations,
        |  count(*) AS n_nations
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,
    "agg_grouping_sets" ->
      """SELECT
        |  CASE WHEN grouping(o_orderstatus) = 1 THEN '(all)' ELSE o_orderstatus END AS status,
        |  CASE WHEN grouping(o_orderpriority) = 1 THEN '(all)' ELSE o_orderpriority END AS priority,
        |  count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority),
        |                        (o_orderstatus, o_orderpriority))
        |ORDER BY status, priority""".stripMargin,
  )
}
