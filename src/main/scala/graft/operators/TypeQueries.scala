package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.sources.Tables

/**
 * Type-matrix coverage — the Spark-native counterpart of the reference's
 * type mapping (TrinoTypeUtils.java:69–275) and decimal encode/decode
 * (DecimalUtils.java): decimal arithmetic, date/timestamp extraction,
 * array, struct, and binary round-trips, each hash-checked against DuckDB.
 */
object TypeQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Decimal: exact fixed-point aggregation of the TPC-H "charge"
    // expression; one decimal rendered as string to pin scale semantics.
    "types_decimal" -> ((s, dir) => {
      val l = Tables(s, dir, "lineitem")
      l.groupBy("l_returnflag")
        .agg(
          // 2dp price × 2dp discount × 2dp tax has ≤6 exact decimals: cast at
          // scale 6 so no engine ever rounds at a ….50 boundary (SURVEY §4).
          sum((l("l_extendedprice") * (lit(1) - l("l_discount")) * (lit(1) + l("l_tax")))
            .cast(DecimalType(24, 6))).cast("double").as("sum_charge"),
          sum(l("l_quantity").cast(DecimalType(18, 4))).cast(DecimalType(18, 1))
            .cast("string").as("sum_qty_str"))
        .orderBy("l_returnflag")
    }),
    "types_datetime" -> ((s, dir) => {
      val o = Tables(s, dir, "orders")
      o.groupBy(
          year(o("o_orderdate")).as("y"),
          month(o("o_orderdate")).as("m"))
        .agg(
          count(lit(1)).as("n_orders"),
          date_format(min(to_date(o("o_orderdate"))), "yyyy-MM-dd").as("first_day"),
          date_format(max(to_date(date_trunc("month", o("o_orderdate")))), "yyyy-MM-dd")
            .as("month_start"))
        .orderBy("y", "m")
    }),
    // Higher-order array lambdas (filter/transform/aggregate/exists) —
    // all codegen-friendly scan-stage expressions, zero shuffle.
    "expr_lambda" -> ((s, dir) => {
      val d = Tables(s, dir, "documents")
      val toks = regexp_extract_all(d("text"), lit("[a-z]+"), lit(0))
      d.select(
          d("doc_id"),
          size(filter(toks, t => length(t) > 5)).as("n_long"),
          aggregate(transform(toks, t => length(t)), lit(0), (a, x) => a + x)
            .as("total_len"),
          exists(toks, t => t === "the").as("has_the"))
        .orderBy("doc_id")
    }),
    "types_array" -> ((s, dir) => {
      val d = Tables(s, dir, "documents")
      val toks = regexp_extract_all(d("text"), lit("[a-z]+"), lit(0))
      d.select(
          d("doc_id"),
          size(toks).as("n_tokens"),
          size(array_distinct(toks)).as("n_distinct"),
          element_at(toks, 1).as("first_tok"),
          element_at(toks, -1).as("last_tok"),
          array_contains(toks, "spark").as("has_spark"),
          array_join(slice(sort_array(array_distinct(toks)), 1, 5), ",").as("top5_alpha"))
        .orderBy("doc_id")
    }),
    // Struct: build a typed row, then project fields back out (flat output).
    "types_struct" -> ((s, dir) => {
      val c = Tables(s, dir, "customer")
      c.select(c("c_custkey"),
          struct(c("c_name").as("name"), c("c_acctbal").as("bal"),
            c("c_mktsegment").as("seg")).as("info"))
        .select(
          col("c_custkey"),
          col("info.name").as("name"),
          col("info.bal").as("bal"),
          upper(col("info.seg")).as("seg_u"))
        .orderBy("c_custkey")
    }),
    // Map: build map<string,string>, then element access, keys/values, and
    // cardinality back out as flat columns (TrinoTypeUtils.java:236 map cell).
    "types_map" -> ((s, dir) => {
      val c = Tables(s, dir, "customer")
      c.select(c("c_custkey"),
          map(lit("seg"), c("c_mktsegment"),
            lit("nation"), c("c_nationkey").cast("string")).as("m"))
        .select(
          col("c_custkey"),
          element_at(col("m"), "seg").as("seg_val"),
          element_at(col("m"), "nation").as("nation_val"),
          size(col("m")).as("n_entries"),
          array_join(map_keys(col("m")), ",").as("keys_csv"),
          array_join(map_values(col("m")), ",").as("vals_csv"))
        .orderBy("c_custkey")
    }),
    "types_binary" -> ((s, dir) => {
      val d = Tables(s, dir, "documents")
      val bin = d("text").cast("binary")
      d.select(
          d("doc_id"),
          length(bin).as("n_bytes"),
          md5(bin).as("digest"),
          base64(substring(d("text"), 1, 12).cast("binary")).as("head_b64"))
        .orderBy("doc_id")
    }),
  )

  def oracle: Map[String, String] = Map(
    "types_decimal" ->
      """SELECT l_returnflag,
        |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax)
        |        AS DECIMAL(24,6))) AS DOUBLE) AS sum_charge,
        |  CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DECIMAL(18,1))
        |        AS VARCHAR) AS sum_qty_str
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "types_datetime" ->
      """SELECT CAST(year(o_orderdate) AS INTEGER) AS y,
        |  CAST(month(o_orderdate) AS INTEGER) AS m,
        |  count(*) AS n_orders,
        |  strftime(min(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS first_day,
        |  strftime(max(CAST(date_trunc('month', o_orderdate) AS DATE)), '%Y-%m-%d') AS month_start
        |FROM orders GROUP BY 1, 2 ORDER BY y, m""".stripMargin,
    "expr_lambda" ->
      """WITH t AS (
        |  SELECT doc_id, regexp_extract_all(text, '[a-z]+') AS toks FROM documents)
        |SELECT doc_id,
        |  CAST(len(list_filter(toks, t -> length(t) > 5)) AS INTEGER) AS n_long,
        |  CAST(coalesce(list_sum(list_transform(toks, t -> length(t))), 0)
        |    AS INTEGER) AS total_len,
        |  list_contains(toks, 'the') AS has_the
        |FROM t ORDER BY doc_id""".stripMargin,
    "types_array" ->
      """SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, '[a-z]+')) AS INTEGER) AS n_tokens,
        |  CAST(len(list_distinct(regexp_extract_all(text, '[a-z]+'))) AS INTEGER) AS n_distinct,
        |  regexp_extract_all(text, '[a-z]+')[1] AS first_tok,
        |  regexp_extract_all(text, '[a-z]+')[-1] AS last_tok,
        |  list_contains(regexp_extract_all(text, '[a-z]+'), 'spark') AS has_spark,
        |  array_to_string(list_sort(list_distinct(regexp_extract_all(text, '[a-z]+')))[1:5], ',') AS top5_alpha
        |FROM documents ORDER BY doc_id""".stripMargin,
    "types_struct" ->
      """SELECT c_custkey,
        |  struct_extract(info, 'name') AS name,
        |  struct_extract(info, 'bal') AS bal,
        |  upper(struct_extract(info, 'seg')) AS seg_u
        |FROM (SELECT c_custkey, struct_pack(name := c_name, bal := c_acctbal,
        |             seg := c_mktsegment) AS info
        |      FROM customer) t ORDER BY c_custkey""".stripMargin,
    "types_map" ->
      """SELECT c_custkey,
        |  (m['seg'])[1] AS seg_val,
        |  (m['nation'])[1] AS nation_val,
        |  CAST(cardinality(m) AS INTEGER) AS n_entries,
        |  array_to_string(map_keys(m), ',') AS keys_csv,
        |  array_to_string(map_values(m), ',') AS vals_csv
        |FROM (SELECT c_custkey,
        |        MAP {'seg': c_mktsegment, 'nation': CAST(c_nationkey AS VARCHAR)} AS m
        |      FROM customer) t
        |ORDER BY c_custkey""".stripMargin,
    "types_binary" ->
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
        |  md5(text) AS digest,
        |  base64(encode(substring(text, 1, 12))) AS head_b64
        |FROM documents ORDER BY doc_id""".stripMargin,
  )
}
