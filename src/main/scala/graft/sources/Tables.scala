package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/**
 * Parquet table access — the Spark-native analog of the reference's read
 * path (TrinoPageSourceBase.java / TrinoSplitManagerBase.java). Instead of
 * hand-built splits and page sources, we declare the scan via
 * `spark.read.parquet` and let Catalyst + the vectorized parquet reader do
 * split planning, filter/projection pushdown, and columnar decode.
 */
object Tables {

  /** Load table `name` from scale-factor dir `dir` (e.g. /root/testdata/sf0.01). */
  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    // events.parquet carries TIMESTAMP(NANOS) which the vectorized parquet
    // reader rejects; read nanos as long and expose both a µs-truncated
    // timestamp `ts` and the exact `ts_ns` (for ns-precise ordering parity
    // with engines that keep full nanos).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events")
      df.withColumn("ts_ns", col("ts"))
        .withColumn("ts", expr("timestamp_micros(ts div 1000)")) // integer div: doubles lose ns precision at 2024 epoch-nanos magnitude
    else df
  }

  /**
   * Deterministic double aggregation for DuckDB hash-parity: sum in exact
   * decimal (order-independent), then one IEEE cast back to double.
   * See SURVEY.md §4.
   */
  def dsum(c: Column): Column = sum(c.cast(DecimalType(18, 4))).cast("double")

  /** Deterministic avg: exact decimal sum as double, divided by exact count. */
  def davg(c: Column): Column = dsum(c) / count(c)
}
