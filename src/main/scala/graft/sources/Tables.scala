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
    // events.parquet has shipped with two physical `ts` encodings across
    // testdata generations: TIMESTAMP(NANOS) (read as long via the legacy
    // flag — the vectorized reader rejects nanos) and plain µs timestamps
    // (read natively, NTZ when unadjusted). Normalize both to the same
    // logical surface: `ts` TIMESTAMP (µs) + exact `ts_ns` BIGINT. The
    // legacy flag is session-wide, so it is only touched for the one
    // table that needs it (and only when not already set).
    if (name == "events") {
      if (spark.conf.getOption(NanosAsLong).forall(_ != "true"))
        spark.conf.set(NanosAsLong, "true")
      val raw = spark.read.parquet(s"$dir/$name.parquet")
      raw.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType => // nanos-as-long file
          raw.withColumn("ts_ns", col("ts"))
            .withColumn("ts", expr("timestamp_micros(ts div 1000)")) // integer div: doubles lose ns precision at 2024 epoch-nanos magnitude
        case org.apache.spark.sql.types.TimestampNTZType =>
          // the NTZ→TZ cast is only value-preserving under UTC (same
          // micros DuckDB sees in the file) — fail loudly on a
          // misconfigured session instead of silently shifting ts/ts_ns
          val tz = spark.conf.get("spark.sql.session.timeZone")
          require(tz == "UTC",
            s"events NTZ timestamps require spark.sql.session.timeZone=UTC (got $tz): the ts cast would shift values against the oracle")
          raw.withColumn("ts", col("ts").cast("timestamp"))
            .withColumn("ts_ns", expr("unix_micros(ts) * 1000"))
        case _ => // already a µs timestamp
          raw.withColumn("ts_ns", expr("unix_micros(ts) * 1000"))
      }
    } else spark.read.parquet(s"$dir/$name.parquet")
  }

  private val NanosAsLong = "spark.sql.legacy.parquet.nanosAsLong"

  /**
   * Ensure at least default-parallelism partitions for compute-bound
   * per-row stages (hashing, signatures, winnowing). Small tables arrive
   * as one file split and would otherwise serialize the kernel work on a
   * single core; at cluster scale real tables have many splits and this
   * is a no-op.
   */
  def spread(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
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
