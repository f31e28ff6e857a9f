package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.sources.Tables
import graft.streaming.EventStreams

/**
 * Batch-parity registrations of the streaming transforms: the exact
 * DataFrame functions StreamingSpec drives through readStream are run here
 * in batch mode and hash-checked against DuckDB.
 */
object StreamQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stream_window" -> ((s, dir) =>
      EventStreams.windowedCounts(Tables(s, dir, "events"))
        .orderBy("window_start_epoch", "event_type")),
    "stream_sessions" -> ((s, dir) =>
      EventStreams.sessionizeBatch(Tables(s, dir, "events"), gapMinutes = 30)
        .orderBy("user_id", "session_id")),
  )

  def oracle: Map[String, String] = Map(
    "stream_window" ->
      """SELECT CAST(epoch(time_bucket(INTERVAL 1 HOUR, ts)) AS BIGINT) AS window_start_epoch,
        |  event_type, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY window_start_epoch, event_type""".stripMargin,
    "stream_sessions" ->
      """WITH w AS (
        |  SELECT user_id, event_id, value, epoch_us(ts) AS ts_us,
        |    lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev_us
        |  FROM events),
        |b AS (
        |  SELECT *, CASE WHEN prev_us IS NULL OR ts_us - prev_us > 1800000000 THEN 1 ELSE 0 END AS brk
        |  FROM w),
        |sid AS (
        |  SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        |  FROM b)
        |SELECT user_id, CAST(session_id AS BIGINT) AS session_id, count(*) AS n_events,
        |  CAST(min(ts_us) // 1000 AS BIGINT) AS start_ms,
        |  CAST(max(ts_us) // 1000 AS BIGINT) AS end_ms,
        |  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
        |FROM sid GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin,
  )
}
