package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.DecimalType

/**
 * Streaming surface over the `events` table shape
 * (event_id, ts, user_id, event_type, value[, ts_ns]).
 *
 * The transforms are plain DataFrame functions, so the SAME code runs as a
 * batch query (oracle-checked in DuckDB) and under `readStream` with
 * watermarks (StreamingSpec drives it through MemoryStream). This is the
 * Structured Streaming idiom: one declarative plan, two execution modes.
 */
object EventStreams {

  case class Ev(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double)

  case class Session(user_id: Long, start_ms: Long, end_ms: Long,
      n_events: Int, total_value: Double)

  /** Open-session state for [[sessionizeStateful]] (public: the state
    * encoder's generated code must be able to construct it). */
  case class SessionState(start: Long, last: Long, n: Int, total: Double)

  /**
   * Tumbling 1-hour windowed aggregation with a 2-hour watermark. In batch
   * mode the watermark is a no-op and this is an ordinary group-by; in
   * streaming mode state is evicted once the watermark passes a window.
   */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 4))).cast("double").as("sum_value"))
      .select(
        unix_timestamp(col("window.start")).as("window_start_epoch"),
        col("event_type"), col("n"), col("sum_value"))

  /**
   * Streaming exact deduplication by event id: state is bounded by the
   * watermark horizon (ids older than the watermark are evicted). In batch
   * mode this degenerates to a plain dropDuplicates.
   */
  def dedupStream(events: DataFrame): DataFrame =
    events.withWatermark("ts", "1 hour").dropDuplicates("event_id")

  /**
   * Streaming NEAR-deduplication of documents: keep the first document
   * per 60-bit SimHash within the watermark horizon — boilerplate and
   * re-posted near-copies (same token multiset, tiny edits collapse to
   * the same simhash) are dropped as they stream in, the ingest-side
   * twin of the batch [[graft.operators.Dedup.simhashPairs]] family.
   * `dropDuplicatesWithinWatermark` keys state on the HASH (never the
   * text — 8 bytes/doc of state) and evicts entries once the watermark
   * passes, so state is bounded by the horizon's document count, not
   * the stream's. Expects (doc_id, ts, text) columns.
   */
  def nearDedupStream(docs: DataFrame, horizon: String = "1 hour"): DataFrame =
    docs
      .withColumn("__sim", graft.functions.TextHash.simhash60(
        graft.functions.TextHash.tokenHashes(col("text"))))
      .withWatermark("ts", horizon)
      .dropDuplicatesWithinWatermark("__sim")
      .drop("__sim")

  /**
   * Batch sessionization: a session breaks after `gapMinutes` of user
   * inactivity. lag + running-sum session ids — the declarative twin of
   * the stateful streaming version below, and SQL-expressible for the
   * oracle. Uses exact ns timestamps (`ts_ns`) for ordering parity.
   */
  def sessionizeBatch(events: DataFrame, gapMinutes: Int): DataFrame = {
    // µs precision throughout: DuckDB truncates parquet ns timestamps to µs
    // on read, so ns-exact gaps/ordering could disagree at µs boundaries.
    // Integer `div` everywhere — double division rounds up across integer
    // boundaries (engines would then disagree by 1 unit).
    val gapUs = gapMinutes * 60L * 1000000L
    val withUs = events.withColumn("ts_us", expr("ts_ns div 1000"))
    val byUser = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    val cume = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    withUs
      .withColumn("prev_us", lag("ts_us", 1).over(byUser))
      .withColumn("brk",
        when(col("prev_us").isNull || col("ts_us") - col("prev_us") > gapUs, 1)
          .otherwise(0))
      .withColumn("session_id", sum("brk").over(cume))
      .groupBy("user_id", "session_id")
      .agg(
        count(lit(1)).as("n_events"),
        expr("min(ts_us) div 1000").as("start_ms"),
        expr("max(ts_us) div 1000").as("end_ms"),
        sum(col("value").cast(DecimalType(18, 4))).cast("double").as("total_value"))
  }

  /**
   * Stream-stream inner join with event-time bounds: pair each user's
   * click with their first qualifying purchase within `withinMinutes`.
   * Both sides carry watermarks so join state is evicted once the range
   * condition can no longer match (Spark's watermark-bounded state).
   */
  def clickToPurchase(clickEvents: DataFrame, purchaseEvents: DataFrame,
      withinMinutes: Int): DataFrame = {
    val clicks = clickEvents.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", "1 hour")
    val purchases = purchaseEvents.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"), col("value").as("purchase_value"))
      .withWatermark("purchase_ts", "1 hour")
    clicks.join(purchases,
      col("c_user") === col("p_user") &&
        col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") <= col("click_ts") + expr(s"INTERVAL $withinMinutes MINUTES"))
      .select(col("c_user").as("user_id"), col("click_id"), col("purchase_id"),
        col("purchase_value"))
  }

  /**
   * Stateful streaming sessionization via flatMapGroupsWithState: per-user
   * state holds the open session; a new event either extends it or closes
   * it (emitting the finished session) and opens the next. State size is
   * O(active users); no timeout is used so results are deterministic for
   * tests (open sessions simply remain in state).
   */
  def sessionizeStateful(events: Dataset[Ev], gapMinutes: Int): Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapMs = gapMinutes * 60L * 1000L
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (user: Long, evs: Iterator[Ev], state: GroupState[SessionState]) =>
          val sorted = evs.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          val closed = Seq.newBuilder[Session]
          var cur = state.getOption
          sorted.foreach { e =>
            val t = e.ts.getTime
            cur match {
              case Some(s) if t - s.last <= gapMs =>
                cur = Some(s.copy(last = t, n = s.n + 1, total = s.total + e.value))
              case Some(s) =>
                closed += Session(user, s.start, s.last, s.n, s.total)
                cur = Some(SessionState(t, t, 1, e.value))
              case None =>
                cur = Some(SessionState(t, t, 1, e.value))
            }
          }
          cur.foreach(state.update)
          closed.result().iterator
      }
  }
}
