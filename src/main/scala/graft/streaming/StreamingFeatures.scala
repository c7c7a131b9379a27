package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming extension (SURVEY §2.10/§7.6): the reference's
  * incremental append protocol (etl_turbofan.py:119-121 — micro-batch
  * unions) and polling dashboard become real streams here.
  *
  * Three building blocks, each a standard production shape:
  *  - [[eventStream]]: file-source ingest with an explicit schema (new
  *    parquet dropped into a directory = one micro-batch, the streaming
  *    mirror of the replace/append protocol);
  *  - [[windowedCounts]]: event-time tumbling windows with a watermark —
  *    bounded state at any scale;
  *  - [[runningFeatures]]: per-key running mean/count/max via
  *    mapGroupsWithState — the streaming twin of the batch window
  *    features (W1/W4 shapes) with O(keys) state.
  */
object StreamingFeatures {

  case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double)

  case class UserState(count: Long, sum: Double, max: Double)

  case class UserFeatures(user_id: Long, n_events: Long, mean_value: Double,
      max_value: Double)

  /** File-source ingest: schema must be explicit for streams. */
  def eventStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema("event_id LONG, ts TIMESTAMP, user_id LONG, " +
        "event_type STRING, value DOUBLE")
      .parquet(dir)

  /** Event-time tumbling window counts with a 10-minute watermark: late
    * data beyond the watermark is dropped and window state is evicted —
    * the property that keeps state bounded on an unbounded stream.
    */
  def windowedCounts(events: DataFrame,
      windowLen: String = "1 hour",
      watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("win_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Gap-based session aggregation on a stream: the streaming form of the
    * batch w12_session_window query. The watermark bounds session state —
    * a session closes (and its state is evicted) once the watermark
    * passes its end, which is what makes sessionization viable on an
    * unbounded stream.
    */
  def sessionCounts(events: DataFrame,
      gap: String = "24 hours",
      watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(col("user_id"),
        unix_micros(col("session_window.start")).as("start_us"),
        col("n_events"), col("sum_value"))

  /** Stream-stream interval join: each event joins the error events of
    * the same user within the trailing hour. Both sides carry watermarks
    * and the join condition bounds event-time distance, so Spark can
    * evict right-side state once the watermark passes ts + 1h — the
    * requirement for a stream-stream join to run with bounded state on
    * an unbounded stream.
    */
  def joinRecentErrors(events: DataFrame, errors: DataFrame,
      watermark: String = "10 minutes",
      joinType: String = "inner"): DataFrame = {
    import org.apache.spark.sql.functions.expr
    val e = events.withWatermark("ts", watermark).alias("e")
    val r = errors.withWatermark("ts", watermark).alias("r")
    // "left_outer" emits the unmatched (error_id null) row only once the
    // watermark proves no matching error can still arrive — the
    // completeness-vs-latency tradeoff every outer stream join makes.
    // "full_outer" additionally finalizes errors that never saw an event
    // (event_id null) when their join-window state is evicted; user_id is
    // coalesced so unmatched rows from either side keep their key.
    e.join(r,
      expr("e.user_id = r.user_id AND " +
        "r.ts BETWEEN e.ts - INTERVAL 1 HOUR AND e.ts"),
      joinType)
      .select(col("e.event_id").as("event_id"),
        coalesce(col("e.user_id"), col("r.user_id")).as("user_id"),
        col("r.event_id").as("error_id"),
        col("r.ts").as("error_ts"))
  }

  /** Stateful per-user running features: count/mean/max maintained in
    * GroupState — O(distinct users) state, updated per micro-batch.
    */
  def runningFeatures(events: Dataset[Event]): Dataset[UserFeatures] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .mapGroupsWithState[UserState, UserFeatures](
        GroupStateTimeout.NoTimeout) {
        case (uid, batch, state: GroupState[UserState]) =>
          val prev = state.getOption.getOrElse(UserState(0L, 0.0, Double.MinValue))
          val next = batch.foldLeft(prev) { (acc, e) =>
            UserState(acc.count + 1, acc.sum + e.value, math.max(acc.max, e.value))
          }
          state.update(next)
          UserFeatures(uid, next.count, next.sum / next.count, next.max)
      }
  }

  /** Convenience: drive a stream from `srcDir` into an in-memory table
    * and block until all available input is processed (test/dev entry).
    */
  def runWindowedToMemory(spark: SparkSession, srcDir: String,
      queryName: String): Unit = {
    val q = windowedCounts(eventStream(spark, srcDir))
      .writeStream.outputMode(OutputMode.Update())
      .format("memory").queryName(queryName).start()
    q.processAllAvailable()
    q.stop()
  }
}
