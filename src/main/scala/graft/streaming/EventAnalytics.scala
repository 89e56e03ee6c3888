package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Streaming analytics over the events shape (event_id, ts, user_id,
  * event_type, value) — the Structured Streaming surface of the engine
  * (SURVEY §2.8 streaming row: v2). Inputs are any streaming DataFrame
  * (readStream over parquet/commit-log/rate source); everything here
  * composes with `writeStream` sinks.
  */
object EventAnalytics {

  /** Watermarked sliding-window aggregation: counts + sums per
    * (window, event_type). The watermark bounds state: rows later than
    * `lateness` behind the max event time are dropped and windows older
    * than that are finalized and evicted — state stays O(active windows)
    * no matter how long the stream runs. */
  def windowedStats(events: DataFrame, windowLen: String = "1 hour",
                    lateness: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"),
        col("event_type"), col("n_events"), col("sum_value"))

  /** One user's running session state (driver-defined gap semantics). */
  final case class SessionState(count: Long, firstTs: Long, lastTs: Long)
  final case class SessionUpdate(user_id: Long, n_events: Long,
                                 duration_ms: Long, closed: Boolean)

  /** Stateful sessionization via mapGroupsWithState: per-user running
    * session, closed when `gapMs` passes without events (checked against
    * incoming batches). Custom state is exactly the
    * KeyValueGroupedDataset escape hatch the engine reserves for logic
    * windowed aggs can't express. */
  def sessionize(events: Dataset[(Long, Timestamp)], gapMs: Long): Dataset[SessionUpdate] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_._1)
      .mapGroupsWithState[SessionState, SessionUpdate](GroupStateTimeout.NoTimeout) {
        case (user, rows, state: GroupState[SessionState]) =>
          val times = rows.map(_._2.getTime).toVector.sorted
          val prev = state.getOption
          val merged = prev match {
            case Some(s) if times.head - s.lastTs <= gapMs =>
              SessionState(s.count + times.length, s.firstTs, times.last)
            case Some(_) => // gap exceeded: new session replaces the old
              SessionState(times.length, times.head, times.last)
            case None =>
              SessionState(times.length, times.head, times.last)
          }
          state.update(merged)
          SessionUpdate(user, merged.count, merged.lastTs - merged.firstTs,
            closed = false)
      }
  }
}
