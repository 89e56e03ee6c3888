package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

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

  /** Streaming exact dedup for document ingest: one survivor per content
    * fingerprint (TextOps.fingerprint — normalized-prefix sha256, the
    * same key the batch `Dedup.exactGroups` uses) within the watermark
    * horizon. `dropDuplicatesWithinWatermark` keeps per-key state only
    * until the watermark passes the key's last-seen event time, so state
    * is O(distinct fingerprints per lateness window) — bounded for an
    * unbounded stream, where a plain `dropDuplicates` would grow
    * forever. The batch/stream pair gives the pipeline the same dedup
    * key end to end: stream-side trims the torrent, batch-side
    * `exactGroups` remains the authoritative global pass. */
  def dedupDocs(docs: DataFrame, tsCol: String = "ts",
                textCol: String = "text",
                lateness: String = "10 minutes"): DataFrame =
    docs.withColumn("fp", graft.ops.TextOps.fingerprint(col(textCol)))
      .withWatermark(tsCol, lateness)
      .dropDuplicatesWithinWatermark("fp")

  /** Batch sessionization — the relational twin of [[sessionize]] with
    * the same gap semantics (a gap STRICTLY greater than `gapUs` splits;
    * exactly the boundary merges, matching the streaming state's
    * `<= gapMs` merge): lag → new-session flag → running sum per user →
    * per-session aggregate. One window partitioned by user (high
    * cardinality → fully parallel; never a global window) and one
    * aggregation shuffle. `tieCol` makes the intra-user order total, so
    * same-microsecond events sessionize deterministically on any engine.
    * Emits (userCol, session_idx, n_events, duration_us). */
  def sessionizeBatch(events: DataFrame, gapUs: Long,
                      userCol: String = "user_id", tsUsCol: String = "us",
                      tieCol: String = "event_id"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(userCol)).orderBy(col(tsUsCol), col(tieCol))
    events
      .withColumn("__prev", lag(col(tsUsCol), 1).over(w))
      .withColumn("__new", when(col("__prev").isNull ||
        col(tsUsCol) - col("__prev") > gapUs, 1L).otherwise(0L))
      .withColumn("session_idx", sum(col("__new")).over(w))
      .groupBy(col(userCol), col("session_idx"))
      .agg(count(lit(1)).as("n_events"),
        (max(col(tsUsCol)) - min(col(tsUsCol))).as("duration_us"))
  }

  /** SESSION TRANSCRIPT ASSEMBLY — the dialog/interaction-sequence prep
    * step of a behavioral-training pipeline: per (user, session), the
    * event types concatenated in (ts, tie) order into one transcript
    * string ("view>click>purchase"), plus count and start time. The
    * session derivation is [[sessionizeBatch]]'s lag/sum window
    * verbatim.
    *
    * Scale shape: the same single partition-by-user exchange as
    * sessionizeBatch (the window and the group-by share it), then one
    * aggregation whose only wide value is the per-session event list —
    * bounded by the session gap semantics (a session is as long as its
    * user kept acting within `gapUs`), not by the corpus. Ordering is
    * pinned inside the aggregation: `array_sort` over (ts, tie, type)
    * structs, so collect_list's arrival order never escapes —
    * deterministic on any partitioning, same discipline as the q62
    * posting lists. */
  def sessionTranscripts(events: DataFrame, gapUs: Long,
                         userCol: String = "user_id", tsUsCol: String = "us",
                         tieCol: String = "event_id",
                         typeCol: String = "event_type"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(userCol)).orderBy(col(tsUsCol), col(tieCol))
    events
      .withColumn("__prev", lag(col(tsUsCol), 1).over(w))
      .withColumn("__new", when(col("__prev").isNull ||
        col(tsUsCol) - col("__prev") > gapUs, 1L).otherwise(0L))
      .withColumn("session_idx", sum(col("__new")).over(w))
      .groupBy(col(userCol), col("session_idx"))
      .agg(count(lit(1)).as("n_events"),
        min(col(tsUsCol)).as("start_us"),
        concat_ws(">", transform(
          array_sort(collect_list(struct(
            col(tsUsCol).as("t"), col(tieCol).as("e"), col(typeCol).as("ty")))),
          s => s.getField("ty"))).as("transcript"))
  }

  /** STREAM-STREAM INTERVAL JOIN (conversion attribution, live): clicks
    * joined to purchases by the same user where the purchase lands in
    * (click_ts, click_ts + `horizon`] — the streaming counterpart of
    * the batch as-of/range joins (q30/q31). Both sides are watermarked,
    * and the join condition carries the explicit event-time interval,
    * which is what lets Spark BOUND the join state: a buffered click
    * can be evicted once the purchase-side watermark passes
    * click_ts + horizon (and vice versa), so state is O(events within
    * horizon + lateness), not O(stream history). An equi-join without
    * the time bounds would be rejected for exactly that reason in
    * append mode. Inner join → append-mode output, safe for exactly-
    * once file sinks. */
  def conversionJoin(clicks: DataFrame, purchases: DataFrame,
                     horizon: String = "1 hour",
                     lateness: String = "10 minutes"): DataFrame = {
    val c = clicks.withWatermark("ts", lateness)
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"),
        col("event_id").as("click_id"))
    val p = purchases.withWatermark("ts", lateness)
      .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"),
        col("event_id").as("purchase_id"), col("value").as("amount"))
    c.join(p,
      col("c_user") === col("p_user") &&
        col("purchase_ts") > col("click_ts") &&
        col("purchase_ts") <= col("click_ts") + expr(s"INTERVAL $horizon"))
      .select(col("c_user").as("user_id"), col("click_id"),
        col("purchase_id"), col("click_ts"), col("purchase_ts"), col("amount"))
  }

  /** One user's running session state (driver-defined gap semantics). */
  final case class SessionState(count: Long, firstTs: Long, lastTs: Long)
  final case class SessionUpdate(user_id: Long, n_events: Long,
                                 duration_ms: Long, closed: Boolean)

  /** Stateful sessionization via flatMapGroupsWithState: per-user
    * running session, closed (and its state EVICTED) when `gapMs`
    * passes without events. Two close paths, both emitting
    * `closed = true`:
    *   - in-data: a batch whose first event is > gapMs past the stored
    *     session closes the old one and starts fresh;
    *   - timeout: the event-time timeout fires once the watermark
    *     passes lastTs + gapMs, closing idle users and removing their
    *     state — so state stays O(users active within the gap window),
    *     not O(all users ever seen), for the life of the stream.
    * Custom state is exactly the KeyValueGroupedDataset escape hatch the
    * engine reserves for logic windowed aggs can't express. */
  def sessionize(events: Dataset[(Long, Timestamp)], gapMs: Long,
                 lateness: String = "10 minutes"): Dataset[SessionUpdate] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.withWatermark("_2", lateness)
      .groupByKey(_._1)
      .flatMapGroupsWithState[SessionState, SessionUpdate](
        OutputMode.Update, GroupStateTimeout.EventTimeTimeout) {
        case (user, rows, state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            // watermark passed lastTs + gapMs with no new events: close
            // the session and drop its state
            val s = state.get
            state.remove()
            Iterator.single(SessionUpdate(user, s.count,
              s.lastTs - s.firstTs, closed = true))
          } else {
            val times = rows.map(_._2.getTime).toVector.sorted
            val (closedOut, merged) = state.getOption match {
              case Some(s) if times.head - s.lastTs <= gapMs =>
                // min/max, not head/last: a late (within-watermark) event
                // must not REGRESS lastTs — that would shrink the timeout
                // horizon, split sessions early, and allow negative
                // durations when the whole batch predates the state
                (Iterator.empty[SessionUpdate],
                  SessionState(s.count + times.length,
                    math.min(s.firstTs, times.head),
                    math.max(s.lastTs, times.last)))
              case Some(s) => // gap exceeded inside the data: close old
                (Iterator.single(SessionUpdate(user, s.count,
                    s.lastTs - s.firstTs, closed = true)),
                  SessionState(times.length, times.head, times.last))
              case None =>
                (Iterator.empty[SessionUpdate],
                  SessionState(times.length, times.head, times.last))
            }
            state.update(merged)
            // must be > current watermark or Spark rejects the timeout
            state.setTimeoutTimestamp(
              math.max(merged.lastTs + gapMs, state.getCurrentWatermarkMs + 1))
            closedOut ++ Iterator.single(SessionUpdate(user, merged.count,
              merged.lastTs - merged.firstTs, closed = false))
          }
      }
  }
}
