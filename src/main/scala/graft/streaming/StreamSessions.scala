package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Session-window aggregation and watermarked deduplication over the live
  * event stream — the stateful-streaming counterparts of the batch
  * `q_sessionize` / `cdc_dedup_events` operators.
  *
  * Scale notes: `session_window` keeps one merged-session state row per
  * (user, open session) and the watermark closes sessions older than the
  * lateness bound, so state is O(active users), not O(events).
  * `dropDuplicatesWithinWatermark` keeps seen-keys only inside the
  * watermark horizon — the unbounded-state trap of plain streaming
  * `dropDuplicates` is avoided by construction.
  */
object StreamSessions {

  /** Gap-based user sessions via Spark's native session_window: events
    * whose `[ts, ts+gap)` intervals chain are merged into one session.
    * Works identically over a batch frame (used by the `q_session_window`
    * oracle-gated entry) and a stream (watermark bounds open-session
    * state). */
  def userSessions(events: DataFrame, gap: String = "30 minutes",
      watermark: Option[String] = None): DataFrame = {
    val src = watermark.fold(events)(events.withWatermark("ts", _))
    src
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      // Exact integer cents (values are 2-decimal): summation order inside
      // a merged session differs across engines, so a float sum can flip a
      // rounding boundary; the cents sum is order-independent.
      .agg(count(lit(1)).as("n_events"),
        (sum(round(col("value") * 100).cast("long")) / 100.0).as("session_value"))
      .select(
        col("user_id"),
        unix_micros(col("session_window.start")).as("session_start_us"),
        unix_micros(col("session_window.end")).as("session_end_us"),
        col("n_events"), col("session_value"))
  }

  /** Exactly-once repair on the live stream: duplicate deliveries of the
    * same event_id are dropped as long as they arrive within the watermark
    * horizon (the at-least-once queue redelivery case — duplicates arrive
    * close together; a batch `cdc_dedup_events` pass covers anything
    * later). */
  def dedupedEvents(events: DataFrame, horizon: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", horizon)
      .dropDuplicatesWithinWatermark("event_id")
}
