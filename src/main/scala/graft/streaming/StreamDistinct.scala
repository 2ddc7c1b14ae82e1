package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distinct-user counting over the live event stream — the streaming twin
  * of `q_distinct_users`/`q_hourly_events`' exact distinct and of
  * `q_approx_distinct`'s sketch.
  *
  * Scale notes: the exact path chains two stateful operators (Spark ≥3.4
  * supports multiple stateful ops in append mode): a watermark-bounded
  * dedup on (window, user) — state is one row per distinct pair, dropped
  * once the watermark passes the window — feeding a windowed count. The
  * approximate path keeps one HLL sketch per window (constant state per
  * window regardless of cardinality) — the 100 TB/day answer when ±5%
  * suffices.
  */
object StreamDistinct {

  /** EXACT distinct users per tumbling hour: dedup state bounded by the
    * watermark horizon, then count rows per window — count(*) of a
    * deduped stream IS the distinct count (the `q_sliding_distinct`
    * trick, streaming edition). */
  def windowedDistinctUsers(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      // the window struct inherits the event-time metadata from ts, so the
      // dedup state is evictable once the watermark passes the window
      .select(window(col("ts"), "1 hour").as("win"), col("user_id"))
      .dropDuplicates("user_id", "win")
      .groupBy(col("win"))
      .agg(count(lit(1)).as("n_users"))
      .select(unix_micros(col("win.start")).as("window_us"), col("n_users"))

  /** One HLL sketch per window — bounded state per window at ANY user
    * cardinality. */
  def windowedApproxDistinct(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour").as("win"))
      .agg(approx_count_distinct(col("user_id")).as("n_users_approx"))
      .select(unix_micros(col("win.start")).as("window_us"), col("n_users_approx"))
}
