package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream joins over the event stream — the Structured Streaming
  * capability the reference's poll-loop architecture cannot express at all:
  * correlating two live CDC/event flows with bounded state.
  *
  * Scale notes: both sides are watermarked, so the state store retains only
  * the join-window's worth of rows per key; the join shuffles both streams
  * once on user_id.
  */
object StreamJoins {

  /** Purchases joined to the same user's clicks in the preceding 15
    * minutes. Input: a (streaming or batch) DataFrame with the `events`
    * table schema. Emits one row per (purchase, click) pair. */
  def purchaseClickJoin(events: DataFrame): DataFrame = {
    val clicks = events
      .filter(col("event_type") === "click")
      .select(
        col("user_id").as("c_user_id"),
        col("ts").as("c_ts"),
        col("event_id").as("click_id")
      )
      .withWatermark("c_ts", "30 minutes")
    val purchases = events
      .filter(col("event_type") === "purchase")
      .select(
        col("user_id").as("p_user_id"),
        col("ts").as("p_ts"),
        col("event_id").as("purchase_id"),
        col("value").as("purchase_value")
      )
      .withWatermark("p_ts", "30 minutes")
    purchases.join(
      clicks,
      expr("""
        c_user_id = p_user_id AND
        c_ts >= p_ts - INTERVAL 15 MINUTES AND
        c_ts < p_ts
      """),
      "inner"
    ).select(
      col("purchase_id"), col("p_user_id").as("user_id"),
      col("click_id"),
      unix_micros(col("p_ts")).as("purchase_us"),
      unix_micros(col("c_ts")).as("click_us"),
      round(col("purchase_value"), 2).as("purchase_value")
    )
  }

  /** Left-outer variant: EVERY purchase is emitted — matched pairs
    * immediately, unmatched purchases null-padded only once the watermark
    * has passed their join window (Structured Streaming can't know "no
    * click will ever arrive" any earlier; the outer row's emission is the
    * state-store eviction itself). State stays bounded exactly as in the
    * inner join: both sides watermarked, so only the 15-minute window's
    * rows per user are retained. The conversion-rate query this feeds
    * (which purchases had NO preceding click?) is `q_anti_join`'s streaming
    * twin. */
  def purchaseClickLeftOuter(events: DataFrame): DataFrame = {
    val clicks = events
      .filter(col("event_type") === "click")
      .select(
        col("user_id").as("c_user_id"),
        col("ts").as("c_ts"),
        col("event_id").as("click_id")
      )
      .withWatermark("c_ts", "30 minutes")
    val purchases = events
      .filter(col("event_type") === "purchase")
      .select(
        col("user_id").as("p_user_id"),
        col("ts").as("p_ts"),
        col("event_id").as("purchase_id"),
        col("value").as("purchase_value")
      )
      .withWatermark("p_ts", "30 minutes")
    purchases.join(
      clicks,
      expr("""
        c_user_id = p_user_id AND
        c_ts >= p_ts - INTERVAL 15 MINUTES AND
        c_ts < p_ts
      """),
      "leftOuter"
    ).select(
      col("purchase_id"), col("p_user_id").as("user_id"),
      col("click_id"),
      unix_micros(col("p_ts")).as("purchase_us"),
      unix_micros(col("c_ts")).as("click_us"),
      round(col("purchase_value"), 2).as("purchase_value")
    )
  }

  /** Full-outer variant — the last of the three stream-stream join
    * topologies: matched pairs emit immediately; unmatched rows from BOTH
    * sides null-pad when the watermark evicts them (a purchase with no
    * preceding click AND a click that converted nothing each surface
    * exactly once). Same bounded state as the inner join — emission of
    * every outer row is its state-store eviction. The `side` column tags
    * what each row is (pair / purchase-only / click-only), since a
    * full-outer stream interleaves all three. */
  def purchaseClickFullOuter(events: DataFrame): DataFrame = {
    val clicks = events
      .filter(col("event_type") === "click")
      .select(
        col("user_id").as("c_user_id"),
        col("ts").as("c_ts"),
        col("event_id").as("click_id")
      )
      .withWatermark("c_ts", "30 minutes")
    val purchases = events
      .filter(col("event_type") === "purchase")
      .select(
        col("user_id").as("p_user_id"),
        col("ts").as("p_ts"),
        col("event_id").as("purchase_id"),
        col("value").as("purchase_value")
      )
      .withWatermark("p_ts", "30 minutes")
    purchases.join(
      clicks,
      expr("""
        c_user_id = p_user_id AND
        c_ts >= p_ts - INTERVAL 15 MINUTES AND
        c_ts < p_ts
      """),
      "fullOuter"
    ).select(
      col("purchase_id"),
      coalesce(col("p_user_id"), col("c_user_id")).as("user_id"),
      col("click_id"),
      unix_micros(col("p_ts")).as("purchase_us"),
      unix_micros(col("c_ts")).as("click_us"),
      round(col("purchase_value"), 2).as("purchase_value"),
      when(col("purchase_id").isNotNull && col("click_id").isNotNull, "pair")
        .when(col("purchase_id").isNotNull, "purchase_only")
        .otherwise("click_only").as("side")
    )
  }
}
