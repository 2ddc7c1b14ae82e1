package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-static enrichment — the dimension-join capability every CDC
  * consumer needs (tag live change events with reference data) and the
  * third join topology beside the stream-stream inner/outer pair.
  *
  * Scale notes: a stream-static join is STATELESS — nothing is buffered,
  * no watermark is involved; the static side re-plans per micro-batch
  * (picking up dim updates between batches) and broadcasts when small.
  * That makes it the right lane for slowly-changing reference tables,
  * where a stream-stream join would buffer the whole dimension in the
  * state store for no benefit.
  */
object StreamEnrich {

  /** Enrich a live event stream with a static per-user dimension
    * (any (user_id, ...) DataFrame — e.g. a replica snapshot or a cohort
    * table). Left join: events with unknown users pass through with a
    * NULL dim payload rather than being dropped — the audit lane decides
    * what to do with them, mirroring the dead-letter philosophy of the
    * replica sink. */
  def withUserDim(events: DataFrame, userDim: DataFrame): DataFrame =
    events.join(broadcast(userDim), Seq("user_id"), "left")

  /** The reference-data build most enrichment uses here: each user's
    * first-ever event type and first-seen timestamp, computed as a batch
    * aggregate (min_by / min over one user_id exchange). */
  def userFirstSeen(batchEvents: DataFrame): DataFrame =
    batchEvents
      .groupBy(col("user_id"))
      .agg(
        min_by(col("event_type"), struct(col("ts"), col("event_id"))).as("first_type"),
        min(col("ts")).as("first_seen_ts"))
}
