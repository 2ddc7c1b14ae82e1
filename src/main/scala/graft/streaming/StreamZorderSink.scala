package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.Tables
import graft.operators.ScalePatterns

/** LAYOUT-PRESERVING streaming writer — the online half of the Z-order
  * story (`q_zorder_layout` is the audit half): a live event stream lands
  * in parquet ALREADY clustered on the (user, time) Morton code, so the
  * lakehouse data-skipping property holds from the moment of ingest
  * instead of waiting for a nightly OPTIMIZE pass.
  *
  * The grid is FROZEN at deployment (bounds from the archive corpus —
  * plan literals inside the codegen'd Morton arithmetic, shared with the
  * batch audit via [[ScalePatterns.withZBucket]]; out-of-range arrivals
  * clamp to edge cells, the production rule). Each micro-batch is
  * range-repartitioned on (zbucket, event_id) with an EXPLICIT partition
  * count (AQE would coalesce the small case to one file) and sorted
  * within partitions, so every written file covers one contiguous
  * z-range — the per-file min/max column stats a reader prunes on are
  * tight on BOTH grid dimensions. Files land under batchId-named
  * directories (replay-idempotent, the StreamIndexUpsert segment rule);
  * a compaction pass merging small per-batch segments is
  * `ann_index_compact`'s shape applied to events. */
object StreamZorderSink {

  /** Frozen grid bounds, trained on an archive corpus. */
  final case class GridBounds(ulo: Long, uhi: Long, tlo: Long, thi: Long)

  /** One distributed 1-row aggregate over the archive corpus. */
  def trainBounds(s: SparkSession, d: String): GridBounds = {
    val r = Tables.events(s, d)
      .select(col("user_id"), unix_micros(col("ts")).as("us"))
      .agg(min(col("user_id")), max(col("user_id")), min(col("us")), max(col("us")))
      .head()
    GridBounds(r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
  }

  /** `events`: streaming (event_id, user_id, us). Starts the clustered
    * segment writer: one z-range-clustered parquet directory per
    * micro-batch under `dir`. */
  def sink(events: DataFrame, b: GridBounds, dir: String, checkpoint: String,
      parts: Int = 8): StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (df: DataFrame, batchId: Long) =>
        ScalePatterns.withZBucket(df, b.ulo, b.uhi, b.tlo, b.thi)
          .repartitionByRange(parts, col("zbucket"), col("event_id"))
          .sortWithinPartitions("zbucket", "event_id")
          .write.mode("overwrite")
          .parquet(f"$dir/batch-$batchId%05d.parquet")
      }
      .start()
}
