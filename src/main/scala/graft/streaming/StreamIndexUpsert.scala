package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.plans.VectorExpressions

/** Streaming ingest into the persisted ANN index — the online half of the
  * FAISS `add` path (`ann_index_upsert` is the batch half): newly arriving
  * vectors are assigned to their nearest cell and PQ-encoded with the
  * FROZEN model, then land as one delta-segment parquet directory per
  * micro-batch — Lucene's per-commit segment, keyed by `batchId` so a
  * replayed micro-batch overwrites its own segment (idempotent under
  * at-least-once delivery; Structured Streaming replays a failed batch
  * with the same id). Serving reads base ∪ segments until
  * `ann_index_compact` folds them back in.
  *
  * Scale shape: centroids and codebooks ride inside the codegen'd
  * NearestCells/PqEncode kernels as plan constants — no model shuffle, no
  * training, no state operator; each micro-batch costs one narrow encode
  * pass over its own rows (8-byte codes out), so ingest cost is O(delta)
  * regardless of index size, which is the entire point of the
  * build/serve/add split. */
object StreamIndexUpsert {

  /** Frozen-model encode of a (vec_id, embedding) frame — identical
    * arithmetic to the batch upsert lane, usable on static or streaming
    * input (pure projection, no state). */
  def encoded(vecs: DataFrame, cents: Array[Array[Double]],
      books: Array[Array[Array[Double]]]): DataFrame =
    vecs.select(
      element_at(VectorExpressions.nearestCells(col("embedding"), cents, 1), 1)
        .getField("cell").as("cell"),
      col("vec_id"),
      VectorExpressions.pqEncode(col("embedding"), books)
        .getField("codes").as("codes"))

  /** Starts the segment-writer sink: one parquet segment directory per
    * micro-batch under `dir`, named by batchId (replay-idempotent). */
  def sink(vecs: DataFrame, cents: Array[Array[Double]],
      books: Array[Array[Array[Double]]], dir: String,
      checkpoint: String): StreamingQuery =
    encoded(vecs, cents, books).writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (df: DataFrame, batchId: Long) =>
        df.write.mode("overwrite")
          .parquet(f"$dir/segment-$batchId%05d.parquet")
      }
      .start()
}
