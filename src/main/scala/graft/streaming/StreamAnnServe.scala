package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Streaming ANN serving — the online half of the persisted-index story:
  * query vectors arrive as a STREAM, the index is a static frame (the
  * build-once artifact), and every micro-batch answers its queries with
  * IVF probe + exact cosine within the probed cells — the same plan as
  * batch `ann_ivf` serving, re-expressed under Structured Streaming.
  *
  * Topology per micro-batch:
  *   1. each query row computes its `nProbe` nearest cells against the
  *      FROZEN centroid matrix (a plan constant inside the codegen'd
  *      NearestCells kernel — no training, no model shuffle) and explodes
  *      to (cell, query) rows — stream-side, tiny;
  *   2. a stream-static equi-join on `cell` against the cell-tagged
  *      corpus yields each query's candidate set — the static side is
  *      partition-prunable by cell at scale, and only nprobe/K of the
  *      corpus is touched per query, exactly the batch serving cost;
  *   3. a stateless `flatMapGroupsWithState` folds each query's
  *      candidate iterator through a bounded k-slot insertion buffer —
  *      O(k) memory per group, NO full candidate buffering — and emits
  *      (rank, neighbor, cosine) rows in Append mode.
  *
  * The group fn keeps NO state across batches (serving is a pure
  * recompute): a query id re-sent in a later micro-batch is simply
  * re-answered against the then-current static snapshot — at-least-once
  * query delivery yields idempotent answers, nothing to reconcile.
  * Parity with the batch plan is spec-asserted hit-for-hit. */
object StreamAnnServe {

  /** One served neighbor: rank 1..k by (cosine desc, neighbor_id asc). */
  case class Hit(query_id: Long, neighbor_id: Long, cos: Double, rank: Int)

  private def dot(a: Column, b: Column): Column =
    graft.plans.VectorExpressions.floatDot(a, b)

  /** `queries`: streaming (query_id: Long, embedding: Array[Float]).
    * `corpus`: static (vec_id: Long, embedding: Array[Float]) — the
    * indexed collection. `cents`: the frozen, L2-normalized coarse
    * quantizer (from the persisted index artifact). */
  def topK(queries: DataFrame, corpus: DataFrame, cents: Array[Array[Double]],
      nProbe: Int = 4, k: Int = 5): Dataset[Hit] = {
    val s = queries.sparkSession
    import s.implicits._
    val tagged = corpus.select(
      element_at(graft.plans.VectorExpressions.nearestCells(col("embedding"), cents, 1), 1)
        .getField("cell").as("cell"),
      col("vec_id").as("neighbor_id"),
      col("embedding").as("cv"),
      sqrt(dot(col("embedding"), col("embedding"))).as("cn"))
    val probed = queries.select(
      col("query_id"),
      col("embedding").as("qv"),
      sqrt(dot(col("embedding"), col("embedding"))).as("qn"),
      explode(transform(
        graft.plans.VectorExpressions.nearestCells(col("embedding"), cents, nProbe),
        c => c.getField("cell"))).as("cell"))
    probed.join(tagged, Seq("cell")) // stream-static: static side never re-shuffles the stream
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        (dot(col("qv"), col("cv")) / (col("qn") * col("cn"))).as("cos"))
      .as[(Long, Long, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Long, Hit](OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (qid, it, _) =>
          // bounded k-slot insertion top-k: O(k) heap per group, the
          // candidate iterator streams through (never materialized)
          val ids = new Array[Long](k)
          val cs = new Array[Double](k)
          var n = 0
          def beats(c: Double, id: Long, i: Int): Boolean =
            cs(i) < c || (cs(i) == c && ids(i) > id)
          it.foreach { case (_, nid, c) =>
            if (n < k || beats(c, nid, k - 1)) {
              var pos = if (n < k) { n += 1; n - 1 } else k - 1
              ids(pos) = nid; cs(pos) = c
              while (pos > 0 && beats(cs(pos), ids(pos), pos - 1)) {
                val ti = ids(pos); ids(pos) = ids(pos - 1); ids(pos - 1) = ti
                val tc = cs(pos); cs(pos) = cs(pos - 1); cs(pos - 1) = tc
                pos -= 1
              }
            }
          }
          Iterator.range(0, n).map(i => Hit(qid, ids(i), cs(i), i + 1))
      }
  }
}
