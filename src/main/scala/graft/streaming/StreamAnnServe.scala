package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Streaming ANN serving — the online half of the persisted-index story:
  * query vectors arrive as a STREAM, the index is static, and every
  * micro-batch answers its queries with IVF probe + ranked candidates.
  *
  * Two lanes:
  *   - [[topKIndexed]] — the PRODUCTION path: the static side is the
  *     `ann_index_build` artifact (stored `cell` + 8-byte PQ codes), so a
  *     micro-batch touches probed posting lists of the codes table plus a
  *     refine-from-storage rerank of the 128-row shortlist. NO corpus
  *     kernel work per batch: NearestCells/PqLut run only over the
  *     handful of streamed query rows; the corpus contributes a narrow
  *     column scan. This is the lane that survives a 100× corpus.
  *   - [[topK]] — the small-corpus convenience: raw `(vec_id, embedding)`
  *     static side, cell-tagged inline per batch (O(corpus·K·Dim) per
  *     micro-batch — fine for a dev corpus, not for serving at scale).
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

  /** One ADC-shortlisted candidate headed for the exact rerank; the
    * query vector and norm ride along (emitted once per shortlist row —
    * they entered the group as a single marker row, so the wide
    * candidate shuffle never carries them). */
  case class Shortlisted(
      query_id: Long, neighbor_id: Long, qv: Seq[Float], qn: Double)

  /** Pre-shortlist candidate row: either a probed (cell-joined) corpus
    * code with its ADC, or the query's own marker row carrying the float
    * vector + norm for the downstream rerank. The marker is an EXPLICIT
    * boolean, not an in-band sentinel id — a corpus whose vec_id space
    * includes any reserved value can never be swallowed as a marker (the
    * old `neighbor_id == -1` convention would silently overwrite the
    * query payload with that row's and drop it from ranking). */
  case class Cand(
      query_id: Long, neighbor_id: Long, adc: Double, qv: Seq[Float], qn: Double,
      is_marker: Boolean)

  /** INDEXED streaming ANN serving — [[graft.operators.Similarity.annIndexSearch]]'s
    * exact plan under Structured Streaming, hit-for-hit (spec-asserted):
    * the static side is the PERSISTED index artifact, never the raw
    * corpus.
    *
    * Topology per micro-batch:
    *   1. each streamed query row builds its PQ lookup table and explodes
    *      to `nProbe` (cell, lut) probe rows — centroids and codebooks are
    *      plan constants loaded from the artifact (K and M×K row collects
    *      at query construction, NOT per batch);
    *   2. probe rows equi-join the artifact's `corpus_codes` table on
    *      `cell` — a narrow (cell, vec_id, codes) column scan, 8 bytes of
    *      payload per corpus vector, zero corpus-side kernels (the batch
    *      audit pattern: the plan is NearestCells/PqEncode-free on the
    *      static side); candidates get their asymmetric distance from the
    *      codegen'd PqAdc kernel;
    *   3. a stateless fmgws keeps each query's exact batch shortlist —
    *      the [[graft.operators.Similarity.PqShortlist]] lowest (adc,
    *      neighbor_id) — in a bounded insertion buffer; the query's
    *      float vector enters the group as ONE marker row and leaves
    *      attached to the 128 shortlist rows (the candidate shuffle
    *      itself stays ~24 B/row);
    *   4. the shortlist joins `vectors` (refine-from-storage: at scale a
    *      vec_id-clustered table — only this 8×128-row join ever touches
    *      float vectors) and exact 6-dp cosine ranks the final top-k in a
    *      second bounded-buffer fmgws.
    *
    * Both fmgws are Append-mode and keep no state across batches (pure
    * recompute serving), which is the combination Spark's unsupported-
    * operations checker admits for chained stateful operators.
    *
    * `indexDir`: an `ann_index_build` artifact directory. `vectors`: the
    * (vec_id, embedding) table backing the exact rerank. */
  def topKIndexed(queries: DataFrame, indexDir: String, vectors: DataFrame,
      nProbe: Int = 4, k: Int = 5): Dataset[Hit] = {
    val s = queries.sparkSession
    import s.implicits._
    val shortN = graft.operators.Similarity.PqShortlist
    val (cents, books) = graft.operators.Similarity.loadAnnModel(s, indexDir)
    val codes = s.read.parquet(s"$indexDir/corpus_codes.parquet")
      .select(col("cell"), col("vec_id").as("neighbor_id"), col("codes"))
    val probed = queries.select(
      col("query_id"),
      graft.plans.VectorExpressions.pqLut(col("embedding"), books).as("lut"),
      explode(transform(
        graft.plans.VectorExpressions.nearestCells(col("embedding"), cents, nProbe),
        c => c.getField("cell"))).as("cell"))
    val cand = probed.join(codes, Seq("cell")) // static side: codes column scan only
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        graft.plans.VectorExpressions.pqAdc(col("codes"), col("lut")).as("adc"),
        lit(null).cast("array<float>").as("qv"), lit(0.0).as("qn"),
        lit(false).as("is_marker"))
    val markers = queries.select( // one row per query: the rerank payload
      col("query_id"), lit(-1L).as("neighbor_id"), lit(0.0).as("adc"),
      col("embedding").as("qv"),
      sqrt(dot(col("embedding"), col("embedding"))).as("qn"),
      lit(true).as("is_marker"))
    val shortlist = cand.unionByName(markers).as[Cand]
      .groupByKey(_.query_id)
      .flatMapGroupsWithState[Long, Shortlisted](OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (qid, it, _) =>
          // bounded shortN-slot buffer ordered (adc asc, neighbor_id asc) —
          // exactly row_number over (adc, neighbor_id) ≤ PqShortlist, so
          // the shortlist is the batch plan's, member for member
          val ids = new Array[Long](shortN)
          val ds = new Array[Double](shortN)
          var n = 0
          var qv: Seq[Float] = null
          var qn = 0.0
          def beats(a: Double, id: Long, i: Int): Boolean =
            ds(i) > a || (ds(i) == a && ids(i) > id)
          it.foreach { c =>
            if (c.is_marker) { qv = c.qv; qn = c.qn }
            else if (n < shortN || beats(c.adc, c.neighbor_id, shortN - 1)) {
              var pos = if (n < shortN) { n += 1; n - 1 } else shortN - 1
              ids(pos) = c.neighbor_id; ds(pos) = c.adc
              while (pos > 0 && beats(ds(pos), ids(pos), pos - 1)) {
                val ti = ids(pos); ids(pos) = ids(pos - 1); ids(pos - 1) = ti
                val td = ds(pos); ds(pos) = ds(pos - 1); ds(pos - 1) = td
                pos -= 1
              }
            }
          }
          if (qv == null) Iterator.empty // candidates without their query marker
          else Iterator.range(0, n).map(i => Shortlisted(qid, ids(i), qv, qn))
      }
    val vec = vectors.select(col("vec_id").as("neighbor_id"),
      col("embedding").as("cv"),
      sqrt(dot(col("embedding"), col("embedding"))).as("cn"))
    shortlist.toDF()
      .join(vec, Seq("neighbor_id")) // refine-from-storage: 8×128 rows wide
      .select(col("query_id"), col("neighbor_id"),
        round(dot(col("qv"), col("cv")) / (col("qn") * col("cn")), 6).as("cos"))
      .as[(Long, Long, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Long, Hit](OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (qid, it, _) =>
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
