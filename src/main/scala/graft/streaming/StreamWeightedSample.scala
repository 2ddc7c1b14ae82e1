package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** STREAMING token-proportional sampler — the live twin of batch
  * `pipeline_weighted_sample`: documents arrive on a stream and each
  * (lang, source) domain SELECTS the ones whose cumulative-token
  * interval straddles a stride boundary, i.e. every doc is picked with
  * probability ∝ its token mass and a domain yields exactly one pick
  * per `stride` tokens of throughput. This is the ingest-time
  * downsampling valve (feed a fixed-rate eval/telemetry sink from an
  * unbounded firehose without biasing against long documents).
  *
  * State is ONE running token counter per domain — O(langs×sources)
  * longs, the [[StreamBudgetGate]] shape: genuinely bounded, no
  * watermark needed, and counters survive checkpointed restarts (a
  * reset would re-anchor the stride grid and double-pick around the
  * restart point). Token counting is the byte-exact JVM mirror of the
  * SpaceSegCount kernel, and within a micro-batch a domain's rows
  * process in doc_id order — the same determinism contract as the
  * batch op (and what makes a task retry re-emit the SAME picks:
  * shuffle-fetch order is not deterministic, so an arrival-order fold
  * could pick different docs on retry with identical end state).
  *
  * **Ordered-arrival contract.** Pick-for-pick equality with batch
  * `pipeline_weighted_sample` holds exactly when documents arrive in
  * globally ascending doc_id order ACROSS micro-batches (each batch's
  * domain slice is a contiguous doc_id run — the replay-a-corpus and
  * ingest-by-monotone-id shapes). Under out-of-order ingest the
  * within-batch sort still makes every batch deterministic, but the
  * stride grid lands on a different interleaving than the batch op
  * saw: only the probability-proportional property (every doc picked
  * w.p. ~tok/stride, one pick per stride tokens of domain throughput)
  * is guaranteed, not batch parity.
  *
  * **Memory.** The group fold buffers only (doc_id, tok) PAIRS — the
  * token count folds out of each text as the iterator is consumed, and
  * the text is dropped before the sort. A hot domain with a large
  * micro-batch costs ~48 B/doc on the task heap (100k docs ≈ 5 MB),
  * not the O(total text bytes) the previous `rows.toSeq.sortBy` paid;
  * a true external (spilling) sort is not reachable here because
  * streaming plans reject Sort operators below fmgws and the state
  * operator's required child ordering covers the grouping key only. */
object StreamWeightedSample {

  /** One selected document. `bucket`: 1-based stride index it covers. */
  final case class Pick(doc_id: Long, lang: String, source: String,
      tok: Long, bucket: Long)

  /** `docs`: streaming (doc_id, text, lang, source). Append-mode: each
    * pick emits in its arrival micro-batch. */
  def picks(docs: DataFrame, stride: Long = 500L): Dataset[Pick] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select("doc_id", "text", "lang", "source")
      .as[(Long, String, String, String)]
      .groupByKey { case (_, _, lang, source) => (lang, source) }
      .flatMapGroupsWithState[Long, Pick](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case ((lang, source), rows, state) =>
          var cum = state.getOption.getOrElse(0L)
          // Fold texts down to (doc_id, tok) as the iterator streams past —
          // only the 16-byte pair survives to the sort, never the text.
          val idTok = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
          rows.foreach { case (id, text, _, _) =>
            idTok += ((id, StreamBudgetGate.tokenCount(text)))
          }
          idTok.sortInPlaceBy(_._1)
          val out = idTok.flatMap { case (id, tok) =>
            val before = cum
            cum += tok
            if (cum / stride > before / stride)
              Some(Pick(id, lang, source, tok, before / stride + 1L))
            else None
          }
          state.update(cum)
          out.iterator
      }
  }
}
