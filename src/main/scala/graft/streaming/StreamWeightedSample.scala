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
  * batch op, so the spec can drive the same corpus through both forms
  * and assert pick-for-pick equality. */
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
          val out = rows.toSeq.sortBy(_._1).flatMap { case (id, text, _, _) =>
            val tok = StreamBudgetGate.tokenCount(text)
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
