package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** STREAMING token-budget admission — the live twin of batch
  * `pipeline_budget_gate`: documents arrive on a stream and each (lang,
  * source) domain admits them until its cumulative token mass exceeds the
  * budget; every doc gets an explicit admit/reject decision the moment it
  * arrives. This is the "stop taking domain X after N tokens" valve a
  * training-mix ingestion front-end runs (the budget the batch
  * `pipeline_token_budget` planner computed).
  *
  * State is ONE running counter per domain — O(langs×sources) longs,
  * genuinely bounded with no watermark needed (contrast the dedup gate,
  * whose state is corpus-shaped). The counter accumulates EVERY doc's
  * tokens, admitted or not, matching the batch prefix rule (cum ≤ budget):
  * once a domain overshoots, later docs stay rejected even if small.
  *
  * Token counting is the byte-exact JVM mirror of the codegen'd
  * [[graft.plans.StringKernels.spaceSegCount]] kernel (0x20 count + 1 —
  * UTF-8 multibyte sequences never contain 0x20, so counting ' ' chars is
  * identical), so stream and batch decisions agree token-for-token.
  *
  * Within a micro-batch a domain's rows process in doc_id order — the
  * deterministic stand-in for arrival order that the batch op also uses —
  * so the spec can drive the same corpus through both forms and assert
  * per-doc decision equality. */
object StreamBudgetGate {

  /** One admission decision. */
  final case class Decision(doc_id: Long, lang: String, source: String,
      tok: Long, admitted: Boolean)

  private[graft] def tokenCount(text: String): Long = {
    var c = 1L
    var i = 0
    while (i < text.length) {
      if (text.charAt(i) == ' ') c += 1
      i += 1
    }
    c
  }

  /** `docs`: streaming (doc_id, text, lang, source). Append-mode output:
    * one decision per doc, emitted in its arrival micro-batch. */
  def decisions(docs: DataFrame, budget: Long = 150L): Dataset[Decision] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select("doc_id", "text", "lang", "source")
      .as[(Long, String, String, String)]
      .groupByKey { case (_, _, lang, source) => (lang, source) }
      .flatMapGroupsWithState[Long, Decision](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case ((lang, source), rows, state) =>
          var running = state.getOption.getOrElse(0L)
          val out = rows.toSeq.sortBy(_._1).map { case (id, text, _, _) =>
            val tok = tokenCount(text)
            running += tok
            Decision(id, lang, source, tok, running <= budget)
          }
          state.update(running)
          out.iterator
      }
  }
}
