package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Live corpus-quality router — the streaming twin of the batch
  * `pipeline_quality_filter` waterfall: every arriving document gets a
  * routing verdict (`kept` / `rejected_len` / `rejected_dup` /
  * `rejected_qual`) in the SAME gate order the batch op counts
  * (length → exact-dedup → lexical quality), so a sink wired per verdict
  * implements the C4-style keep/reject lanes with ingest-time latency.
  *
  * Dedup gate: first-arrived document of each md5(text) wins — state is
  * one boolean per distinct content hash (the batch op's min-doc_id
  * keeper equals first-arrival when the feed is doc_id-ordered, which
  * the spec drives; it asserts per-lang verdict counts aggregate to the
  * batch op's exact waterfall row). The hash is the GROUP KEY, so the
  * gate costs the same one content-hash exchange as dedup_exact; length
  * and quality gates are stateless per-row arithmetic. Docs failing the
  * length gate still mark their hash seen — the batch keeper window is
  * computed over ALL docs, and the twin must agree.
  */
object StreamQuality {

  /** One routing decision, aggregable to the batch waterfall counts. */
  case class Decision(doc_id: Long, lang: String, verdict: String)

  /** Spark's `md5(text)` in JVM arithmetic (hex string parity). */
  def md5Hex(text: String): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(text.getBytes("UTF-8")).map(b => f"$b%02x").mkString
  }

  /** The batch op's stateless gates: (len_ok, qual_ok). */
  def gates(text: String, nChars: Long): (Boolean, Boolean) = {
    val toks = text.toLowerCase(java.util.Locale.ROOT).split(" ", -1)
    val lenOk = nChars >= 100
    val qualOk = toks.length >= 30 && toks.distinct.length * 10 >= toks.length * 4
    (lenOk, qualOk)
  }

  /** `docs`: streaming DataFrame with (doc_id, text, lang, n_chars). */
  def decisions(docs: DataFrame): Dataset[Decision] = {
    val s = docs.sparkSession
    import s.implicits._
    docs
      .select(col("doc_id").cast("long"), col("text"), col("lang"),
        col("n_chars").cast("long"))
      .as[(Long, String, String, Long)]
      .groupByKey { case (_, text, _, _) => md5Hex(text) }
      .flatMapGroupsWithState[Boolean, Decision](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_, it, state: GroupState[Boolean]) =>
          var seen = state.getOption.getOrElse(false)
          // doc_id order within the batch group — the deterministic
          // first-wins the batch keeper window encodes
          val out = it.toVector.sortBy(_._1).map { case (id, text, lang, nc) =>
            val first = !seen
            seen = true
            val (lenOk, qualOk) = gates(text, nc)
            val verdict =
              if (!lenOk) "rejected_len"
              else if (!first) "rejected_dup"
              else if (!qualOk) "rejected_qual"
              else "kept"
            Decision(id, lang, verdict)
          }
          state.update(seen)
          out.iterator
      }
  }

  /** Output mode the stateful operator requires. */
  val outputMode: OutputMode = OutputMode.Append()
}
