package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Ingest-time CCNet perplexity ROUTER — the streaming twin of batch
  * `pipeline_ppl_buckets` (Wenzek et al. 2020): the bigram LM and the
  * per-language head/middle cutoffs are trained OFFLINE on the archive
  * corpus (CCNet ships a KenLM model plus sample-derived tertile cutoffs
  * to every worker; here the model is the repo's exact-integer bigram
  * table), and every arriving document is scored and routed
  * head/middle/tail in a STATELESS typed map — no state store, no
  * shuffle, one narrow map added to the ingest path at any corpus size.
  *
  * Contract differences vs the batch op, both deliberate:
  *   - Routing is THRESHOLD semantics (avg_pm ≥ c1 → head 1, ≥ c2 →
  *     middle 2, else tail 3; boundary ties promote) — the production
  *     rule, vs batch ntile's forced equal-frequency tie splits; on the
  *     training corpus they agree everywhere except those splits.
  *   - Bigrams the model never saw are skipped EXACTLY like the batch
  *     inner join; a doc with no known bigram routes to bucket 0
  *     ("unscored", avg_pm = −1) instead of a fabricated score, and an
  *     unknown language routes to tail.
  *
  * Model size is vocab²-bounded — the declared broadcast budget of this
  * lane (CCNet accepts multi-GB KenLM per worker for the same reason);
  * integer scoring (`sum(cond_pm) / n` on non-negatives) floors exactly
  * like both engines' SQL `div`, which the parity spec exploits. */
object StreamPplRouter {

  /** One routed document. bucket: 1 head / 2 middle / 3 tail / 0 unscored. */
  case class Routed(doc_id: Long, lang: String, avg_pm: Long, bucket: Int)

  /** The frozen serving model: bigram conditional table + per-lang
    * (head, middle) minimum scores. */
  case class Model(lm: Map[(String, String), Long], cuts: Map[String, (Long, Long)])

  /** Offline model build on an archive corpus: ONE pass for the bigram
    * table (same integer arithmetic as `text_bigram_lm`), one scoring
    * pass for the cutoffs (min avg_pm of tertiles 1 and 2 per language —
    * cutoff TRAINING is sample-sized in CCNet, so the plain per-lang
    * window is the right plan here; the 100 TB-safe two-phase rank lives
    * in the batch assignment op). */
  def model(s: SparkSession, d: String): Model = {
    import s.implicits._
    val lm = Tables.documents(s, d)
      .select(col("text")).as[String]
      .flatMap { text =>
        val t = text.toLowerCase(java.util.Locale.ROOT).split(" ", -1)
        (0 until math.max(0, t.length - 1)).iterator.map(i => (t(i), t(i + 1)))
      }
      .toDF("w1", "w2")
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("n12"))
      .withColumn("n1", sum(col("n12")).over(Window.partitionBy(col("w1"))))
      .select(col("w1"), col("w2"), expr("(10000 * n12) div n1").as("cond_pm"))
      .as[(String, String, Long)].collect()
      .map { case (a, b, pm) => (a, b) -> pm }.toMap
    val scored = graft.operators.TextAnalysis.textLmScore.fn(s, d)
      .select(col("doc_id"), col("avg_pm"))
      .join(Tables.documents(s, d).select(col("doc_id"), col("lang")), "doc_id")
    val w = Window.partitionBy(col("lang")).orderBy(col("avg_pm").desc, col("doc_id"))
    val cuts = scored
      .withColumn("b", ntile(3).over(w))
      .groupBy(col("lang"))
      .agg(min(when(col("b") === 1, col("avg_pm"))).as("c1"),
        min(when(col("b") <= 2, col("avg_pm"))).as("c2"))
      .as[(String, Long, Long)].collect()
      .map { case (l, c1, c2) => l -> (c1, c2) }.toMap
    Model(lm, cuts)
  }

  /** `docs`: streaming (doc_id, text, lang). Stateless score + route. */
  def routed(docs: DataFrame, m: Model): Dataset[Routed] = {
    val s = docs.sparkSession
    import s.implicits._
    val lmB = s.sparkContext.broadcast(m.lm)
    val cutsB = s.sparkContext.broadcast(m.cuts)
    docs.select(col("doc_id").cast("long"), col("text"), col("lang"))
      .as[(Long, String, String)]
      .map { case (id, text, lang) =>
        val t = text.toLowerCase(java.util.Locale.ROOT).split(" ", -1)
        var sum = 0L
        var n = 0L
        var i = 0
        while (i < t.length - 1) {
          val pm = lmB.value.getOrElse((t(i), t(i + 1)), -1L)
          if (pm >= 0) { sum += pm; n += 1 }
          i += 1
        }
        if (n == 0) Routed(id, lang, -1L, 0)
        else {
          val avg = sum / n // non-negative: floors exactly like SQL div
          val b = cutsB.value.get(lang) match {
            case Some((c1, _)) if avg >= c1 => 1
            case Some((_, c2)) if avg >= c2 => 2
            case _ => 3 // below both cuts, or unknown language
          }
          Routed(id, lang, avg, b)
        }
      }
  }
}
