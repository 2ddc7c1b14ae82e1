package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}

/** Training-layout planning operators — the stages that turn a curated
  * corpus into the physical training stream: a deterministic global
  * shuffle into shards, sequence-length bucketing (padding-waste
  * accounting), per-domain token-budget admission, and the Pareto-frontier
  * (skyline) operator for multi-objective selection.
  *
  * Shared conventions follow [[Curation]]: md5-derived routing keys
  * (reproducible under retries and repartitioning), exact integer
  * arithmetic for every ratio, totals ordered deterministically.
  */
object Planning {

  /** Deterministic GLOBAL SHUFFLE into training shards — the layout step
    * every epoch pipeline runs after curation: each document gets a
    * pseudo-random but reproducible position, expressed as (shard,
    * pos-in-shard). The key is md5(doc_id): shard = key mod NSHARDS is a
    * pure map (no global sort!), and pos is a row_number ordered by key
    * WITHIN the shard — so the only sort is per-shard, bounded by
    * corpus/NSHARDS, exactly the sort every shard writer pays anyway.
    * A naive `ORDER BY hash` global ranking would funnel the corpus
    * through one range sort; this shape keeps all NSHARDS lanes parallel
    * (at 100 TB, NSHARDS is the write parallelism — 64 here, 100k there).
    */
  val pipelineGlobalShuffle: QueryDef = QueryDef(
    "pipeline_global_shuffle",
    (s, d) => {
      val key = conv(substring(md5(col("doc_id").cast("string")), 1, 15), 16, 10)
        .cast("long")
      val shard = pmod(col("key"), lit(64L))
      Tables.documents(s, d)
        .select(col("doc_id"), key.as("key"))
        .withColumn("shard", shard)
        .withColumn("pos",
          row_number().over(
            Window.partitionBy(col("shard")).orderBy(col("key"), col("doc_id"))))
        .select(col("doc_id"), col("shard"), col("pos"))
        .orderBy("shard", "pos")
    },
    Some("""
      WITH k AS (
        SELECT doc_id,
               ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT AS key
        FROM documents
      )
      SELECT doc_id, key % 64 AS shard,
             CAST(row_number() OVER (PARTITION BY key % 64 ORDER BY key, doc_id) AS INT) AS pos
      FROM k
      ORDER BY shard, pos
    """.stripMargin.trim)
  )

  /** Sequence-LENGTH BUCKETING — the padding-waste planning table: each
    * document's whitespace token count is clamped to the 2048 context and
    * assigned the smallest power-of-two bucket ≥ max(count, 16); per
    * bucket the table reports document mass, real tokens, padding tokens
    * (bucket_len − tokens) and the padding share in permille. This is the
    * table a batching strategy reads to choose bucket boundaries (padding
    * waste is pure overhead at training time).
    *
    * Scale shape: one narrow map over the corpus (the codegen'd
    * [[graft.plans.StringKernels.spaceSegCount]] kernel), one hash
    * aggregate to ≤ 9 bucket rows. The CASE chain is identical on both
    * engines — integer-exact. */
  val pipelineLengthBuckets: QueryDef = QueryDef(
    "pipeline_length_buckets",
    (s, d) => {
      val tok = least(graft.plans.StringKernels.spaceSegCount(col("text")), lit(2048L))
      Tables.documents(s, d)
        .select(tok.as("tok"))
        .withColumn("bucket",
          when(col("tok") <= 16, 16L).when(col("tok") <= 32, 32L)
            .when(col("tok") <= 64, 64L).when(col("tok") <= 128, 128L)
            .when(col("tok") <= 256, 256L).when(col("tok") <= 512, 512L)
            .when(col("tok") <= 1024, 1024L).otherwise(2048L))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("tok")).as("sum_tokens"),
          sum(col("bucket") - col("tok")).as("sum_padding"))
        .withColumn("waste_pm",
          expr("(1000 * sum_padding) div (sum_tokens + sum_padding)"))
        .orderBy("bucket")
    },
    Some("""
      WITH t AS (
        SELECT least(len(string_split(text, ' ')), 2048)::BIGINT AS tok
        FROM documents
      ), b AS (
        SELECT tok, CASE WHEN tok <= 16 THEN 16 WHEN tok <= 32 THEN 32
                         WHEN tok <= 64 THEN 64 WHEN tok <= 128 THEN 128
                         WHEN tok <= 256 THEN 256 WHEN tok <= 512 THEN 512
                         WHEN tok <= 1024 THEN 1024 ELSE 2048 END::BIGINT AS bucket
        FROM t
      )
      SELECT bucket, count(*) AS n_docs, sum(tok)::BIGINT AS sum_tokens,
             sum(bucket - tok)::BIGINT AS sum_padding,
             ((1000 * sum(bucket - tok)) // (sum(tok) + sum(bucket - tok)))::BIGINT AS waste_pm
      FROM b
      GROUP BY bucket
      ORDER BY bucket
    """.stripMargin.trim)
  )

  /** Per-document admission decisions for the token-budget gate: a doc is
    * admitted iff its domain's cumulative token count (doc_id order, the
    * deterministic stand-in for arrival order) stays ≤ the per-domain
    * budget. Shared by the batch aggregate below and the
    * [[graft.streaming.StreamBudgetGate]] parity spec. */
  private[graft] def budgetDecisions(s: SparkSession, d: String,
      budget: Long): DataFrame = {
    val w = Window.partitionBy(col("lang"), col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.documents(s, d)
      .select(col("doc_id"), col("lang"), col("source"),
        graft.plans.StringKernels.spaceSegCount(col("text")).as("tok"))
      .withColumn("cum", sum(col("tok")).over(w))
      .withColumn("admitted", col("cum") <= budget)
  }

  /** Token-BUDGET ADMISSION GATE — the "stop taking domain X after N
    * tokens" rule, run at ingestion: documents are admitted in order until
    * their (lang, source) domain's cumulative token mass exceeds the
    * budget; the table reports per-domain admitted/rejected document
    * counts and the admitted token mass. The batch form is the audit view
    * of the streaming gate (`StreamBudgetGate` holds one running counter
    * per domain and is spec-verified to make identical decisions).
    *
    * Scale shape: one corpus scan, one per-domain window (parallel across
    * domains — the admission order is per-domain, never global), one
    * aggregate to ≤ langs×sources rows. */
  val pipelineBudgetGate: QueryDef = QueryDef(
    "pipeline_budget_gate",
    (s, d) => {
      budgetDecisions(s, d, 150L)
        .groupBy(col("lang"), col("source"))
        .agg(
          sum(when(col("admitted"), 1L).otherwise(0L)).as("n_admitted"),
          sum(when(!col("admitted"), 1L).otherwise(0L)).as("n_rejected"),
          sum(when(col("admitted"), col("tok")).otherwise(0L)).as("tokens_admitted"))
        .orderBy("lang", "source")
    },
    Some("""
      WITH t AS (
        SELECT doc_id, lang, source,
               len(string_split(text, ' '))::BIGINT AS tok
        FROM documents
      ), c AS (
        SELECT *, sum(tok) OVER (PARTITION BY lang, source ORDER BY doc_id
                                 ROWS UNBOUNDED PRECEDING) AS cum
        FROM t
      )
      SELECT lang, source,
             sum(CASE WHEN cum <= 150 THEN 1 ELSE 0 END)::BIGINT AS n_admitted,
             sum(CASE WHEN cum <= 150 THEN 0 ELSE 1 END)::BIGINT AS n_rejected,
             sum(CASE WHEN cum <= 150 THEN tok ELSE 0 END)::BIGINT AS tokens_admitted
      FROM c
      GROUP BY lang, source
      ORDER BY lang, source
    """.stripMargin.trim)
  )

  /** MULTI-EPOCH MIXTURE PLAN — temperature-scaled domain weighting
    * (α = 0.5: sample shares ∝ √tokens, the standard square-root
    * rebalancing that upweights small domains without letting them
    * dominate) turned into a concrete repetition plan against a training
    * token budget: per (lang, source) domain, its planned token draw and
    * how many times its data gets repeated (in basis points — 25000 bp =
    * the domain is seen 2.5×). This is the data-constrained planning
    * table: which domains run multi-epoch and which are subsampled.
    *
    * Everything is INTEGER-exact across engines: weights are
    * floor(√tokens) (IEEE sqrt is correctly rounded, so floor∘sqrt is
    * deterministic in both Spark and DuckDB), shares/draws/repeats are
    * integer div arithmetic over the weight sums.
    *
    * Scale shape: one corpus scan → ≤ langs×sources rows; the weight
    * total is a whole-frame window over that TINY aggregate
    * (Registry.wholeFrameKey — a lit(1) key would be folded back to the
    * warn-spamming empty spec). */
  val pipelineEpochPlan: QueryDef = QueryDef(
    "pipeline_epoch_plan",
    (s, d) => {
      val budget = 1000000L // demo training-run token budget
      val perDomain = Tables.documents(s, d)
        .select(col("lang"), col("source"),
          graft.plans.StringKernels.spaceSegCount(col("text")).as("n_tokens"))
        .groupBy(col("lang"), col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("tokens"))
        .withColumn("weight", floor(sqrt(col("tokens"))).cast("long"))
      perDomain
        .withColumn("wsum", sum(col("weight")).over(
          Window.partitionBy(graft.Registry.wholeFrameKey(col("weight")))))
        .select(col("lang"), col("source"), col("n_docs"), col("tokens"),
          col("weight"),
          expr("(10000 * weight) div wsum").as("share_bp"),
          expr(s"($budget * weight) div wsum").as("planned_tokens"),
          expr(s"(10000 * (($budget * weight) div wsum)) div tokens").as("repeat_bp"))
        .orderBy("lang", "source")
    },
    Some("""
      WITH ps AS (
        SELECT lang, source, count(*) AS n_docs,
               sum(len(string_split(text, ' ')))::BIGINT AS tokens
        FROM documents
        GROUP BY lang, source
      ), w AS (
        SELECT *, CAST(floor(sqrt(tokens)) AS BIGINT) AS weight FROM ps
      )
      SELECT lang, source, n_docs, tokens, weight,
             (10000 * weight) // (sum(weight) OVER ())::BIGINT AS share_bp,
             (1000000 * weight) // (sum(weight) OVER ())::BIGINT AS planned_tokens,
             (10000 * ((1000000 * weight) // (sum(weight) OVER ())::BIGINT)) // tokens AS repeat_bp
      FROM w
      ORDER BY lang, source
    """.stripMargin.trim)
  )

  /** WEIGHTED (token-proportional) downsampling via SYSTEMATIC interval
    * selection — the sampler a corpus-shrink runs when big documents must
    * stay represented ∝ their token mass: within each (lang, source)
    * domain, documents lie on the cumulative token line in doc_id order
    * and a document is SELECTED iff it straddles a stride boundary
    * (its cumulative interval contains a multiple of the stride), so
    * selection probability ∝ tokens with exactly ⌊mass/stride⌋±1 picks
    * per domain. Unlike A-Res/exp-key weighted reservoirs this needs no
    * floating pow/log — `div` arithmetic only, bit-equal across engines
    * and deterministic under retries.
    *
    * Scale shape: one corpus scan, one per-domain window (the
    * budget-gate exchange — parallel across domains, never a global
    * prefix sum), output is the sample. */
  val pipelineWeightedSample: QueryDef = QueryDef(
    "pipeline_weighted_sample",
    (s, d) => {
      val stride = 500L // demo: one pick per ~500 tokens of domain mass
      val before = Window.partitionBy(col("lang"), col("source")).orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      Tables.documents(s, d)
        .select(col("doc_id"), col("lang"), col("source"),
          graft.plans.StringKernels.spaceSegCount(col("text")).as("n_tokens"))
        .withColumn("cum_before", coalesce(sum(col("n_tokens")).over(before), lit(0L)))
        .withColumn("pick", expr(s"(cum_before + n_tokens) div $stride - cum_before div $stride"))
        .filter(col("pick") > 0)
        .select(col("lang"), col("source"), col("doc_id"), col("n_tokens"),
          expr(s"cum_before div $stride + 1").as("bucket"))
        .orderBy("lang", "source", "doc_id")
    },
    Some("""
      WITH t AS (
        SELECT doc_id, lang, source,
               len(string_split(text, ' '))::BIGINT AS n_tokens
        FROM documents
      ), c AS (
        SELECT *, CAST(coalesce(sum(n_tokens) OVER (PARTITION BY lang, source ORDER BY doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_before
        FROM t
      )
      SELECT lang, source, doc_id, n_tokens,
             cum_before // 500 + 1 AS bucket
      FROM c
      WHERE (cum_before + n_tokens) // 500 - cum_before // 500 > 0
      ORDER BY lang, source, doc_id
    """.stripMargin.trim)
  )

  /** SHARD-BALANCE report — the check run after [[pipelineGlobalShuffle]]
    * assigns a layout: per-shard document and token masses folded to one
    * row (shard count, min/max docs, min/max tokens, and max/mean skew in
    * per-mille for both). doc_skew_pm ≈ 1000 means perfectly balanced
    * lanes; a hot shard shows up here before it shows up as the straggler
    * task of every epoch. One shard aggregate (64 rows) + a 1-row fold —
    * the fact is scanned once. Integer-exact: max/mean as
    * (1000·max·n_shards) div total. */
  val pipelineShardSkew: QueryDef = QueryDef(
    "pipeline_shard_skew",
    (s, d) => {
      val key = conv(substring(md5(col("doc_id").cast("string")), 1, 15), 16, 10)
        .cast("long")
      Tables.documents(s, d)
        .select(pmod(key, lit(64L)).as("shard"),
          graft.plans.StringKernels.spaceSegCount(col("text")).as("tok"))
        .groupBy(col("shard"))
        .agg(count(lit(1)).as("docs"), sum(col("tok")).as("toks"))
        .agg(
          count(lit(1)).as("n_shards"),
          min(col("docs")).as("min_docs"), max(col("docs")).as("max_docs"),
          sum(col("docs")).as("total_docs"),
          min(col("toks")).as("min_tokens"), max(col("toks")).as("max_tokens"),
          sum(col("toks")).as("total_tokens"))
        .select(
          col("n_shards"), col("min_docs"), col("max_docs"),
          expr("(1000 * max_docs * n_shards) div total_docs").as("doc_skew_pm"),
          col("min_tokens"), col("max_tokens"),
          expr("(1000 * max_tokens * n_shards) div total_tokens").as("token_skew_pm"))
        .orderBy("n_shards")
    },
    Some("""
      WITH k AS (
        SELECT ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT % 64 AS shard,
               len(string_split(text, ' '))::BIGINT AS tok
        FROM documents
      ), sh AS (
        SELECT shard, count(*)::BIGINT AS docs, sum(tok)::BIGINT AS toks
        FROM k GROUP BY shard
      )
      SELECT count(*)::BIGINT AS n_shards,
             min(docs)::BIGINT AS min_docs, max(docs)::BIGINT AS max_docs,
             ((1000 * max(docs) * count(*)) // sum(docs))::BIGINT AS doc_skew_pm,
             min(toks)::BIGINT AS min_tokens, max(toks)::BIGINT AS max_tokens,
             ((1000 * max(toks) * count(*)) // sum(toks))::BIGINT AS token_skew_pm
      FROM sh
      ORDER BY n_shards
    """.stripMargin.trim)
  )

  /** STRIDE-SCHEDULED domain INTERLEAVING — the read-time mixing order a
    * trainer consumes: each language is a lane with weight w (en 8×, zh
    * 1×, rest 2× — the token-budget mix), docs take lane-local positions
    * r (md5 order, reproducible), and the virtual-time key
    * `((2r−1)·500000) div w` interleaves the lanes so every window of the
    * stream holds domains in weight proportion (stride scheduling:
    * Waldspurger & Weihl, OSDI'94). The head of the stream (120 rows
    * here) is what a smoke-test batch reads.
    *
    * Scale shape: per-lane windows (parallel across lanes), then
    * TakeOrdered for the head — the global mix order is DEFINED for the
    * whole corpus but never materialized as a global sort; a consumer
    * range-reads (key_lo, key_hi] slices, each a pruned scan at 100 TB. */
  val pipelineInterleave: QueryDef = QueryDef(
    "pipeline_interleave",
    (s, d) => {
      val mkey = conv(substring(md5(col("doc_id").cast("string")), 1, 15), 16, 10)
        .cast("long")
      val w = when(col("lang") === "en", 8L)
        .when(col("lang") === "zh", 1L).otherwise(2L)
      Tables.documents(s, d)
        .select(col("doc_id"), col("lang"), mkey.as("mkey"), w.as("w"))
        .withColumn("r",
          row_number().over(
            Window.partitionBy(col("lang")).orderBy(col("mkey"), col("doc_id")))
            .cast("long"))
        .select(col("doc_id"), col("lang"),
          expr("((2 * r - 1) * 500000) div w").as("vkey"))
        .orderBy(col("vkey"), col("lang"), col("doc_id"))
        .limit(120)
    },
    Some("""
      WITH k AS (
        SELECT doc_id, lang,
               ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT AS mkey,
               (CASE WHEN lang = 'en' THEN 8 WHEN lang = 'zh' THEN 1
                     ELSE 2 END)::BIGINT AS w
        FROM documents
      ), r AS (
        SELECT doc_id, lang, w,
               CAST(row_number() OVER (PARTITION BY lang ORDER BY mkey, doc_id) AS BIGINT) AS r
        FROM k
      )
      SELECT doc_id, lang, ((2 * r - 1) * 500000) // w AS vkey
      FROM r
      ORDER BY vkey, lang, doc_id
      LIMIT 120
    """.stripMargin.trim)
  )

  /** One local skyline pass over rows sorted by (price asc, size desc,
    * key): a row survives iff nothing seen so far dominates it
    * (dominator: price ≤ AND size ≥, at least one strict). Applied to a
    * partition it yields a SUPERSET filter (any global-skyline member
    * survives its partition's pass); applied to all candidates at once it
    * is exact. */
  private[graft] def skylinePass(
      rows: Iterator[(Long, Double, Int)]): Iterator[(Long, Double, Int)] = {
    val sorted = rows.toArray.sortBy { case (k, p, s) => (p, -s, k) }
    val out = Array.newBuilder[(Long, Double, Int)]
    var bestBefore = Int.MinValue   // max size among strictly cheaper rows
    var i = 0
    while (i < sorted.length) {
      // one equal-price run: head(s) carry the run's max size
      var j = i
      val price = sorted(i)._2
      val runMax = sorted(i)._3
      while (j < sorted.length && sorted(j)._2 == price) {
        val r = sorted(j)
        // dominated by a strictly cheaper row of size ≥ ours, or by a
        // same-price row of strictly larger size
        if (r._3 > bestBefore && r._3 == runMax) out += r
        j += 1
      }
      bestBefore = math.max(bestBefore, runMax)
      i = j
    }
    out.result().iterator
  }

  /** SKYLINE (Pareto frontier) — the multi-objective selection operator
    * (Börzsönyi et al., ICDE 2001): parts minimizing retail price while
    * maximizing size; a part is on the skyline iff no other part is both
    * ≤ in price and ≥ in size with one strict. The engine-native shape is
    * the classic two-phase distributed skyline: each partition computes
    * its LOCAL skyline with one sorted pass (local skylines are a sound
    * superset — a dominator in the same partition would have eliminated
    * the row), then the few surviving candidates (O(frontier), not
    * O(corpus)) collapse in a single-partition exact pass. No cartesian
    * product, no global sort of the fact; the oracle's NOT EXISTS
    * self-join is the semantics, quadratic only in DuckDB. */
  val qSkyline: QueryDef = QueryDef(
    "q_skyline",
    (s, d) => {
      import s.implicits._
      val base = Tables.part(s, d)
        .select(col("p_partkey").cast("long"), col("p_retailprice"), col("p_size"))
        .as[(Long, Double, Int)]
      val candidates = base.mapPartitions(skylinePass)
      // exact pass over the small candidate set; explicit 1-partition
      // exchange (repartition, not coalesce: coalesce would drag whole
      // input partitions into one task and un-do the local passes)
      candidates.repartition(1).mapPartitions(skylinePass)
        .toDF("p_partkey", "p_retailprice", "p_size")
        .select(col("p_partkey"), round(col("p_retailprice"), 2).as("price"),
          col("p_size").as("size"))
        .orderBy("price", "p_partkey")
    },
    Some("""
      SELECT a.p_partkey, round(a.p_retailprice, 2) AS price, a.p_size AS size
      FROM part a
      WHERE NOT EXISTS (
        SELECT 1 FROM part b
        WHERE b.p_retailprice <= a.p_retailprice AND b.p_size >= a.p_size
          AND (b.p_retailprice < a.p_retailprice OR b.p_size > a.p_size))
      ORDER BY price, a.p_partkey
    """.stripMargin.trim)
  )

  val all: Seq[QueryDef] = Seq(
    pipelineGlobalShuffle, pipelineLengthBuckets, pipelineBudgetGate,
    pipelineInterleave, pipelineShardSkew, pipelineEpochPlan,
    pipelineWeightedSample, qSkyline)
}
