package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}

/** Corpus-curation operators — the stages between "raw crawl" and
  * "training shards" in an LLM data pipeline: benchmark decontamination,
  * sequence packing, stratified downsampling, the C4-style quality-filter
  * waterfall, and subword-length vocabulary statistics.
  *
  * Shared conventions: deterministic md5-derived routing (stable under
  * retries/repartitioning — the property that makes 100 TB shard builds
  * reproducible, same scheme as [[TrainingOps.pipelineTrainSplit]]); all
  * ratios via exact integer division (both engines floor non-negative
  * quotients identically); token streams are typed flatMaps, never
  * `explode(transform(...))` (the Generate re-evaluation pitfall).
  */
object Curation {

  /** md5-derived permille bucket of doc_id — identical arithmetic in
    * DuckDB: `('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT`. */
  private def md5Bucket(modulus: Int) =
    pmod(conv(substring(md5(col("doc_id").cast("string")), 1, 15), 16, 10).cast("long"), lit(modulus))

  private val bucketSql = "('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT"

  /** Distinct word 8-grams per doc as a typed flatMap: one tight loop per
    * document (slice + join + local HashSet dedup), no Generate, no
    * per-element Catalyst evaluation. */
  private def shingles(df: DataFrame, s: SparkSession): DataFrame = {
    import s.implicits._
    df.select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .flatMap { case (id, text) => wordShingles8(text).iterator.map(sh => (id, sh)) }
      .toDF("doc_id", "sh")
  }

  /** One doc's distinct word 8-grams, JVM-side — the shared kernel of the
    * batch contamination check and the streaming ingestion gate
    * ([[graft.streaming.StreamContamination]]), so both compute identical
    * shingle sets. First-occurrence order, deduped. */
  private[graft] def wordShingles8(text: String): Array[String] = {
    val t = text.toLowerCase(java.util.Locale.ROOT).split(" ", -1)
    val seen = scala.collection.mutable.LinkedHashSet.empty[String]
    var i = 0
    while (i <= t.length - 8) {
      seen += t.slice(i, i + 8).mkString(" ")
      i += 1
    }
    seen.toArray
  }

  /** Benchmark decontamination: fraction of each EVAL doc's distinct word
    * 8-grams that also occur anywhere in the TRAIN split (the
    * n-gram-overlap test run before training on any corpus that might
    * contain eval sets). Split routing reuses the train/eval md5 buckets of
    * `pipeline_train_split`, so "train" here IS the training corpus that
    * split ships.
    *
    * Scale shape: both sides reduce to DISTINCT shingle streams (linear
    * scans + one partial-aggregated distinct each) and meet in a single
    * shingle-keyed equi-join — never doc×doc. At 100 TB you'd join on a
    * 64-bit shingle hash instead of the string (same plan, ~10× less
    * shuffle payload); the string key here keeps the DuckDB oracle exact.
    * Docs shorter than 8 tokens have no 8-grams and drop out on both
    * engines. */
  val pipelineContamination: QueryDef = QueryDef(
    "pipeline_contamination",
    (s, d) => {
      val docs = Tables.documents(s, d).withColumn("bucket", md5Bucket(100))
      val evalSh = shingles(docs.filter(col("bucket") >= 90), s)
      val trainSh = shingles(docs.filter(col("bucket") < 90), s)
        .select(col("sh")).distinct().withColumn("hit", lit(1))
      evalSh.join(trainSh, Seq("sh"), "left")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_ngrams"), count(col("hit")).as("n_contaminated"))
        .withColumn("contamination_pct", expr("(10000 * n_contaminated) div n_ngrams") / 100.0)
        .orderBy("doc_id")
    },
    Some(s"""
      WITH b AS (
        SELECT doc_id, string_split(lower(text), ' ') AS t,
               $bucketSql % 100 AS bucket
        FROM documents
      ), esh AS (
        SELECT DISTINCT doc_id, sh FROM (
          SELECT doc_id,
                 unnest(list_transform(range(1, len(t) - 6),
                                       r -> array_to_string(t[r:r+7], ' '))) AS sh
          FROM b WHERE bucket >= 90)
      ), tsh AS (
        SELECT DISTINCT sh FROM (
          SELECT unnest(list_transform(range(1, len(t) - 6),
                                       r -> array_to_string(t[r:r+7], ' '))) AS sh
          FROM b WHERE bucket < 90)
      )
      SELECT e.doc_id, count(*) AS n_ngrams, count(t.sh) AS n_contaminated,
             ((10000 * count(t.sh)) // count(*)) / 100.0 AS contamination_pct
      FROM esh e LEFT JOIN tsh t USING (sh)
      GROUP BY e.doc_id
      ORDER BY doc_id
    """.stripMargin.trim)
  )

  /** Sequence packing (concatenate-then-chunk): docs are laid out in
    * doc_id order within each (lang, source) stream, and each doc joins
    * the 2048-token context window its START offset falls in — the
    * standard packing approximation for LLM pretraining shards. The
    * running offset is a window sum over (lang, source); partitioning by
    * BOTH keys is the parallelism point: packing is embarrassingly
    * parallel across streams, and at 100 TB a shard key with enough
    * cardinality (here lang×source) keeps every executor busy — packing
    * by lang alone would serialize onto ~5 tasks. */
  val pipelinePackSequences: QueryDef = QueryDef(
    "pipeline_pack_sequences",
    (s, d) => {
      val w = Window.partitionBy(col("lang"), col("source")).orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      Tables.documents(s, d)
        .select(col("doc_id"), col("lang"), col("source"),
          graft.plans.StringKernels.spaceSegCount(col("text")).as("n_tokens"))
        .withColumn("off", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
        .groupBy(col("lang"), col("source"), expr("off div 2048").as("bin"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("bin_tokens"))
        .orderBy("lang", "source", "bin")
    },
    Some("""
      WITH t AS (
        SELECT doc_id, lang, source, len(string_split(text, ' ')) AS n_tokens
        FROM documents
      ), o AS (
        SELECT *, coalesce(sum(n_tokens) OVER (PARTITION BY lang, source ORDER BY doc_id
                                               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                           0) AS off
        FROM t
      )
      SELECT lang, source, (off // 2048)::BIGINT AS bin,
             count(*) AS n_docs, sum(n_tokens)::BIGINT AS bin_tokens
      FROM o
      GROUP BY lang, source, bin
      ORDER BY lang, source, bin
    """.stripMargin.trim)
  )

  /** Stratified downsampling: overrepresented strata keep a lower
    * deterministic fraction (en → 200‰, other langs → 600‰), routed by an
    * md5 permille bucket of doc_id — no RNG, so the sample is identical
    * under reruns, retries, and any partitioning, and any doc's membership
    * is auditable from its id alone. One narrow scan + one tiny-key
    * aggregate; nothing shuffles at doc granularity. */
  val pipelineStratifiedSample: QueryDef = QueryDef(
    "pipeline_stratified_sample",
    (s, d) => {
      val target = when(col("lang") === "en", 200L).otherwise(600L)
      Tables.documents(s, d)
        .withColumn("keep", (md5Bucket(1000) < target).cast("int"))
        .groupBy(col("lang"))
        .agg(
          count(lit(1)).as("n_total"),
          sum(col("keep")).as("n_sampled"),
          max(target).as("target_permille"))
        .withColumn("achieved_permille", expr("(1000 * n_sampled) div n_total"))
        .orderBy("lang")
    },
    Some(s"""
      SELECT lang, count(*) AS n_total,
             sum(CASE WHEN $bucketSql % 1000 <
                           CASE WHEN lang = 'en' THEN 200 ELSE 600 END
                      THEN 1 ELSE 0 END)::BIGINT AS n_sampled,
             max(CASE WHEN lang = 'en' THEN 200 ELSE 600 END)::BIGINT AS target_permille,
             (1000 * sum(CASE WHEN $bucketSql % 1000 <
                                   CASE WHEN lang = 'en' THEN 200 ELSE 600 END
                              THEN 1 ELSE 0 END)::BIGINT) // count(*) AS achieved_permille
      FROM documents
      GROUP BY lang
      ORDER BY lang
    """.stripMargin.trim)
  )

  /** C4-style quality-filter waterfall, reported per language: how many
    * docs survive (1) the length gate, (2) + exact dedup (min-doc_id-per-
    * content-hash, the keeper rule of `dedup_exact`), (3) + the lexical
    * quality gate (≥30 tokens and ≥40% distinct — the repetition filter).
    * The dedup membership test is a window min over md5(text) — the same
    * single content-hash shuffle `dedup_exact` pays, with no join back.
    * The quality predicate is pure integer arithmetic (`10·distinct ≥
    * 4·tokens`), so both engines decide identically — no float thresholds
    * at the filter boundary. */
  val pipelineQualityFilter: QueryDef = QueryDef(
    "pipeline_quality_filter",
    (s, d) => {
      val toks = split(lower(col("text")), " ")
      Tables.documents(s, d)
        .withColumn("keeper", min(col("doc_id")).over(Window.partitionBy(md5(col("text")))))
        .select(
          col("lang"),
          (col("n_chars") >= 100).cast("int").as("len_ok"),
          (col("doc_id") === col("keeper")).cast("int").as("dedup_ok"),
          (size(toks) >= 30 &&
            size(array_distinct(toks)) * 10 >= size(toks) * 4).cast("int").as("qual_ok"))
        .groupBy(col("lang"))
        .agg(
          count(lit(1)).as("n_total"),
          sum(col("len_ok")).as("n_after_len"),
          sum(col("len_ok") * col("dedup_ok")).as("n_after_dedup"),
          sum(col("len_ok") * col("dedup_ok") * col("qual_ok")).as("n_kept"))
        .withColumn("kept_pct", expr("(10000 * n_kept) div n_total") / 100.0)
        .orderBy("lang")
    },
    Some("""
      WITH f AS (
        SELECT lang,
               CASE WHEN n_chars >= 100 THEN 1 ELSE 0 END AS len_ok,
               CASE WHEN doc_id = min(doc_id) OVER (PARTITION BY md5(text)) THEN 1 ELSE 0 END AS dedup_ok,
               CASE WHEN len(string_split(lower(text), ' ')) >= 30
                     AND len(list_distinct(string_split(lower(text), ' '))) * 10 >=
                         len(string_split(lower(text), ' ')) * 4
                    THEN 1 ELSE 0 END AS qual_ok
        FROM documents
      )
      SELECT lang, count(*) AS n_total,
             sum(len_ok)::BIGINT AS n_after_len,
             sum(len_ok * dedup_ok)::BIGINT AS n_after_dedup,
             sum(len_ok * dedup_ok * qual_ok)::BIGINT AS n_kept,
             ((10000 * sum(len_ok * dedup_ok * qual_ok)::BIGINT) // count(*)) / 100.0 AS kept_pct
      FROM f
      GROUP BY lang
      ORDER BY lang
    """.stripMargin.trim)
  )

  /** Subword/token length distribution over the corpus — the vocabulary
    * statistic that sizes a tokenizer (length histogram + distinct types
    * per length). Typed flatMap token stream into a ≤~20-key partial
    * aggregate; the distinct-type count shuffles (len, token) pairs once,
    * map-side deduplicated. */
  val textTokenLenHist: QueryDef = QueryDef(
    "text_token_len_hist",
    (s, d) => {
      import s.implicits._
      Tables.documents(s, d)
        .select(col("text"))
        .as[String]
        .flatMap(t => t.toLowerCase(java.util.Locale.ROOT).split(" ", -1).iterator)
        .toDF("token")
        .groupBy(length(col("token")).cast("long").as("token_len"))
        .agg(count(lit(1)).as("n_tokens"), countDistinct(col("token")).as("n_types"))
        .orderBy("token_len")
    },
    Some("""
      WITH t AS (SELECT unnest(string_split(lower(text), ' ')) AS token FROM documents)
      SELECT len(token)::BIGINT AS token_len,
             count(*) AS n_tokens,
             count(DISTINCT token) AS n_types
      FROM t
      GROUP BY token_len
      ORDER BY token_len
    """.stripMargin.trim)
  )

  /** Data-mixture report: token mass per (lang, source) stream and its
    * share of the corpus in basis points — the table every pretraining
    * mixture decision reads. One narrow scan + tiny-key aggregate; the
    * global total is a 1-row broadcast; shares are exact integer basis
    * points. */
  val pipelineDomainMix: QueryDef = QueryDef(
    "pipeline_domain_mix",
    (s, d) => {
      // The global total is a whole-frame window over the ALREADY-AGGREGATED
      // ≤ langs×sources rows (not the corpus) — one corpus scan total; a
      // scalar-subquery formulation would recompute the aggregate twice.
      // Partition key: Registry.wholeFrameKey — lit(1) is constant-folded
      // back to an empty spec, which makes WindowExec WARN per task.
      val perStream = Tables.documents(s, d)
        .select(col("lang"), col("source"),
          graft.plans.StringKernels.spaceSegCount(col("text")).as("n_tokens"))
        .groupBy(col("lang"), col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("tokens"))
      perStream
        .withColumn("g", sum(col("tokens")).over(
          Window.partitionBy(graft.Registry.wholeFrameKey(col("tokens")))))
        .select(col("lang"), col("source"), col("n_docs"), col("tokens"),
          expr("(10000 * tokens) div g").as("share_bp"))
        .orderBy("lang", "source")
    },
    Some("""
      WITH ps AS (
        SELECT lang, source, count(*) AS n_docs,
               sum(len(string_split(text, ' ')))::BIGINT AS tokens
        FROM documents
        GROUP BY lang, source
      )
      SELECT lang, source, n_docs, tokens,
             (10000 * tokens) // (sum(tokens) OVER ())::BIGINT AS share_bp
      FROM ps
      ORDER BY lang, source
    """.stripMargin.trim)
  )

  /** Demo shard size in tokens. Real shard builds target ~10⁸ tokens per
    * shard; the testdata streams hold a few hundred tokens each, so the
    * demo size keeps multiple shards per stream actually exercised. */
  private[graft] val ShardTokens = 128

  /** Greedy in-order shard assignment: within each (lang, source) stream,
    * docs pack into shards of ~[[ShardTokens]] tokens — a doc's shard is
    * `tokens-before-it div size` (the running sum EXCLUDING the doc, so a
    * doc that overflows a shard starts it rather than splitting). One
    * stream-keyed exchange; the running sum is a ROWS frame over the same
    * partitioning the manifest aggregate reuses. */
  private[graft] def shardAssignment(s: SparkSession, d: String, size: Int): DataFrame = {
    val before = Window.partitionBy(col("lang"), col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.documents(s, d)
      .select(col("doc_id"), col("lang"), col("source"), col("text"),
        graft.plans.StringKernels.spaceSegCount(col("text")).as("n_tokens"))
      .withColumn("run_before", coalesce(sum(col("n_tokens")).over(before), lit(0L)))
      .withColumn("shard_no", expr(s"run_before div $size"))
  }

  /** Shard MANIFEST — the table a 100 TB shard build publishes next to its
    * data: per (lang, source, shard_no), the doc count, token mass and
    * doc_id range. Deterministic by construction (in-order packing over
    * doc_id), so retries/rebuilds produce byte-identical manifests.
    * [[graft.sources.ShardWriter]] materializes this exact layout to disk;
    * the query IS its manifest, oracle-checked. */
  val pipelineShardManifest: QueryDef = QueryDef(
    "pipeline_shard_manifest",
    (s, d) =>
      shardAssignment(s, d, ShardTokens)
        .groupBy(col("lang"), col("source"), col("shard_no"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("tokens"),
          min(col("doc_id")).as("first_doc"),
          max(col("doc_id")).as("last_doc"))
        .orderBy("lang", "source", "shard_no"),
    Some(s"""
      WITH t AS (
        SELECT doc_id, lang, source,
               len(string_split(text, ' '))::BIGINT AS n_tokens
        FROM documents
      ), r AS (
        SELECT *, coalesce(sum(n_tokens) OVER (
                 PARTITION BY lang, source ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS run_before
        FROM t
      )
      SELECT lang, source, (run_before // $ShardTokens)::BIGINT AS shard_no,
             count(*) AS n_docs, sum(n_tokens)::BIGINT AS tokens,
             min(doc_id) AS first_doc, max(doc_id) AS last_doc
      FROM r
      GROUP BY 1, 2, 3
      ORDER BY lang, source, shard_no
    """.stripMargin.trim)
  )

  /** The WHOLE curation pipeline as ONE declarative plan — raw corpus →
    * quality waterfall (length gate + exact-dedup keeper + lexical
    * repetition gate) → deterministic stratified downsample → packed
    * ~2048-token training bins per (lang, source) stream, reported as the
    * final shard manifest. This is the "switch the reference user's whole
    * job to one query" flagship: every stage is the SAME logic its
    * standalone operator verifies, composed so Catalyst sees one tree —
    * two hash exchanges total (the md5(text) dedup window and the stream
    * window, whose partitioning the manifest aggregate reuses), and the
    * length/quality/sample predicates all run in the first pass before
    * anything shuffles at doc granularity. */
  val pipelineE2eManifest: QueryDef = QueryDef(
    "pipeline_e2e_manifest",
    (s, d) => {
      val toks = split(lower(col("text")), " ")
      val kept = Tables.documents(s, d)
        .withColumn("keeper", min(col("doc_id")).over(Window.partitionBy(md5(col("text")))))
        .withColumn("n_tokens", graft.plans.StringKernels.spaceSegCount(col("text")))
        .filter(col("n_chars") >= 100 &&
          col("doc_id") === col("keeper") &&
          col("n_tokens") >= 30 &&
          size(array_distinct(toks)) * 10 >= size(toks) * 4 &&
          md5Bucket(1000) < when(col("lang") === "en", 200L).otherwise(600L))
        .select(col("doc_id"), col("lang"), col("source"), col("n_tokens"))
      val before = Window.partitionBy(col("lang"), col("source")).orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      kept
        .withColumn("off", coalesce(sum(col("n_tokens")).over(before), lit(0L)))
        .groupBy(col("lang"), col("source"), expr("off div 2048").as("bin"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("bin_tokens"),
          min(col("doc_id")).as("first_doc"),
          max(col("doc_id")).as("last_doc"))
        .orderBy("lang", "source", "bin")
    },
    Some(s"""
      WITH t AS (
        SELECT doc_id, lang, source, n_chars,
               len(string_split(text, ' '))::BIGINT AS n_tokens,
               len(list_distinct(string_split(lower(text), ' '))) AS n_distinct,
               min(doc_id) OVER (PARTITION BY md5(text)) AS keeper
        FROM documents
      ), kept AS (
        SELECT doc_id, lang, source, n_tokens
        FROM t
        WHERE n_chars >= 100 AND doc_id = keeper AND n_tokens >= 30
          AND n_distinct * 10 >= n_tokens * 4
          AND $bucketSql % 1000 < CASE WHEN lang = 'en' THEN 200 ELSE 600 END
      ), o AS (
        SELECT *, coalesce(sum(n_tokens) OVER (
                 PARTITION BY lang, source ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
        FROM kept
      )
      SELECT lang, source, (off // 2048)::BIGINT AS bin, count(*) AS n_docs,
             sum(n_tokens)::BIGINT AS bin_tokens,
             min(doc_id) AS first_doc, max(doc_id) AS last_doc
      FROM o
      GROUP BY 1, 2, 3
      ORDER BY lang, source, bin
    """.stripMargin.trim)
  )

  /** Dedup waterfall report — the stage-by-stage table a pipeline owner
    * reads after an ingest run: how many docs each dedup pass dropped, in
    * pass order (each stage sees only the previous stage's survivors):
    *   1. `exact` — byte-identical text (md5(text), first doc_id wins);
    *   2. `bag`   — token-SET fingerprint (reordered copies; the
    *                [[Dedup.dedupIncremental]] key);
    *   3. `lines` — cross-doc repeated 10-word chunks (the
    *                [[Dedup.dedupLines]] rule): drops no docs, reports
    *                the chunk volume removed and docs touched.
    *
    * Scale: ONE corpus scan through two per-doc window flags (md5 and
    * fingerprint exchanges; the fingerprint ranking partitions dropped
    * docs into a null key, so their presence can't shift survivor ranks),
    * then the line flatMap over survivors with its line exchange. The
    * tiny per-doc flag frame is cached for its two aggregate consumers
    * (typed-subtree recompute rule, CLAUDE.md); the stage rows are a
    * `stack` over ONE assembled row — no collect. */
  val pipelineDedupReport: QueryDef = QueryDef(
    "pipeline_dedup_report",
    (s, d) => {
      import s.implicits._
      val wExact = Window.partitionBy(md5(col("text"))).orderBy(col("doc_id"))
      // survivors of exact rank among themselves on the bag key; dropped
      // docs get a NULL partition so they can't occupy a bag rank
      val bagKey = md5(concat_ws(" ",
        array_sort(array_distinct(split(lower(col("text")), " ")))))
      val wBag = Window
        .partitionBy(when(col("rn_exact") === 1, bagKey))
        .orderBy(col("doc_id"))
      val flags = Tables.documents(s, d)
        .select(col("doc_id"), col("text"))
        .withColumn("rn_exact", row_number().over(wExact))
        .withColumn("rn_bag", when(col("rn_exact") === 1,
          row_number().over(wBag)))
        .cache()
      val stageCounts = flags.agg(
        count(lit(1)).as("n_total"),
        sum(when(col("rn_exact") > 1, 1L).otherwise(0L)).as("drop_exact"),
        sum(when(col("rn_bag") > 1, 1L).otherwise(0L)).as("drop_bag"))
      val lineWords = 10
      val chunks = flags.filter(col("rn_bag") === 1)
        .select(col("doc_id"), col("text"))
        .as[(Long, String)]
        .flatMap { case (id, t) =>
          t.split(' ').grouped(lineWords).zipWithIndex
            .map { case (ws, i) => (id, i.toLong, ws.mkString(" ")) }
        }
        .toDF("doc_id", "line_no", "line")
      val wLine = Window.partitionBy(col("line")).orderBy(col("doc_id"), col("line_no"))
      val lineCounts = chunks
        .withColumn("rn", row_number().over(wLine))
        .agg(
          sum(when(col("rn") > 1, 1L).otherwise(0L)).as("lines_removed"),
          countDistinct(when(col("rn") > 1, col("doc_id"))).as("docs_touched"))
      stageCounts.crossJoin(lineCounts)
        .selectExpr("""stack(3,
          1, 'exact', n_total, drop_exact, 0L, 0L,
          2, 'bag', n_total - drop_exact, drop_bag, 0L, 0L,
          3, 'lines', n_total - drop_exact - drop_bag, 0L, lines_removed, docs_touched)
          AS (stage_no, stage, docs_in, docs_dropped, lines_removed, docs_touched)""")
        .withColumn("docs_out", col("docs_in") - col("docs_dropped"))
        .orderBy("stage_no")
    },
    Some("""
      WITH flagged AS (
        SELECT doc_id, text,
               row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn_exact
        FROM documents
      ), bagged AS (
        SELECT doc_id, text, rn_exact,
               CASE WHEN rn_exact = 1 THEN row_number() OVER (
                 PARTITION BY CASE WHEN rn_exact = 1 THEN
                   md5(array_to_string(list_sort(list_distinct(string_split(lower(text), ' '))), ' '))
                 END ORDER BY doc_id) END AS rn_bag
        FROM flagged
      ), stages AS (
        SELECT count(*) AS n_total,
               sum(CASE WHEN rn_exact > 1 THEN 1 ELSE 0 END)::BIGINT AS drop_exact,
               sum(CASE WHEN rn_bag > 1 THEN 1 ELSE 0 END)::BIGINT AS drop_bag
        FROM bagged
      ), words AS (
        SELECT doc_id, string_split(text, ' ') AS w FROM bagged WHERE rn_bag = 1
      ), chunks AS (
        SELECT doc_id, i - 1 AS line_no,
               array_to_string(w[(i-1)*10+1:i*10], ' ') AS line
        FROM words, LATERAL (
          SELECT unnest(range(1, CAST(ceil(len(w) / 10.0) AS INT) + 1)) AS i) t
      ), ranked AS (
        SELECT *, row_number() OVER (PARTITION BY line ORDER BY doc_id, line_no) AS rn
        FROM chunks
      ), lines AS (
        SELECT sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END)::BIGINT AS lines_removed,
               count(DISTINCT CASE WHEN rn > 1 THEN doc_id END)::BIGINT AS docs_touched
        FROM ranked
      )
      SELECT stage_no, stage, docs_in, docs_dropped, lines_removed, docs_touched,
             docs_in - docs_dropped AS docs_out
      FROM (
        SELECT 1 AS stage_no, 'exact' AS stage, n_total AS docs_in,
               drop_exact AS docs_dropped, 0::BIGINT AS lines_removed,
               0::BIGINT AS docs_touched FROM stages, lines
        UNION ALL
        SELECT 2, 'bag', n_total - drop_exact, drop_bag, 0::BIGINT, 0::BIGINT
        FROM stages, lines
        UNION ALL
        SELECT 3, 'lines', n_total - drop_exact - drop_bag, 0::BIGINT,
               lines_removed, docs_touched FROM stages, lines
      )
      ORDER BY stage_no
    """.stripMargin.trim)
  )

  /** PII scrub — the redaction pass every published pretraining corpus
    * runs (C4 strips lines by blocklist; The Pile / RefinedWeb regex-mask
    * emails, IPs and phone numbers). The synthetic corpus carries no PII,
    * so the op first SEEDS each doc with deterministic doc_id-derived
    * PII (an email, an IPv4, a phone, a second email on every third doc —
    * identical construction in the oracle), then masks with the three
    * conservative patterns below and reports per-doc match counts, the
    * redaction byte delta, and the cleaned-text digest.
    *
    * Regex parity: all three patterns avoid lookaround/backrefs, so the
    * [[PiiScan]] hand scanners (Spark side, r17 — ~4x the regex chain),
    * java.util.regex (the PropertySpec definitional oracle) and RE2
    * (DuckDB) match identically; the oracle passes the 'g' flag since
    * DuckDB's regexp_replace is first-match-only by default while the
    * scanner always replaces all.
    *
    * Scale shape: a pure narrow map — one typed pass, zero exchanges; at
    * 100 TB this pipelines with the quality filter in one scan. */
  val pipelinePiiScrub: QueryDef = QueryDef(
    "pipeline_pii_scrub",
    (s, d) => {
      // One typed pass per document through the [[PiiScan]] hand
      // scanners (round 17) instead of SIX java.util.regex passes (3
      // regexp_count on the seeded text + 3 chained regexp_replace) —
      // same leftmost-first/greedy semantics, proven against
      // java.util.regex directly in PropertySpec and re-attested by the
      // unchanged DuckDB-regex oracle on every sweep. Counts are on the
      // SEEDED text; replaces chain (emails, then IPs on that result,
      // then phones). chars_redacted counts CODE POINTS (Spark length()
      // semantics) so a non-ASCII corpus can't silently diverge.
      import s.implicits._
      Tables.documents(s, d)
        .select(col("doc_id"), col("text"))
        .as[(Long, String)]
        .mapPartitions { it =>
          it.map { case (id, text) =>
            val sb = new java.lang.StringBuilder(text.length + 96)
            sb.append(text)
              .append(" contact user").append(id).append("@example.com")
              .append(" via 10.").append(id % 256).append(".0.").append(id % 100)
            if (id % 3 == 0)
              sb.append(" cc admin").append(id).append("@mail.example.org")
            sb.append(" tel 555-").append(id % 9000 + 1000)
            val seeded = sb.toString
            val (nEmails, nIps, nPhones, clean) = PiiScan.scrub(seeded)
            (id, nEmails, nIps, nPhones,
              (seeded.codePointCount(0, seeded.length) -
                clean.codePointCount(0, clean.length)).toLong,
              PiiScan.md5Hex(clean))
          }
        }
        .toDF("doc_id", "n_emails", "n_ips", "n_phones", "chars_redacted", "clean_md5")
        .orderBy("doc_id")
    },
    Some("""
      WITH seeded AS (
        SELECT doc_id,
               text || ' contact user' || doc_id || '@example.com' ||
                 ' via 10.' || (doc_id % 256) || '.0.' || (doc_id % 100) ||
                 CASE WHEN doc_id % 3 = 0
                      THEN ' cc admin' || doc_id || '@mail.example.org'
                      ELSE '' END ||
                 ' tel 555-' || (doc_id % 9000 + 1000) AS t
        FROM documents
      ), cleaned AS (
        SELECT doc_id, t,
               regexp_replace(
                 regexp_replace(
                   regexp_replace(t,
                     '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
                   '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '[IP]', 'g'),
                 '\b\d{3}-\d{4}\b', '[PHONE]', 'g') AS c
        FROM seeded
      )
      SELECT doc_id,
             len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))::INT AS n_emails,
             len(regexp_extract_all(t, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b'))::INT AS n_ips,
             len(regexp_extract_all(t, '\b\d{3}-\d{4}\b'))::INT AS n_phones,
             (length(t) - length(c))::BIGINT AS chars_redacted,
             md5(c) AS clean_md5
      FROM cleaned
      ORDER BY doc_id
    """.stripMargin.trim)
  )

  /** Token-BUDGET allocation — the training-mix planning table: given a
    * corpus-wide token budget B (80% of available mass here), split it
    * across (lang, source) domains by quality-weighted availability
    * (weight = mult(lang) × available tokens; en upweighted 8×, zh 1×,
    * rest 2× — the LLaMA/Gopher-style mix reweighting) with per-domain
    * availability CAPS and one water-filling redistribution round:
    * domains whose proportional share exceeds their mass are clamped to
    * it and the leftover re-splits over the uncapped domains by the same
    * weights (again clamped). Reports per-domain available/allocated
    * tokens and the sampling rate in permille (1000 = a full epoch of the
    * domain).
    *
    * Everything is integer arithmetic (`div` / `//` floor identically on
    * the non-negative operands), so the plan is hash-exact vs the oracle.
    * `B * w` products stay < 2⁶³ up to ~10¹² tokens per side; a 100 TB
    * corpus swaps the two products to DECIMAL(38) — same plan.
    *
    * Scale shape: one corpus aggregate down to ≤ langs×sources rows, then
    * two whole-frame windows over that tiny frame (same single-partition
    * exchange, [[graft.Registry.wholeFrameKey]]); the fact is scanned
    * once. */
  val pipelineTokenBudget: QueryDef = QueryDef(
    "pipeline_token_budget",
    (s, d) => {
      val whole = Window.partitionBy(graft.Registry.wholeFrameKey(col("avail")))
      val perDomain = Tables.documents(s, d)
        .select(col("lang"), col("source"),
          graft.plans.StringKernels.spaceSegCount(col("text")).as("n_tokens"))
        .groupBy(col("lang"), col("source"))
        .agg(sum(col("n_tokens")).as("avail"))
        .withColumn("w",
          col("avail") * when(col("lang") === "en", 8L)
            .when(col("lang") === "zh", 1L).otherwise(2L))
      val round1 = perDomain
        .withColumn("sum_avail", sum(col("avail")).over(whole))
        .withColumn("sum_w", sum(col("w")).over(whole))
        .withColumn("budget", expr("(4 * sum_avail) div 5"))
        .withColumn("alloc1", least(col("avail"), expr("(budget * w) div sum_w")))
      val whole2 = Window.partitionBy(graft.Registry.wholeFrameKey(col("alloc1")))
      round1
        .withColumn("leftover", col("budget") - sum(col("alloc1")).over(whole2))
        .withColumn("unc_w",
          sum(when(col("alloc1") < col("avail"), col("w")).otherwise(0L)).over(whole2))
        .select(
          col("lang"), col("source"), col("avail"),
          least(col("avail"),
            col("alloc1") + when(col("alloc1") < col("avail") && col("unc_w") > 0,
              expr("(leftover * w) div unc_w")).otherwise(0L)).as("alloc"))
        .withColumn("rate_permille", expr("(1000 * alloc) div avail"))
        .orderBy("lang", "source")
    },
    Some("""
      WITH dom AS (
        SELECT lang, source,
               sum(len(string_split(text, ' ')))::BIGINT AS avail
        FROM documents
        GROUP BY lang, source
      ), wtd AS (
        SELECT *, avail * (CASE WHEN lang = 'en' THEN 8
                                WHEN lang = 'zh' THEN 1 ELSE 2 END)::BIGINT AS w
        FROM dom
      ), r1 AS (
        SELECT *,
               ((4 * sum(avail) OVER ()) // 5)::BIGINT AS budget,
               (sum(w) OVER ())::BIGINT AS sum_w
        FROM wtd
      ), a1 AS (
        SELECT *, least(avail, ((budget * w) // sum_w)::BIGINT) AS alloc1 FROM r1
      ), r2 AS (
        SELECT *,
               (budget - sum(alloc1) OVER ())::BIGINT AS leftover,
               (sum(CASE WHEN alloc1 < avail THEN w ELSE 0 END) OVER ())::BIGINT AS unc_w
        FROM a1
      )
      SELECT lang, source, avail, alloc,
             ((1000 * alloc) // avail)::BIGINT AS rate_permille
      FROM (
        SELECT lang, source, avail,
               least(avail, alloc1 + CASE WHEN alloc1 < avail AND unc_w > 0
                 THEN ((leftover * w) // unc_w)::BIGINT ELSE 0 END) AS alloc
        FROM r2)
      ORDER BY lang, source
    """.stripMargin.trim)
  )

  /** Dataset CARD — the one-row datasheet ("Datasheets for Datasets",
    * Gebru et al. 2021) a corpus publishes next to its shards: doc/token
    * mass, language and source coverage, short-doc count, exact-duplicate
    * mass and the mean document length.
    *
    * Scale shape: TWO corpus exchanges total — the ≤langs×sources domain
    * aggregate (docs/tokens/short flags ride it; lang+source cardinalities
    * then count over ~100 rows, no corpus-wide expand) and the md5(text)
    * hash aggregate (the dedup_exact shuffle) for distinct-text mass; the
    * two 1-row sides meet in a broadcast join. */
  val pipelineDatasetCard: QueryDef = QueryDef(
    "pipeline_dataset_card",
    (s, d) => {
      val dom = Tables.documents(s, d)
        .select(col("lang"), col("source"),
          graft.plans.StringKernels.spaceSegCount(col("text")).as("toks"),
          when(col("n_chars") < 200, 1L).otherwise(0L).as("short_flag"))
        .groupBy(col("lang"), col("source"))
        .agg(count(lit(1)).as("n"), sum(col("toks")).as("toks"),
          sum(col("short_flag")).as("short"))
      val c1 = dom.agg(
        sum(col("n")).as("n_docs"), sum(col("toks")).as("n_tokens"),
        countDistinct(col("lang")).as("n_langs"),
        countDistinct(col("source")).as("n_sources"),
        sum(col("short")).as("short_docs"))
      val c2 = Tables.documents(s, d)
        .select(md5(col("text")).as("h")).groupBy(col("h")).agg(count(lit(1)))
        .agg(count(lit(1)).as("distinct_texts"))
      c1.crossJoin(broadcast(c2))
        .select(
          col("n_docs"), col("n_tokens"), col("n_langs"), col("n_sources"),
          col("short_docs"), col("distinct_texts"),
          (col("n_docs") - col("distinct_texts")).as("dup_docs"),
          expr("(1000 * (n_docs - distinct_texts)) div n_docs").as("dup_pm"),
          expr("n_tokens div n_docs").as("mean_doc_tokens"))
        .orderBy("n_docs")
    },
    Some("""
      WITH dom AS (
        SELECT lang, source, count(*) AS n,
               sum(len(string_split(text, ' ')))::BIGINT AS toks,
               sum(CASE WHEN n_chars < 200 THEN 1 ELSE 0 END)::BIGINT AS short
        FROM documents GROUP BY lang, source
      ), c1 AS (
        SELECT sum(n)::BIGINT AS n_docs, sum(toks)::BIGINT AS n_tokens,
               count(DISTINCT lang)::BIGINT AS n_langs,
               count(DISTINCT source)::BIGINT AS n_sources,
               sum(short)::BIGINT AS short_docs
        FROM dom
      ), c2 AS (
        SELECT count(DISTINCT md5(text))::BIGINT AS distinct_texts FROM documents
      )
      SELECT n_docs, n_tokens, n_langs, n_sources, short_docs, distinct_texts,
             n_docs - distinct_texts AS dup_docs,
             (1000 * (n_docs - distinct_texts)) // n_docs AS dup_pm,
             n_tokens // n_docs AS mean_doc_tokens
      FROM c1, c2
      ORDER BY n_docs
    """.stripMargin.trim)
  )

  /** CCNet's perplexity-bucket split (Wenzek et al. 2020) — the
    * head/middle/tail cut every CommonCrawl-derived corpus ships with:
    * per language, rank documents by LM fluency (the exact-integer
    * bigram-LM avg from [[TextAnalysis.textLmScore]] — higher = more
    * predictable = "head") and split into 3 equal-frequency buckets
    * (1 = head … 3 = tail), reporting per (lang, bucket) the doc count,
    * token mass and score range — the table a curriculum/mix planner
    * consumes. The tile assignment is the DISTRIBUTED two-phase rank
    * ([[ScalePatterns.bucketedRank]] on v = −avg_pm, doc_id tie-break +
    * arithmetic [[ScalePatterns.sqlTile]]), not a per-lang window sort —
    * at 100 TB a language is one giant partition and the windowed ntile
    * would funnel it through one reducer; the oracle IS the windowed
    * ntile (same answer, different plan). Integer end-to-end. */
  val pipelinePplBuckets: QueryDef = QueryDef(
    "pipeline_ppl_buckets",
    (s, d) => {
      val scores = TextAnalysis.textLmScore.fn(s, d)
        .select(col("doc_id"), col("avg_pm"))
      val toks = Tables.documents(s, d).select(
        col("doc_id"), col("lang"),
        size(split(col("text"), " ")).cast("long").as("n_toks"))
      // localCheckpoint: bucketedRank fans data into 4 subtrees, and the
      // typed-flatMap LM chain never canonicalizes equal (repo invariant)
      // — without pinning, the full scoring join re-computes per branch
      val data = scores.join(toks, "doc_id").select(
        col("lang").as("key"),
        (-col("avg_pm")).cast("double").as("v"),
        col("doc_id").as("id"),
        col("avg_pm"), col("n_toks"))
        .localCheckpoint()
      ScalePatterns.bucketedRank(data)
        .withColumn("bucket", ScalePatterns.sqlTile(3))
        .groupBy(col("key").as("lang"), col("bucket"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_toks")).as("sum_toks"),
          max(col("avg_pm")).as("max_avg_pm"),
          min(col("avg_pm")).as("min_avg_pm"))
        .orderBy("lang", "bucket")
    },
    Some("""
      WITH b AS (
        SELECT doc_id,
               unnest(list_transform(generate_series(1, len(t) - 1), i -> t[i])) AS w1,
               unnest(list_transform(generate_series(1, len(t) - 1), i -> t[i+1])) AS w2
        FROM (SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents)
      ), c AS (
        SELECT w1, w2, count(*) AS n12 FROM b GROUP BY w1, w2
      ), lm AS (
        SELECT w1, w2,
               ((10000 * n12) // (sum(n12) OVER (PARTITION BY w1)))::BIGINT AS cond_pm
        FROM c
      ), scored AS (
        SELECT doc_id, (sum(cond_pm) // count(*))::BIGINT AS avg_pm
        FROM b JOIN lm USING (w1, w2)
        GROUP BY doc_id
      ), ranked AS (
        SELECT d.lang, s.avg_pm, len(string_split(d.text, ' '))::BIGINT AS n_toks,
               CAST(ntile(3) OVER (PARTITION BY d.lang ORDER BY s.avg_pm DESC, s.doc_id) AS INT) AS bucket
        FROM scored s JOIN documents d USING (doc_id)
      )
      SELECT lang, bucket, count(*) AS n_docs,
             sum(n_toks)::BIGINT AS sum_toks,
             max(avg_pm) AS max_avg_pm, min(avg_pm) AS min_avg_pm
      FROM ranked
      GROUP BY lang, bucket
      ORDER BY lang, bucket
    """.stripMargin.trim)
  )

  val all: Seq[QueryDef] = Seq(
    pipelineContamination, pipelinePackSequences, pipelineStratifiedSample,
    pipelineQualityFilter, textTokenLenHist, pipelineDomainMix,
    pipelineShardManifest, pipelineE2eManifest, pipelineDedupReport,
    pipelinePiiScrub, pipelineTokenBudget, pipelineDatasetCard,
    pipelinePplBuckets)
}
