package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}

/** Deduplication operators for training-data pipelines over `documents`.
  *
  * All similarity ops work on DISTINCT word 3-gram shingles: the synthetic
  * corpus draws every doc from one small vocabulary, so unigram token SETS
  * are degenerate (most long docs contain the whole vocabulary); 3-gram
  * shingles keep word order and are discriminative.
  *
  * Shared deterministic token hash H(t) = first 8 hex chars of md5(t) as a
  * uint32 — reproducible across engines and runs (no Random), which is what
  * makes MinHash signatures stable under retries/speculative execution.
  *
  * Scale notes: exact dedup is a hash-aggregate (one shuffle). MinHash
  * signatures are per-row collection expressions (no shuffle, codegen'd);
  * LSH banding turns pair discovery into an equi-join on (band, key) — never
  * O(n^2). The blocked variants bound their block sizes by construction.
  */
object Dedup {

  private val P = 2147483647L // 2^31 - 1, Mersenne prime for the affine perms

  /** Distinct word 3-gram shingles of the lower-cased text. */
  def shingles(text: Column): Column = {
    val toks = split(lower(text), " ")
    when(
      size(toks) >= 3,
      array_distinct(
        transform(
          sequence(lit(0), size(toks) - 3),
          i => concat_ws("_", element_at(toks, i + 1), element_at(toks, i + 2), element_at(toks, i + 3))
        )
      )
    ).otherwise(array().cast("array<string>"))
  }

  /** H(t): first 8 md5 hex chars as uint32 (0 .. 2^32-1). */
  def tokenHash(t: Column): Column =
    conv(substring(md5(t), 1, 8), 16, 10).cast("long")

  private def docShingles(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(col("doc_id"), col("lang"), col("source"), shingles(col("text")).as("sh"))

  private def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") / size(array_union(a, b))

  /** Exact dedup: hash-groupBy on md5(text); one partial-aggregated shuffle. */
  val dedupExact: QueryDef = QueryDef(
    "dedup_exact",
    (s, d) =>
      Tables.documents(s, d)
        .groupBy(md5(col("text")).as("content_hash"))
        .agg(count(lit(1)).as("n_copies"), min(col("doc_id")).as("keep_id"))
        .orderBy("keep_id"),
    Some("""
      SELECT md5(text) AS content_hash, count(*) AS n_copies, min(doc_id) AS keep_id
      FROM documents
      GROUP BY 1
      ORDER BY keep_id
    """.stripMargin.trim)
  )

  /** Blocked pairwise n-gram Jaccard: within each (lang, source) block,
    * the top-3 most similar pairs by 3-gram-shingle Jaccard. Blocking bounds
    * the pairwise work; jaccard is an exact int/int ratio (bit-identical
    * across engines). */
  val dedupNgramJaccard: QueryDef = QueryDef(
    "dedup_ngram_jaccard",
    (s, d) => {
      val a = docShingles(s, d).select(col("lang"), col("source"), col("doc_id").as("id1"), col("sh").as("sh1"))
      val b = docShingles(s, d).select(col("lang"), col("source"), col("doc_id").as("id2"), col("sh").as("sh2"))
      val w = Window.partitionBy(col("lang"), col("source")).orderBy(col("jac").desc, col("id1"), col("id2"))
      a.join(b, Seq("lang", "source"))
        .filter(col("id1") < col("id2"))
        .withColumn("jac", jaccard(col("sh1"), col("sh2")))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("lang"), col("source"), col("id1"), col("id2"), round(col("jac"), 6).as("jac"), col("rn"))
        .orderBy("lang", "source", "rn")
    },
    Some("""
      WITH sh AS (
        SELECT doc_id, lang, source,
               list_distinct(list_transform(generate_series(1, len(t) - 2),
                 i -> t[i] || '_' || t[i+1] || '_' || t[i+2])) AS s
        FROM (SELECT doc_id, lang, source, string_split(lower(text), ' ') AS t FROM documents)
      ), pairs AS (
        SELECT a.lang, a.source, a.doc_id AS id1, b.doc_id AS id2,
               len(list_intersect(a.s, b.s))::DOUBLE / len(list_distinct(a.s || b.s)) AS jac
        FROM sh a JOIN sh b ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
      )
      SELECT lang, source, id1, id2, round(jac, 6) AS jac, rn
      FROM (SELECT *, row_number() OVER (PARTITION BY lang, source ORDER BY jac DESC, id1, id2) AS rn
            FROM pairs)
      WHERE rn <= 3
      ORDER BY lang, source, rn
    """.stripMargin.trim)
  )

  /** MinHash signature + LSH banding + exact-Jaccard confirmation.
    *
    * sig[i] = min over shingles of (a_i*H(t)+b_i mod P); 16 bands of 4 rows
    * hashed to band keys; docs sharing any band key become candidate pairs;
    * candidates are confirmed by exact Jaccard >= 0.8. At tau=0.8 the miss
    * probability per true pair is (1-0.8^4)^16 ~ 2e-4 (0 for exact dups),
    * so the confirmed output equals the brute-force oracle. The oracle IS
    * brute force — the whole point of LSH is reproducing it without the
    * O(n^2) join. */
  val dedupMinhashLsh: QueryDef = QueryDef(
    "dedup_minhash_lsh",
    (s, d) => {
      val nHashes = 64
      val bandRows = 4
      val nBands = nHashes / bandRows
      def aCoef(i: Int): Long = ((i.toLong * 2654435761L + 1L) % (P - 1)) + 1 // in [1, P-1]
      def bCoef(i: Int): Long = (i.toLong * 40503L + 7L) % P

      val sigCols: Column = array((0 until nHashes).map { i =>
        array_min(transform(col("sh"), t => (lit(aCoef(i)) * tokenHash(t) + lit(bCoef(i))) % P))
      }: _*)

      val withSig = docShingles(s, d)
        .filter(size(col("sh")) > 0)
        .select(col("doc_id"), col("sh"), sigCols.as("sig"))

      val bands = withSig.select(
        col("doc_id"),
        col("sh"),
        posexplode(
          array((0 until nBands).map { bIdx =>
            md5(concat_ws(",", (0 until bandRows).map(r => element_at(col("sig"), bIdx * bandRows + r + 1)): _*))
          }: _*)
        ).as(Seq("band_idx", "band_key"))
      )

      val a = bands.select(col("band_idx"), col("band_key"), col("doc_id").as("id1"), col("sh").as("sh1"))
      val b = bands.select(col("band_idx"), col("band_key"), col("doc_id").as("id2"), col("sh").as("sh2"))
      a.join(b, Seq("band_idx", "band_key"))
        .filter(col("id1") < col("id2"))
        .select("id1", "id2", "sh1", "sh2")
        .dropDuplicates("id1", "id2")
        .withColumn("jac", jaccard(col("sh1"), col("sh2")))
        .filter(col("jac") >= 0.8)
        .select(col("id1"), col("id2"), round(col("jac"), 6).as("jac"))
        .orderBy("id1", "id2")
    },
    Some("""
      WITH sh AS (
        SELECT doc_id,
               list_distinct(list_transform(generate_series(1, len(t) - 2),
                 i -> t[i] || '_' || t[i+1] || '_' || t[i+2])) AS s
        FROM (SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents)
        WHERE len(t) >= 3
      )
      SELECT a.doc_id AS id1, b.doc_id AS id2,
             round(len(list_intersect(a.s, b.s))::DOUBLE / len(list_distinct(a.s || b.s)), 6) AS jac
      FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      WHERE len(list_intersect(a.s, b.s))::DOUBLE / len(list_distinct(a.s || b.s)) >= 0.8
      ORDER BY id1, id2
    """.stripMargin.trim)
  )

  /** 32-bit SimHash over shingles: per-bit voting on H(t), one explode +
    * partially-aggregated groupBy (map-side combine keeps the shuffle tiny). */
  val dedupSimhash: QueryDef = QueryDef(
    "dedup_simhash",
    (s, d) => {
      val exploded = docShingles(s, d)
        .select(col("doc_id"), explode(col("sh")).as("tok"))
        .withColumn("h", tokenHash(col("tok")))
      val voteCols = (0 until 32).map(bit => sum(expr(s"(shiftright(h, $bit) & 1) * 2 - 1")).as(s"v$bit"))
      val votes = exploded
        .groupBy(col("doc_id"))
        .agg(voteCols.head, voteCols.tail: _*)
      val simhash = (0 until 32)
        .map(bit => when(col(s"v$bit") > 0, lit(1L << bit)).otherwise(lit(0L)))
        .reduce(_ + _)
      votes.select(col("doc_id"), simhash.as("simhash")).orderBy("doc_id")
    },
    Some("""
      WITH sh AS (
        SELECT doc_id,
               list_distinct(list_transform(generate_series(1, len(t) - 2),
                 i -> t[i] || '_' || t[i+1] || '_' || t[i+2])) AS s
        FROM (SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents)
      ), h AS (
        SELECT doc_id, ('0x' || substr(md5(tok), 1, 8))::BIGINT AS h
        FROM (SELECT doc_id, unnest(s) AS tok FROM sh)
      ), votes AS (
        SELECT doc_id, b, sum(((h >> b) & 1) * 2 - 1) AS v
        FROM h CROSS JOIN range(0, 32) r(b)
        GROUP BY 1, 2
      )
      SELECT doc_id,
             sum(CASE WHEN v > 0 THEN (1::BIGINT << b) ELSE 0 END)::BIGINT AS simhash
      FROM votes
      GROUP BY doc_id
      ORDER BY doc_id
    """.stripMargin.trim)
  )

  val all: Seq[QueryDef] = Seq(dedupExact, dedupNgramJaccard, dedupMinhashLsh, dedupSimhash)
}
