package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}

/** Similarity search over the `embeddings` table (`Array[Float]`, dim 64).
  *
  * Vector math is expressed with higher-order collection expressions
  * (`zip_with` + `aggregate`): elements are cast to double BEFORE the
  * multiply and summed left-to-right, which is the same evaluation order
  * DuckDB's `list_sum(list_transform(...))` uses — so cosines are
  * bit-identical across engines and safe to rank on. Norms are computed
  * ONCE per vector (not per pair) and joined into the pair stream.
  *
  * Scale path: the brute-force variant broadcasts the (small) query set and
  * linearly scans the corpus — embarrassingly parallel, no shuffle on the
  * corpus side, exactly how you'd do 100 TB x 1k queries. For corpus x
  * corpus similarity the LSH variant buckets by random-hyperplane signs so
  * candidate generation is an id-only equi-join, never a cross join, and
  * embeddings are re-joined only for surviving candidates.
  */
object Similarity {

  val Dim = 64

  /** Left-to-right double dot product of two float vectors, as the native
    * codegen'd [[graft.plans.FloatVecDot]] expression. The HOF formulation
    * (`aggregate(zip_with(...))`) evaluates interpreted and allocates per
    * row; an unrolled 64-term expression was even worse (Janino blowup).
    * The custom expression keeps the identical left-to-right fold, so
    * values stay bit-identical to the DuckDB oracle. */
  def dot(a: Column, b: Column): Column =
    graft.plans.VectorExpressions.floatDot(a, b)

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  private def emb(s: SparkSession, d: String) = Tables.embeddings(s, d)

  /** (vec_id, embedding, nrm): per-vector L2 norm computed once. (Pre-
    * casting the whole array to double was also measured slower — wider
    * shuffle rows — so pairs carry the float arrays.) */
  private def withNorm(s: SparkSession, d: String): DataFrame =
    emb(s, d).select(
      col("vec_id"),
      col("label"),
      col("embedding"),
      sqrt(dot(col("embedding"), col("embedding"))).as("nrm")
    )

  /** cosine from a precomputed-norm pair: dot / (nrm1 * nrm2) —
    * algebraically identical to [[cosine]] (same multiply/fold order,
    * so bit-identical to the oracle's expression). */
  private def cosPre(v1: Column, v2: Column, n1: Column, n2: Column): Column =
    dot(v1, v2) / (n1 * n2)

  /** Exact top-5 cosine neighbors for a fixed query set (vec_id < 8) over
    * the rest of the corpus. Queries are broadcast; the corpus is scanned
    * once. */
  val annBruteforce: QueryDef = QueryDef(
    "ann_bruteforce",
    (s, d) => {
      val base = withNorm(s, d)
      val q = base.filter(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"), col("embedding").as("qv"), col("nrm").as("qn"))
      val c = base.filter(col("vec_id") >= 8)
        .select(col("vec_id").as("neighbor_id"), col("embedding").as("cv"), col("nrm").as("cn"))
      val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id"))
      c.crossJoin(broadcast(q))
        .withColumn("cos", round(cosPre(col("qv"), col("cv"), col("qn"), col("cn")), 6))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 5)
        .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos"))
        .orderBy("query_id", "rank")
    },
    Some(s"""
      WITH n AS (
        SELECT vec_id, embedding,
               sqrt(list_sum(list_transform(generate_series(1, $Dim), i -> embedding[i]::DOUBLE * embedding[i]::DOUBLE))) AS nrm
        FROM embeddings
      ),
      q AS (SELECT vec_id AS query_id, embedding AS qv, nrm AS qn FROM n WHERE vec_id < 8),
      c AS (SELECT vec_id AS neighbor_id, embedding AS cv, nrm AS cn FROM n WHERE vec_id >= 8),
      scored AS (
        SELECT query_id, neighbor_id,
               round(
                 list_sum(list_transform(generate_series(1, $Dim), i -> qv[i]::DOUBLE * cv[i]::DOUBLE))
                 / (qn * cn), 6) AS cos
        FROM c CROSS JOIN q
      )
      SELECT query_id, rank, neighbor_id, cos
      FROM (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
            FROM scored)
      WHERE rank <= 5
      ORDER BY query_id, rank
    """.stripMargin.trim)
  )

  /** RANGE (radius) search — the other exact retrieval primitive beside
    * top-k: ALL corpus vectors with cosine ≥ τ of each query, however
    * many or few that is. This is the serving shape for dedup-at-
    * threshold and recall-oriented retrieval filters, where a fixed k
    * either truncates dense neighborhoods or pads sparse ones. τ = 0.25
    * sits in this synthetic corpus's discriminative band (88 hits at
    * sf0.01 vs 2 at 0.4).
    *
    * Scale shape: the query set broadcasts (one row per query), the
    * corpus scans ONCE with the codegen'd FloatVecDot kernel, and the
    * τ-filter prunes before any exchange — output-sized, not
    * corpus-sized, shuffle. At 100 TB compose with the IVF router
    * exactly like [[annIvfK]]: probe only cells whose centroid cosine
    * clears τ minus the cell radius margin. */
  val annRangeSearch: QueryDef = QueryDef(
    "ann_range_search",
    (s, d) => {
      val base = withNorm(s, d)
      val q = base.filter(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"), col("embedding").as("qv"), col("nrm").as("qn"))
      val c = base.filter(col("vec_id") >= 8)
        .select(col("vec_id").as("neighbor_id"), col("embedding").as("cv"), col("nrm").as("cn"))
      c.crossJoin(broadcast(q))
        .withColumn("cos", round(cosPre(col("qv"), col("cv"), col("qn"), col("cn")), 6))
        .filter(col("cos") >= 0.25)
        .select(col("query_id"), col("neighbor_id"), col("cos"))
        .orderBy("query_id", "neighbor_id")
    },
    Some(s"""
      WITH n AS (
        SELECT vec_id, embedding,
               sqrt(list_sum(list_transform(generate_series(1, $Dim), i -> embedding[i]::DOUBLE * embedding[i]::DOUBLE))) AS nrm
        FROM embeddings
      ),
      q AS (SELECT vec_id AS query_id, embedding AS qv, nrm AS qn FROM n WHERE vec_id < 8),
      c AS (SELECT vec_id AS neighbor_id, embedding AS cv, nrm AS cn FROM n WHERE vec_id >= 8),
      scored AS (
        SELECT query_id, neighbor_id,
               round(
                 list_sum(list_transform(generate_series(1, $Dim), i -> qv[i]::DOUBLE * cv[i]::DOUBLE))
                 / (qn * cn), 6) AS cos
        FROM c CROSS JOIN q
      )
      SELECT query_id, neighbor_id, cos
      FROM scored
      WHERE cos >= 0.25
      ORDER BY query_id, neighbor_id
    """.stripMargin.trim)
  )

  /** Per-label block-size bound for the EXACT pairwise embedding audit:
    * labels at or under it compare all pairs (labels×cap² worst case);
    * labels above it route through a random-hyperplane LSH candidate path
    * ([[embeddingTop3]]) instead of silently keeping the `blockCap` lowest
    * vec_ids. Far above every bench-SF block (≤400 vectors), so bench
    * outputs are the exact ones; corpus-scale ANN serving is [[annLsh]]'s
    * bucketed path. */
  private val blockCap = 512

  /** Embedding near-dup pairs: label-blocked top-3 most-cosine-similar
    * pairs per label (labels act as the coarse clustering / IVF cells).
    * Over-cap labels use hyperplane-LSH candidates — see [[embeddingTop3]]. */
  val dedupEmbedding: QueryDef = QueryDef(
    "dedup_embedding",
    (s, d) => embeddingTop3(s, d,
      graft.Conf.int(s, graft.Conf.EmbBlockCapConf, blockCap)),
    Some(s"""
      WITH capped AS (
        SELECT label, vec_id, embedding
        FROM embeddings
        QUALIFY row_number() OVER (PARTITION BY label ORDER BY vec_id) <= 512
      ),
      n AS (
        SELECT label, vec_id, embedding,
               sqrt(list_sum(list_transform(generate_series(1, $Dim), i -> embedding[i]::DOUBLE * embedding[i]::DOUBLE))) AS nrm
        FROM capped
      ),
      pairs AS (
        SELECT a.label, a.vec_id AS id1, b.vec_id AS id2,
               round(
                 list_sum(list_transform(generate_series(1, $Dim), i -> a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE))
                 / (a.nrm * b.nrm), 6) AS cos
        FROM n a JOIN n b ON a.label = b.label AND a.vec_id < b.vec_id
      )
      SELECT label, rn, id1, id2, cos
      FROM (SELECT *, row_number() OVER (PARTITION BY label ORDER BY cos DESC, id1, id2) AS rn
            FROM pairs)
      WHERE rn <= 3
      ORDER BY label, rn
    """.stripMargin.trim)
  )

  /** [[dedupEmbedding]]'s engine, cap-parameterized for the spec.
    *
    * Label-size split: labels ≤ cap vectors take the exact all-pairs leg
    * (identical to the oracle's pairwise SQL); labels > cap take an LSH
    * leg — 16 independent 8-bit random-hyperplane lanes from ONE
    * [[graft.plans.HyperplaneSig]] codegen pass (the annLsh signature
    * machinery), candidates = vectors sharing any lane bucket within the
    * label, confirmed with the exact full-precision cosine. Both legs
    * union into one per-label top-3 window. For a near-dup pair at
    * cos≥0.9 the per-lane collision odds are (1-θ/π)^8 ≈ 0.29, so across
    * 16 lanes recall ≈ 1-(0.71)^16 ≈ 0.996 — vs the previous doc_id cap,
    * which dropped EVERY pair touching a vector beyond the cap. Work per
    * over-cap label is O(n × lanes) band rows + bucket-collision confirms,
    * never O(n²). */
  /** Bits per LSH lane for the biggest over-cap block — the annLsh
    * round-2 rule: B = ⌈log₂(n/8)⌉ keeps ~8 vectors per bucket so
    * candidate volume stays O(n × lanes) as blocks grow. */
  private def lanePlanesFor(maxBig: Long): Int = math.max(8,
    64 - java.lang.Long.numberOfLeadingZeros(math.max(1L, (maxBig + 7) / 8 - 1)))

  /** Per-vector lane metadata for the over-cap legs: (label, vec_id,
    * q8, lanes) where `lanes(t)` is the vector's B-bit bucket in table t
    * and `q8` its SQ8 codes — one codegen'd
    * [[graft.plans.HyperplaneSig]] signature pass + one
    * [[graft.plans.QuantizeVec]] pass per vector, lanes unpacked from
    * the packed sig words (straddle-safe: a lane crossing a 64-bit word
    * boundary ORs the tail of word i with the head of word i+1; pure bit
    * arithmetic, cheap enough for Generate's per-output-row
    * re-evaluation when consumers posexplode it). Hyperplane weights are
    * the deterministic [-0.5, 0.5) integer mix of lshTopK, stable across
    * runs and executors. Keeping the whole lane ARRAY on each row is
    * what lets the candidate join elect the smallest shared posted lane
    * map-side ([[graft.plans.ElectLane]]) instead of paying a
    * dropDuplicates shuffle over the ~nTables×-inflated pair stream. */
  private def laneMeta(big: DataFrame, nTables: Int, nPlanes: Int,
      nFlips: Int = 0): DataFrame = {
    def wgt(t: Int, p: Int, i: Int): Double =
      ((((t * 7919L + p * 131L + i * 31L + 7L) * 2654435761L) % 1000003L + 1000003L) % 1000003L)
        .toDouble / 1000003.0 - 0.5
    val planes: Array[Array[Double]] =
      (for { t <- 0 until nTables; p <- 0 until nPlanes } yield
        Array.tabulate(Dim)(i => wgt(t, p, i))).toArray
    val nWords = (nTables * nPlanes + 63) / 64
    val sigWords = (0 until nWords).map(i => element_at(col("sig"), i + 1).as(s"w$i"))
    // `nFlips >= 1` adds the flip probe buckets (`flips(t)` = the table-t
    // bucket with its least-confident bit flipped, and at nFlips=2 also
    // `flips(nTables+t)` with the second-least-confident bit — the
    // [[graft.plans.HyperplaneFlips]] multi-probe kernel, same
    // deterministic plane matrix) in the SAME projection; legs that
    // don't multi-probe never pay the second plane pass.
    val flipCol =
      if (nFlips >= 1)
        Seq(graft.plans.VectorExpressions.hyperplaneFlips(
          col("embedding"), planes, nPlanes, nFlips).as("flips"))
      else Seq.empty
    val sig = big.select(Seq(col("label"), col("vec_id"),
      graft.plans.VectorExpressions.hyperplaneSig(col("embedding"), planes).as("sig"),
      graft.plans.VectorExpressions.quantize(col("embedding")).as("q8")) ++ flipCol: _*)
      .select(Seq(col("label"), col("vec_id"), col("q8")) ++
        (if (nFlips >= 1) Seq(col("flips")) else Seq.empty) ++ sigWords: _*)
    val laneMask = (1L << nPlanes) - 1
    val laneCols = (0 until nTables).map { t =>
      val start = t * nPlanes
      val i0 = start >>> 6
      val sh = start & 63
      val low = shiftrightunsigned(col(s"w$i0"), sh)
      if (sh + nPlanes > 64 && i0 + 1 < nWords)
        low.bitwiseOR(shiftleft(col(s"w${i0 + 1}"), 64 - sh)).bitwiseAND(lit(laneMask))
      else low.bitwiseAND(lit(laneMask))
    }
    sig.select(Seq(col("label"), col("vec_id"), col("q8"), array(laneCols: _*).as("lanes")) ++
      (if (nFlips >= 1) Seq(col("flips")) else Seq.empty): _*)
  }

  private[graft] def embeddingTop3(s: SparkSession, d: String, cap: Int): DataFrame = {
    val nTables = 16

    val sizes = emb(s, d).groupBy(col("label")).agg(count(lit(1)).as("label_n"))
    // Bits per lane GROW with the biggest over-cap label — the annLsh
    // round-2 rule, which this leg was missing: with a fixed 8-bit lane,
    // bucket population is O(n) and the bucket self-join O(n²/256) —
    // the sf10 bench (20k-member labels) materialized ~125M candidate
    // pairs and died spilling. B = ⌈log₂(n/8)⌉ keeps ~8 vectors/bucket,
    // so candidates stay O(n × lanes). B stays 8 through sf1 (n=2000 →
    // 250 buckets-worth fits 8 bits), so sub-sf10 outputs are unchanged.
    // Recall tradeoff is real and documented: at cos≥0.9 per-lane
    // collision is (1−θ/π)^B, 16-lane recall 0.996 at B=8 → 0.93 at
    // B=12 — the near-dup band a semantic dedup acts on stays covered,
    // while the (already-declared) "top-3 of LSH candidates" over-cap
    // contract thins for sub-threshold pairs. The one-row aggregate here
    // is a declared construction-time action (the dedup_clusters
    // partition-sizing precedent).
    val maxBig: Long = sizes.filter(col("label_n") > cap)
      .agg(coalesce(max(col("label_n")), lit(0L))).head.getLong(0)
    val nPlanes = lanePlanesFor(maxBig)

    // boundedCache: repeat invocations unpersist the previous run's frame
    // (one outstanding per tag per session — the r12 ADVICE cache-pressure
    // item); Bench/Verify additionally clearCache between queries.
    val base = graft.Registry.boundedCache(s, "embTop3.base",
      withNorm(s, d).join(sizes, Seq("label")))
    val small = base.filter(col("label_n") <= cap)
    val big = base.filter(col("label_n") > cap)

    val a = small.select(col("label"), col("vec_id").as("id1"), col("embedding").as("v1"), col("nrm").as("n1"))
    val b = small.select(col("label"), col("vec_id").as("id2"), col("embedding").as("v2"), col("nrm").as("n2"))
    val smallPairs = a.join(b, Seq("label"))
      .filter(col("id1") < col("id2"))
      .withColumn("cos", cosPre(col("v1"), col("v2"), col("n1"), col("n2")))
      .select(col("label"), col("id1"), col("id2"), col("cos"))

    val meta = graft.Registry.boundedCache(s, "embTop3.meta",
      laneMeta(big, nTables, nPlanes))
    val rawBuckets = meta
      .select(col("label"), col("vec_id"), posexplode(col("lanes")).as(Seq("t", "bucket")))
    // POSTING TRUNCATION (the FAISS oversized-list rule): hyperplane cells
    // are skewed on correlated data — the sf10 census measured buckets of
    // 576 members and 2×10⁸ pre-dedup pairs from C(pop,2) blowup, which
    // more bits cannot fix (skew is directional, not resolution-bound).
    // Each (label, lane, bucket) keeps its 64 lowest vec_ids: a hot
    // bucket is the LEAST selective cell (an uninformative hyperplane
    // region), and a genuine near-dup pair still collides in its quieter
    // lanes — while worst-case pair volume becomes buckets × C(64,2),
    // linear in the corpus. WindowGroupLimit prunes the rank map-side.
    val popCap = graft.Conf.int(s, graft.Conf.PostingCapConf, 64)
    val popW = Window.partitionBy(col("label"), col("t"), col("bucket")).orderBy(col("vec_id"))
    val buckets = rawBuckets
      .withColumn("pn", row_number().over(popW))
      .filter(col("pn") <= popCap)
      .drop("pn")
    // SQ8 SHORTLIST before the float confirm (the lshTopK recipe, applied
    // here after the sf10 bench showed the confirm joining 256-byte float
    // embeddings per candidate side — a candidate-sized multi-GB shuffle):
    // candidates stay id-only through the collision join, score with the
    // 64-byte int8 dot (±0.003 of cosine), keep 16 per label via
    // dense_rank (WindowGroupLimit prunes map-side), and only the ≤16
    // survivors/label touch float vectors. A pair colliding in k lanes is
    // emitted ONCE, from the smallest lane where BOTH sides survived
    // posting truncation ([[graft.plans.ElectLane]] over the two lane
    // arrays + AND of the two posted masks — the r12 election that
    // replaced the dropDuplicates shuffle over the inflated stream; pair
    // set is identical). Lane arrays and SQ8 codes ride the posting rows
    // into the bucket join, so the candidate stream joins NOTHING.
    // Output risk is an int8 rank inversion between true rank 3 and
    // approx rank 16 — needs two pairs within ~0.006 cosine of each
    // other across a 13-rank gap; the over-cap leg's declared contract
    // (top-3 of LSH candidates) already absorbs this class, and the
    // oracle-gated scales (labels ≤ cap) never take this leg.
    val pmask = buckets.groupBy(col("vec_id"))
      .agg(expr("bit_or(shiftleft(CAST(1 AS BIGINT), t))").as("pmask"))
    val posted = buckets
      .join(meta.select(col("vec_id"), col("lanes"), col("q8")).join(pmask, Seq("vec_id")),
        Seq("vec_id"))
    val approxW = Window.partitionBy(col("label"))
      .orderBy(col("adot").desc, col("id1"), col("id2"))
    val shortPairs = posted
      .select(col("label"), col("t"), col("bucket"), col("vec_id").as("id1"),
        col("lanes").as("l1"), col("pmask").as("m1"), col("q8").as("q1"))
      .join(posted.select(col("label"), col("t"), col("bucket"), col("vec_id").as("id2"),
        col("lanes").as("l2"), col("pmask").as("m2"), col("q8").as("q2")),
        Seq("label", "t", "bucket"))
      .filter(col("id1") < col("id2"))
      .filter(graft.plans.VectorExpressions.electLane(
        col("l1"), col("l2"), col("m1").bitwiseAND(col("m2"))) === col("t"))
      .select(col("label"), col("id1"), col("id2"),
        graft.plans.VectorExpressions.int8Dot(col("q1"), col("q2")).as("adot"))
      .withColumn("arn", dense_rank().over(approxW))
      .filter(col("arn") <= 16)
      .select(col("label"), col("id1"), col("id2"))
    val bigPairs = shortPairs
      .join(big.select(col("vec_id").as("id1"), col("embedding").as("v1"), col("nrm").as("n1")), "id1")
      .join(big.select(col("vec_id").as("id2"), col("embedding").as("v2"), col("nrm").as("n2")), "id2")
      .withColumn("cos", cosPre(col("v1"), col("v2"), col("n1"), col("n2")))
      .select(col("label"), col("id1"), col("id2"), col("cos"))

    val w = Window.partitionBy(col("label")).orderBy(col("cos").desc, col("id1"), col("id2"))
    smallPairs.unionByName(bigPairs)
      .withColumn("cos", round(col("cos"), 6))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("label"), col("rn"), col("id1"), col("id2"), col("cos"))
      .orderBy("label", "rn")
  }

  /** Random-hyperplane LSH ANN, round-2 design (round 1's fixed 16
    * buckets/table made the band self-join Θ(N²/16) — all-pairs at scale).
    * Shared structure of both execution paths (see [[lshTopK]]):
    *
    *  1. One codegen pass ([[graft.plans.HyperplaneSig]]) computes every
    *     vector's packed bit signature: 16 tables × an 8-bit lane. nPlanes
    *     grows with log₂(corpus) (~N/8 buckets per table), so bucket
    *     population stays O(1) as the corpus grows instead of O(N).
    *  2. Candidates = vectors sharing a bucket in any of 16 tables, with
    *     MULTI-PROBE on the query side (the exact bucket plus every 1-bit
    *     flip). Measured tradeoff: 16 tables × 1-bit probes beats 8 tables
    *     × ≤2-bit probes at equal capture (~0.87 at sf0.1) with ~3× fewer
    *     raw collisions — fresh tables are independent, deep flips explore
    *     correlated buckets.
    *  3. SQ8 RERANK: candidates are scored with an integer dot of 64-byte
    *     int8-quantized vectors ([[graft.plans.QuantizeVec]] /
    *     [[graft.plans.Int8Dot]]) ≈ cosine ±0.003; only the top-16 per
    *     query survive. (A Hamming prefilter over up to 240 sign bits was
    *     measured too blunt: σ≈0.09 in cosine units vs ~0.01 gaps between
    *     rank-3 and rank-50 neighbors → recall 0.17.)
    *  4. Exact full-precision cosine + top-3 over that bounded shortlist —
    *     at most N×16 vector fetches REGARDLESS of bucket skew.
    *
    * Execution paths ([[lshTopK]]), auto-routed on the corpus count
    * against [[Guards.annServeCap]] (round 14 — the registered lane no
    * longer collects unconditionally):
    *  - SERVING (under the cap): one build pass collects (id, signature,
    *    SQ8) — ~90 bytes/vector, broadcastable to ~10⁷ vectors — into a
    *    bucket directory + quantized sidecar; search is a NARROW
    *    distributed map (probe → dedup → int8 dots → local top-16): one
    *    job, zero shuffles before the tiny exact-rerank joins.
    *  - DISTRIBUTED (corpus beyond the cap, or forced): corpus-sharded
    *    SEGMENT SERVING — each corpus partition builds the serving
    *    kernel's flat-array bucket directory over its own ~N/P members
    *    inside one mapPartitions; queries arrive as a bounded broadcast
    *    batch (looping over pmod batches past `spark.graft
    *    .annQueryBatch`); each (query, segment) emits its local top-topM
    *    after visited-stamp dedup, and one window merges the ≤ Q×P×topM
    *    survivor rows. No per-candidate row ever crosses an exchange and
    *    nothing corpus-sized is ever resident — any N. PipelineSpec
    *    asserts both paths return identical rows.
    *
    * Approximate by construction, so no SQL oracle; the spec asserts
    * recall ≥50%@3 against exact top-3. */
  val annLsh: QueryDef = QueryDef(
    "ann_lsh",
    (s, d) => lshTopK(s, d, distributed = false),
    None // approximate: verified by recall spec against exact top-3
  )

  /** `queryIds`: restrict SEARCH to these query vectors (the index still
    * covers the full corpus — answers are unchanged per query, only the
    * query stream narrows). None = every corpus vector queries, the
    * ann_lsh surface. */
  private[graft] def lshTopK(s: SparkSession, d: String, distributed: Boolean,
      queryIds: Option[Set[Long]] = None): DataFrame =
    lshRerank(s, d, lshShortlist(s, d, distributed, queryIds))

  /** The SQ8 shortlist stage of [[lshTopK]] — (query_id, neighbor_id)
    * candidates, topM per query by quantized dot. Factored from lshTopK
    * (round 18, r17 verdict #4) so the profiling harness can time the
    * shortlist and the exact rerank separately; plans are unchanged. */
  private[graft] def lshShortlist(s: SparkSession, d: String, distributed: Boolean,
      queryIds: Option[Set[Long]] = None): DataFrame = {
    {
      import s.implicits._
      val nTables = 16 // L independent hash tables: union of candidates
      // Parquet-metadata count — sizes nPlanes to the corpus (train-free).
      val corpusN = emb(s, d).count()
      // Bits per table grow with log₂(corpus) WITHOUT the old 8-bit lane
      // ceiling: the byte-aligned two-word packing silently clamped
      // nPlanes at 8, so past ~2k vectors bucket population grew O(N) and
      // the candidate stage was Θ(N²/256) — the sf10 bench measured it at
      // 70× the sf1 time (1146 s) before this fix. Two regimes, keeping
      // every ≤sf0.1 corpus bit-identical to the old plan: the original
      // ~N/8-bucket rule up to 8 bits, then a ~32-deep-bucket rule
      // (coarser, preserving multi-probe recall) up to 18 bits. Lanes are
      // B bits wide, straddle-safe across the packed sig words.
      val b8 = math.max(6, math.min(8,
        math.ceil(math.log(corpusN / 8.0) / math.log(2)).toInt))
      val bScale = math.min(18,
        math.ceil(math.log(corpusN / 32.0) / math.log(2)).toInt)
      val nPlanes = math.max(b8, bScale)
      val topM = 16 // SQ8 shortlist per query before the full-precision re-join
      // Deterministic hyperplane weights in [-0.5, 0.5): w(t,p,i) from a
      // fixed integer mix; same for every run and every executor.
      def w(t: Int, p: Int, i: Int): Double =
        ((((t * 7919L + p * 131L + i * 31L + 7L) * 2654435761L) % 1000003L + 1000003L) % 1000003L)
          .toDouble / 1000003.0 - 0.5
      // All bucket bits come from ONE codegen'd pass
      // ([[graft.plans.HyperplaneSig]]) — per-plane Column terms would
      // generate separate dot loops per plane (Janino pitfall). Table t
      // owns bits [t·B, (t+1)·B) of the packed signature.
      val planes: Array[Array[Double]] =
        (for { t <- 0 until nTables; p <- 0 until nPlanes } yield
          Array.tabulate(Dim)(i => w(t, p, i))).toArray
      val nWords = (nTables * nPlanes + 63) / 64
      val laneMask = (1L << nPlanes) - 1
      def bucketOf(words: scala.collection.Seq[Long], t: Int): Int = {
        val start = t * nPlanes
        val i0 = start >>> 6
        val sh = start & 63
        val low = words(i0) >>> sh
        val v = if (sh + nPlanes > 64 && i0 + 1 < nWords)
          low | (words(i0 + 1) << (64 - sh))
        else low
        (v & laneMask).toInt
      }
      // Multi-probe masks: the exact bucket plus every flip of up to
      // `spark.graft.annProbe` signature bits (round 15, verdict #4) —
      // the recall/cost dial the routed kNN leg already had via knnProbe.
      // Depth d probes sum(C(nPlanes, 1..d)) buckets per table; depth 1
      // stays the default (bit-identical plans to r14). GENERIC in d
      // (review: an earlier form silently treated annProbe=3 as 2 — a
      // recall dial that ignores its setting is worse than none).
      // PLANS.md holds the measured sf10 depth-1/2 recall curve.
      // Depth CLAMPED to 4 (round 16, r15 advice): masks grow as
      // sum(C(nPlanes, 1..d)), so with nPlanes up to 18 an unbounded
      // depth enumerates up to 2^18 masks per table — a silent
      // combinatorial cost cliff behind one conf knob. Depth 4 already
      // probes ~4.6k buckets/table at 18 planes, far past any useful
      // point on the measured recall/cost curve (PLANS.md r15); the
      // clamp is LOUD so an extreme annProbe setting is visible.
      val probeDepthRaw = math.max(1, graft.Conf.int(s, graft.Conf.AnnProbeConf, 1))
      val probeDepth = math.min(probeDepthRaw, 4)
      if (probeDepth != probeDepthRaw)
        System.err.println(s"[graft] annProbe=$probeDepthRaw clamped to " +
          s"$probeDepth (mask count is sum(C($nPlanes,1..d)) per table)")
      val probeMasks: Array[Int] = {
        val buf = scala.collection.mutable.ArrayBuffer(0)
        for {
          d <- 1 to math.min(probeDepth, nPlanes)
          combo <- (0 until nPlanes).combinations(d)
        } buf += combo.foldLeft(0)((m, b) => m | (1 << b))
        buf.toArray
      }

      // (id, packed sig words, SQ8 bytes) in one pass over the corpus.
      def sideData = emb(s, d)
        .select(col("vec_id"),
          graft.plans.VectorExpressions.hyperplaneSig(col("embedding"), planes).as("sig"),
          graft.plans.VectorExpressions.quantize(col("embedding")).as("q8"))

      // Guard (round 14, the r13 verdict's one `weak`): the serving path
      // driver-collects ~90 B/vector, the right plan only while the index
      // fits the driver/broadcast envelope. Above [[Guards.annServeCap]]
      // the lane routes to the distributed posting-join twin — spec-proven
      // row-identical, so the flip changes the physical plan only. The
      // corpusN count above is parquet-metadata-cheap and already paid.
      val useServing = !distributed && corpusN <= Guards.annServeCap(s)

      val shortlist: DataFrame =
        if (useServing) {
          // SERVING path: index build = one collect (the classic ANN
          // "train + add" step — the index is driver/executor-resident by
          // design, ~90 bytes/vector → broadcastable to ~10⁷–10⁸ vectors);
          // search = a narrow distributed map over the id list with local
          // top-topM per query. Each query sees ALL its candidates (the
          // directory is complete), so the local top-topM is globally
          // exact for that query — one job, zero shuffles before the tiny
          // exact-rerank joins.
          // Index layout is POSITION-COMPACT primitive arrays, not id-keyed
          // maps: the hot loop touches one candidate every ~30 ns, and the
          // previous Map[Long, Array[Byte]] lookup + HashSet dedup boxed a
          // Long per touch — measured as the dominant cost at sf10 (the
          // whole-corpus query stream visits ~10⁹ candidates). Flat q8/sig
          // arrays give locality, the visited array replaces the per-query
          // HashSet with a stamp compare, and the top-M is an in-place
          // insertion sort over primitive arrays (identical (adot desc,
          // id asc) order to the old sortBy — serving ≡ distributed holds).
          val side = sideData.as[(Long, Seq[Long], Array[Byte])].collect()
          val nSide = side.length
          val q8Len = if (nSide == 0) 0 else side(0)._3.length
          val posIds = new Array[Long](nSide)
          val q8Flat = new Array[Byte](nSide * q8Len)
          val sigFlat = new Array[Long](nSide * nWords)
          val idToPos = new java.util.HashMap[java.lang.Long, java.lang.Integer](nSide * 2)
          var bp = 0
          while (bp < nSide) {
            val (id, words, q8) = side(bp)
            posIds(bp) = id
            System.arraycopy(q8, 0, q8Flat, bp * q8Len, q8Len)
            var wi = 0
            while (wi < nWords) { sigFlat(bp * nWords + wi) = words(wi); wi += 1 }
            idToPos.put(id, bp)
            bp += 1
          }
          def bucketAt(sig: Array[Long], pos: Int, t: Int): Int = {
            val start = t * nPlanes
            val i0 = (start >>> 6) + pos * nWords
            val sh = start & 63
            val low = sig(i0) >>> sh
            val v = if (sh + nPlanes > 64 && (start >>> 6) + 1 < nWords)
              low | (sig(i0 + 1) << (64 - sh))
            else low
            (v & laneMask).toInt
          }
          val builders = Array.fill(nTables << nPlanes)(new scala.collection.mutable.ArrayBuilder.ofInt)
          bp = 0
          while (bp < nSide) {
            var t = 0
            while (t < nTables) { builders((t << nPlanes) + bucketAt(sigFlat, bp, t)) += bp; t += 1 }
            bp += 1
          }
          val dirB = s.sparkContext.broadcast(builders.map(_.result()))
          val q8FB = s.sparkContext.broadcast(q8Flat)
          val sigFB = s.sparkContext.broadcast(sigFlat)
          val posIdsB = s.sparkContext.broadcast(posIds)
          val idToPosB = s.sparkContext.broadcast(idToPos)
          // hundreds of MB at serve-cap corpora; registered so sequential
          // harnesses unpersist them after the query executes (r18 —
          // in-sequence session pressure; Registry scaladoc has numbers)
          Seq(dirB, q8FB, sigFB, posIdsB, idToPosB)
            .foreach(graft.Registry.registerTransientBroadcast(s, _))
          // Parallelize the query id list evenly: P narrow tasks, no shuffle.
          val qids = queryIds match {
            case Some(ids) => side.map(_._1).filter(ids.contains).toIndexedSeq
            case None => side.map(_._1).toIndexedSeq
          }
          val idsRdd = s.sparkContext.parallelize(
            qids, s.sparkContext.defaultParallelism)
          s.createDataset(idsRdd).mapPartitions { it =>
            val dir = dirB.value; val q8f = q8FB.value; val sigf = sigFB.value
            val ids = posIdsB.value; val i2p = idToPosB.value
            val visited = new Array[Int](ids.length)
            var stamp = 0
            val accTop = new Array[Int](topM)
            val idTop = new Array[Long](topM)
            it.flatMap { q =>
              stamp += 1
              val qp = i2p.get(q).intValue
              val qOff = qp * q8Len
              var m = 0
              var t = 0
              while (t < nTables) {
                val base = bucketAt(sigf, qp, t)
                var mi = 0
                while (mi < probeMasks.length) {
                  val bucket = dir((t << nPlanes) + (base ^ probeMasks(mi)))
                  var k = 0
                  while (k < bucket.length) {
                    val np = bucket(k)
                    if (np != qp && visited(np) != stamp) {
                      visited(np) = stamp
                      var acc = 0; var i = 0
                      val nOff = np * q8Len
                      while (i < q8Len) { acc += q8f(qOff + i) * q8f(nOff + i); i += 1 }
                      val nid = ids(np)
                      if (m < topM || acc > accTop(m - 1) ||
                        (acc == accTop(m - 1) && nid < idTop(m - 1))) {
                        var j = if (m < topM) m else topM - 1
                        while (j > 0 && (accTop(j - 1) < acc ||
                          (accTop(j - 1) == acc && idTop(j - 1) > nid))) {
                          accTop(j) = accTop(j - 1); idTop(j) = idTop(j - 1); j -= 1
                        }
                        accTop(j) = acc; idTop(j) = nid
                        if (m < topM) m += 1
                      }
                    }
                    k += 1
                  }
                  mi += 1
                }
                t += 1
              }
              val out = new Array[(Long, Long)](m)
              var j = 0
              while (j < m) { out(j) = (q, idTop(j)); j += 1 }
              out.iterator
            }
          }.toDF("query_id", "neighbor_id")
        } else {
          // DISTRIBUTED path (round-14 rewrite): corpus-SHARDED segment
          // serving — the FAISS/Milvus distribution pattern, replacing the
          // r13 posting-list join. The join shape materialized the raw
          // COLLISION stream into the shortlist window's sort; on the
          // sf10 tiled corpus that stream measured 15.0e9 rows (hot
          // buckets × probe multiplicity, max bucket 4768 members) →
          // 480+ GB of sort spill and a disk-full abort on one box. The
          // serving path survives the identical workload because its
          // visited-stamp dedup skips repeat candidates BEFORE any work —
          // so the fix is to distribute that kernel, not the pair stream:
          //
          //  - the corpus re-partitions once (hash by vec_id); each
          //    partition builds ITS OWN flat-array bucket directory over
          //    its ~N/P members inside one mapPartitions — the serving
          //    index layout, segment-local;
          //  - queries arrive as a bounded BROADCAST batch (sig + SQ8,
          //    ~90 B each); every (query, segment) pair emits its local
          //    top-topM after visited-stamp dedup. Per-candidate work
          //    stays in primitive arrays; NOTHING per-candidate crosses
          //    an exchange;
          //  - one window merges the ≤ Q×P×topM (query, neighbor, adot)
          //    rows. A segment's sub-top-M candidate can never reach the
          //    global top-M (its ≥topM segment superiors are also global
          //    candidates), and every neighbor lives in exactly ONE
          //    segment, so the merge is exact and dedup-free — identical
          //    rows to the serving path under the same (adot desc, id
          //    asc) total order.
          //
          // Query streams beyond spark.graft.annQueryBatch loop over
          // disjoint pmod(id) batches: bounded broadcast, one corpus pass
          // per batch — the honest streamed cost of an all-pairs kNN at
          // corpus scale, with nothing corpus-sized ever resident.
          val P = s.sparkContext.defaultParallelism
          val sideD = sideData.repartition(P, col("vec_id"))
            .as[(Long, Seq[Long], Array[Byte])]
          val batchCap = graft.Conf.long(s, graft.Conf.AnnQueryBatchConf, 2000000L)
          val nQ = queryIds.map(_.size.toLong).getOrElse(corpusN)
          val nBatches = math.max(1L, (nQ + batchCap - 1) / batchCap).toInt
          // Per-query merge window: batches partition query_id disjointly
          // (pmod), so merging INSIDE each batch is row-identical to one
          // global merge — and it lets a multi-batch stream materialize
          // each batch eagerly (localCheckpoint) and DESTROY its query
          // broadcast before the next collect. Round 15 (advice): the old
          // lazy union kept every batch broadcast referenced until
          // execution, so peak footprint was the FULL query set (~nQ ×
          // 90 B), not one batch — exactly in the above-serve-cap regime
          // this path exists for. Single-batch streams keep the lazy plan
          // (no extra materialization).
          val mergeW = Window.partitionBy(col("query_id"))
            .orderBy(col("adot").desc, col("neighbor_id"))
          val batchResults = (0 until nBatches).map { b =>
            val qBatch = (queryIds match {
              case Some(ids) => sideD.filter(r => ids.contains(r._1))
              case None => sideD
            }).filter(r => java.lang.Math.floorMod(r._1, nBatches.toLong) == b.toLong)
              .collect() // bounded: ≤ ~batchCap rows × ~90 B
            val qB = s.sparkContext.broadcast(qBatch)
            // multi-batch destroys qB eagerly below; only the lazy
            // single-batch plan leaves it for the harness release
            if (nBatches == 1) graft.Registry.registerTransientBroadcast(s, qB)
            val nT = nTables; val nP = nPlanes; val nW = nWords
            val lMask = laneMask; val tM = topM; val masks = probeMasks
            val local = sideD.mapPartitions { segIt =>
              val seg = segIt.toArray
              val queries = qB.value
              if (seg.isEmpty || queries.isEmpty) Iterator.empty
              else {
                val nSide = seg.length
                val q8Len = seg(0)._3.length
                val posIds = new Array[Long](nSide)
                val q8Flat = new Array[Byte](nSide * q8Len)
                val sigFlat = new Array[Long](nSide * nW)
                var bp = 0
                while (bp < nSide) {
                  val (id, words, q8) = seg(bp)
                  posIds(bp) = id
                  System.arraycopy(q8, 0, q8Flat, bp * q8Len, q8Len)
                  var wi = 0
                  while (wi < nW) { sigFlat(bp * nW + wi) = words(wi); wi += 1 }
                  bp += 1
                }
                def bucketAt(pos: Int, t: Int): Int = {
                  val start = t * nP
                  val i0 = (start >>> 6) + pos * nW
                  val sh = start & 63
                  val low = sigFlat(i0) >>> sh
                  val v = if (sh + nP > 64 && (start >>> 6) + 1 < nW)
                    low | (sigFlat(i0 + 1) << (64 - sh))
                  else low
                  (v & lMask).toInt
                }
                def bucketOfWords(words: scala.collection.Seq[Long], t: Int): Int = {
                  val start = t * nP
                  val i0 = start >>> 6
                  val sh = start & 63
                  val low = words(i0) >>> sh
                  val v = if (sh + nP > 64 && i0 + 1 < nW)
                    low | (words(i0 + 1) << (64 - sh))
                  else low
                  (v & lMask).toInt
                }
                val builders =
                  Array.fill(nT << nP)(new scala.collection.mutable.ArrayBuilder.ofInt)
                bp = 0
                while (bp < nSide) {
                  var t = 0
                  while (t < nT) { builders((t << nP) + bucketAt(bp, t)) += bp; t += 1 }
                  bp += 1
                }
                val dir = builders.map(_.result())
                val visited = new Array[Int](nSide)
                var stamp = 0
                val accTop = new Array[Int](tM)
                val idTop = new Array[Long](tM)
                queries.iterator.flatMap { case (qid, qWords, qq8) =>
                  stamp += 1
                  var m = 0
                  var t = 0
                  while (t < nT) {
                    val base = bucketOfWords(qWords, t)
                    var mi = 0
                    while (mi < masks.length) {
                      val bucket = dir((t << nP) + (base ^ masks(mi)))
                      var k = 0
                      while (k < bucket.length) {
                        val np = bucket(k)
                        if (posIds(np) != qid && visited(np) != stamp) {
                          visited(np) = stamp
                          var acc = 0; var i = 0
                          val nOff = np * q8Len
                          while (i < q8Len) { acc += qq8(i) * q8Flat(nOff + i); i += 1 }
                          val nid = posIds(np)
                          if (m < tM || acc > accTop(m - 1) ||
                            (acc == accTop(m - 1) && nid < idTop(m - 1))) {
                            var j = if (m < tM) m else tM - 1
                            while (j > 0 && (accTop(j - 1) < acc ||
                              (accTop(j - 1) == acc && idTop(j - 1) > nid))) {
                              accTop(j) = accTop(j - 1); idTop(j) = idTop(j - 1); j -= 1
                            }
                            accTop(j) = acc; idTop(j) = nid
                            if (m < tM) m += 1
                          }
                        }
                        k += 1
                      }
                      mi += 1
                    }
                    t += 1
                  }
                  val out = new Array[(Long, Long, Int)](m)
                  var j = 0
                  while (j < m) { out(j) = (qid, idTop(j), accTop(j)); j += 1 }
                  out.iterator
                }
              }
            }.toDF("query_id", "neighbor_id", "adot")
            val mergedB = local
              .withColumn("hrn", row_number().over(mergeW))
              .filter(col("hrn") <= topM)
              .select("query_id", "neighbor_id")
            if (nBatches > 1) {
              // Eager: runs this batch's one corpus pass + merge NOW,
              // pins the ≤ batchQ×topM result on executors, and frees
              // the query broadcast before the next batch collects.
              val eager = mergedB.localCheckpoint(eager = true)
              qB.destroy()
              eager
            } else mergedB
          }
          batchResults.reduce(_ union _)
        }
      shortlist
    }
  }

  /** The exact-rerank tail of [[lshTopK]]: fetch full-precision vectors
    * for both shortlist sides, exact cosine, top-3 per query. */
  private[graft] def lshRerank(s: SparkSession, d: String,
      shortlist: DataFrame): DataFrame = {
    val vecs = withNorm(s, d)
    val win = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id"))
    shortlist
      .join(vecs.select(col("vec_id").as("query_id"), col("embedding").as("qv"), col("nrm").as("qn")), "query_id")
      .join(vecs.select(col("vec_id").as("neighbor_id"), col("embedding").as("cv"), col("nrm").as("cn")), "neighbor_id")
      .withColumn("cos", round(cosPre(col("qv"), col("cv"), col("qn"), col("cn")), 6))
      .withColumn("rank", row_number().over(win))
      .filter(col("rank") <= 3)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos"))
      .orderBy("query_id", "rank")
  }

  /** IVF-style ANN: a coarse quantizer (centroids computed as per-label
    * mean vectors — the "training" step, expressed as one aggregate),
    * every vector assigned to its nearest centroid cell, queries probing
    * their nprobe=4 nearest cells, exact top-5 within the probed cells.
    *
    * Scale path: centroids are a tiny broadcast; assignment is a narrow
    * map over the corpus; search touches only nprobe/N of the data —
    * the standard recipe for 100 TB of embeddings (with real k-means
    * centroids swapped in). Approximate → no SQL oracle; recall-tested
    * against [[annBruteforce]] in the spec. */
  // ---------- IVF machinery (shared by ann_ivf and ann_ivf_k) ----------

  /** L2-normalize matrix rows (zero rows stay zero). Centroids are stored
    * normalized so the [[graft.plans.NearestCells]] kernel ranks by true
    * cosine with only the row vector's own norm. */
  private def normalizeRows(cs: Array[Array[Double]]): Array[Array[Double]] =
    cs.map { r =>
      val n = math.sqrt(r.foldLeft(0.0)((a, x) => a + x * x))
      if (n == 0.0) r else r.map(_ / n)
    }

  /** Nearest-cell id of `embedding` against a normalized centroid matrix —
    * the kernel's rank-1 slot; a NARROW MAP, zero exchanges. */
  private def cellOf(cents: Array[Array[Double]]): Column =
    element_at(graft.plans.VectorExpressions.nearestCells(col("embedding"), cents, 1), 1)
      .getField("cell")

  /** Mean vector per `cell` over `df(cell, embedding)`: ONE aggregate pass
    * + a K-row collect. Cells that lost all members vanish; callers get a
    * compacted, cell-id-ordered (hence deterministic) matrix back. */
  private def cellMeans(df: DataFrame): Array[Array[Double]] = df
    .groupBy(col("cell"))
    .agg(array((1 to Dim).map(i => avg(element_at(col("embedding"), i))): _*).as("centroid"))
    .collect()
    .map(r => r.getInt(0) -> r.getSeq[Double](1).toArray)
    .sortBy(_._1)
    .map(_._2)

  /** The IVF serving plan over a trained (normalized) centroid matrix:
    * corpus rows tag their nearest cell (codegen'd narrow map, zero
    * exchanges before the cell equi-join), queries probe their `nProbe`
    * nearest cells, exact top-5 cosine within the probed cells. */
  private def ivfSearch(base: DataFrame, cents: Array[Array[Double]], nProbe: Int): DataFrame = {
    val corpus = base.select(
      cellOf(cents).as("cell"),
      col("vec_id").as("neighbor_id"), col("embedding").as("cv"), col("nrm").as("cn"))
    // The explode runs over the 8 query rows only, so the Generate
    // re-evaluation pitfall doesn't bite here.
    val queries = base.filter(col("vec_id") < 8)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"), col("nrm").as("qn"),
        explode(transform(
          graft.plans.VectorExpressions.nearestCells(col("embedding"), cents, nProbe),
          c => c.getField("cell"))).as("cell"))
    val win = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id"))
    corpus
      .join(broadcast(queries), Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", round(cosPre(col("qv"), col("cv"), col("qn"), col("cn")), 6))
      .withColumn("rank", row_number().over(win))
      .filter(col("rank") <= 5)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos"))
      .orderBy("query_id", "rank")
  }

  /** IVF-style ANN: a coarse quantizer (label-mean seeding + one Lloyd
    * round), every vector assigned to its nearest centroid cell, queries
    * probing their nprobe=4 nearest cells, exact top-5 within the probed
    * cells.
    *
    * Scale path: centroids ride as ONE constant reference object inside
    * the codegen'd [[graft.plans.NearestCells]] kernel (the
    * broadcast-matrix loop-in-codegen form the round-4 verdict asked for —
    * compile time constant in K, where the previous K-struct-literal
    * `sort_array(array(struct(...)))` form grew codegen size with K);
    * assignment is a narrow map over the corpus; search touches only
    * nprobe/K of the data — the standard recipe for 100 TB of embeddings.
    * Each Lloyd round is one corpus pass + a K-row collect; more rounds
    * buy no recall on this corpus (measured round 4). Approximate → no SQL
    * oracle; recall-tested against [[annBruteforce]] in the spec. */
  val annIvf: QueryDef = QueryDef(
    "ann_ivf",
    (s, d) => {
      val nProbe = 4
      val base = withNorm(s, d)
      // Label means as the init (good supervised seeding on this corpus),
      // then one Lloyd refinement: kernel reassignment + mean recompute.
      var cents = normalizeRows(cellMeans(
        emb(s, d).select(col("label").cast("int").as("cell"), col("embedding"))))
      cents = normalizeRows(cellMeans(base.select(cellOf(cents).as("cell"), col("embedding"))))
      ivfSearch(base, cents, nProbe)
    },
    None // approximate: verified by recall spec against ann_bruteforce
  )

  /** Deterministic k-means|| seeding (Bahmani et al., "Scalable k-means++",
    * VLDB 2012): `rounds` oversampling passes, each keeping vectors with
    * probability `l·d²/Σd²` (l = 2K oversampling, d² = 1 − cos to the
    * nearest current candidate — the spherical-k-means distance), seeded
    * from the minimum-vec_id vector. Pseudo-randomness is
    * `xxhash64(vec_id, round)` mapped to [0,1) — deterministic across
    * runs, retries and repartitioning, like the md5-bucket samplers. The
    * ≈1+rounds·l candidates collect to the driver, are weighted by their
    * nearest-candidate population (one pass), and a driver-local weighted
    * Lloyd (tiny: candidates × K × Dim) reduces them to K seeds — the
    * standard k-means|| finishing step. Corpus passes: 2 per round + 1 for
    * weights, each a codegen'd narrow map + single-value/tiny aggregate. */
  private[graft] def kmeansParSeeds(s: SparkSession, d: String, k: Int,
      rounds: Int = 2): Array[Array[Double]] = {
    val base = withNorm(s, d)
    def embOf(df: DataFrame): Array[Array[Double]] = df
      .select(col("embedding")).collect()
      .map(_.getSeq[Float](0).toArray.map(_.toDouble))
    var cands = normalizeRows(embOf(base.orderBy(col("vec_id")).limit(1)))
    val l = 2.0 * k
    for (r <- 1 to rounds) {
      val best = element_at(
        graft.plans.VectorExpressions.nearestCells(col("embedding"), cands, 1), 1)
      val d2c = lit(1.0) - best.getField("cos")
      val sumD2 = base.select(sum(d2c)).head.getDouble(0)
      if (sumD2 > 0) {
        val u = pmod(xxhash64(col("vec_id"), lit(r)), lit(1000000000L)).cast("double") / 1e9
        cands = cands ++ normalizeRows(embOf(base.filter(u < d2c * (l / sumD2))))
      }
    }
    val pop = base.select(cellOf(cands).as("cell"))
      .groupBy(col("cell")).count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val weights = Array.tabulate(cands.length)(i => pop.getOrElse(i, 0L).toDouble)
    localWeightedKMeans(cands, weights, k)
  }

  /** Driver-local weighted spherical Lloyd over the (tiny) k-means||
    * candidate set: init = top-K candidates by weight, assign by max dot
    * (all rows normalized; ties to the lower index), centers = normalized
    * weighted means; empty centers keep their previous position. */
  private def localWeightedKMeans(cands: Array[Array[Double]], w: Array[Double],
      k: Int, iters: Int = 10): Array[Array[Double]] = {
    if (cands.length <= k) return cands
    val dim = cands.head.length
    var centers = cands.indices.sortBy(i => (-w(i), i)).take(k).map(cands(_)).toArray
    for (_ <- 1 to iters) {
      val sums = Array.fill(k)(new Array[Double](dim))
      val cw = new Array[Double](k)
      for (ci <- cands.indices) {
        var bestJ = 0
        var bestS = Double.NegativeInfinity
        for (j <- 0 until k) {
          var acc = 0.0
          var t = 0
          while (t < dim) { acc += cands(ci)(t) * centers(j)(t); t += 1 }
          if (acc > bestS) { bestS = acc; bestJ = j }
        }
        var t = 0
        while (t < dim) { sums(bestJ)(t) += w(ci) * cands(ci)(t); t += 1 }
        cw(bestJ) += w(ci)
      }
      centers = Array.tabulate(k) { j =>
        if (cw(j) == 0.0) centers(j)
        else normalizeRows(Array(sums(j).map(_ / cw(j)))).head
      }
    }
    centers
  }

  /** PARAMETERIZED IVF: K is an argument (not label-derived), trained with
    * deterministic k-means|| seeding + one global Lloyd round, served by
    * the same kernel plan as [[annIvf]]. K=64 with nprobe=8 probes 1/8 of
    * the cells; compile time is constant in K (the centroid matrix is one
    * reference object), so the same code path runs at K = 4096. */
  def annIvfWithK(k: Int, nProbe: Int): (SparkSession, String) => DataFrame =
    (s, d) => {
      val base = withNorm(s, d)
      var cents = kmeansParSeeds(s, d, k)
      cents = normalizeRows(cellMeans(base.select(cellOf(cents).as("cell"), col("embedding"))))
      ivfSearch(base, cents, nProbe)
    }

  val annIvfK: QueryDef = QueryDef(
    "ann_ivf_k",
    // nprobe 16/64 = a 4x search-space cut; measured recall@5 at sf0.1 is
    // 0.625 (0.35 at nprobe 8) — equal to ann_ivf's, whose nprobe=4 spans
    // ~10 label cells: unsupervised cells split the label clusters more
    // finely, so IVF-K needs proportionally wider probes for the same
    // cluster coverage
    annIvfWithK(k = 64, nProbe = 16),
    None // approximate: verified by recall spec against ann_bruteforce
  )

  /** SemDeDup (Abbas et al. 2023): cluster the embedding space, then keep
    * ONE representative of every within-cluster group of semantically
    * near-identical vectors — the embedding-space analogue of dedup_exact.
    * Clusters are nearest-centroid assignments against the K label-mean
    * centroids (each coordinate `round(avg, 5)`, so the model is
    * bit-identical to the oracle's SQL recomputation — the reason this
    * uses explicit rounded centroids + a K-struct argmax rather than the
    * [[graft.plans.NearestCells]] kernel, which ranks on normalized-row
    * cosines the oracle can't reproduce bit-for-bit; at real K swap the
    * kernel in and drop to a recall spec, as ann_ivf_k does). The keep
    * rule is greedy first-wins: a vector is dropped iff some lower-id
    * vector in its cluster has rounded cosine ≥ τ. τ = 0.38 sits in the
    * upper tail of this corpus's in-cluster cosines (uniform random
    * vectors — no true semantic dups; production τ ≈ 0.95+), so the drop
    * lane is genuinely exercised.
    *
    * Scale: assignment is a narrow zero-exchange map (K literal structs,
    * K = 10 here); the pairwise stage is the SemDeDup design itself —
    * quadratic only WITHIN a cluster, with the same [[blockCap]] bound as
    * dedup_embedding, so worst case is clusters × cap² at any corpus
    * size. */
  val dedupSemantic: QueryDef = QueryDef(
    "dedup_semantic",
    (s, d) => {
      val tau = 0.38
      // K-row centroid model: one aggregate pass + a K-row collect (the
      // declared model-build collect, as in ann_ivf's Lloyd round)
      val cents: Array[(Int, Array[Double])] = emb(s, d)
        .select(col("label"), posexplode(col("embedding")).as(Seq("dim", "v")))
        .groupBy(col("label"), col("dim"))
        .agg(round(avg(col("v")), 5).as("cv"))
        .groupBy(col("label"))
        .agg(expr("transform(array_sort(collect_list(struct(dim, cv))), x -> x.cv)").as("c"))
        .orderBy("label")
        .collect()
        .map(r => (r.getInt(0), r.getSeq[Double](1).toArray))
      val scoreCols = cents.map { case (cl, c) =>
        // same left-to-right fold the oracle's list_sum uses
        var a = 0.0; var i = 0
        while (i < c.length) { a += c(i) * c(i); i += 1 }
        val cnrm = math.sqrt(a)
        struct(
          round(dot(col("embedding"), typedlit(c)) / (col("nrm") * lit(cnrm)), 6).as("cos"),
          // negated label: lexicographic DESC sort then breaks cosine
          // ties toward the LOWEST cluster id, matching the oracle
          lit(-cl).as("ncl"))
      }
      val assigned = withNorm(s, d)
        .withColumn("best", element_at(sort_array(array(scoreCols.toIndexedSeq: _*), asc = false), 1))
        .select(col("vec_id"), (-col("best").getField("ncl")).cast("int").as("cluster"),
          col("embedding"), col("nrm"))
      val capW = Window.partitionBy(col("cluster")).orderBy(col("vec_id"))
      // boundedCache: the pairwise self-join below consumes this frame
      // on BOTH sides and Spark re-evaluates the whole scan →
      // assignment → window subtree per consumer (no exchange-reuse
      // across the join sides here) — measured 21-25 s vs ~3 s at sf10
      // (PLANS.md r17). The cache is scale-safe BY CONSTRUCTION:
      // ≤ clusters × blockCap rows survive the filter, the exact bound
      // that makes the quadratic stage tractable in the first place.
      val capped = graft.Registry.boundedCache(s, "dedupSemantic.capped",
        assigned
          .withColumn("brn", row_number().over(capW))
          .filter(col("brn") <= blockCap))
      val a = capped.select(col("cluster"), col("vec_id").as("id1"),
        col("embedding").as("v1"), col("nrm").as("n1"))
      val b = capped.select(col("cluster"), col("vec_id").as("id2"),
        col("embedding").as("v2"), col("nrm").as("n2"))
      val dropped = a.join(b, Seq("cluster"))
        .filter(col("id1") < col("id2"))
        .filter(round(cosPre(col("v1"), col("v2"), col("n1"), col("n2")), 6) >= tau)
        .select(col("id2").as("vec_id")).distinct()
        .withColumn("drp", lit(true))
      assigned.select(col("vec_id"), col("cluster"))
        .join(dropped, Seq("vec_id"), "left")
        .select(col("vec_id"), col("cluster"), col("drp").isNull.as("kept"))
        .orderBy("vec_id")
    },
    Some(s"""
      WITH cent AS (
        SELECT label AS cl, r.i AS dim, round(avg(embedding[r.i]), 5) AS cv
        FROM embeddings CROSS JOIN range(1, ${Dim + 1}) AS r(i)
        GROUP BY cl, dim
      ),
      carr AS (SELECT cl, list(cv ORDER BY dim) AS c FROM cent GROUP BY cl),
      cn AS (
        SELECT cl, c,
               sqrt(list_sum(list_transform(generate_series(1, $Dim), i -> c[i] * c[i]))) AS cnrm
        FROM carr
      ),
      vn AS (
        SELECT vec_id, embedding,
               sqrt(list_sum(list_transform(generate_series(1, $Dim), i -> embedding[i]::DOUBLE * embedding[i]::DOUBLE))) AS nrm
        FROM embeddings
      ),
      scored AS (
        SELECT vec_id, cl,
               round(list_sum(list_transform(generate_series(1, $Dim), i -> embedding[i]::DOUBLE * c[i])) / (nrm * cnrm), 6) AS cos
        FROM vn CROSS JOIN cn
      ),
      assign AS (
        SELECT vec_id, cl AS cluster FROM scored
        QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cl) = 1
      ),
      capped AS (
        SELECT a.vec_id, a.cluster, v.embedding, v.nrm
        FROM assign a JOIN vn v USING (vec_id)
        QUALIFY row_number() OVER (PARTITION BY cluster ORDER BY vec_id) <= $blockCap
      ),
      dropped AS (
        SELECT DISTINCT b.vec_id
        FROM capped a JOIN capped b ON a.cluster = b.cluster AND a.vec_id < b.vec_id
        WHERE round(list_sum(list_transform(generate_series(1, $Dim), i -> a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE)) / (a.nrm * b.nrm), 6) >= 0.38
      )
      SELECT a.vec_id, a.cluster, (d.vec_id IS NULL) AS kept
      FROM assign a LEFT JOIN dropped d ON a.vec_id = d.vec_id
      ORDER BY a.vec_id
    """.stripMargin.trim)
  )

  /** Label-outlier surfacing — the data-cleaning lens over the embedding
    * corpus: each label's 3 vectors FARTHEST from their own label
    * centroid (lowest cosine), i.e. the mislabel/noise candidates a
    * curation pass reviews first. Centroid model: rounded label means
    * (the [[dedupSemantic]] oracle-recomputable pattern, one aggregate
    * pass + a K-row collect); scoring is a NARROW map — a K-deep
    * when-chain over the model constants, zero exchanges before the
    * label-keyed rank window, which WindowGroupLimit prunes to 3 rows
    * per label ahead of the sort. */
  val embOutliers: QueryDef = QueryDef(
    "emb_outliers",
    (s, d) => {
      val cents: Array[(Int, Array[Double])] = emb(s, d)
        .select(col("label"), posexplode(col("embedding")).as(Seq("dim", "v")))
        .groupBy(col("label"), col("dim"))
        .agg(round(avg(col("v")), 5).as("cv"))
        .groupBy(col("label"))
        .agg(expr("transform(array_sort(collect_list(struct(dim, cv))), x -> x.cv)").as("c"))
        .orderBy("label")
        .collect()
        .map(r => (r.getInt(0), r.getSeq[Double](1).toArray))
      // cosine to the vector's OWN label centroid (not the argmax — the
      // question is "how typical is this vector of its label")
      val ownCos = cents.foldLeft(lit(null).cast("double")) { case (acc, (cl, c)) =>
        var a = 0.0; var i = 0
        while (i < c.length) { a += c(i) * c(i); i += 1 }
        val cnrm = math.sqrt(a)
        when(col("label") === cl,
          round(dot(col("embedding"), typedlit(c)) / (col("nrm") * lit(cnrm)), 6))
          .otherwise(acc)
      }
      val w = Window.partitionBy(col("label")).orderBy(col("cos_centroid"), col("vec_id"))
      withNorm(s, d)
        .withColumn("cos_centroid", ownCos)
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select(col("label"), col("rank"), col("vec_id"), col("cos_centroid"))
        .orderBy("label", "rank")
    },
    Some(s"""
      WITH cent AS (
        SELECT label AS cl, r.i AS dim, round(avg(embedding[r.i]), 5) AS cv
        FROM embeddings CROSS JOIN range(1, ${Dim + 1}) AS r(i)
        GROUP BY cl, dim
      ),
      carr AS (SELECT cl, list(cv ORDER BY dim) AS c FROM cent GROUP BY cl),
      cn AS (
        SELECT cl, c,
               sqrt(list_sum(list_transform(generate_series(1, $Dim), i -> c[i] * c[i]))) AS cnrm
        FROM carr
      ),
      vn AS (
        SELECT vec_id, label, embedding,
               sqrt(list_sum(list_transform(generate_series(1, $Dim), i -> embedding[i]::DOUBLE * embedding[i]::DOUBLE))) AS nrm
        FROM embeddings
      ),
      scored AS (
        SELECT vec_id, label,
               round(list_sum(list_transform(generate_series(1, $Dim), i -> embedding[i]::DOUBLE * c[i])) / (nrm * cnrm), 6) AS cos_centroid
        FROM vn JOIN cn ON vn.label = cn.cl
      )
      SELECT label, rank, vec_id, cos_centroid FROM (
        SELECT *, row_number() OVER (PARTITION BY label
                                     ORDER BY cos_centroid, vec_id) AS rank
        FROM scored)
      WHERE rank <= 3
      ORDER BY label, rank
    """.stripMargin.trim)
  )

  /** Pairwise-cosine distribution over a FIXED-SIZE deterministic sample —
    * the embedding-quality diagnostic read before trusting any
    * cosine-thresholded op (dedup τ, ANN recall targets): a healthy space
    * shows spread; mass piling near 1.0 means collapsed embeddings.
    * 20 bins over [-1, 1] with per-bin pair counts and cosine extrema.
    *
    * The sample is the [[CosSampleN]] vectors with the smallest
    * md5(vec_id) — an id-hash order both engines compute identically, so
    * the pick is reproducible under retries AND unbiased by id assignment
    * order (a `vec_id < N` prefix would sample whatever was ingested
    * first). A FRACTION sample (the previous 5% form) keeps the pairwise
    * quadratic in corpus size — (n/20)² pairs is 400× more work at 20×
    * the corpus; the fixed N makes the diagnostic O(N²·dim) = O(1) in
    * corpus size at ANY scale, which is what a 100 TB health check needs.
    *
    * Scale: the sample pick is a TakeOrdered (per-partition heaps, no
    * whole-frame sort); the sample side broadcasts (the ann_bruteforce
    * pattern), so the plan is one corpus scan + an O(N²) local pair loop,
    * never a shuffle of pairs. */
  private val CosSampleN = 1024

  val embCosineHist: QueryDef = QueryDef(
    "emb_cosine_hist",
    (s, d) => {
      val sample = withNorm(s, d)
        .withColumn("hk",
          conv(substring(md5(col("vec_id").cast("string")), 1, 8), 16, 10).cast("long"))
        .orderBy(col("hk"), col("vec_id"))
        .limit(CosSampleN)
      val a = sample.select(col("vec_id").as("id1"),
        col("embedding").as("v1"), col("nrm").as("n1"))
      val b = sample.select(col("vec_id").as("id2"),
        col("embedding").as("v2"), col("nrm").as("n2"))
      a.join(broadcast(b), col("id1") < col("id2"))
        .select(round(cosPre(col("v1"), col("v2"), col("n1"), col("n2")), 6).as("cos"))
        .withColumn("bin",
          least(floor((col("cos") + 1) * 10), lit(19L)).cast("int"))
        .groupBy(col("bin"))
        .agg(count(lit(1)).as("n_pairs"),
          round(min(col("cos")), 6).as("min_cos"),
          round(max(col("cos")), 6).as("max_cos"))
        .orderBy("bin")
    },
    Some(s"""
      WITH vn AS (
        SELECT vec_id, embedding,
               sqrt(list_sum(list_transform(generate_series(1, $Dim), i -> embedding[i]::DOUBLE * embedding[i]::DOUBLE))) AS nrm
        FROM embeddings
        QUALIFY row_number() OVER (
          ORDER BY ('0x' || substr(md5(vec_id::VARCHAR), 1, 8))::BIGINT, vec_id) <= $CosSampleN
      ), p AS (
        SELECT round(list_sum(list_transform(generate_series(1, $Dim), i -> a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE)) / (a.nrm * b.nrm), 6) AS cos
        FROM vn a JOIN vn b ON a.vec_id < b.vec_id
      )
      SELECT CAST(least(floor((cos + 1) * 10), 19) AS INT) AS bin,
             count(*) AS n_pairs,
             round(min(cos), 6) AS min_cos,
             round(max(cos), 6) AS max_cos
      FROM p GROUP BY bin ORDER BY bin
    """.stripMargin.trim)
  )

  // ---------------------------------------------------------------- PQ ----

  /** PQ geometry: M=16 subspaces × 4 dims, K=16 centroids each → 16×4 bits
    * = 8 BYTES per vector (vs 256 of float32) plus exact ids. This corpus
    * is uniform-random (no cluster structure — PQ's worst case), so the
    * geometry leans fine-grained; real embedding manifolds compress far
    * better at the same bit budget. */
  private val PqM = 16
  private val PqK = 16
  private def pqSubDim = Dim / PqM

  /** ADC shortlist width before the exact rerank — 128 candidates of the
    * corpus per query (FAISS's IVFPQ re-rank pattern: codes pick the
    * shortlist, original vectors rank the final k). `private[graft]` so
    * the streaming serve lane ([[graft.streaming.StreamAnnServe]]) uses
    * the identical width — hit parity with [[annIndexSearch]] depends on
    * shortlisting exactly the same 128 candidates. */
  private[graft] val PqShortlist = 128

  /** Deterministic PQ codebooks: per subspace, a driver-local L2 Lloyd over
    * a BOUNDED training sample (the 256 lowest vec_ids, L2-normalized).
    * Real PQ deployments train exactly this way — a fixed-size sample on
    * one node (FAISS trains on ~10⁵ vectors regardless of corpus size),
    * then the corpus encode is the distributed part — so the sample
    * collect is the declared model build, not a scale leak. */
  private[graft] def pqBooks(s: SparkSession, d: String,
      keep: Option[Column] = None): Array[Array[Array[Double]]] = {
    val src = keep.map(withNorm(s, d).filter(_)).getOrElse(withNorm(s, d))
    val sample = src.filter(col("vec_id") < 256)
      .orderBy(col("vec_id"))
      .select(col("embedding"), col("nrm")).collect()
      .map { r =>
        val v = r.getSeq[Float](0).toArray.map(_.toDouble)
        val n = r.getDouble(1)
        if (n == 0) v else v.map(_ / n)
      }
    Array.tabulate(PqM) { mm =>
      lloydL2(sample.map(_.slice(mm * pqSubDim, (mm + 1) * pqSubDim)), PqK)
    }
  }

  /** Driver-local plain-L2 Lloyd over a (tiny) point set: strided
    * deterministic init (every n/k-th point of the sample order), ties to
    * the lower centroid, empty cells keep their previous position. */
  private def lloydL2(pts: Array[Array[Double]], k: Int, iters: Int = 10): Array[Array[Double]] = {
    if (pts.length <= k) return pts
    val dim = pts.head.length
    var centers = Array.tabulate(k)(i => pts(i * pts.length / k))
    for (_ <- 1 to iters) {
      val sums = Array.fill(k)(new Array[Double](dim))
      val cnt = new Array[Int](k)
      for (p <- pts) {
        var bestJ = 0
        var bestD = Double.PositiveInfinity
        for (j <- 0 until k) {
          var acc = 0.0
          var t = 0
          while (t < dim) { val dl = p(t) - centers(j)(t); acc += dl * dl; t += 1 }
          if (acc < bestD) { bestD = acc; bestJ = j }
        }
        var t = 0
        while (t < dim) { sums(bestJ)(t) += p(t); t += 1 }
        cnt(bestJ) += 1
      }
      centers = Array.tabulate(k)(j =>
        if (cnt(j) == 0) centers(j) else sums(j).map(_ / cnt(j)))
    }
    centers
  }

  /** Product-quantization CODES + distortion for every vector — the
    * compressed index build (Jégou et al. 2011; the 100 TB story: 4-byte
    * codes make a trillion-vector index ~4 TB, RAM-resident on a modest
    * serving tier, while float32 would need 256 TB).
    *
    * Scale shape: the codebook tensor is ONE plan constant inside the
    * codegen'd [[graft.plans.PqEncode]] kernel; the encode is a narrow
    * map over the corpus — zero exchanges, the same shape as ann_ivf's
    * assignment. The struct is projected once; codes and err read from
    * the materialized column. Approximate model (trained codebooks) → no
    * SQL oracle; distortion- and determinism-tested in the spec, serving
    * recall in [[annPq]]'s. */
  val embPqCodes: QueryDef = QueryDef(
    "emb_pq_codes",
    (s, d) => {
      val books = pqBooks(s, d)
      emb(s, d)
        .withColumn("pq", graft.plans.VectorExpressions.pqEncode(col("embedding"), books))
        .select(
          col("vec_id"),
          array_join(col("pq").getField("codes").cast("array<string>"), ",").as("codes"),
          round(col("pq").getField("err"), 6).as("err"))
        .orderBy("vec_id")
    },
    None // approximate (trained model): distortion/determinism spec + annPq recall
  )

  /** PQ SERVING: asymmetric-distance top-5 ANN — queries build an M×K
    * lookup table ([[graft.plans.PqLut]], narrow map over the 8-row query
    * set), the corpus is scanned by its 4-byte codes only
    * ([[graft.plans.PqAdc]]: M array reads per row, memory-bound — float
    * vectors are never touched at scan time), exact ranking within the
    * top-5 window. For normalized vectors ADC² = 2−2·cos, so ascending
    * ADC is descending approximate cosine.
    *
    * Scale shape: same broadcast-queries × linear-scan plan as
    * [[annBruteforce]] but over 64× less scan payload; at 100 TB this is
    * the shape that keeps ANN serving I/O-bound on codes, with optional
    * IVF cells composed upstream (route by cell, then ADC within cells). */
  val annPq: QueryDef = QueryDef(
    "ann_pq",
    (s, d) => {
      val books = pqBooks(s, d)
      val base = withNorm(s, d)
      val corpus = base.select(
        col("vec_id").as("neighbor_id"),
        graft.plans.VectorExpressions.pqEncode(col("embedding"), books)
          .getField("codes").as("codes"))
      val queries = base.filter(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"),
          graft.plans.VectorExpressions.pqLut(col("embedding"), books).as("lut"))
      val adcW = Window.partitionBy(col("query_id")).orderBy(col("adc"), col("neighbor_id"))
      // Stage 1 — ADC shortlist: the corpus is scanned by its 8-byte codes
      // only (M lut reads/row); ids+ADC survive, vectors don't move.
      val shortlist = corpus
        .crossJoin(broadcast(queries))
        .filter(col("query_id") =!= col("neighbor_id"))
        .withColumn("adc", graft.plans.VectorExpressions.pqAdc(col("codes"), col("lut")))
        .withColumn("arank", row_number().over(adcW))
        .filter(col("arank") <= PqShortlist)
        .select(col("query_id"), col("neighbor_id"))
      pqRerank(base, shortlist)
    },
    None // approximate: recall-tested against ann_bruteforce in the spec
  )

  /** Exact-rerank tail shared by the PQ serving plans: ONLY the shortlist
    * ids re-join full vectors (8×[[PqShortlist]] rows), exact cosine picks
    * the final top-5. */
  private def pqRerank(base: DataFrame, shortlist: DataFrame): DataFrame = {
    val qVec = base.filter(col("vec_id") < 8)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"), col("nrm").as("qn"))
    val cosW = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id"))
    shortlist
      .join(base.select(col("vec_id").as("neighbor_id"), col("embedding").as("cv"),
        col("nrm").as("cn")), Seq("neighbor_id"))
      .join(broadcast(qVec), Seq("query_id"))
      .withColumn("cos", round(cosPre(col("qv"), col("cv"), col("qn"), col("cn")), 6))
      .withColumn("rank", row_number().over(cosW))
      .filter(col("rank") <= 5)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos"))
      .orderBy("query_id", "rank")
  }

  /** IVFPQ — the composed trillion-scale serving plan (FAISS's IVF+PQ, the
    * layout behind every billion-vector index): the IVF coarse quantizer
    * routes vectors into cells (inverted lists), each list stores only
    * 8-byte PQ codes, queries probe their nprobe nearest cells and ADC-rank
    * the probed codes, exact cosine reranks the shortlist. Search cost =
    * (nprobe/K of the corpus) × M lut reads — both factors composable with
    * corpus size.
    *
    * Plan shape: corpus side is one narrow map (cell tag + codes in a
    * single pass — both `NearestCells` and `PqEncode` are plan-constant
    * codegen kernels), candidates via the cell EQUI-join (broadcast 8×
    * nprobe query rows), never a corpus cross join; the float vectors are
    * touched only by the shortlist re-join. */
  val annIvfPq: QueryDef = QueryDef(
    "ann_ivfpq",
    (s, d) => {
      val nProbe = 4
      val books = pqBooks(s, d)
      val base = withNorm(s, d)
      // same coarse quantizer training as ann_ivf: label-mean seeding + one
      // Lloyd reassign-recompute round
      var cents = normalizeRows(cellMeans(
        emb(s, d).select(col("label").cast("int").as("cell"), col("embedding"))))
      cents = normalizeRows(cellMeans(base.select(cellOf(cents).as("cell"), col("embedding"))))
      val corpus = base.select(
        cellOf(cents).as("cell"),
        col("vec_id").as("neighbor_id"),
        graft.plans.VectorExpressions.pqEncode(col("embedding"), books)
          .getField("codes").as("codes"))
      // 8 query rows explode to 8×nprobe probe rows, each carrying the LUT
      val queries = base.filter(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"),
          graft.plans.VectorExpressions.pqLut(col("embedding"), books).as("lut"),
          explode(transform(
            graft.plans.VectorExpressions.nearestCells(col("embedding"), cents, nProbe),
            c => c.getField("cell"))).as("cell"))
      val adcW = Window.partitionBy(col("query_id")).orderBy(col("adc"), col("neighbor_id"))
      val shortlist = corpus
        .join(broadcast(queries), Seq("cell"))
        .filter(col("query_id") =!= col("neighbor_id"))
        .withColumn("adc", graft.plans.VectorExpressions.pqAdc(col("codes"), col("lut")))
        .withColumn("arank", row_number().over(adcW))
        .filter(col("arank") <= PqShortlist)
        .select(col("query_id"), col("neighbor_id"))
      pqRerank(base, shortlist)
    },
    None // approximate: recall-tested against ann_bruteforce in the spec
  )

  /** ANN SERVING-QUALITY report — recall measurement as a first-class
    * operator, not just a spec: the health check run against a live index
    * before trusting its answers (index drift, bad quantization, a wrong
    * nPlanes after a corpus migration all surface here first).
    *
    * A FIXED-SIZE query sample (the [[RecallSampleN]] vectors with
    * smallest md5(vec_id) — the emb_cosine_hist pick: reproducible,
    * ingestion-order-unbiased) gets exact ground-truth top-3 by the
    * ann_bruteforce plan (sample broadcasts, corpus scans ONCE — the
    * quadratic stays bounded to Q×N at any corpus size); the serving
    * index's own answers ([[lshTopK]]) are semi-joined against the truth
    * and the per-query hit counts fold into a recall histogram
    * (n_hits ∈ 0..3 → query count + per-mille share). Approximate
    * serving path ⇒ rows-only; the spec bounds mean recall and totals. */
  private val RecallSampleN = 64

  /** IVF CLUSTER-QUALITY report — the partition-health half of the index
    * health-check family (recall is [[embRecallReport]]'s half): per IVF
    * cell, member count plus mean cosine to the OWN centroid and to the
    * RUNNER-UP centroid, and their separation. Balanced cells with high
    * intra / low next cosine mean the coarse quantizer is doing its job;
    * a fat cell with near-zero separation is the one that degrades both
    * recall AND probe cost after a corpus shift.
    *
    * One narrow kernel map (top-2 cells + cosines in a single
    * [[graft.plans.NearestCells]] pass, zero exchanges) + one hash
    * aggregate to K rows. Approximate path (k-means training is
    * engine-specific) → rows-only; the spec asserts full coverage and the
    * per-cell invariant mean_intra ≥ mean_next (true per VECTOR by the
    * nearest-cell assignment, hence over means). */
  val embClusterQuality: QueryDef = QueryDef(
    "emb_cluster_quality",
    (s, d) => {
      val base = withNorm(s, d)
      var cents = normalizeRows(cellMeans(
        emb(s, d).select(col("label").cast("int").as("cell"), col("embedding"))))
      cents = normalizeRows(cellMeans(base.select(cellOf(cents).as("cell"), col("embedding"))))
      val top2 = graft.plans.VectorExpressions.nearestCells(col("embedding"), cents, 2)
      base
        .select(col("vec_id"), top2.as("nc"))
        .select(
          element_at(col("nc"), 1).getField("cell").as("cell"),
          element_at(col("nc"), 1).getField("cos").as("own_cos"),
          element_at(col("nc"), 2).getField("cos").as("next_cos"))
        .groupBy(col("cell"))
        .agg(count(lit(1)).as("n_vectors"),
          round(avg(col("own_cos")), 4).as("mean_intra"),
          round(avg(col("next_cos")), 4).as("mean_next"))
        .withColumn("separation", round(col("mean_intra") - col("mean_next"), 4))
        .orderBy("cell")
    },
    None // k-means path engine-specific: rows-only; invariant spec'd
  )

  val embRecallReport: QueryDef = QueryDef(
    "emb_recall_report",
    (s, d) => {
      val base = withNorm(s, d)
      val sample = base
        .withColumn("hk",
          conv(substring(md5(col("vec_id").cast("string")), 1, 8), 16, 10).cast("long"))
        .orderBy(col("hk"), col("vec_id"))
        .limit(RecallSampleN)
        .select(col("vec_id").as("query_id"), col("embedding").as("qv"), col("nrm").as("qn"))
      val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id"))
      val exact = base
        .select(col("vec_id").as("neighbor_id"), col("embedding").as("cv"), col("nrm").as("cn"))
        .crossJoin(broadcast(sample))
        .filter(col("neighbor_id") =!= col("query_id"))
        .withColumn("cos", cosPre(col("qv"), col("cv"), col("qn"), col("cn")))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select(col("query_id"), col("neighbor_id"))
      // the serving run SEARCHES ONLY the sample (the id set is a bounded
      // 64-row collect — the query-stream prefilter a production health
      // check would apply); the index itself still covers the full corpus
      val sampleIds = sample.select(col("query_id")).collect().map(_.getLong(0)).toSet
      val approx = lshTopK(s, d, distributed = false, queryIds = Some(sampleIds))
        .select(col("query_id"), col("neighbor_id"))
      val hits = exact.join(approx, Seq("query_id", "neighbor_id"), "left_semi")
        .groupBy(col("query_id")).agg(count(lit(1)).as("n_hits"))
      sample.select(col("query_id"))
        .join(hits, Seq("query_id"), "left")
        .select(coalesce(col("n_hits"), lit(0L)).as("n_hits"))
        .groupBy(col("n_hits")).agg(count(lit(1)).as("n_queries"))
        .withColumn("share_pm", expr(s"(1000 * n_queries) div $RecallSampleN"))
        .orderBy("n_hits")
    },
    None // approximate serving path: rows-only; spec bounds mean recall
  )

  /** Per-label membership bound for the exact kNN-graph block join:
    * labels at or under it build the full exact graph; labels ABOVE it
    * route EVERY member through the hyperplane-LSH candidate path (the
    * [[embeddingTop3]] over-cap machinery, directed) — nobody is
    * silently dropped. Both test SFs sit far under it (≤220
    * vectors/label), so bench outputs are the exact ones and the oracle
    * (which is the UNCAPPED exact graph) hash-matches; an over-cap
    * corpus diverges VISIBLY from the exact oracle instead of both
    * sides agreeing on dropped vectors. */
  private[graft] val KnnBlockCap = 512

  /** Cap-parameterized kNN-graph engine shared by [[embKnnGraph]] and
    * the over-cap routing spec. `base`: (label, vec_id, embedding, nrm,
    * label_n) rows.
    *
    * Under-cap labels: exact block self-join (one shuffle on `label`,
    * codegen'd FloatVecDot, per-src top-3 window). Over-cap labels —
    * directed LSH kNN, O(n × lanes) never O(n²): one [[laneMeta]] pass
    * buckets members into 16 B-bit lanes (B grows with the block) and
    * computes SQ8 codes + best-flip probe buckets; each member probes
    * its exact AND its best-flip bucket per table (round-12 1-probe
    * multi-probe — routed recall 0.394 → 0.533 on the spec's
    * worst-case corpus for ~2× probe rows); the candidate join keeps
    * the SRC side untruncated and truncates only the DST posting side
    * (64 lowest ids per bucket — the FAISS oversized-list rule; a src
    * in a hot bucket still gets candidates, it just meets a bounded
    * posting); the [[graft.plans.ElectLaneMp]] smallest-shared-posted-
    * lane election keeps each colliding pair exactly ONCE map-side (no
    * dedup shuffle); SQ8 int8 dots shortlist the top-8 per src
    * (WindowGroupLimit), and only shortlist survivors touch float
    * vectors for the exact 6-dp rerank. Both legs union into one
    * per-src top-3 window. */
  private[graft] def knnGraphFor(s: SparkSession, base: DataFrame, cap: Int): DataFrame = {
    // NOT boundedCache'd (r17 null result): caching `base` here — the
    // embTop3.base precedent — measured 20 → 115 s at sf10 because the
    // InMemoryRelation hides runtime stats from AQE across the big leg's
    // join chain; the re-evaluated scans it saves are cheaper than the
    // join plans it breaks. dedupSemantic.capped caches a ≤ clusters×cap
    // frame instead, which carries no such risk.
    val small = base.filter(col("label_n") <= cap)
    val a = small.select(col("label"), col("vec_id").as("src"),
      col("embedding").as("av"), col("nrm").as("an"))
    val b = small.select(col("label"), col("vec_id").as("dst"),
      col("embedding").as("bv"), col("nrm").as("bn"))
    val smallEdges = a.join(b, Seq("label"))
      .filter(col("src") =!= col("dst"))
      .select(col("label"), col("src"), col("dst"),
        cosPre(col("av"), col("bv"), col("an"), col("bn")).as("cos"))
    // one-row construction-time action (the dedup_clusters sizing
    // precedent): absent over-cap labels the big leg never enters the plan
    val maxBig: Long = base.filter(col("label_n") > cap)
      .agg(coalesce(max(col("label_n")), lit(0L))).head.getLong(0)
    val edges = if (maxBig == 0L) smallEdges else {
      val nTables = 16
      // Deployment knobs ([[graft.Conf]]): posting depth (more memory →
      // deeper lists → fewer truncation misses) and multi-probe depth
      // (0 = exact buckets, 1 = + best flip [default], 2 = + second flip;
      // recall/cost curve in PLANS.md). Probe depth only ADDS candidate
      // rows; the lane election still emits each pair exactly once.
      val postingCap = graft.Conf.int(s, graft.Conf.PostingCapConf, 64)
      // default 2 (round 13): the second flip measured FREE at sf10
      // (isolated ×2: depth1 30.0/22.9 s, depth2 25.4/27.7 s — parity
      // within the box's noise band) for +0.06 worst-case recall
      // (0.533 → 0.595 on the uniform 600-member spec corpus; a
      // correlated 60-cluster corpus sits at 0.99+ at EVERY depth)
      val nProbe = math.max(0, math.min(2, graft.Conf.int(s, graft.Conf.KnnProbeConf, 2)))
      val big = base.filter(col("label_n") > cap)
      // ONE signature + ONE quantize + ONE best-flip pass per vector,
      // cached: consumed by the probe explodes, the posting leg and the
      // posted-mask aggregate.
      val meta = graft.Registry.boundedCache(s, "knnGraph.meta",
        laneMeta(big, nTables, lanePlanesFor(maxBig), nFlips = nProbe))
      val popW = Window.partitionBy(col("label"), col("t"), col("bucket")).orderBy(col("vec_id"))
      // postings stay NARROW (label, t, bucket, vec_id) through the
      // per-bucket truncation window; lane arrays / SQ8 codes re-attach
      // afterwards via one per-vector join, not through the window shuffle
      val postings = meta
        .select(col("label"), col("vec_id"), posexplode(col("lanes")).as(Seq("t", "bucket")))
        .withColumn("pn", row_number().over(popW)).filter(col("pn") <= postingCap).drop("pn")
      // bit t of pmask = "this vector survived posting truncation in
      // table t" — election may only pick lanes where the pair is
      // actually generated, so the elected pair set is IDENTICAL to the
      // old dropDuplicates formulation's (truncated lanes are ineligible)
      val pmask = postings.groupBy(col("vec_id"))
        .agg(expr("bit_or(shiftleft(CAST(1 AS BIGINT), t))").as("pmask"))
      val posted = postings
        .join(meta.select(col("vec_id"), col("lanes").as("dlanes"), col("q8").as("qd"))
          .join(pmask, Seq("vec_id")), Seq("vec_id"))
        .select(col("label"), col("t"), col("bucket"), col("vec_id").as("dst"),
          col("dlanes"), col("pmask"), col("qd"))
      // probe side carries its OWN lane + flip arrays + SQ8 codes into
      // the bucket join, so the candidate stream never joins anything
      // downstream: the smallest-shared-posted-lane election (codegen'd,
      // map-side) keeps exactly ONE copy of each colliding pair — the
      // ~16× candidate inflation dies in a filter, not in a dedup
      // shuffle — and the int8 dot scores it in the same stage (r11
      // verdict: this lane was 238.6 s at sf10, 43× its sf1 time, from
      // per-shared-table pair copies × two corpus-sized q8 joins × a
      // 16×-inflated dense_rank exchange). MULTI-PROBE (round 12): each
      // vector also probes its best-flip bucket per table (the ann_lsh
      // 1-bit trick, query-directed: the least-confident plane) — ~2×
      // probe rows for the measured routed-recall lift; the election
      // accepts either the exact or the flip match, still exactly once.
      val srcMeta = Seq(col("label"), col("vec_id").as("src"),
        col("lanes").as("slanes"), col("q8").as("qs")) ++
        (if (nProbe >= 1) Seq(col("flips").as("sflips")) else Seq.empty)
      def probeRows(buckets: Column) =
        meta.select(srcMeta :+ posexplode(buckets).as(Seq("t", "bucket")): _*)
      // flip probes explode a SLICE of the flips array so the posexplode
      // position is always the table index (at nFlips=2 the second-flip
      // buckets live at entries nTables..2·nTables−1)
      val probes = (0 to nProbe).map {
        case 0 => probeRows(col("lanes"))
        case f => probeRows(slice(col("flips"), (f - 1) * nTables + 1, nTables))
      }.reduce(_ unionByName _)
      // the election form must match the probe set exactly: a lane is only
      // electable if a probe could have GENERATED the pair there
      def elected =
        if (nProbe == 0) graft.plans.VectorExpressions.electLane(
          col("slanes"), col("dlanes"), col("pmask"))
        else graft.plans.VectorExpressions.electLaneMp(
          col("slanes"), col("sflips"), col("dlanes"), col("pmask"))
      val srcW = Window.partitionBy(col("src")).orderBy(col("adot").desc, col("dst"))
      val shortlist = probes.join(posted, Seq("label", "t", "bucket"))
        .filter(col("src") =!= col("dst"))
        .filter(elected === col("t"))
        .select(col("label"), col("src"), col("dst"),
          graft.plans.VectorExpressions.int8Dot(col("qs"), col("qd")).as("adot"))
        .withColumn("arn", dense_rank().over(srcW))
        .filter(col("arn") <= 8)
        .select(col("label"), col("src"), col("dst"))
      val bigEdges = shortlist
        .join(big.select(col("vec_id").as("src"), col("embedding").as("sv"), col("nrm").as("sn")), "src")
        .join(big.select(col("vec_id").as("dst"), col("embedding").as("dv"), col("nrm").as("dn")), "dst")
        .select(col("label"), col("src"), col("dst"),
          cosPre(col("sv"), col("dv"), col("sn"), col("dn")).as("cos"))
      smallEdges.unionByName(bigEdges)
    }
    val w = Window.partitionBy(col("src")).orderBy(col("cos").desc, col("dst"))
    edges
      .withColumn("cos", round(col("cos"), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select(col("label"), col("src"), col("rank"), col("dst"), col("cos"))
      .orderBy("src", "rank")
  }

  /** k-nearest-neighbor GRAPH within label blocks — the
    * neighborhood-graph primitive under graph clustering, kNN-LM
    * retrieval eval and NN-descent seeding: EVERY vector gets its k=3
    * most-cosine-similar neighbors among its label's members. Labels
    * within [[KnnBlockCap]] answer exactly (block self-join, one
    * shuffle on `label`, codegen'd [[graft.plans.FloatVecDot]], per-src
    * window); labels beyond it route all members through the directed
    * hyperplane-LSH candidate path — see [[knnGraphFor]] — so over-cap
    * work is O(n × lanes), never block², and no member is dropped. At
    * every oracle-gated SF all labels are under the cap, so the output
    * is the exact graph and DuckDB recomputes every pair. */
  val embKnnGraph: QueryDef = QueryDef(
    "emb_knn_graph",
    (s, d) => {
      val sizes = emb(s, d).groupBy(col("label")).agg(count(lit(1)).as("label_n"))
      knnGraphFor(s, withNorm(s, d).join(sizes, Seq("label")),
        graft.Conf.int(s, graft.Conf.KnnBlockCapConf, KnnBlockCap))
    },
    // The oracle is the UNCAPPED exact graph: at every oracle-gated SF all
    // labels sit under KnnBlockCap so the exact leg answers and hashes
    // match; if a corpus ever grows an over-cap label, the approximate
    // routed leg diverges VISIBLY here (and is then covered by the
    // over-cap routing spec) instead of an oracle-side cap silently
    // agreeing with dropped vectors.
    Some(s"""
      WITH n AS (
        SELECT vec_id, label, embedding,
               sqrt(list_sum(list_transform(generate_series(1, $Dim),
                 i -> embedding[i]::DOUBLE * embedding[i]::DOUBLE))) AS nrm
        FROM embeddings
      ),
      scored AS (
        SELECT a.label AS label, a.vec_id AS src, b.vec_id AS dst,
               round(
                 list_sum(list_transform(generate_series(1, $Dim),
                   i -> a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE))
                 / (a.nrm * b.nrm), 6) AS cos
        FROM n a JOIN n b ON a.label = b.label AND a.vec_id <> b.vec_id
      )
      SELECT label, src, rank, dst, cos
      FROM (SELECT *, CAST(row_number() OVER (PARTITION BY src ORDER BY cos DESC, dst) AS INT) AS rank
            FROM scored)
      WHERE rank <= 3
      ORDER BY src, rank
    """.stripMargin.trim)
  )

  /** Per-cell drift table for any (cell, embedding)-assignable frame
    * against a saved centroid matrix — factored so the spec can drive a
    * deliberately shifted corpus through the same arithmetic. */
  private[graft] def centroidDriftFor(s: SparkSession, vecs: DataFrame,
      cents: Array[Array[Double]]): DataFrame = {
    import s.implicits._
    val rows = vecs.select(cellOf(cents).as("cell"), col("embedding"))
      .groupBy(col("cell"))
      .agg(count(lit(1)).as("n_members"),
        array((1 to Dim).map(i => avg(element_at(col("embedding"), i))): _*).as("mean"))
      .collect()
      .map { r =>
        val cell = r.getInt(0)
        val n = r.getLong(1)
        val m = r.getSeq[Double](2).toArray
        val nm = math.sqrt(m.foldLeft(0.0)((a, x) => a + x * x))
        val c = cents(cell)
        val cos = if (nm == 0.0) 0.0
          else m.zip(c).map { case (a, b) => a * b }.sum / nm // c is unit-norm
        (cell, n, math.round((1.0 - cos) * 1e6))
      }
      .sortBy(_._1).toSeq
    rows.toDF("cell", "n_members", "drift_ppm")
  }

  /** INDEX-STALENESS MONITOR — the fifth leg of the index lifecycle
    * (build / serve / add / compact / MONITOR), answering "is it time to
    * retrain": per cell, the cosine drift (in ppm) between the SAVED
    * coarse centroid and the normalized mean of the vectors that
    * centroid currently attracts, plus the live member count. On the
    * training corpus drift is tiny (the saved model is one Lloyd round
    * from its own means — spec-bounded); after a distribution shift the
    * drifted cells light up and their recall decays exactly as
    * [[embClusterQuality]] predicts — this table is the trigger a
    * retraining scheduler reads. ONE narrow assignment pass (centroids
    * as plan constants) + a K-row aggregate/collect — O(corpus) scan,
    * O(K) state, same cost envelope as serving. Rows-only (reads the
    * engine-specific trained artifact); spec bounds training-corpus
    * drift, asserts coverage, and proves a deliberately scrambled
    * corpus sends median drift up by orders of magnitude. */
  val embCentroidDrift: QueryDef = QueryDef(
    "emb_centroid_drift",
    (s, d) => {
      val dir = annIndexDir(d)
      if (!new java.io.File(s"$dir/corpus_codes.parquet").exists())
        writeAnnIndex(s, d, dir)
      val (cents, _) = loadAnnModel(s, dir)
      centroidDriftFor(s, withNorm(s, d), cents).orderBy("cell")
    },
    None // engine-specific trained model: rows-only; drift-bound +
    //      shifted-corpus specs carry the correctness claim
  )

  /** MATRYOSHKA-style DIMENSION-TRUNCATION evaluation (Kusupati et al.
    * 2022) — the embedding-compression decision table: serve vectors
    * truncated to a dim prefix (16 / 32 / full 64), measure top-3 recall
    * against full-dimension truth plus the exact mean cosine shift over
    * the truth pairs — the numbers that decide whether an index can run
    * at 4× less memory/bandwidth. Same broadcast-query/one-corpus-scan
    * shape as [[annBruteforce]] per dim (3 narrow passes; `slice` keeps
    * codegen); shift arithmetic is integer micro-cosine (sum of |Δ| over
    * 6-dp-rounded cosines, integer div), so the whole report is
    * hash-exact cross-engine. The dim=64 row is the built-in sanity
    * anchor (recall 1000, shift 0). */
  val embDimTruncEval: QueryDef = QueryDef(
    "emb_dim_trunc_eval",
    (s, d) => {
      val dims = Seq(16, 32, 64)
      def scored(k: Int): DataFrame = {
        val base = emb(s, d).select(col("vec_id"),
          slice(col("embedding"), 1, k).as("v"))
        val q = base.filter(col("vec_id") < 8)
          .select(col("vec_id").as("query_id"), col("v").as("qv"),
            sqrt(dot(col("v"), col("v"))).as("qn"))
        val c = base.filter(col("vec_id") >= 8)
          .select(col("vec_id").as("neighbor_id"), col("v").as("cv"),
            sqrt(dot(col("v"), col("v"))).as("cn"))
        c.crossJoin(broadcast(q))
          .select(lit(k).as("dim"), col("query_id"), col("neighbor_id"),
            round(cosPre(col("qv"), col("cv"), col("qn"), col("cn")), 6).as("cos"))
      }
      val all = dims.map(scored).reduce(_ unionByName _)
        .withColumn("cos_ppm", round(col("cos") * 1000000).cast("long"))
      val w = Window.partitionBy(col("dim"), col("query_id"))
        .orderBy(col("cos").desc, col("neighbor_id"))
      val top3 = all
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("dim"), col("query_id"), col("neighbor_id"))
      val truth = top3.filter(col("dim") === 64)
        .select(col("query_id"), col("neighbor_id"))
      // truth pairs rescored under each dim → exact integer shift
      val fullCos = all.filter(col("dim") === 64)
        .select(col("query_id"), col("neighbor_id"), col("cos_ppm").as("full_ppm"))
      val shifts = all
        .join(truth, Seq("query_id", "neighbor_id"), "left_semi")
        .join(fullCos, Seq("query_id", "neighbor_id"))
        .groupBy(col("dim"))
        .agg(expr("sum(abs(cos_ppm - full_ppm)) div count(1)").as("mean_shift_ppm"))
      val hits = top3
        .join(truth, Seq("query_id", "neighbor_id"), "left_semi")
        .groupBy(col("dim"))
        .agg(count(lit(1)).as("n_hits"))
      // recall denominator DERIVED from the truth frame (1-row broadcast
      // agg), never hardcoded 8×k: a corpus with fewer than 8 query
      // vectors (or < 3 corpus vectors) must shrink the denominator so
      // the dim=64 anchor row stays exactly 1000 — a hardcoded 24 would
      // silently under-report instead of self-validating.
      val truthN = broadcast(truth.agg(count(lit(1)).as("n_truth")))
      // anchor on shifts (always one row per dim) — a dim with ZERO
      // recall must still report, not vanish from the table
      shifts.join(hits, Seq("dim"), "left")
        .crossJoin(truthN)
        .select(col("dim"),
          coalesce(col("n_hits"), lit(0L)).as("n_hits"),
          expr("(1000 * coalesce(n_hits, 0)) div n_truth").as("recall_pm"),
          col("mean_shift_ppm"))
        .orderBy("dim")
    },
    Some(s"""
      WITH dims AS (SELECT unnest([16, 32, 64]) AS dim),
      n AS (
        SELECT d.dim, e.vec_id, e.embedding,
               sqrt(list_sum(list_transform(generate_series(1, d.dim),
                 i -> e.embedding[i]::DOUBLE * e.embedding[i]::DOUBLE))) AS nrm
        FROM embeddings e, dims d
      ),
      scored AS (
        SELECT a.dim, a.vec_id AS query_id, b.vec_id AS neighbor_id,
               round(
                 list_sum(list_transform(generate_series(1, a.dim),
                   i -> a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE))
                 / (a.nrm * b.nrm), 6) AS cos
        FROM n a JOIN n b ON a.dim = b.dim AND a.vec_id < 8 AND b.vec_id >= 8
      ),
      ppm AS (
        SELECT dim, query_id, neighbor_id, cos,
               CAST(round(cos * 1000000) AS BIGINT) AS cos_ppm
        FROM scored
      ),
      top3 AS (
        SELECT dim, query_id, neighbor_id
        FROM (SELECT *, row_number() OVER (PARTITION BY dim, query_id
                ORDER BY cos DESC, neighbor_id) AS rn FROM ppm)
        WHERE rn <= 3
      ),
      truth AS (SELECT query_id, neighbor_id FROM top3 WHERE dim = 64),
      full_cos AS (
        SELECT query_id, neighbor_id, cos_ppm AS full_ppm FROM ppm WHERE dim = 64
      ),
      shifts AS (
        SELECT p.dim, sum(abs(p.cos_ppm - f.full_ppm)) // count(*) AS mean_shift_ppm
        FROM ppm p
        JOIN truth t ON p.query_id = t.query_id AND p.neighbor_id = t.neighbor_id
        JOIN full_cos f ON p.query_id = f.query_id AND p.neighbor_id = f.neighbor_id
        GROUP BY p.dim
      ),
      hits AS (
        SELECT g.dim, count(*) AS n_hits
        FROM top3 g JOIN truth t
          ON g.query_id = t.query_id AND g.neighbor_id = t.neighbor_id
        GROUP BY g.dim
      )
      SELECT s.dim, coalesce(h.n_hits, 0)::BIGINT AS n_hits,
             ((1000 * coalesce(h.n_hits, 0)) // (SELECT count(*) FROM truth))::BIGINT AS recall_pm,
             s.mean_shift_ppm::BIGINT AS mean_shift_ppm
      FROM shifts s LEFT JOIN hits h ON s.dim = h.dim
      ORDER BY s.dim
    """.stripMargin.trim)
  )

  // ------------------------------------------- persisted index artifacts ----

  /** Root for saved ANN index artifacts: one subdirectory per corpus
    * (md5 of the sf dir path), overridable via SPARK_GRAFT_INDEX_DIR.
    * Anchored at the JVM working directory (the repo root under sbt), in
    * the gitignored data/ tree. */
  private[graft] def annIndexDir(d: String): String = {
    val tag = java.security.MessageDigest.getInstance("MD5")
      .digest(d.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(12)
    val root = sys.env.getOrElse("SPARK_GRAFT_INDEX_DIR",
      s"${sys.props("user.dir")}/data/ann_index")
    s"$root/$tag"
  }

  /** Runs the IVFPQ training + encode ONCE and writes the three artifact
    * tables [[annIvfPq]] otherwise rebuilds per invocation. `keep`
    * restricts BOTH training and the encoded corpus to a subset — the
    * build-time view [[annIndexUpsert]] freezes its model against. */
  private def writeAnnIndex(s: SparkSession, d: String, dir: String,
      keep: Option[Column] = None): Unit = {
    val books = pqBooks(s, d, keep)
    val base = keep.map(withNorm(s, d).filter(_)).getOrElse(withNorm(s, d))
    val seed = keep.map(emb(s, d).filter(_)).getOrElse(emb(s, d))
    var cents = normalizeRows(cellMeans(
      seed.select(col("label").cast("int").as("cell"), col("embedding"))))
    cents = normalizeRows(cellMeans(base.select(cellOf(cents).as("cell"), col("embedding"))))
    import s.implicits._
    // centroids: K rows of (cell, centroid) — the coarse quantizer
    cents.zipWithIndex.map { case (c, i) => (i, c.toSeq) }.toSeq
      .toDF("cell", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/centroids.parquet")
    // codebooks: M×K rows of (m, k, centroid) — the PQ model
    (for { mm <- books.indices; kk <- books(mm).indices }
      yield (mm, kk, books(mm)(kk).toSeq)).toDF("m", "k", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/codebooks.parquet")
    // corpus codes: (cell, vec_id, codes) — the inverted lists, 8-byte
    // payload per vector; the ONLY corpus-sized table, written in one
    // distributed encode pass (both kernels are plan constants)
    base.select(
      cellOf(cents).as("cell"),
      col("vec_id"),
      graft.plans.VectorExpressions.pqEncode(col("embedding"), books)
        .getField("codes").as("codes"))
      .write.mode("overwrite").parquet(s"$dir/corpus_codes.parquet")
  }

  /** BUILD-ONCE half of the FAISS build/serve split: trains the IVFPQ
    * model (label-mean + Lloyd coarse quantizer, sample-trained PQ
    * codebooks — identical training to [[annIvfPq]]) and PERSISTS it as
    * three parquet tables (centroids, codebooks, corpus inverted-list
    * codes), so serving never retrains. Every in-repo ANN lane before
    * round 10 rebuilt its model per invocation — free at bench SF,
    * a non-starter at 100 TB where the corpus encode alone is a full
    * scan. Training is deterministic, so a rebuild is byte-identical;
    * the saved-index precedent is `sketch_window_merge`'s persisted KMV
    * states. Output: the artifact manifest (deterministic counts). */
  val annIndexBuild: QueryDef = QueryDef(
    "ann_index_build",
    (s, d) => {
      val dir = annIndexDir(d)
      writeAnnIndex(s, d, dir)
      import s.implicits._
      val nCent = s.read.parquet(s"$dir/centroids.parquet").count()
      val nBooks = s.read.parquet(s"$dir/codebooks.parquet").count()
      val nCodes = s.read.parquet(s"$dir/corpus_codes.parquet").count()
      Seq(
        ("centroids", nCent, s"dim=$Dim"),
        ("codebooks", nBooks, s"m=$PqM,k=$PqK,subdim=$pqSubDim"),
        ("corpus_codes", nCodes, s"bytes_per_vec=$PqM"))
        .toDF("component", "n_rows", "detail")
        .orderBy("component")
    },
    None // engine-specific trained model: manifest is rows-only; the
    //      serve-parity spec proves the artifact byte-equivalent
  )

  /** Model load from a saved artifact: K + M×K rows — bounded collects,
    * not training. Shared by the serve and upsert halves. */
  private[graft] def loadAnnModel(s: SparkSession, dir: String)
      : (Array[Array[Double]], Array[Array[Array[Double]]]) = {
    val cents = s.read.parquet(s"$dir/centroids.parquet").collect()
      .map(r => r.getInt(0) -> r.getSeq[Double](1).toArray)
      .sortBy(_._1).map(_._2)
    val bookRows = s.read.parquet(s"$dir/codebooks.parquet").collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getSeq[Double](2).toArray).toMap
    (cents, Array.tabulate(PqM)(mm => Array.tabulate(PqK)(kk => bookRows((mm, kk)))))
  }

  /** SERVE half: [[annIvfPq]]'s exact plan, but every model input comes
    * from the SAVED artifact — centroids and codebooks load as tiny
    * plan constants (K and M×K rows), the corpus is scanned by its
    * persisted 8-byte (cell, codes) rows, and the float embeddings are
    * touched ONLY by the 8-row query side and the shortlist rerank
    * join (the FAISS refine-from-storage path). Zero training, zero
    * corpus encode at serve time: repeated searches pay probe cost
    * only. Bootstraps the artifact if absent (one-time, then reused —
    * also what makes the query self-contained under a fresh JVM).
    * Answers are bit-identical to inline [[annIvfPq]] (training is
    * deterministic), which the spec asserts row-for-row. */
  val annIndexSearch: QueryDef = QueryDef(
    "ann_index_search",
    (s, d) => {
      val dir = annIndexDir(d)
      if (!new java.io.File(s"$dir/corpus_codes.parquet").exists())
        writeAnnIndex(s, d, dir)
      val nProbe = 4
      val (cents, books) = loadAnnModel(s, dir)
      val corpus = s.read.parquet(s"$dir/corpus_codes.parquet")
        .select(col("cell"), col("vec_id").as("neighbor_id"), col("codes"))
      val base = withNorm(s, d)
      val queries = base.filter(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"),
          graft.plans.VectorExpressions.pqLut(col("embedding"), books).as("lut"),
          explode(transform(
            graft.plans.VectorExpressions.nearestCells(col("embedding"), cents, nProbe),
            c => c.getField("cell"))).as("cell"))
      val adcW = Window.partitionBy(col("query_id")).orderBy(col("adc"), col("neighbor_id"))
      val shortlist = corpus
        .join(broadcast(queries), Seq("cell"))
        .filter(col("query_id") =!= col("neighbor_id"))
        .withColumn("adc", graft.plans.VectorExpressions.pqAdc(col("codes"), col("lut")))
        .withColumn("arank", row_number().over(adcW))
        .filter(col("arank") <= PqShortlist)
        .select(col("query_id"), col("neighbor_id"))
      pqRerank(base, shortlist)
    },
    None // approximate: serve-parity + recall spec'd against annIvfPq
  )

  /** The deterministic "new arrivals" slice for the upsert lane: every
    * tenth vector (pmod 7) is withheld from the frozen build and later
    * added. ~10% churn — a realistic ingest increment. */
  private[graft] def upsertIsNew: Column = pmod(col("vec_id"), lit(10)) === 7

  /** INCREMENTAL-ADD half of the index lifecycle (FAISS `add` semantics):
    * the model is FROZEN — new vectors are assigned to their nearest
    * existing cell and PQ-encoded with the existing codebooks, never
    * retrained. The increment lands as a separate `upsert_codes` parquet
    * segment (the Lucene-style delta-segment form — the natural
    * distributed rendering of FAISS's in-place posting-list append), so
    * the op is idempotent across reruns and serving reads
    * base ∪ segments. Parity contract (spec-asserted bit-for-bit):
    * upsert(model(base), new) ≡ encode-all(model(base), base ∪ new) —
    * i.e. the segmented index is indistinguishable from having encoded
    * the full corpus under the same frozen model.
    *
    * Scale shape: ONE narrow codegen'd encode pass over the increment
    * (both kernels are plan constants), zero exchanges before the
    * manifest agg; at 100 TB the increment encode touches only the new
    * data — which is the entire point of the build/serve/add split. */
  val annIndexUpsert: QueryDef = QueryDef(
    "ann_index_upsert",
    (s, d) => {
      import s.implicits._
      val dir = annIndexDir(d) + "-frozen"
      if (!new java.io.File(s"$dir/corpus_codes.parquet").exists())
        writeAnnIndex(s, d, dir, keep = Some(!upsertIsNew))
      val (cents, books) = loadAnnModel(s, dir)
      withNorm(s, d).filter(upsertIsNew)
        .select(
          cellOf(cents).as("cell"),
          col("vec_id"),
          graft.plans.VectorExpressions.pqEncode(col("embedding"), books)
            .getField("codes").as("codes"))
        .write.mode("overwrite").parquet(s"$dir/upsert_codes.parquet")
      val nBase = s.read.parquet(s"$dir/corpus_codes.parquet").count()
      val up = s.read.parquet(s"$dir/upsert_codes.parquet")
      val nNew = up.count()
      val touched = up.select(countDistinct(col("cell"))).first().getLong(0)
      Seq(
        ("base_codes", nBase, "model=frozen"),
        ("total_codes", nBase + nNew, s"bytes_per_vec=$PqM"),
        ("upsert_codes", nNew, s"cells_touched=$touched"))
        .toDF("component", "n_rows", "detail")
        .orderBy("component")
    },
    None // engine-specific trained model: manifest is rows-only; the
    //      frozen-model parity spec proves the segment bit-equivalent
  )

  /** Ensures the frozen-model artifact (base minus the withheld slice) and
    * its delta segment both exist on disk — the shared bootstrap for the
    * upsert-adjacent lanes, so each query is self-contained under a fresh
    * JVM. Returns the artifact directory. */
  private def ensureFrozenWithSegment(s: SparkSession, d: String): String = {
    val dir = annIndexDir(d) + "-frozen"
    if (!new java.io.File(s"$dir/corpus_codes.parquet").exists())
      writeAnnIndex(s, d, dir, keep = Some(!upsertIsNew))
    if (!new java.io.File(s"$dir/upsert_codes.parquet").exists()) {
      val (cents, books) = loadAnnModel(s, dir)
      withNorm(s, d).filter(upsertIsNew)
        .select(
          cellOf(cents).as("cell"),
          col("vec_id"),
          graft.plans.VectorExpressions.pqEncode(col("embedding"), books)
            .getField("codes").as("codes"))
        .write.mode("overwrite").parquet(s"$dir/upsert_codes.parquet")
    }
    dir
  }

  /** COMPACTION leg of the index lifecycle (Lucene segment merge / FAISS
    * `merge_from`): folds the delta segment back into ONE contiguous codes
    * table so serving returns to a single range-clustered scan instead of a
    * base ∪ segments union. Duplicate vec_ids resolve newest-generation-
    * wins (segments override base — the LSM/Lucene rule; here the sets are
    * disjoint and the spec asserts zero overwrites). The merged table is
    * range-repartitioned on (cell, vec_id) and sorted within partitions, so
    * each inverted list lands contiguous in its parquet row groups — at
    * 100 TB this is what keeps a probe's posting-list read sequential after
    * months of ingest. Cost is the Lucene merge cost by design: one shuffle
    * over the 8-byte codes rows (never the float embeddings), with an
    * explicit partition count (AQE would coalesce a tiny repartition to 1).
    * Inputs stay in place — swapping `compacted` in for base+segment is the
    * caller's atomic-pointer step. Output: deterministic manifest. */
  val annIndexCompact: QueryDef = QueryDef(
    "ann_index_compact",
    (s, d) => {
      import s.implicits._
      val dir = ensureFrozenWithSegment(s, d)
      val base = s.read.parquet(s"$dir/corpus_codes.parquet")
      val seg = s.read.parquet(s"$dir/upsert_codes.parquet")
      val nBase = base.count(); val nSeg = seg.count()
      val w = Window.partitionBy(col("vec_id")).orderBy(col("gen").desc)
      val merged = base.withColumn("gen", lit(0))
        .unionByName(seg.withColumn("gen", lit(1)))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1).drop("rn", "gen")
      val parts = math.max(1, ((nBase + nSeg) / 50000L).toInt + 1)
      merged.repartitionByRange(parts, col("cell"), col("vec_id"))
        .sortWithinPartitions("cell", "vec_id")
        .write.mode("overwrite").parquet(s"$dir/compacted_codes.parquet")
      val comp = s.read.parquet(s"$dir/compacted_codes.parquet")
      val stats = comp.agg(
        count(lit(1)).as("n"), countDistinct(col("cell")).as("cells")).first()
      val (nComp, nCells) = (stats.getLong(0), stats.getLong(1))
      Seq(
        ("compacted_codes", nComp, s"cells=$nCells,parts=$parts"),
        ("merged_base", nBase, "gen=0"),
        ("merged_segments", nSeg, s"overwrites=${nBase + nSeg - nComp}"))
        .toDF("component", "n_rows", "detail")
        .orderBy("component")
    },
    None // engine-specific trained model: manifest is rows-only; the
    //      compaction spec proves content parity with base ∪ segment
  )

  val all: Seq[QueryDef] = Seq(annBruteforce, annRangeSearch, dedupEmbedding,
    dedupSemantic, annLsh, annIvf, annIvfK, embOutliers, embCosineHist,
    embPqCodes, annPq, annIvfPq, embRecallReport, embClusterQuality,
    annIndexBuild, annIndexSearch, annIndexUpsert, annIndexCompact, embKnnGraph,
    embDimTruncEval, embCentroidDrift)
}
