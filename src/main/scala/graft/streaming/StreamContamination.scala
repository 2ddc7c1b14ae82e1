package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}

/** STREAMING benchmark-decontamination gate — the ingestion-time twin of
  * batch `pipeline_contamination`: every arriving training document is
  * checked against a STATIC benchmark/eval corpus before it can enter the
  * training archive, so contaminated docs are quarantined at the door
  * instead of discovered by a post-hoc sweep.
  *
  * Topology: the benchmark's distinct word 8-grams (benchmark-sized by
  * definition — eval sets are tiny next to a training corpus) collect
  * once and BROADCAST; each streamed doc then scores in a STATELESS typed
  * map (its distinct 8-grams probed against the broadcast set — the same
  * [[graft.operators.Curation.wordShingles8]] kernel the batch op
  * shingles with, so counts are byte-identical). No state store, no
  * shuffle, append mode: the gate adds one narrow map to the ingest plan
  * at any corpus size. At extreme benchmark sizes swap the broadcast
  * `Set[String]` for xxhash64 shingle hashes (8 bytes each) or a bloom
  * prefilter + confirm lane.
  *
  * Spec contract: streaming the batch op's own eval split against its
  * train split reproduces `pipeline_contamination`'s per-doc counts and
  * percentage EXACTLY (StreamingSpec drives it in two chunks). */
object StreamContamination {

  /** Per-document gate decision. `contamination_pct` is the batch op's
    * exact integer per-mille arithmetic ((10000 * hits) div n / 100.0 —
    * no float division, so stream and batch cannot diverge). */
  final case class Decision(
      doc_id: Long,
      n_ngrams: Long,
      n_hits: Long,
      contamination_pct: Double,
      quarantined: Boolean)

  /** Gate a streaming (doc_id, text) frame against a static benchmark
    * corpus (any frame with a `text` column). A doc quarantines when at
    * least `minHits` of its distinct 8-grams appear in the benchmark —
    * the conservative default flags a SINGLE shared 8-gram, the usual
    * leakage policy.
    *
    * `maxBenchNgrams` bounds the driver-side collect: the design premise
    * is that the benchmark battery is TINY next to the training corpus
    * (eval sets are ~MBs), and the default cap of 2M distinct 8-grams
    * (~hundreds of MB as JVM strings — a 100-MB-of-text battery) keeps
    * that premise explicit instead of implied. A battery over the cap
    * fails FAST at stream-construction time with the remediation named,
    * rather than OOMing the driver mid-ingest; the scale path for a
    * genuinely huge battery is the hashed-shingle stream-static join
    * (probe xxhash64 shingle hashes against a benchmark hash table, the
    * [[StreamDedup]] confirm topology), which gives up the zero-shuffle
    * stateless map this gate exists for. */
  def decisions(docs: DataFrame, benchmark: DataFrame, minHits: Long = 1L,
      maxBenchNgrams: Long = 2000000L): Dataset[Decision] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val nDistinct = benchmark.select("text").as[String]
      .flatMap(graft.operators.Curation.wordShingles8).distinct().count()
    require(nDistinct <= maxBenchNgrams,
      s"benchmark battery has $nDistinct distinct 8-grams (cap $maxBenchNgrams): " +
        "too large to broadcast as a driver set — probe hashed shingles via a " +
        "stream-static join instead, or raise maxBenchNgrams deliberately")
    val bench: Set[String] = benchmark.select("text").as[String].collect()
      .iterator.flatMap(graft.operators.Curation.wordShingles8).toSet
    val b = spark.sparkContext.broadcast(bench)
    docs.select("doc_id", "text").as[(Long, String)].map { case (id, text) =>
      val hs = graft.operators.Curation.wordShingles8(text)
      val n = hs.length.toLong
      val hits = hs.count(b.value.contains).toLong
      val pct = if (n == 0L) 0.0 else (10000L * hits / n) / 100.0
      Decision(id, n, hits, pct, hits >= minHits)
    }
  }
}
