package graft

import org.apache.spark.sql.SparkSession

/** Deployment-tunable scale knobs, exposed as `spark.graft.*` runtime confs
  * (the [[GraftSql.DataDirConf]] pattern — settable per session, no
  * rebuild). Every default is this repo's MEASURED 32-core constant; the
  * scaladoc at each consuming operator records the measurement. The knobs
  * move plan-ROUTING thresholds only: under-threshold plans are unchanged,
  * and the guarded batch lanes delegate to oracle-proven-identical twins,
  * so flipping a knob never changes an exact lane's answer — it changes
  * which physical plan computes it (or, for the approximate ANN caps,
  * where the declared exact→routed crossover sits).
  *
  * Why confs and not constants: PLANS.md's own scale notes say a
  * 1000-executor deployment must move these (one straggler task idles the
  * fleet, so the single-sort crossover sits far LEFT of a 32-thread box's;
  * a memory-rich executor can hold bigger posting lists). Conf-reading
  * makes that an ops decision instead of a fork. */
object Conf {

  /** Max rows one window partition may funnel through a single task's sort
    * before a guarded lane delegates to its two-phase twin
    * ([[graft.operators.Guards.SingleSortCap]] holds the measured
    * rationale). */
  val SingleSortCapConf = "spark.graft.singleSortCap"

  /** q_window_funnel's OWN delegation cap (rows for the hottest user
    * before the lane re-routes to `q_window_funnel_dist`). Separate from
    * [[SingleSortCapConf]] because the funnel kernel is an O(1)-state
    * streaming fold over Spark's spillable group sort — no per-group heap
    * and no per-row output amplification, unlike the lag/lead/window
    * lanes — so its measured single-box crossover sits ~25× further
    * right: hot-user rows (plain vs twin, 32 threads, fresh JVMs) 1M
    * 6.6/16.4 s, 5M 15.6/23.7 s, 20M 71.7/169.4 s, 50M 163.7/167.5 s
    * (tie). The twin's cost is CORPUS-bound (flat 167–169 s at 100M
    * events whether the hot user holds 20M or 50M) while plain grows
    * only with the hot group, so delegation must be rare; default 32M
    * keeps margin under the measured 50M tie. A 1000-executor
    * deployment lowers this (a 50M-row task is a fleet-idling straggler
    * there; the twin's corpus stages parallelize with the fleet). */
  val FunnelSortCapConf = "spark.graft.funnelSortCap"

  /** Per-label block size above which emb_knn_graph routes members through
    * the directed-LSH leg instead of the exact block self-join. */
  val KnnBlockCapConf = "spark.graft.knnBlockCap"

  /** Per-label block size above which dedup_embedding's pair audit takes
    * the LSH candidate leg. */
  val EmbBlockCapConf = "spark.graft.embBlockCap"

  /** Posting-list truncation depth per (label, lane, bucket) in the
    * over-cap ANN legs — the FAISS oversized-list rule's keep-k. */
  val PostingCapConf = "spark.graft.postingCap"

  /** Multi-probe depth for the over-cap emb_knn_graph leg: 0 = exact
    * buckets only (worst-case recall 0.394), 1 = + best-flip bucket per
    * table (0.533), 2 = + second-best flip (default — 0.595 on the
    * uniform worst-case corpus at cost parity with depth 1; PLANS.md
    * holds the measured recall/cost curve). */
  val KnnProbeConf = "spark.graft.knnProbe"

  /** Corpus-vector count above which the ANN serving lanes (`ann_lsh`,
    * `emb_recall_report`'s index search) stop building the driver-resident
    * broadcast index and route to the distributed posting-join twin
    * ([[graft.operators.Guards.AnnServeCap]] holds the measured
    * rationale). The twin is spec-proven row-identical, so the flip
    * changes the physical plan only. */
  val AnnServeCapConf = "spark.graft.annServeCap"

  /** Multi-probe depth for the SERVING/SEGMENT ANN lanes' `lshTopK`
    * shortlist (the `ann_lsh` family): 1 = exact bucket + every 1-bit
    * sig flip per table (the r14 hard-coded behavior, kept as default),
    * 2 = + every 2-bit flip — ~(P choose 2) extra probe buckets per
    * table for a recall/cost dial the routed kNN leg already has
    * ([[KnnProbeConf]]). Needed at scale: sampled recall@3 on the sf10
    * tiled corpus measured 0.485 at depth 1 (log-scaled buckets finer
    * than per-copy structure) with no knob to buy it back; PLANS.md
    * holds the measured depth-1/2 curve. */
  val AnnProbeConf = "spark.graft.annProbe"

  /** Members-per-(table, bucket) cap for the STREAMING embedding dedup
    * gate ([[graft.streaming.StreamEmbDedup]]) — 0 (default) = unbounded,
    * today's exact-candidate contract. Above 0 each bucket keeps a ring
    * of the newest N members: per-newcomer pairing work and state stay
    * O(tables × N) at ANY corpus size instead of growing linearly with
    * accumulated members (the sf100 drive's ~3 → 10 min/batch curve).
    * Recall trade: a pair is missed iff the earlier vector has rotated
    * out of the SMALLEST signature-shared table's ring before the later
    * one arrives (the election reads signature prefixes, so a higher
    * table the two still share never re-elects — bucket occupancy
    * differs per table, making this strictly more misses than "out of
    * every shared table"; size caps from THIS condition) — the
    * posting-cap economics of the batch over-cap ANN legs applied to
    * ingest. Size it to the duplicate horizon (how far apart duplicates
    * arrive), like retention in the bounded gate but counted in members,
    * not time. Applies to BOTH candidate stages (round 17): the
    * unbounded gate ([[graft.streaming.StreamEmbDedup.candidates]]) and
    * the retention-bounded gate
    * ([[graft.streaming.StreamEmbDedup.candidatesBounded]]), where
    * retention bounds total state but not one hot (table, bucket) group
    * inside the window — there expired members evict first, then
    * oldest-by-arrival. */
  val EmbGateBucketCapConf = "spark.graft.embGateBucketCap"

  /** Newest-N ring cap on the PERCEPTUAL streaming gates' state buckets
    * (image/audio band buckets, video frame-hash buckets —
    * [[graft.streaming.StreamPhashDedup]]), the [[EmbGateBucketCapConf]]
    * treatment ported to the stop-frame modalities (r17 verdict #2: at
    * sf10 perceptual buckets went duplication-sized — band df 3291,
    * frame df 8622, 22 buckets carrying 72% of 1.7e9 candidate rows —
    * so an unbounded gate bucket is a state/CPU wall at ingest scale).
    * 0 (default) keeps the exact contract; > 0 bounds every bucket to
    * its newest N members — a pair is MISSED iff the earlier payload
    * rotated out of the electing bucket's ring (smallest shared band /
    * smallest shared frame hash) before the later one arrived; never
    * duplicated, because election reads signatures/full hash sets, not
    * ring membership. */
  val PhashGateBucketCapConf = "spark.graft.phashGateBucketCap"

  /** On-disk byte cap under which [[graft.operators.Guards.dimHint]]
    * broadcast-hints a dimension-table slice (round 18, closing the r17
    * verdict-#1 trade): a FORCED hint on an SF-scaling frame is a hard
    * failure above the 8 GB broadcast ceiling, but dropping every hint
    * makes fixed-fraction dim slices (16% of part, a mktsegment slice of
    * customer) plan as SortMergeJoin once their ESTIMATE crosses the
    * 10 MB threshold — AQE still converts at runtime, but both sides'
    * map-write is already paid (measured at sf10: q_supplier_variety
    * 5.2 → 9.9 s). The guard reads the table's actual parquet bytes
    * (ground truth, memoized per (session, dir) with the staleness
    * fingerprint) and hints only while the WHOLE table is provably
    * small: default 256 MiB of files ≈ well under a 4 GB in-memory
    * build at the worst compression ratios, and customer crosses it by
    * ~sf100 — three orders of magnitude before the hard-fail cliff.
    * 0 disables all guarded hints (the audit runs with 0 so raw
    * unbounded hints still get flagged). */
  val DimHintCapConf = "spark.graft.dimHintCap"

  /** Query rows per broadcast batch in the distributed (segment-serving)
    * ANN path: query streams past this loop over disjoint pmod batches —
    * one corpus pass each — so the broadcast stays ≤ ~cap × 90 B no
    * matter how many queries arrive. */
  val AnnQueryBatchConf = "spark.graft.annQueryBatch"

  /** df window cap on the perceptual-hash BAND buckets (mm_phash /
    * mm_audio_phash candidate join, r17): band values shared by more
    * than this many docs are stop-bands — excluded from candidate
    * generation, so the banded join is Σ min(df, cap)·df-bounded instead
    * of Σ df². Below the cap the pigeonhole guarantee is intact; above
    * it a Hamming ≤ 3 pair is missed only if EVERY band it shares is
    * over-window (measured at sf10: cap=1024 loses 5,895 of 13,854,526
    * image pairs — recall 0.9996). Oracle-gated SFs sit entirely under
    * the default (max band df ≈ 330 at sf0.1), so sweeps stay exact. */
  val PhashBandMaxDfConf = "spark.graft.phashBandMaxDf"

  /** df window cap on the video frame-hash buckets (mm_video_phash
    * candidate join, r17): frame hashes shared by more than this many
    * videos are stop-frames (blank/common content) — excluded from
    * candidate generation; the n_shared confirm recomputes EXACTLY from
    * the full per-doc sorted hash sets, so windowing affects only which
    * pairs are FOUND, never their reported counts. A qualifying pair is
    * missed only if every hash it shares is over-window. Oracle-gated
    * SFs sit under the default (max df 13 at sf0.01). */
  val VideoMaxDfConf = "spark.graft.videoMaxDf"

  def long(s: SparkSession, key: String, default: Long): Long =
    s.conf.getOption(key).map(_.trim.toLong).getOrElse(default)

  def int(s: SparkSession, key: String, default: Int): Int =
    s.conf.getOption(key).map(_.trim.toInt).getOrElse(default)

  /** The measurement-harness knob seam, single-sourced (round 15 —
    * Bench and RecallCheck each carried a copy):
    * `SPARK_GRAFT_CONF="spark.graft.annProbe=2,..."` applies runtime
    * confs before any lane builds. Known limit (shared by design with
    * the one parser): list-valued confs containing commas don't fit
    * this env var — core confs like `spark.local.dir=/a,/b` belong in
    * SPARK_GRAFT_JVM_CONF anyway (session confs are too late for
    * them). */
  def applyEnv(s: SparkSession): Unit =
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(",").filter(_.contains("="))
      .foreach { kv =>
        val Array(k, v) = kv.split("=", 2)
        s.conf.set(k.trim, v.trim)
      })
}
