package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

import graft.operators.Dedup

/** STREAMING near-duplicate surfacing — the live twin of the batch
  * `dedup_minhash_lsh` operator: documents arrive on a stream, and every
  * incoming doc is checked against the ENTIRE corpus seen so far (not
  * just its micro-batch) through MinHash-LSH band state, emitting
  * confirmed jaccard ≥ τ pairs as they become known. This is the
  * ingestion-time dedup gate a training-data pipeline runs in front of
  * its archive — the reference's poll-loop analog is re-expressed as one
  * continuous stateful plan.
  *
  * Topology (both forms, round 9): one typed flatMap shingles +
  * minhashes each doc (JVM-side [[Dedup.hashedShingleSet]]/
  * [[Dedup.minhashBandKeys]] — byte-identical to the batch column
  * pipeline) and emits its 16 (band_idx, band-key signature) rows;
  * `flatMapGroupsWithState` keyed on the band bucket holds prior members
  * as packed primitive arrays of (doc_id, band signatures BELOW the
  * group's own band — all the election reads) — FIXED ≤136 B per member
  * (avg ~68) regardless of document length — and emits each bucket-mate
  * pair as a CANDIDATE exactly once (smallest-shared-band election; see
  * [[PackedBandMembers]] for why the layout is packed). Exact Jaccard confirm is DOWNSTREAM and
  * STATELESS: a stream-static join against the corpus/archive plus the
  * codegen'd [[graft.plans.SortedJaccard]] kernel — the batch operator's
  * own band-join → candidates → confirm-join topology.
  *
  * State bounds: a bucket holds only docs agreeing on 4 of 64 minhash
  * rows — near-dup cluster populations, not corpus populations (the
  * batch op's band equi-join reads the same distribution). Per-bucket
  * work for a newcomer is O(bucket); the shingle-set merges happen in
  * the confirm join, the exact cost the batch confirm pays per
  * candidate pair. At 100 TB the state store backend (RocksDB) pages
  * buckets off-heap; [[candidatesBounded]] adds retention eviction.
  *
  * Spec contract: streamed over the test corpus in arbitrary chunking,
  * `distinctPairs` equals the batch `dedup_minhash_lsh` rows exactly
  * (same bands, same hashes, same τ — StreamingSpec drives a dup pair
  * SPLIT ACROSS batches to prove the cross-batch state path). */
object StreamDedup {

  /** One confirmed near-dup hit, reported on the band lane that found it. */
  final case class NearDupHit(id1: Long, id2: Long, jac: Double, band_idx: Int)

  /** An unbounded-form LSH candidate pair, elected exactly once on the
    * smallest shared band. */
  final case class BandHit(id1: Long, id2: Long, band_idx: Int)

  private[streaming] def bandSigs(text: String): Array[Long] = {
    val hs = Dedup.hashedShingleSet(text)
    if (hs.isEmpty) Array.emptyLongArray
    else Dedup.minhashBandKeys(hs).map { k =>
      org.apache.spark.sql.catalyst.expressions.XXH64.hashUTF8String(
        org.apache.spark.unsafe.types.UTF8String.fromString(k), 42L)
    }
  }

  /** Packed band-member state (round 15 — the [[StreamEmbDedup
    * .PackedVecMembers]] layout for Long signatures): `ids(j)` is member
    * j's doc_id and `pre(j*b .. j*b+b-1)` its band signatures at bands
    * 0..b-1, where b is the group's own band index — all the
    * smallest-shared-band election ever reads (both members share THIS
    * band by construction). Primitive arrays encode as one
    * UnsafeArrayData memcopy per state write instead of a per-element
    * List re-encode, and the suffix signatures never enter state or the
    * exchange: ~(8 + 8·bIdx) B per member, avg half the old fixed-16
    * layout.
    *
    * STATE-FORMAT BREAK (r15 advice): the packed layouts (this,
    * [[PackedTimedBandMembers]], [[StreamEmbDedup.PackedVecMembers]] and
    * its timed twin) changed the fmgws state encoder schema — a restart
    * from a pre-round-15 checkpoint fails Spark's state-schema check by
    * design (no silent misread); there is no migration path. Gate
    * checkpoints are retention-bounded operational state, not data: an
    * in-place upgrade discards old gate checkpoints and replays the
    * retention window (the confirmed-pair SINK is the durable output and
    * carries across). */
  final case class PackedBandMembers(ids: Array[Long], pre: Array[Long])

  /** True iff `p` (a newcomer's b-entry signature prefix) shares a
    * signature with member j of `pre` at any band below b — i.e. the
    * pair was already elected on an earlier band. The SINGLE source of
    * the election comparison (plus the buffer twin below); primitive
    * while-loops per the repo's hot-path rule. */
  private def sharesBelow(p: Array[Long], pre: Array[Long], j: Int, b: Int): Boolean = {
    var i = 0
    val base = j * b
    while (i < b) {
      if (p(i) == pre(base + i)) return true
      i += 1
    }
    false
  }

  /** [[sharesBelow]] against the within-batch newcomer buffer. */
  private def sharesBelowBuf(p: Array[Long],
      pre: scala.collection.mutable.ArrayBuffer[Long], k: Int, b: Int): Boolean = {
    var i = 0
    val base = k * b
    while (i < b) {
      if (p(i) == pre(base + i)) return true
      i += 1
    }
    false
  }

  /** Candidate pairs from a streaming (doc_id, text) frame, each pair
    * emitted exactly once (when its later doc arrives) via the
    * smallest-shared-band election — no confirm, no shingle state. */
  def candidates(docs: DataFrame): Dataset[BandHit] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select("doc_id", "text")
      .as[(Long, String)]
      .flatMap { case (id, text) =>
        val sigs = bandSigs(text)
        // each band row carries only the PREFIX (bands below its own)
        sigs.iterator.zipWithIndex
          .map { case (sig, bIdx) => (bIdx, sig, id, sigs.take(bIdx)) }
      }
      .groupByKey { case (bIdx, sig, _, _) => (bIdx, sig) }
      .flatMapGroupsWithState[PackedBandMembers, BandHit](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case ((bIdx, _), rows, state) =>
          val st = state.getOption
            .getOrElse(PackedBandMembers(Array.emptyLongArray, Array.emptyLongArray))
          val newIds = scala.collection.mutable.ArrayBuffer.empty[Long]
          val newPre = scala.collection.mutable.ArrayBuffer.empty[Long]
          val out = scala.collection.mutable.ArrayBuffer.empty[BandHit]
          // doc_id order makes within-batch pairing deterministic and
          // independent of micro-batch chunking: a batch's docs join the
          // bucket one at a time, each paired against ALL earlier
          // members (previous batches AND earlier rows of this batch).
          rows.toSeq.sortBy(_._3).foreach { case (_, _, id, p) =>
            if (!st.ids.contains(id) && !newIds.contains(id)) {
              var j = 0
              while (j < st.ids.length) {
                if (!sharesBelow(p, st.pre, j, bIdx))
                  out += BandHit(math.min(id, st.ids(j)),
                    math.max(id, st.ids(j)), bIdx)
                j += 1
              }
              var k = 0
              while (k < newIds.length) {
                if (!sharesBelowBuf(p, newPre, k, bIdx))
                  out += BandHit(math.min(id, newIds(k)),
                    math.max(id, newIds(k)), bIdx)
                k += 1
              }
              newIds += id
              newPre ++= p
            }
          }
          if (newIds.nonEmpty)
            state.update(PackedBandMembers(st.ids ++ newIds, st.pre ++ newPre))
          out.iterator
      }
  }

  /** Confirmed jaccard ≥ τ pairs from a streaming (doc_id, text) frame.
    * Append-mode output, each pair exactly once (election — no dedup
    * state). `corpus`: static (doc_id, text) resolving every admitted
    * doc (the archive in production) — or a pre-shingled (doc_id, hsh)
    * frame, see [[corpusShingleSets]].
    *
    * **Unresolvable candidates are loud, not dropped.** The confirm
    * joins are LEFT joins: a candidate whose doc is missing from the
    * corpus snapshot (archive sink lagging the confirm read, or a
    * corpus/stream id mismatch) emits with the sentinel `jac = -1.0`
    * instead of vanishing — the "archive is always ahead" assumption is
    * deployment-dependent, and an inner join silently converted its
    * violation into missed duplicates. Route `jac < 0` rows to an alert
    * sink; [[distinctPairs]] (the batch-parity frame) filters them. */
  def nearDups(docs: DataFrame, corpus: DataFrame,
      tau: Double = 0.8): Dataset[NearDupHit] = {
    val spark = docs.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, lit, when}
    val hsh = corpusShingleSets(corpus)
    val h1 = hsh.toDF("doc_id", "hsh1")
    val h2 = hsh.toDF("doc_id", "hsh2")
    candidates(docs).toDF()
      .join(h1, col("id1") === h1("doc_id"), "left").drop("doc_id")
      .join(h2, col("id2") === h2("doc_id"), "left").drop("doc_id")
      .withColumn("jac",
        when(col("hsh1").isNull || col("hsh2").isNull, lit(-1.0)).otherwise(
          graft.plans.VectorExpressions.sortedJaccard(col("hsh1"), col("hsh2"))))
      .filter(col("jac") >= tau || col("jac") < 0.0)
      .select(col("id1"), col("id2"), col("jac"), col("band_idx"))
      .as[NearDupHit]
  }

  /** The confirmed pairs as one row per pair — the frame to compare
    * against batch `dedup_minhash_lsh`. Already distinct by the
    * smallest-shared-band election (the earlier per-band-lane form
    * needed a chained streaming `dropDuplicates` here — unbounded
    * exactly-once state this topology simply doesn't have). Filters the
    * `jac = -1` unresolved-candidate sentinels — parity is over
    * CONFIRMED pairs. */
  def distinctPairs(docs: DataFrame, corpus: DataFrame,
      tau: Double = 0.8): DataFrame =
    nearDups(docs, corpus, tau).toDF()
      .filter(org.apache.spark.sql.functions.col("jac") >= tau)
      .drop("band_idx")

  /** A confirmed hit stamped with the arriving doc's event time (the later
    * doc of the pair — the one whose arrival completed it). */
  final case class TimedNearDupHit(id1: Long, id2: Long, jac: Double,
      band_idx: Int, ts: java.sql.Timestamp)

  /** An LSH candidate pair (bucket-mates in ≥1 band, elected exactly once
    * on the smallest shared band), stamped with the later doc's ts. */
  final case class CandidatePair(id1: Long, id2: Long, band_idx: Int,
      ts: java.sql.Timestamp)

  /** RETENTION-BOUNDED candidate stage of the near-dup gate — the part
    * that holds state, sized so that a stored document costs a FIXED
    * ~200 B per band bucket regardless of document length.
    *
    * The earlier form of this gate kept each doc's full hashed shingle
    * set (O(tokens) longs) in EVERY one of its 16 band buckets so it
    * could exact-confirm in-op — a ~16× corpus-text memory multiplier at
    * ingest scale. This stage stores only `(doc_id, band signatures
    * BELOW the group's band, ts)` per member in the packed
    * [[PackedTimedBandMembers]] layout: band keys collapse to xxhash64
    * signatures, which is all the smallest-shared-band election needs
    * (equality, not content), and only the prefix is ever read. Shuffle
    * rows shrink identically — no shingle set and no key strings ride
    * the exchange. Exact Jaccard confirm moves DOWNSTREAM to a stateless
    * stream-static join against the corpus/archive ([[nearDupsBounded]])
    * — the same topology as the batch operator (band join → candidates →
    * exact confirm join), so moving it off the state store costs nothing
    * semantically.
    *
    * Signature collisions: grouping on a colliding bucket signature can
    * only ADD spurious candidates (killed by the exact confirm); electing
    * on a colliding lower band can only happen if two docs' DIFFERENT
    * band keys hash equal (~2^-64 per band pair) — accepted odds, same
    * class as the repo-wide 64-bit content-hash identities.
    *
    * `docs`: streaming (doc_id, text, ts). The watermark is declared on
    * the flatMap OUTPUT (typed flatMaps mint fresh attributes without the
    * event-time tag — the repo's documented watermark-stripping pitfall).
    *
    * Bounds: members older than the watermark are evicted before pairing;
    * an event-time timeout at (newest member + 1 ms) sweeps idle buckets,
    * so state death does not require new traffic. */
  /** [[PackedBandMembers]] plus each member's event-time millis (for
    * retention eviction). */
  final case class PackedTimedBandMembers(ids: Array[Long], pre: Array[Long],
      tsMs: Array[Long])

  def candidatesBounded(docs: DataFrame,
      retention: String): Dataset[CandidatePair] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bands = docs
      .select("doc_id", "text", "ts")
      .as[(Long, String, java.sql.Timestamp)]
      .flatMap { case (id, text, ts) =>
        val sigs = bandSigs(text)
        sigs.iterator.zipWithIndex
          .map { case (sig, bIdx) => (bIdx, sig, id, sigs.take(bIdx).toSeq, ts) }
      }
      .toDF("band_idx", "band_sig", "doc_id", "band_sigs", "ts")
      .withWatermark("ts", retention)
      .as[(Int, Long, Long, Seq[Long], java.sql.Timestamp)]
    bands
      .groupByKey { case (bIdx, sig, _, _, _) => (bIdx, sig) }
      .flatMapGroupsWithState[PackedTimedBandMembers, CandidatePair](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case ((bIdx, _), rows, state) =>
          val wmMs = state.getCurrentWatermarkMs()
          val st0 = state.getOption.getOrElse(
            PackedTimedBandMembers(Array.emptyLongArray, Array.emptyLongArray,
              Array.emptyLongArray))
          // retention eviction first: expired members are not candidates
          // (arrays rebuilt only when something actually expired)
          val st =
            if (!st0.tsMs.exists(_ < wmMs)) st0
            else {
              val keep = st0.tsMs.indices.filter(st0.tsMs(_) >= wmMs)
              PackedTimedBandMembers(
                keep.map(st0.ids(_)).toArray,
                keep.iterator.flatMap(j =>
                  (0 until bIdx).iterator.map(i => st0.pre(j * bIdx + i))).toArray,
                keep.map(st0.tsMs(_)).toArray)
            }
          val evicted = st ne st0
          val newIds = scala.collection.mutable.ArrayBuffer.empty[Long]
          val newPre = scala.collection.mutable.ArrayBuffer.empty[Long]
          val newTs = scala.collection.mutable.ArrayBuffer.empty[Long]
          val out = scala.collection.mutable.ArrayBuffer.empty[CandidatePair]
          // doc_id order makes within-batch pairing deterministic and
          // independent of micro-batch chunking. Exactly-once lane
          // election: a pair reports on the smallest band the two docs
          // share — elected HERE iff no band below bIdx already shares.
          rows.toSeq.sortBy(_._3).foreach { case (_, _, id, pSeq, ts) =>
            if (!st.ids.contains(id) && !newIds.contains(id)) {
              val p = pSeq.toArray // unbox once; the loops below stay primitive
              var j = 0
              while (j < st.ids.length) {
                if (!sharesBelow(p, st.pre, j, bIdx))
                  out += CandidatePair(math.min(id, st.ids(j)),
                    math.max(id, st.ids(j)), bIdx, ts)
                j += 1
              }
              var k = 0
              while (k < newIds.length) {
                if (!sharesBelowBuf(p, newPre, k, bIdx))
                  out += CandidatePair(math.min(id, newIds(k)),
                    math.max(id, newIds(k)), bIdx, ts)
                k += 1
              }
              newIds += id
              newPre ++= p
              newTs += ts.getTime
            }
          }
          val ids = st.ids ++ newIds
          if (ids.isEmpty) state.remove()
          else {
            if (newIds.nonEmpty || evicted)
              state.update(PackedTimedBandMembers(ids, st.pre ++ newPre,
                st.tsMs ++ newTs))
            // fire once the watermark passes the newest member: every
            // member is then expired and the bucket removes itself
            val newest = (st.tsMs.iterator ++ newTs.iterator).max
            if (newest + 1L > wmMs) state.setTimeoutTimestamp(newest + 1L)
          }
          out.iterator
      }
  }

  /** Static (doc_id, hsh) sorted shingle-hash sets for the confirm join —
    * the same kernel the candidate stage minhashes, so both sides agree
    * byte-for-byte. `corpus` is the batch-side document store the stream
    * is feeding (the archive table in production).
    *
    * The frame is consumed TWICE per micro-batch (h1/h2 aliases), and a
    * typed-map subtree never canonicalizes equal (fresh closures), so an
    * uncached version re-shingled the full corpus twice every batch. Two
    * escapes, in preference order:
    *  - a corpus that ALREADY carries an `hsh` column (the materialized
    *    shingled-archive table — shingle once at archive-write time, the
    *    production shape) is used as-is, no typed map at all;
    *  - otherwise the shingled frame is `.cache()`d — the first batch
    *    pays one shingle pass and later batches reuse the blocks. The
    *    cache pins the corpus SNAPSHOT; for an archive growing under the
    *    stream, pass the pre-shingled table instead (the [[nearDups]]
    *    sentinel rows make a stale snapshot loud, not silent). */
  private def corpusShingleSets(corpus: DataFrame): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    if (corpus.columns.contains("hsh")) corpus.select("doc_id", "hsh")
    else corpus.select("doc_id", "text").as[(Long, String)]
      .map { case (id, text) => (id, Dedup.hashedShingleSet(text).toSeq) }
      .toDF("doc_id", "hsh")
      .cache()
  }

  /** RETENTION-BOUNDED near-dup gate — candidate state bounded by the
    * retention horizon AND independent of document length
    * ([[candidatesBounded]]), exact-confirmed against the document store
    * via two STATELESS stream-static joins + the codegen'd
    * [[graft.plans.SortedJaccard]] kernel. Append-mode output, one row
    * per confirmed pair (the smallest-shared-band election already makes
    * candidates exactly-once, so no dedup state exists downstream —
    * chained stateful ops would trip Spark's global-watermark check).
    *
    * `corpus`: static (doc_id, text) resolving every doc the stream has
    * admitted within retention — in production the archive the stream
    * itself writes; candidates emitted in micro-batch N reference docs
    * ingested ≤ N, so an archive sink updated per batch is always ahead
    * of the confirm read. */
  def nearDupsBounded(docs: DataFrame, corpus: DataFrame, retention: String,
      tau: Double = 0.8): Dataset[TimedNearDupHit] = {
    val spark = docs.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val hsh = corpusShingleSets(corpus)
    val h1 = hsh.toDF("doc_id", "hsh1")
    val h2 = hsh.toDF("doc_id", "hsh2")
    candidatesBounded(docs, retention).toDF()
      .join(h1, col("id1") === h1("doc_id")).drop("doc_id")
      .join(h2, col("id2") === h2("doc_id")).drop("doc_id")
      .withColumn("jac",
        graft.plans.VectorExpressions.sortedJaccard(col("hsh1"), col("hsh2")))
      .filter(col("jac") >= tau)
      .select(col("id1"), col("id2"), col("jac"), col("band_idx"), col("ts"))
      .as[TimedNearDupHit]
  }

  /** [[nearDupsBounded]] as one row per confirmed pair — already distinct
    * by the smallest-shared-band election; no dedup state needed. */
  def distinctPairsBounded(docs: DataFrame, corpus: DataFrame,
      retention: String, tau: Double = 0.8): DataFrame =
    nearDupsBounded(docs, corpus, retention, tau).toDF().drop("band_idx")
}
