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
  * Topology: one typed flatMap shingles + minhashes each doc (JVM-side
  * [[Dedup.hashedShingleSet]]/[[Dedup.minhashBandKeys]] — byte-identical
  * to the batch column pipeline) and emits its 16 (band_idx, band_key)
  * rows; `flatMapGroupsWithState` keyed on the band bucket holds the
  * (doc_id, shingle-hash set) list of prior bucket members, confirms
  * each newcomer against them with the exact sorted-merge jaccard, and
  * appends the newcomer to state. A pair sharing several bands is
  * emitted once per SHARING BAND — `distinctPairs` collapses the lanes.
  *
  * State bounds: a bucket holds only docs agreeing on 4 of 64 minhash
  * rows — near-dup cluster populations, not corpus populations (the
  * batch op's band equi-join reads the same distribution). Per-bucket
  * work for a newcomer is O(bucket × set-merge), the exact cost the
  * batch confirm pays per candidate pair. At 100 TB the state store
  * backend (RocksDB) pages buckets off-heap; eviction policy (e.g. TTL
  * on stale buckets) composes via GroupStateTimeout when retention is
  * bounded.
  *
  * Spec contract: streamed over the test corpus in arbitrary chunking,
  * `distinctPairs` equals the batch `dedup_minhash_lsh` rows exactly
  * (same bands, same hashes, same τ — StreamingSpec drives a dup pair
  * SPLIT ACROSS batches to prove the cross-batch state path). */
object StreamDedup {

  /** One confirmed near-dup hit, reported on the band lane that found it. */
  final case class NearDupHit(id1: Long, id2: Long, jac: Double, band_idx: Int)

  /** Confirmed jaccard ≥ τ pairs from a streaming (doc_id, text) frame.
    * Append-mode output: each (pair, band) lane fires exactly once, when
    * the later doc of the pair arrives. */
  def nearDups(docs: DataFrame, tau: Double = 0.8): Dataset[NearDupHit] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bands = docs
      .select("doc_id", "text")
      .as[(Long, String)]
      .flatMap { case (id, text) =>
        val hs = Dedup.hashedShingleSet(text)
        if (hs.isEmpty) Iterator.empty
        else Dedup.minhashBandKeys(hs).iterator.zipWithIndex
          .map { case (key, bIdx) => (bIdx, key, id, hs.toSeq) }
      }
    bands
      .groupByKey { case (bIdx, key, _, _) => (bIdx, key) }
      .flatMapGroupsWithState[List[(Long, Seq[Long])], NearDupHit](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case ((bIdx, _), rows, state) =>
          var seen = state.getOption.getOrElse(List.empty[(Long, Seq[Long])])
          val out = scala.collection.mutable.ArrayBuffer.empty[NearDupHit]
          // doc_id order makes within-batch pairing deterministic and
          // independent of micro-batch chunking: a batch's docs join the
          // bucket one at a time, each confirmed against ALL earlier
          // members (previous batches AND earlier rows of this batch).
          rows.toSeq.sortBy(_._3).foreach { case (_, _, id, hs) =>
            if (!seen.exists(_._1 == id)) {
              seen.foreach { case (oid, ohs) =>
                val jac = Dedup.sortedJaccardLocal(hs, ohs)
                if (jac >= tau)
                  out += NearDupHit(math.min(id, oid), math.max(id, oid), jac, bIdx)
              }
              seen = (id, hs) :: seen
            }
          }
          state.update(seen)
          out.iterator
      }
  }

  /** The band lanes collapsed to one row per confirmed pair — the frame
    * to compare against batch `dedup_minhash_lsh`. (Streaming
    * `dropDuplicates` state on (id1, id2) is unbounded like every
    * exactly-once dedup; [[distinctPairsBounded]] is the retention-bounded
    * form.) */
  def distinctPairs(docs: DataFrame, tau: Double = 0.8): DataFrame =
    nearDups(docs, tau).toDF().drop("band_idx").dropDuplicates("id1", "id2")

  /** A confirmed hit stamped with the arriving doc's event time (the later
    * doc of the pair — the one whose arrival completed it). */
  final case class TimedNearDupHit(id1: Long, id2: Long, jac: Double,
      band_idx: Int, ts: java.sql.Timestamp)

  /** RETENTION-BOUNDED near-dup gate — the form whose state cannot grow
    * past the retention horizon, for deployments where "duplicate" means
    * "duplicate of something seen in the last N days" (the usual contract
    * once a corpus is snapshotted + deduped in batch and the stream only
    * guards the incremental frontier).
    *
    * `docs`: streaming (doc_id, text, ts). The watermark is declared HERE,
    * on the shingle flatMap's OUTPUT — a typed flatMap mints fresh
    * attributes without the event-time tag (the repo's documented
    * watermark-stripping pitfall), so tagging the upstream frame would
    * leave the stateful op without a watermark. Tagging the band rows
    * (16/doc, same ts) yields the identical watermark value.
    *
    * Bounds, vs the unbounded [[nearDups]]:
    *   - bucket members with ts older than the current watermark are
    *     evicted BEFORE pairing — a newcomer only matches partners still
    *     inside retention;
    *   - an event-time timeout at (newest member + 1ms) sweeps buckets
    *     that go idle, so state death does not require new traffic;
    *   - lane collapse is ALGEBRAIC, not stateful: at confirm time both
    *     docs' full band-key vectors are known (the member's rides in
    *     state), so the pair is emitted only on the SMALLEST shared band
    *     — exactly-once per pair with no downstream dedup operator. (A
    *     chained `dropDuplicatesWithinWatermark` would trip Spark's
    *     global-watermark correctness check for stateful-after-stateful
    *     plans; this form needs no such state at all.)
    */
  def nearDupsBounded(docs: DataFrame, retention: String,
      tau: Double = 0.8): Dataset[TimedNearDupHit] = {
    val spark = docs.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val bands = docs
      .select("doc_id", "text", "ts")
      .as[(Long, String, java.sql.Timestamp)]
      .flatMap { case (id, text, ts) =>
        val hs = Dedup.hashedShingleSet(text)
        if (hs.isEmpty) Iterator.empty
        else {
          val keys = Dedup.minhashBandKeys(hs)
          keys.iterator.zipWithIndex
            .map { case (key, bIdx) => (bIdx, key, id, hs.toSeq, keys, ts) }
        }
      }
      .toDF("band_idx", "band_key", "doc_id", "shingles", "band_keys", "ts")
      .withWatermark("ts", retention)
      .as[(Int, String, Long, Seq[Long], Seq[String], java.sql.Timestamp)]
    bands
      .groupByKey { case (bIdx, key, _, _, _, _) => (bIdx, key) }
      .flatMapGroupsWithState[List[(Long, Seq[Long], Seq[String], Long)], TimedNearDupHit](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case ((bIdx, _), rows, state) =>
          val wmMs = state.getCurrentWatermarkMs()
          // retention eviction first: expired members are not candidates
          var seen = state.getOption
            .getOrElse(List.empty[(Long, Seq[Long], Seq[String], Long)])
            .filter(_._4 >= wmMs)
          val out = scala.collection.mutable.ArrayBuffer.empty[TimedNearDupHit]
          rows.toSeq.sortBy(_._3).foreach { case (_, _, id, hs, keys, ts) =>
            if (!seen.exists(_._1 == id)) {
              seen.foreach { case (oid, ohs, okeys, _) =>
                // exactly-once lane election: only the smallest band the
                // two docs share reports the pair (they share THIS band,
                // so the index always exists and is ≤ bIdx)
                val firstShared = keys.iterator.zip(okeys.iterator)
                  .indexWhere { case (a, b) => a == b }
                if (firstShared == bIdx) {
                  val jac = Dedup.sortedJaccardLocal(hs, ohs)
                  if (jac >= tau)
                    out += TimedNearDupHit(
                      math.min(id, oid), math.max(id, oid), jac, bIdx, ts)
                }
              }
              seen = (id, hs, keys, ts.getTime) :: seen
            }
          }
          if (seen.isEmpty) state.remove()
          else {
            state.update(seen)
            // fire once the watermark passes the newest member: every
            // member is then expired and the bucket removes itself
            val newest = seen.map(_._4).max
            if (newest + 1L > wmMs) state.setTimeoutTimestamp(newest + 1L)
          }
          out.iterator
      }
  }

  /** [[nearDupsBounded]] as one row per confirmed pair — already distinct
    * by the smallest-shared-band election; no dedup state needed. */
  def distinctPairsBounded(docs: DataFrame, retention: String,
      tau: Double = 0.8): DataFrame =
    nearDupsBounded(docs, retention, tau).toDF().drop("band_idx")
}
