package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** STREAMING perceptual IMAGE near-dup gate — the image analog of
  * [[StreamDedup]] (text MinHash-LSH) and [[StreamEmbDedup]] (embedding
  * hyperplane-LSH), completing the modality set of ingest-time dedup
  * valves: payloads arrive on a stream, each is perceptually hashed
  * through the REAL decode path ([[graft.operators.Multimodal.phash64]]
  * — PNG CRC-verified chunks, zlib inflate, filter reconstruction, then
  * the 8×8 integer average-hash, byte-identical to batch `mm_phash`),
  * and every newcomer is checked against the corpus seen so far through
  * 4×16-bit band-bucket state, emitting Hamming ≤ 3 pairs exactly once.
  *
  * Topology (the round-9/15 lean-state shape shared with the sibling
  * gates): a typed flatMap hashes each payload and emits its 4
  * (band_idx, band_val) rows; `flatMapGroupsWithState` keyed on the
  * band bucket stores packed primitive arrays of (doc_id, band values
  * BELOW the group's band, hash halves) and elects each bucket-mate
  * pair once on the smallest shared band. Unlike the text/vector gates,
  * the exact confirm runs IN-OP: the full content a Hamming confirm
  * needs is the 16-byte hash already in state — storing it IS the lean
  * choice (the text gate moved its confirm downstream because shingle
  * sets are O(tokens); here a downstream join would cost more than the
  * 16 B it saves). ~(24 + 4·bIdx) B per member, payload-size
  * independent.
  *
  * Recall contract: Hamming ≤ 3 with 4 bands is EXACT by pigeonhole —
  * 3 flipped bits cannot touch all 4 bands, so every qualifying pair is
  * bucket-mates in its smallest shared band and is checked there. The
  * spec proves stream/batch parity: streamed over the test corpus in
  * arbitrary chunking, [[distinctPairs]] equals batch `mm_phash` rows
  * exactly, including a pair split across micro-batches.
  *
  * Scale: bucket populations are perceptual-cluster populations, not
  * corpus populations — but stop-frame corpora make them
  * duplication-sized (sf10: 22 buckets carried 72% of all candidate
  * rows), so all three lanes take the newest-N ring bound via
  * `spark.graft.phashGateBucketCap` (round 18 — the
  * `embGateBucketCap` treatment, same recall trade, spec-pinned).
  * Retention bounding composes exactly as in
  * [[StreamDedup.candidatesBounded]] when the duplicate horizon is
  * bounded. */
object StreamPhashDedup {

  /** A confirmed perceptual near-dup (Hamming ≤ maxHamming), elected
    * exactly once on the smallest shared band. */
  final case class PhashHit(id1: Long, id2: Long, hamming: Long, band_idx: Int)

  /** Packed band-member state ([[StreamDedup.PackedBandMembers]] plus
    * the 16-byte hash the in-op Hamming confirm reads): `ids(j)` is
    * member j's doc_id, `pre(j*b .. j*b+b-1)` its band values at bands
    * 0..b-1 (all the smallest-shared-band election reads), `hi(j)`/
    * `lo(j)` its hash halves. */
  final case class PackedPhashMembers(ids: Array[Long], pre: Array[Int],
      hi: Array[Long], lo: Array[Long])

  private def bandsOf(hi: Long, lo: Long): Array[Int] = Array(
    (lo & 0xFFFFL).toInt, ((lo >>> 16) & 0xFFFFL).toInt,
    (hi & 0xFFFFL).toInt, ((hi >>> 16) & 0xFFFFL).toInt)

  private def sharesBelow(p: Array[Int], pre: Array[Int], j: Int, b: Int): Boolean = {
    var i = 0
    val base = j * b
    while (i < b) {
      if (p(i) == pre(base + i)) return true
      i += 1
    }
    false
  }

  private def sharesBelowBuf(p: Array[Int],
      pre: scala.collection.mutable.ArrayBuffer[Int], k: Int, b: Int): Boolean = {
    var i = 0
    val base = k * b
    while (i < b) {
      if (p(i) == pre(base + i)) return true
      i += 1
    }
    false
  }

  /** Confirmed Hamming ≤ `maxHamming` pairs from a streaming
    * (doc_id, text) frame, each pair emitted exactly once (when its
    * later payload arrives). `maxHamming` above 3 voids the pigeonhole
    * recall guarantee (4 bands only cover ≤ 3 flips) — kept a parameter
    * for recall-tolerant deployments, defaulted to the exact point. */
  def hits(docs: DataFrame, maxHamming: Int = 3): Dataset[PhashHit] =
    hitsWith(docs, graft.operators.Multimodal.phash64, maxHamming)

  /** The AUDIO lane: same gate over [[graft.operators.Multimodal
    * .audioFp64]] (the energy-envelope fingerprint through the real WAV
    * decode path) — batch parity target is `mm_audio_phash`. */
  def audioHits(docs: DataFrame, maxHamming: Int = 3): Dataset[PhashHit] =
    hitsWith(docs, graft.operators.Multimodal.audioFp64, maxHamming)

  /** Shared gate machinery: any 64-bit perceptual hash rides the same
    * 4×16-bit band-bucket state and smallest-shared-band election.
    *
    * BUCKET CAP (round 18, r17 verdict #2): perceptual band buckets go
    * duplication-sized on stop-frame corpora (sf10 measured band df 3291
    * with 22 buckets carrying 72% of all candidate rows), so
    * [[graft.Conf.PhashGateBucketCapConf]] > 0 bounds every (band_idx,
    * band_val) group to a newest-N ring — the [[StreamEmbDedup]] cap
    * ported verbatim. Election stays signature-based (the newcomer's
    * band prefix vs the member's stored prefix), so a capped gate never
    * DUPLICATES a pair; it misses one iff the earlier image rotated out
    * of the smallest-shared-band ring before the later arrived. Under
    * the cap, redelivery idempotence narrows to the ring window — feed
    * exactly-once is the boundary, as in the emb gate. Default 0 keeps
    * the exact pigeonhole contract. */
  private def hitsWith(docs: DataFrame, hashFn: String => Option[(Long, Long)],
      maxHamming: Int): Dataset[PhashHit] = {
    val spark = docs.sparkSession
    import spark.implicits._
    // read ONCE at stream build; the closure captures the value
    val bucketCap = graft.Conf.int(spark, graft.Conf.PhashGateBucketCapConf, 0)
    docs
      .select("doc_id", "text")
      .as[(Long, String)]
      .flatMap { case (id, text) =>
        hashFn(text).iterator.flatMap { case (hi, lo) =>
          val bands = bandsOf(hi, lo)
          bands.iterator.zipWithIndex.map { case (bv, bIdx) =>
            (bIdx, bv, id, bands.take(bIdx), hi, lo)
          }
        }
      }
      .groupByKey { case (bIdx, bv, _, _, _, _) => (bIdx, bv) }
      .flatMapGroupsWithState[PackedPhashMembers, PhashHit](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case ((bIdx, _), rows, state) =>
          val st = state.getOption.getOrElse(PackedPhashMembers(
            Array.emptyLongArray, Array.emptyIntArray,
            Array.emptyLongArray, Array.emptyLongArray))
          val out = scala.collection.mutable.ArrayBuffer.empty[PhashHit]
          // doc_id order: deterministic pairing independent of chunking
          val rs = rows.toSeq.sortBy(_._3)
          // Ring mechanics ONLY when this batch could overflow the cap:
          // a ring that never evicts is state-identical to plain append,
          // and the append path skips the per-bucket unpack/repack that
          // made a blanket ring path SLOWER than uncapped on the sf10
          // drive (56 vs 28 s — most buckets are far under cap; only the
          // stop-frame hot buckets should pay ring costs). rs.length
          // over-counts distinct newcomers, which only errs toward the
          // (correct) ring path.
          if (bucketCap > 0 && st.ids.length + rs.length > bucketCap) {
            // RING path: every loop is cap-bounded, so buffer boxing is
            // fine (the unbounded path keeps primitive arrays because
            // nothing bounds it) — the StreamEmbDedup.candidates shape.
            val ids = scala.collection.mutable.ArrayBuffer.empty[Long]
            val pre = scala.collection.mutable.ArrayBuffer.empty[Int]
            val his = scala.collection.mutable.ArrayBuffer.empty[Long]
            val los = scala.collection.mutable.ArrayBuffer.empty[Long]
            ids ++= st.ids; pre ++= st.pre; his ++= st.hi; los ++= st.lo
            var changed = false
            // truncate an OVERSIZED restored ring BEFORE pairing (the r16
            // emb-gate rescue: flip the cap on a stuck drive, restart from
            // its uncapped checkpoint — the FIRST batch must already be
            // cap-bounded)
            if (ids.length > bucketCap) {
              val drop = ids.length - bucketCap
              ids.remove(0, drop); his.remove(0, drop); los.remove(0, drop)
              if (bIdx > 0) pre.remove(0, drop * bIdx)
              changed = true
            }
            rs.foreach { case (_, _, id, p, hi, lo) =>
              if (!ids.contains(id)) {
                var j = 0
                while (j < ids.length) {
                  if (!sharesBelowBuf(p, pre, j, bIdx)) {
                    val d = java.lang.Long.bitCount(hi ^ his(j)) +
                      java.lang.Long.bitCount(lo ^ los(j))
                    if (d <= maxHamming)
                      out += PhashHit(math.min(id, ids(j)),
                        math.max(id, ids(j)), d.toLong, bIdx)
                  }
                  j += 1
                }
                ids += id; pre ++= p; his += hi; los += lo
                while (ids.length > bucketCap) { // evict oldest members
                  ids.remove(0); his.remove(0); los.remove(0)
                  if (bIdx > 0) pre.remove(0, bIdx)
                }
                changed = true
              }
            }
            if (changed) state.update(PackedPhashMembers(
              ids.toArray, pre.toArray, his.toArray, los.toArray))
          } else {
            val newIds = scala.collection.mutable.ArrayBuffer.empty[Long]
            val newPre = scala.collection.mutable.ArrayBuffer.empty[Int]
            val newHi = scala.collection.mutable.ArrayBuffer.empty[Long]
            val newLo = scala.collection.mutable.ArrayBuffer.empty[Long]
            rs.foreach { case (_, _, id, p, hi, lo) =>
              if (!st.ids.contains(id) && !newIds.contains(id)) {
                var j = 0
                while (j < st.ids.length) {
                  if (!sharesBelow(p, st.pre, j, bIdx)) {
                    val d = java.lang.Long.bitCount(hi ^ st.hi(j)) +
                      java.lang.Long.bitCount(lo ^ st.lo(j))
                    if (d <= maxHamming)
                      out += PhashHit(math.min(id, st.ids(j)),
                        math.max(id, st.ids(j)), d.toLong, bIdx)
                  }
                  j += 1
                }
                var k = 0
                while (k < newIds.length) {
                  if (!sharesBelowBuf(p, newPre, k, bIdx)) {
                    val d = java.lang.Long.bitCount(hi ^ newHi(k)) +
                      java.lang.Long.bitCount(lo ^ newLo(k))
                    if (d <= maxHamming)
                      out += PhashHit(math.min(id, newIds(k)),
                        math.max(id, newIds(k)), d.toLong, bIdx)
                  }
                  k += 1
                }
                newIds += id
                newPre ++= p
                newHi += hi
                newLo += lo
              }
            }
            if (newIds.nonEmpty)
              state.update(PackedPhashMembers(st.ids ++ newIds,
                st.pre ++ newPre, st.hi ++ newHi, st.lo ++ newLo))
          }
          out.iterator
      }
  }

  /** One row per confirmed pair — already distinct by the
    * smallest-shared-band election; the frame to compare against batch
    * `mm_phash`. */
  def distinctPairs(docs: DataFrame, maxHamming: Int = 3): DataFrame =
    hits(docs, maxHamming).toDF().drop("band_idx")

  /** Audio-lane twin of [[distinctPairs]] — compares against batch
    * `mm_audio_phash`. */
  def distinctAudioPairs(docs: DataFrame, maxHamming: Int = 3): DataFrame =
    audioHits(docs, maxHamming).toDF().drop("band_idx")

  /** A confirmed streaming video near-dup: shared distinct frame hashes
    * cover ≥ half the shorter video's hashes (floor 2) — batch parity
    * target is `mm_video_phash` (unwindowed). */
  final case class VideoHit(id1: Long, id2: Long, n_shared: Long,
      containment_pct: Long)

  /** Per-frame-hash bucket state for the VIDEO lane: member doc_ids plus
    * their FULL sorted hash sets, flattened ([[offs]](j) is the end
    * offset of member j's hashes in [[hsFlat]]). Sets are ≤ frame-count
    * longs, so storing them IS the lean choice — the containment confirm
    * needs the whole set, and it is payload-size independent
    * (~8+4+8·frames B per member). */
  final case class PackedVideoMembers(ids: Array[Long], offs: Array[Int],
      hsFlat: Array[Long])

  /** Smallest shared packed hash of two SORTED sets, or None — the
    * election key of the video lane (emit a pair only in the bucket of
    * its smallest shared hash → exactly one emission). */
  private def minShared(a: Array[Long], bFlat: Array[Long], bFrom: Int,
      bTo: Int): Option[Long] = {
    var i = 0
    var j = bFrom
    while (i < a.length && j < bTo) {
      if (a(i) == bFlat(j)) return Some(a(i))
      else if (a(i) < bFlat(j)) i += 1
      else j += 1
    }
    None
  }

  private def intersectCount(a: Array[Long], bFlat: Array[Long], bFrom: Int,
      bTo: Int): Int = {
    var i = 0
    var j = bFrom
    var n = 0
    while (i < a.length && j < bTo) {
      if (a(i) == bFlat(j)) { n += 1; i += 1; j += 1 }
      else if (a(i) < bFlat(j)) i += 1
      else j += 1
    }
    n
  }

  /** STREAMING video near-dup gate — the fifth ingest-gate modality
    * (text / embedding / image / audio / VIDEO): payloads decode through
    * the real AVI path ([[graft.operators.Multimodal.videoFrameHashes]],
    * byte-identical to batch `mm_video_phash`), every newcomer meets the
    * corpus so far inside its frame-hash buckets, and the containment
    * confirm runs IN-OP on the full hash sets both sides already carry —
    * n_shared is EXACT. A pair is elected exactly once: only the bucket
    * of the pair's SMALLEST shared hash emits it (both hash sets are
    * known at confirm time, so the smallest shared hash is computable
    * wherever the pair meets).
    *
    * BUCKET CAP (round 18, r17 verdict #2): stop-frame buckets (black
    * frames, title cards) carried 72% of 1.73e9 candidate rows at sf10
    * — [[graft.Conf.PhashGateBucketCapConf]] > 0 bounds every
    * frame-hash bucket to its newest N members. The election key is the
    * smallest shared hash over the FULL sets, so a capped gate never
    * double-emits: if the earlier video rotated out of the electing
    * bucket's ring, a higher shared bucket still fails the
    * `minShared == h` check — the pair is purely missed, the same
    * recall trade as the emb/image rings. Default 0 keeps exact. */
  def videoHits(docs: DataFrame): Dataset[VideoHit] = {
    val spark = docs.sparkSession
    import spark.implicits._
    // read ONCE at stream build; the closure captures the value
    val bucketCap = graft.Conf.int(spark, graft.Conf.PhashGateBucketCapConf, 0)
    docs
      .select("doc_id", "text")
      .as[(Long, String)]
      .flatMap { case (id, text) =>
        val hs = graft.operators.Multimodal.videoFrameHashes(text)
        hs.iterator.map(h => (h, id, hs))
      }
      .groupByKey(_._1)
      .flatMapGroupsWithState[PackedVideoMembers, VideoHit](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (h, rows, state) =>
          val st = state.getOption.getOrElse(PackedVideoMembers(
            Array.emptyLongArray, Array.emptyIntArray, Array.emptyLongArray))
          val out = scala.collection.mutable.ArrayBuffer.empty[VideoHit]
          def confirmInto(id: Long, hs: Array[Long], mid: Long,
              mFlat: Array[Long], mFrom: Int, mTo: Int): Unit = {
            val shared = intersectCount(hs, mFlat, mFrom, mTo)
            val mn = math.min(hs.length, mTo - mFrom)
            if (shared >= 2 && 2 * shared >= mn &&
                minShared(hs, mFlat, mFrom, mTo).contains(h))
              out += VideoHit(math.min(id, mid), math.max(id, mid),
                shared.toLong, (100L * shared) / mn)
          }
          // vec order: deterministic pairing independent of chunking
          val rs = rows.toSeq.sortBy(_._2)
          // ring mechanics only when the batch could overflow the cap —
          // see hitsWith: a never-evicting ring equals plain append, and
          // the unpack/repack of full hash sets per touched bucket is
          // exactly what must stay confined to the hot buckets
          if (bucketCap > 0 && st.ids.length + rs.length > bucketCap) {
            // RING path: ≤ cap members per bucket; buffers hold each
            // member's set unflattened (cap-bounded boxing, the
            // StreamEmbDedup ring shape); repacked on update.
            val ids = scala.collection.mutable.ArrayBuffer.empty[Long]
            val sets = scala.collection.mutable.ArrayBuffer.empty[Array[Long]]
            var j0 = 0
            while (j0 < st.ids.length) {
              val from = if (j0 == 0) 0 else st.offs(j0 - 1)
              ids += st.ids(j0)
              sets += java.util.Arrays.copyOfRange(st.hsFlat, from, st.offs(j0))
              j0 += 1
            }
            var changed = false
            // truncate an OVERSIZED restored ring BEFORE pairing
            if (ids.length > bucketCap) {
              val drop = ids.length - bucketCap
              ids.remove(0, drop); sets.remove(0, drop)
              changed = true
            }
            rs.foreach { case (_, id, hs) =>
              if (!ids.contains(id)) {
                var j = 0
                while (j < ids.length) {
                  confirmInto(id, hs, ids(j), sets(j), 0, sets(j).length)
                  j += 1
                }
                ids += id
                sets += hs
                while (ids.length > bucketCap) { // evict oldest members
                  ids.remove(0); sets.remove(0)
                }
                changed = true
              }
            }
            if (changed) {
              var off = 0
              val offs = sets.map { s => off += s.length; off }.toArray
              state.update(PackedVideoMembers(
                ids.toArray, offs, sets.toArray.flatten))
            }
          } else {
            val newIds = scala.collection.mutable.ArrayBuffer.empty[Long]
            val newSets = scala.collection.mutable.ArrayBuffer.empty[Array[Long]]
            rs.foreach { case (_, id, hs) =>
              if (!st.ids.contains(id) && !newIds.contains(id)) {
                var j = 0
                while (j < st.ids.length) {
                  val from = if (j == 0) 0 else st.offs(j - 1)
                  confirmInto(id, hs, st.ids(j), st.hsFlat, from, st.offs(j))
                  j += 1
                }
                var k = 0
                while (k < newIds.length) {
                  confirmInto(id, hs, newIds(k), newSets(k), 0, newSets(k).length)
                  k += 1
                }
                newIds += id
                newSets += hs
              }
            }
            if (newIds.nonEmpty) {
              val flat = st.hsFlat ++ newSets.flatten
              var off = if (st.offs.isEmpty) 0 else st.offs.last
              val offs = st.offs ++ newSets.map { s => off += s.length; off }
              state.update(PackedVideoMembers(st.ids ++ newIds.toArray, offs, flat))
            }
          }
          out.iterator
      }
  }

  /** One row per confirmed video pair — the frame to compare against
    * batch `mm_video_phash` (unwindowed). */
  def distinctVideoPairs(docs: DataFrame): DataFrame = videoHits(docs).toDF()
}
