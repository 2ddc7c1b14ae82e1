package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions.{broadcast, col, round, sqrt}
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** STREAMING EMBEDDING near-dup gate — the vector analog of
  * [[StreamDedup]]: documents' embeddings arrive on a stream and every
  * newcomer is checked against the corpus seen so far through
  * random-hyperplane LSH bucket state, emitting cosine ≥ τ pairs as they
  * become known. This is the SemDeDup-style semantic-dedup valve run at
  * ingest, where the text gate can't see paraphrase-level duplication.
  *
  * Topology (the round-9 lean-state shape shared with [[StreamDedup]]):
  * a typed flatMap computes each vector's 16 hyperplane table buckets
  * (JVM mirror of the batch hyperplane-LSH lanes — same deterministic
  * integer-mix plane weights as `Similarity.embeddingTop3`/`lshTopK`);
  * `flatMapGroupsWithState` keyed on (table, bucket) stores prior
  * members and emits each bucket-mate pair ONCE via the
  * smallest-shared-table election. Exact cosine confirm is DOWNSTREAM
  * and STATELESS: a stream-static join against the embedding corpus +
  * the codegen'd FloatVecDot kernel. Retention bounding composes
  * exactly as in [[StreamDedup.candidatesBounded]] (watermark + ts in
  * state + event-time timeout) when the deployment's duplicate horizon
  * is bounded.
  *
  * State layout (round 15, found at the sf100 drive): members are
  * PACKED PRIMITIVE ARRAYS of (vec_id, bucket keys for tables BELOW the
  * group's own table index). Two measured costs drove this off the
  * previous `List[(id, all-16-keys)]` shape. (1) The election only ever
  * reads keys at tables < tIdx — both members share THIS table's bucket
  * by construction, so the pair is elected here iff no earlier table
  * already shares; storing the suffix was dead weight (avg 7.5 of 16
  * entries live). (2) fmgws rewrites a group's WHOLE value per update,
  * and Catalyst encodes a List of case-classes per element — at sf100
  * (2M vectors × 16 tables, ~64 members/bucket by [[planesForCorpus]])
  * the re-encode + RocksDB changelog churn made the gate ~9 min per
  * 125k-vector micro-batch. Primitive arrays encode as one
  * UnsafeArrayData memcopy, the per-batch merge does ONE state.update
  * per touched group, and member bytes drop ~2.6× (8 + 4·tIdx vs ~100).
  * Shuffle rows shrink identically (prefix rides the exchange, not the
  * full key vector).
  *
  * Recall contract: a pair is surfaced iff the two vectors share at
  * least one of the 16 tables — the same candidate contract as the
  * batch hyperplane-LSH path (measured ≈0.996 at cos 0.9 for these
  * 16×8-bit lanes); the confirm stage never admits a sub-τ pair. */
object StreamEmbDedup {

  /** An LSH candidate pair (bucket-mates in ≥1 table), elected exactly
    * once on the smallest shared table. */
  final case class VecCandidate(id1: Long, id2: Long, table_idx: Int)

  /** A confirmed cosine ≥ τ pair, reported on its electing table lane. */
  final case class VecNearDup(id1: Long, id2: Long, cos: Double, table_idx: Int)

  private val NTables = 16
  private val NPlanes = 8

  /** Deterministic hyperplane weights in [-0.5, 0.5) — the same integer
    * mix as the batch LSH lanes, so signatures are stable across runs,
    * executors, and engines. */
  private def wgt(t: Int, p: Int, i: Int): Double =
    ((((t * 7919L + p * 131L + i * 31L + 7L) * 2654435761L) % 1000003L + 1000003L) % 1000003L)
      .toDouble / 1000003.0 - 0.5

  /** The 16 table buckets of one embedding: per table, one sign bit per
    * hyperplane (left-to-right double fold, the FloatVecDot order).
    *
    * `nPlanes` is the SATURATION knob (round 13, found by the sf100
    * StreamDemo probe OOMing inside this gate): a (table, bucket) group
    * holds ~N/2^nPlanes members, and every bucket-mate pair is a
    * candidate, so candidate volume is ~N²/2^nPlanes per table. At the
    * default 8 bits a 2M-vector corpus puts ~7.8k members in every
    * bucket — ~10¹¹ candidate pairs, a quadratic wall no pairing-loop
    * micro-optimization survives. Production sizes bucket bits with the
    * corpus: nPlanes ≈ log2(N / targetBucket) (see
    * [[planesForCorpus]]), trading per-table recall (sign-agreement^
    * nPlanes) that deployments buy back with more tables or multi-probe
    * — the same posting-cap/probe economics as the batch over-cap ANN
    * legs. */
  private[graft] def tableBuckets(v: Array[Float], nPlanes: Int): Array[Int] =
    Array.tabulate(NTables) { t =>
      var bucket = 0
      var p = 0
      while (p < nPlanes) {
        var dot = 0.0
        var i = 0
        while (i < v.length) { dot += v(i) * wgt(t, p, i); i += 1 }
        if (dot >= 0) bucket |= (1 << p)
        p += 1
      }
      bucket
    }

  /** Seq convenience for specs/truth recomputes. The hot path decodes
    * straight to Array[Float] and never goes through here: Spark's
    * `Seq[T]` deserializer builds an immutable LIST, whose O(i) apply
    * turned each hyperplane dot quadratic — jstacked at the sf100 drive
    * as the gate's top frame (~15k indexed reads per vector through
    * List.drop). Found round 15. */
  private[graft] def tableBuckets(v: Seq[Float], nPlanes: Int): Array[Int] =
    tableBuckets(v.toArray, nPlanes)

  private[graft] def tableBuckets(v: Seq[Float]): Array[Int] =
    tableBuckets(v.toArray, NPlanes)

  /** Bucket bits for a corpus of `n` vectors targeting ~`targetBucket`
    * members per (table, bucket): candidate work per newcomer stays
    * O(tables × targetBucket) at any corpus size. Floor 8 = the measured
    * ≈0.996 @ cos 0.9 recall point for small corpora; cap 24 keeps the
    * bucket id in an Int with headroom. */
  def planesForCorpus(n: Long, targetBucket: Int = 64): Int =
    math.min(24, math.max(NPlanes,
      math.ceil(math.log(math.max(1.0, n.toDouble / targetBucket)) / math.log(2.0)).toInt))

  /** Packed bucket-member state: `ids(j)` is member j's vec_id and
    * `pre(j*t .. j*t+t-1)` its bucket keys at tables 0..t-1, where t is
    * the group's own table index (constant per group, so no offsets are
    * stored). Table 0 groups store ids only. */
  final case class PackedVecMembers(ids: Array[Long], pre: Array[Int])

  /** True iff `p` (a newcomer's t-entry bucket prefix) shares a bucket
    * with member j of `pre` at any table below t — i.e. the pair was
    * already elected on an earlier table. The SINGLE source of the
    * election comparison (plus the buffer twin below — review: the loop
    * was once inlined at every call site); primitive-array while-loops,
    * not HOFs, per the repo's hot-path rule. */
  private def sharesBelow(p: Array[Int], pre: Array[Int], j: Int, t: Int): Boolean = {
    var i = 0
    val base = j * t
    while (i < t) {
      if (p(i) == pre(base + i)) return true
      i += 1
    }
    false
  }

  /** [[sharesBelow]] against the within-batch newcomer buffer. */
  private def sharesBelowBuf(p: Array[Int],
      pre: scala.collection.mutable.ArrayBuffer[Int], k: Int, t: Int): Boolean = {
    var i = 0
    val base = k * t
    while (i < t) {
      if (p(i) == pre(base + i)) return true
      i += 1
    }
    false
  }

  /** Candidate pairs from a streaming (vec_id, embedding) frame, each
    * pair emitted exactly once (when its later vector arrives).
    * `nPlanes`: bucket bits per table — size with [[planesForCorpus]]
    * for the expected corpus (the default 8 saturates above ~100k
    * vectors; see [[tableBuckets]]).
    *
    * BUCKET CAP (round 16, r15 verdict #5): per-batch gate cost grows
    * ~linearly with the accumulated corpus because every newcomer pairs
    * against all prior bucket-mates (~3.8n members at batch n on the
    * sf100 drive — the algorithmic term the corpus shape dictates, not a
    * constant). `spark.graft.embGateBucketCap` > 0 bounds each (table,
    * bucket) group to a ring of its newest N members — pairing work and
    * state become O(tables × N) per newcomer at any corpus size. The
    * cap only LOSES pairs, never duplicates one: election reads
    * SIGNATURES (the newcomer's prefix vs the member's stored prefix),
    * so at most one shared table emits a pair regardless of which
    * tables still hold the member; the flip side is that a pair is
    * missed iff the earlier vector rotated out of the SMALLEST
    * signature-shared table's ring before the later one arrived —
    * a higher shared table that still holds it never re-elects,
    * because sharesBelow sees the smaller shared table in the
    * signatures (bucket occupancy differs per table, so this is
    * strictly more misses than "rotated out of every shared table").
    * One
    * contract narrows: the unbounded gate's `contains` check also
    * deduped a REDELIVERED vec_id forever, while a ring only remembers
    * the newest N — under the cap, feed-level exactly-once (which the
    * file/Kafka sources provide) is the idempotence boundary. Default 0
    * keeps the exact-candidate contract (bit-identical to r15). */
  def candidates(vecs: DataFrame, nPlanes: Int = NPlanes): Dataset[VecCandidate] = {
    val spark = vecs.sparkSession
    import spark.implicits._
    // read ONCE at stream build; the closure captures the value
    val bucketCap = graft.Conf.int(spark, graft.Conf.EmbGateBucketCapConf, 0)
    vecs
      .select("vec_id", "embedding")
      .as[(Long, Array[Float])] // Array, not Seq: the Seq decoder builds a List (O(i) apply)
      .flatMap { case (id, v) =>
        val buckets = tableBuckets(v, nPlanes)
        // each table row carries only the PREFIX (tables below its own)
        // — all the smallest-shared-table election ever reads
        buckets.iterator.zipWithIndex
          .map { case (b, t) => (t, b, id, buckets.take(t)) }
      }
      .groupByKey { case (t, b, _, _) => (t, b) }
      .flatMapGroupsWithState[PackedVecMembers, VecCandidate](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case ((tIdx, _), rows, state) =>
          val st = state.getOption
            .getOrElse(PackedVecMembers(Array.emptyLongArray, Array.emptyIntArray))
          val out = scala.collection.mutable.ArrayBuffer.empty[VecCandidate]
          if (bucketCap > 0) {
            // RING path: state is ≤ cap members, so seeding working
            // buffers from it is one bounded copy per touched group.
            // ArrayBuffer boxing is a deliberate exception to the
            // primitive-array hot-loop rule: the CAP bounds every loop
            // here (the unbounded path keeps primitive arrays because
            // nothing bounds it), and the sf100 drive measured the ring
            // flat at ~67 s/batch — the quadratic pairing it removes was
            // the cost, not the constant.
            val ids = scala.collection.mutable.ArrayBuffer.empty[Long]
            val pre = scala.collection.mutable.ArrayBuffer.empty[Int]
            ids ++= st.ids
            pre ++= st.pre
            var changed = false
            // truncate an OVERSIZED restored ring to the cap BEFORE
            // pairing (r16 advice): a checkpoint written uncapped or at a
            // larger cap restores more than `bucketCap` members, and the
            // per-insert one-at-a-time eviction below would keep pairing
            // work O(old size) for thousands of batches — the knob's
            // motivating rescue (flip the cap on a stuck drive, restart
            // from its checkpoint) must bound the FIRST batch already.
            if (ids.length > bucketCap) {
              val drop = ids.length - bucketCap
              ids.remove(0, drop)
              if (tIdx > 0) pre.remove(0, drop * tIdx)
              changed = true
            }
            rows.toSeq.sortBy(_._3).foreach { case (_, _, id, p) =>
              if (!ids.contains(id)) {
                var j = 0
                while (j < ids.length) {
                  if (!sharesBelowBuf(p, pre, j, tIdx))
                    out += VecCandidate(math.min(id, ids(j)),
                      math.max(id, ids(j)), tIdx)
                  j += 1
                }
                ids += id
                pre ++= p
                while (ids.length > bucketCap) { // evict oldest members
                  ids.remove(0)
                  if (tIdx > 0) pre.remove(0, tIdx)
                }
                changed = true
              }
            }
            if (changed) state.update(PackedVecMembers(ids.toArray, pre.toArray))
          } else {
            val newIds = scala.collection.mutable.ArrayBuffer.empty[Long]
            val newPre = scala.collection.mutable.ArrayBuffer.empty[Int]
            // vec_id order: deterministic pairing independent of chunking
            rows.toSeq.sortBy(_._3).foreach { case (_, _, id, p) =>
              if (!st.ids.contains(id) && !newIds.contains(id)) {
                var j = 0
                while (j < st.ids.length) {
                  if (!sharesBelow(p, st.pre, j, tIdx))
                    out += VecCandidate(math.min(id, st.ids(j)),
                      math.max(id, st.ids(j)), tIdx)
                  j += 1
                }
                var k = 0
                while (k < newIds.length) {
                  if (!sharesBelowBuf(p, newPre, k, tIdx))
                    out += VecCandidate(math.min(id, newIds(k)),
                      math.max(id, newIds(k)), tIdx)
                  k += 1
                }
                newIds += id
                newPre ++= p
              }
            }
            if (newIds.nonEmpty)
              state.update(PackedVecMembers(st.ids ++ newIds, st.pre ++ newPre))
          }
          out.iterator
      }
  }

  /** Static (vec_id, embedding, nrm) confirm-side frame. Consumed twice
    * per micro-batch (h1/h2 aliases), so it is `.cache()`d — the first
    * batch pays the norm scan, later batches reuse the blocks — unless
    * the corpus ALREADY carries an `nrm` column (the production shape:
    * an embedding store with norms materialized at write time), which is
    * used as-is. The cache pins the corpus snapshot; a growing store
    * should pass the pre-normed table. */
  private def normedCorpus(corpus: DataFrame): DataFrame = {
    val dot = graft.plans.VectorExpressions.floatDot _
    if (corpus.columns.contains("nrm")) corpus.select("vec_id", "embedding", "nrm")
    else corpus.select(col("vec_id"), col("embedding"),
      sqrt(dot(col("embedding"), col("embedding"))).as("nrm")).cache()
  }

  /** The confirm-side join pair, routed on the STORE size against
    * [[graft.Conf.AnnServeCapConf]] — the annServeCap recipe applied to
    * the streaming confirm (round 14, found at the sf100 drive):
    *
    *  - UNDER the cap (store ≤ ~10⁷ vectors): BROADCAST the store on
    *    both confirm sides. The candidate stream then never crosses an
    *    exchange — the cosine computes in the candidate stage and only
    *    confirmed τ-pairs survive. Without this, each micro-batch
    *    SHUFFLES the candidate stream twice, the second time carrying
    *    ~260 B/row of vector payload: on the sf100 tiled corpus (lumpy
    *    buckets → e8-row candidate batches) one batch's confirm shuffle
    *    burned >52 GB of disk and killed the drive.
    *  - ABOVE the cap: shuffle_hash pinned on the corpus side (round 13
    *    — Catalyst would otherwise build a broadcast on the CANDIDATE
    *    side, which is unbounded; hash-partitioning both sides on
    *    vec_id survives any store size, at fleet-disk shuffle cost).
    *
    * Never the candidate side: the fmgws output carries no usable size
    * estimate and AQE is off in stateful plans.
    *
    * One broadcast build per micro-batch, not two (measured, round 15):
    * with AQE off — the stateful-plan regime this runs in — Catalyst's
    * ReuseExchange canonicalizes the h1/h2 subtrees equal (alias names
    * erase), so the second join reads a ReusedExchange of the first's
    * relation. A probe of the same join shape under AQE shows NO static
    * reuse (AQE handles it at runtime via stage caching instead) — do
    * not "simplify" this into two visibly-shared plans on that
    * evidence. */
  private def confirmSides(normed: DataFrame): (DataFrame, DataFrame) = {
    val s = normed.sparkSession
    val serveCap = graft.operators.Guards.annServeCap(s)
    val h1 = normed.toDF("vec_id", "v1", "n1")
    val h2 = normed.toDF("vec_id", "v2", "n2")
    // BYTE-scaled threshold (round 15, advice): annServeCap encodes a
    // ~0.9 GB memory envelope derived at ~90 B/vector SERVING rows, but a
    // confirm row carries the FULL float vector (4·Dim) + id + norm —
    // ~3× wider at Dim=64 — so a raw count test near the cap would build
    // multi-GB broadcasts outside that envelope. Compare corpus bytes
    // against cap×90 instead: the broadcast stays inside the same budget
    // at any dimension. Both stats run once at stream build, not per
    // micro-batch (sf100: 2M × 272 B = 544 MB → broadcast, as measured).
    val n = normed.count()
    val rowBytes =
      if (n == 0L) 90L
      else 4L * normed.select(col("embedding")).head.getSeq[Float](0).length + 16L
    // saturating, not wrapping: a huge cap override (e.g. Long.MaxValue,
    // the natural "always broadcast" spelling) must not flip the routing
    // to shuffle via overflow (round 15, review)
    val capBytes =
      if (serveCap > Long.MaxValue / 90L) Long.MaxValue else serveCap * 90L
    if (n <= capBytes / rowBytes) (broadcast(h1), broadcast(h2))
    else (h1.hint("shuffle_hash"), h2.hint("shuffle_hash"))
  }

  /** Confirmed cosine ≥ τ pairs. `corpus`: static (vec_id, embedding)
    * resolving every admitted vector (the embedding store in
    * production). Cosines round to 6 dp like the batch operators. */
  def nearDups(vecs: DataFrame, corpus: DataFrame,
      tau: Double = 0.9, nPlanes: Int = NPlanes): Dataset[VecNearDup] = {
    val spark = vecs.sparkSession
    import spark.implicits._
    val dot = graft.plans.VectorExpressions.floatDot _
    val (h1, h2) = confirmSides(normedCorpus(corpus))
    candidates(vecs, nPlanes).toDF()
      .join(h1, col("id1") === h1("vec_id")).drop("vec_id")
      .join(h2, col("id2") === h2("vec_id")).drop("vec_id")
      .withColumn("cos", round(dot(col("v1"), col("v2")) / (col("n1") * col("n2")), 6))
      .filter(col("cos") >= tau)
      .select(col("id1"), col("id2"), col("cos"), col("table_idx"))
      .as[VecNearDup]
  }

  /** One row per confirmed pair — already distinct by the
    * smallest-shared-table election. */
  def distinctPairs(vecs: DataFrame, corpus: DataFrame,
      tau: Double = 0.9, nPlanes: Int = NPlanes): DataFrame =
    nearDups(vecs, corpus, tau, nPlanes).toDF().drop("table_idx")

  /** A bounded-form candidate pair, stamped with the later vector's ts. */
  final case class TimedVecCandidate(id1: Long, id2: Long, table_idx: Int,
      ts: java.sql.Timestamp)

  /** [[PackedVecMembers]] plus each member's event-time millis (for
    * retention eviction). */
  final case class PackedTimedVecMembers(ids: Array[Long], pre: Array[Int],
      tsMs: Array[Long])

  /** RETENTION-BOUNDED candidate stage — the [[StreamDedup.candidatesBounded]]
    * machinery for vectors: `vecs` is a streaming (vec_id, embedding, ts)
    * frame; the watermark is declared on the flatMap OUTPUT (typed maps
    * strip the event-time tag), members older than the watermark evict
    * BEFORE pairing, and an event-time timeout at (newest member + 1 ms)
    * sweeps idle buckets — state is O(vectors inside retention), in the
    * same packed prefix-key layout as the unbounded form (+8 B/member
    * for the eviction timestamp).
    *
    * BUCKET CAP (round 17, r16 verdict #2): retention bounds TOTAL state
    * but nothing bounds one hot (table, bucket) group inside the window —
    * the exact skew that ate the r15 sf100 drive recurs here whenever a
    * bucket's arrival rate × retention exceeds the workable member count.
    * `spark.graft.embGateBucketCap` > 0 therefore also caps this lane:
    * each group keeps a ring of its newest N members, with eviction order
    * respecting the watermark — EXPIRED members leave first (they were
    * never pair candidates), then oldest-by-arrival until the ring fits.
    * Same miss condition as the unbounded ring: a pair is missed iff the
    * earlier vector left the SMALLEST signature-shared table's ring
    * before the later one arrived. Default 0 keeps the exact
    * retention-window contract.
    *
    * `nPlanes` (round 17): the same saturation dial as [[candidates]] —
    * size with [[planesForCorpus]] for the vectors expected INSIDE one
    * retention window (the 8-bit default saturates above ~100k members,
    * the r13 wall). */
  def candidatesBounded(vecs: DataFrame,
      retention: String, nPlanes: Int = NPlanes): Dataset[TimedVecCandidate] = {
    val spark = vecs.sparkSession
    import spark.implicits._
    // read ONCE at stream build; the closure captures the value
    val bucketCap = graft.Conf.int(spark, graft.Conf.EmbGateBucketCapConf, 0)
    vecs
      .select("vec_id", "embedding", "ts")
      .as[(Long, Array[Float], java.sql.Timestamp)]
      .flatMap { case (id, v, ts) =>
        val buckets = tableBuckets(v, nPlanes)
        buckets.iterator.zipWithIndex
          .map { case (b, t) => (t, b, id, buckets.take(t).toSeq, ts) }
      }
      .toDF("table_idx", "bucket", "vec_id", "buckets", "ts")
      .withWatermark("ts", retention)
      .as[(Int, Int, Long, Seq[Int], java.sql.Timestamp)]
      .groupByKey { case (t, b, _, _, _) => (t, b) }
      .flatMapGroupsWithState[PackedTimedVecMembers, TimedVecCandidate](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case ((tIdx, _), rows, state) =>
          val wmMs = state.getCurrentWatermarkMs()
          val st0 = state.getOption.getOrElse(
            PackedTimedVecMembers(Array.emptyLongArray, Array.emptyIntArray,
              Array.emptyLongArray))
          // retention eviction first: expired members are not candidates
          // (arrays rebuilt only when something actually expired)
          val st =
            if (!st0.tsMs.exists(_ < wmMs)) st0
            else {
              val keep = st0.tsMs.indices.filter(st0.tsMs(_) >= wmMs)
              PackedTimedVecMembers(
                keep.map(st0.ids(_)).toArray,
                keep.iterator.flatMap(j =>
                  (0 until tIdx).iterator.map(i => st0.pre(j * tIdx + i))).toArray,
                keep.map(st0.tsMs(_)).toArray)
            }
          val evicted = st ne st0
          val out = scala.collection.mutable.ArrayBuffer.empty[TimedVecCandidate]
          if (bucketCap > 0) {
            // RING path (r17): expired members are already gone (above —
            // the watermark-first half of the eviction order); what's
            // left truncates oldest-by-arrival to the cap BEFORE pairing,
            // so a restart from an uncapped/larger-cap checkpoint does
            // O(cap) work from its first batch.
            val ids = scala.collection.mutable.ArrayBuffer.empty[Long]
            val pre = scala.collection.mutable.ArrayBuffer.empty[Int]
            val tsMs = scala.collection.mutable.ArrayBuffer.empty[Long]
            ids ++= st.ids
            pre ++= st.pre
            tsMs ++= st.tsMs
            var changed = evicted
            if (ids.length > bucketCap) {
              val drop = ids.length - bucketCap
              ids.remove(0, drop)
              if (tIdx > 0) pre.remove(0, drop * tIdx)
              tsMs.remove(0, drop)
              changed = true
            }
            rows.toSeq.sortBy(_._3).foreach { case (_, _, id, pSeq, ts) =>
              if (!ids.contains(id)) {
                val p = pSeq.toArray
                var j = 0
                while (j < ids.length) {
                  if (!sharesBelowBuf(p, pre, j, tIdx))
                    out += TimedVecCandidate(math.min(id, ids(j)),
                      math.max(id, ids(j)), tIdx, ts)
                  j += 1
                }
                ids += id
                pre ++= p
                tsMs += ts.getTime
                while (ids.length > bucketCap) { // evict oldest members
                  ids.remove(0)
                  if (tIdx > 0) pre.remove(0, tIdx)
                  tsMs.remove(0)
                }
                changed = true
              }
            }
            if (ids.isEmpty) state.remove()
            else {
              if (changed)
                state.update(PackedTimedVecMembers(ids.toArray, pre.toArray,
                  tsMs.toArray))
              val newest = tsMs.max
              if (newest + 1L > wmMs) state.setTimeoutTimestamp(newest + 1L)
            }
          } else {
          val newIds = scala.collection.mutable.ArrayBuffer.empty[Long]
          val newPre = scala.collection.mutable.ArrayBuffer.empty[Int]
          val newTs = scala.collection.mutable.ArrayBuffer.empty[Long]
          rows.toSeq.sortBy(_._3).foreach { case (_, _, id, pSeq, ts) =>
            if (!st.ids.contains(id) && !newIds.contains(id)) {
              val p = pSeq.toArray // unbox once; the loops below stay primitive
              var j = 0
              while (j < st.ids.length) {
                if (!sharesBelow(p, st.pre, j, tIdx))
                  out += TimedVecCandidate(math.min(id, st.ids(j)),
                    math.max(id, st.ids(j)), tIdx, ts)
                j += 1
              }
              var k = 0
              while (k < newIds.length) {
                if (!sharesBelowBuf(p, newPre, k, tIdx))
                  out += TimedVecCandidate(math.min(id, newIds(k)),
                    math.max(id, newIds(k)), tIdx, ts)
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
              state.update(PackedTimedVecMembers(ids, st.pre ++ newPre,
                st.tsMs ++ newTs))
            val newest = (st.tsMs.iterator ++ newTs.iterator).max
            if (newest + 1L > wmMs) state.setTimeoutTimestamp(newest + 1L)
          }
          }
          out.iterator
      }
  }

  /** Retention-bounded confirmed pairs — [[candidatesBounded]] +
    * the stateless corpus confirm join. */
  def distinctPairsBounded(vecs: DataFrame, corpus: DataFrame,
      retention: String, tau: Double = 0.9,
      nPlanes: Int = NPlanes): DataFrame = {
    val dot = graft.plans.VectorExpressions.floatDot _
    val (h1, h2) = confirmSides(normedCorpus(corpus))
    candidatesBounded(vecs, retention, nPlanes).toDF()
      .join(h1, col("id1") === h1("vec_id")).drop("vec_id")
      .join(h2, col("id2") === h2("vec_id")).drop("vec_id")
      .withColumn("cos", round(dot(col("v1"), col("v2")) / (col("n1") * col("n2")), 6))
      .filter(col("cos") >= tau)
      .select(col("id1"), col("id2"), col("cos"), col("ts"))
  }
}
