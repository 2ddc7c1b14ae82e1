package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Distributed sketches as typed [[Aggregator]]s — the custom-aggregate
  * path for when exact operators don't scale (counting distincts across
  * 100 TB without a full shuffle of the key space).
  *
  * KMV (k-minimum-values) distinct-count sketch: keep the k smallest
  * 64-bit hashes seen; if fewer than k exist the count is EXACT, otherwise
  * estimate (k-1)/theta where theta is the k-th minimum mapped to [0,1).
  * Deterministic (hash-based, no RNG): results are reproducible across
  * runs, retries, and partitionings — merge is associative+commutative.
  * Standard error ~ 1/sqrt(k-2) (~6% at k=256).
  */
object Sketches {

  /** Map a sign-flipped hash (see [[KmvDistinct.reduce]]) onto [0, 1). */
  private def frac(u: Long): Double =
    (u.toDouble - Long.MinValue.toDouble) / 1.8446744073709552e19

  /** Shared KMV buffer mechanics over pre-hashed Long inputs (e.g.
    * xxhash64). Buffer: the k smallest distinct hashes in UNSIGNED order,
    * kept ascending by storing them sign-bit-flipped (signed order of the
    * flipped value == unsigned order of the hash). */
  sealed abstract class KmvBase[OUT](k: Int) extends Aggregator[Long, Seq[Long], OUT] {
    override def zero: Seq[Long] = Vector.empty

    private def backing(b: Seq[Long]): Array[Long] = b match {
      // after the first insert the buffer is always an ofLong wrapper —
      // direct primitive access, no per-element boxing
      case as: scala.collection.immutable.ArraySeq.ofLong => as.unsafeArray
      case other => other.toArray
    }

    /** O(log k) membership + one two-segment arraycopy per ACCEPTED value.
      * The naive `contains` + re-`sorted` form is O(k log k) per insert,
      * which at k=4096 dominated the whole sketch_distinct_users query
      * (warm-up alone is k inserts per partition); accepted inserts are
      * rare after warm-up (~k·ln(n/k) total), so the copy cost vanishes. */
    override def reduce(b: Seq[Long], h0: Long): Seq[Long] = {
      val h = h0 ^ Long.MinValue // unsigned-comparable form
      val n = b.length
      val src = backing(b)
      if (n == k && h >= src(n - 1)) b // common fast path: not among the k minima
      else {
        var lo = 0
        var hi = n
        while (lo < hi) {
          val m = (lo + hi) >>> 1
          if (src(m) < h) lo = m + 1 else hi = m
        }
        if (lo < n && src(lo) == h) b // duplicate hash (same key re-seen)
        else {
          val outLen = math.min(n + 1, k)
          val arr = new Array[Long](outLen)
          System.arraycopy(src, 0, arr, 0, math.min(lo, outLen))
          if (lo < outLen) {
            arr(lo) = h
            System.arraycopy(src, lo, arr, lo + 1, outLen - lo - 1)
          }
          scala.collection.immutable.ArraySeq.unsafeWrapArray(arr)
        }
      }
    }

    /** Linear sorted-merge with dedup — O(k), no global re-sort. */
    override def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] = {
      if (a.isEmpty) b
      else if (b.isEmpty) a
      else {
        val x = backing(a)
        val y = backing(b)
        val out = new Array[Long](math.min(x.length + y.length, k))
        var i = 0; var j = 0; var o = 0
        while (o < out.length && (i < x.length || j < y.length)) {
          val takeX = j >= y.length || (i < x.length && x(i) <= y(j))
          val v = if (takeX) x(i) else y(j)
          if (takeX) i += 1 else j += 1
          if (o == 0 || out(o - 1) != v) { out(o) = v; o += 1 }
        }
        val trimmed = if (o == out.length) out else java.util.Arrays.copyOf(out, o)
        scala.collection.immutable.ArraySeq.unsafeWrapArray(trimmed)
      }
    }

    override def bufferEncoder: Encoder[Seq[Long]] = Encoders.kryo[Seq[Long]]
  }

  /** KMV distinct-count estimate (the classic finisher). */
  final class KmvDistinct(k: Int) extends KmvBase[Double](k) {
    override def finish(b: Seq[Long]): Double =
      if (b.length < k) b.length.toDouble
      else (k - 1).toDouble / frac(b.last)
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** KMV finisher that emits the STATE itself (the ascending flipped-hash
    * array) instead of the estimate — the materialized-partial form: persist
    * per-slice states, answer any window by merging states (KMV union is
    * lossless: the k smallest of a union are among the union of per-slice
    * k-smallest), never rescanning the raw data. */
  final class KmvState(k: Int) extends KmvBase[Seq[Long]](k) {
    override def finish(b: Seq[Long]): Seq[Long] = b
    override def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  }

  /** Untyped Column form usable in `groupBy(...).agg(...)`; input must be a
    * 64-bit hash column. */
  def kmvDistinct(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(new KmvDistinct(k), Encoders.scalaLong)

  /** Column form of [[KmvState]]; emits `array<bigint>`. */
  def kmvState(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(new KmvState(k), Encoders.scalaLong)

  /** Estimate from a (merged) KMV state column — the Column twin of
    * [[KmvDistinct.finish]], bit-identical arithmetic. */
  def kmvEstimate(state: Column, k: Int): Column = {
    import org.apache.spark.sql.functions._
    when(size(state) < k, size(state).cast("double"))
      .otherwise(lit((k - 1).toDouble) /
        ((element_at(state, k).cast("double") - lit(Long.MinValue.toDouble)) /
          lit(1.8446744073709552e19)))
  }

  /** Misra–Gries heavy-hitters sketch: k counters, O(k) state per partition.
    *
    * Guarantee (the reason it is usable under an EXACT oracle): every item
    * whose true frequency exceeds N/(k+1) is present in the candidate set,
    * regardless of partitioning or merge order. Items below that bound may
    * or may not appear — so a query thresholding at fraction f > 1/(k+1)
    * and CONFIRMING candidates with exact counts is fully deterministic:
    * the sketch can only add spurious candidates, and the exact-count
    * filter removes them.
    *
    * Merge is the mergeable-summaries construction (Agarwal et al., PODS
    * 2012): sum counters, then subtract the (k+1)-th largest count from all
    * and drop non-positive — preserving the N/(k+1) error bound, so
    * map-side partial aggregation works and no token ever shuffles.
    */
  final class MisraGries(k: Int) extends Aggregator[String, Map[String, Long], Seq[String]] {
    override def zero: Map[String, Long] = Map.empty

    override def reduce(b: Map[String, Long], item: String): Map[String, Long] =
      b.get(item) match {
        case Some(c) => b.updated(item, c + 1L)
        case None if b.size < k => b.updated(item, 1L)
        case None => // decrement-all step: drop one occurrence of every tracked item
          b.iterator.collect { case (t, c) if c > 1L => (t, c - 1L) }.toMap
      }

    override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
      val summed = b.foldLeft(a) { case (m, (t, c)) => m.updated(t, m.getOrElse(t, 0L) + c) }
      if (summed.size <= k) summed
      else {
        val cut = summed.valuesIterator.toArray.sorted(Ordering[Long].reverse)(k)
        summed.iterator.collect { case (t, c) if c > cut => (t, c - cut) }.toMap
      }
    }

    override def finish(b: Map[String, Long]): Seq[String] = b.keys.toSeq.sorted

    override def bufferEncoder: Encoder[Map[String, Long]] = Encoders.kryo[Map[String, Long]]
    override def outputEncoder: Encoder[Seq[String]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[String]]()
  }

  /** Untyped Column form over a string item column; emits `array<string>`
    * candidate heavy hitters. */
  def misraGries(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(new MisraGries(k), Encoders.STRING)

  /** One-pass second-moment accumulator over dim-dimensional float
    * vectors — the distributed-PCA primitive: buffer is
    * [n, Σx(dim), upper-triangle Σxxᵀ (dim·(dim+1)/2)], reduce is dim²/2
    * multiply-adds per row, merge is elementwise add (associative +
    * commutative → map-side partial aggregation works and the corpus is
    * touched in ONE exchange-free pass). The finisher emits the flat
    * buffer; covariance/eigen work happens on the driver over the tiny
    * dim×dim result — the only corpus-scaled cost is the scan. */
  final class MomentMatrix(dim: Int)
      extends Aggregator[Seq[Float], Array[Double], Seq[Double]] {
    private val triLen = dim * (dim + 1) / 2

    override def zero: Array[Double] = new Array[Double](1 + dim + triLen)

    override def reduce(b: Array[Double], v: Seq[Float]): Array[Double] = {
      val x = v.toArray
      b(0) += 1.0
      var i = 0
      var t = 1 + dim
      while (i < dim) {
        val xi = x(i).toDouble
        b(1 + i) += xi
        var j = i
        while (j < dim) { b(t) += xi * x(j).toDouble; j += 1; t += 1 }
        i += 1
      }
      b
    }

    override def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }

    override def finish(b: Array[Double]): Seq[Double] = b.toSeq

    override def bufferEncoder: Encoder[Array[Double]] = Encoders.kryo[Array[Double]]
    override def outputEncoder: Encoder[Seq[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
  }

  /** Column form of [[MomentMatrix]] over an `array<float>` column. */
  def momentMatrix(dim: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(new MomentMatrix(dim),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Float]]())
}
