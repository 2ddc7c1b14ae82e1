package graft.operators

import org.apache.spark.sql.SparkSession

/** Shared plan-guard statistics for operators that pick between a
  * single-sort window plan and its two-phase distributed twin at runtime.
  *
  * The guard statistic (max rows in one window partition) costs one
  * hash-agg count job, so it is memoized per (session, dir, tag) — the
  * bpeMemo/pairsMemo lifetime contract: keyed by [[graft.Registry
  * .sessionToken]]'s per-session UUID plus the data dir (STRINGS, never
  * the session object), bounded as a synchronized access-order LRU
  * (removeEldestEntry evicts only the coldest key; a miss just
  * recomputes), and the count job runs OUTSIDE any map lock — two racing
  * first probes may both compute, which is benign (same value, last put
  * loses). */
object Guards {

  /** Per-partition row bound above which a windowed single-sort lane
    * DELEGATES to its scale-safe two-phase twin (identical output,
    * shared oracle). Measured on the 32-core box: q_ntile at sf10 funnels
    * ~3M-row groups through one reducer (19.6 s vs the twin's 9.3 s), and
    * cdc_late_arrivals' hot-key crossover sits between a 1M-row hot user
    * (plain 10.9 s beats dist 12.2 s) and a 5M-row one (32.3 vs 24.1 s —
    * and the plain form degraded 6.7× from its unskewed time). Under the
    * bound the single sort IS the right plan (no two-phase overhead); on
    * a 1000-executor cluster the crossover moves far left because one
    * straggler task idles the fleet, so a deployment would lower this.
    *
    * Round 13: overridable per session via `spark.graft.singleSortCap`
    * ([[graft.Conf.SingleSortCapConf]]) — the crossover is a property of
    * the DEPLOYMENT (task heap, executor count, straggler tolerance), so
    * it must move without a rebuild. [[SingleSortCap]] stays as the
    * measured default. */
  val SingleSortCap = 2000000L

  def singleSortCap(s: SparkSession): Long =
    graft.Conf.long(s, graft.Conf.SingleSortCapConf, SingleSortCap)

  /** q_window_funnel's own crossover (round 13): the funnel kernel is an
    * O(1)-state streaming fold over the spillable group sort — no heap
    * ceiling and one output row per user — so plain beats its twin until
    * the hottest user nears ~50M rows on the 32-core box (measured curve
    * at [[graft.Conf.FunnelSortCapConf]]). 32M keeps margin under the
    * measured tie; clusters lower it via the conf. */
  val FunnelSortCap = 32000000L

  /** Round 14 (r13 verdict #7): the 32M default is a SINGLE-BOX
    * measurement; on a fleet one 32M-row task idles every other
    * executor, so when a deployment declares its size
    * (`spark.executor.instances`) the effective default derives DOWN —
    * divided by the instance count, floored at the shared
    * [[SingleSortCap]] (below that the two-phase twin's own overhead
    * dominates regardless of fleet size). An explicit
    * `spark.graft.funnelSortCap` always wins. */
  /** The pure derivation, seam for the spec (`spark.executor.instances`
    * is a submit-time core conf — immutable per session, so the spec
    * exercises the function, not a conf flip). */
  private[graft] def derivedFunnelCap(execInstances: Option[String], floor: Long): Long = {
    val execs = execInstances
      .flatMap(v => scala.util.Try(v.trim.toInt).toOption).getOrElse(1)
    if (execs <= 1) FunnelSortCap
    else math.max(floor, FunnelSortCap / execs)
  }

  def funnelSortCap(s: SparkSession): Long =
    graft.Conf.long(s, graft.Conf.FunnelSortCapConf,
      derivedFunnelCap(
        s.conf.getOption("spark.executor.instances")
          .orElse(Option(s.sparkContext.getConf.get("spark.executor.instances", null))),
        singleSortCap(s)))

  /** Corpus-vector count above which `lshTopK` refuses the serving path
    * (driver-resident broadcast index) and routes to its spec-identical
    * distributed posting-join twin. The serving index costs ~90 B/vector
    * (id + packed sig + SQ8), so 10⁷ vectors ≈ 0.9 GB of driver heap +
    * broadcast — the right plan up to there (zero shuffles before the
    * exact rerank), a driver OOM well past it. The cap is a MEMORY
    * envelope, not a perf crossover: at sf10 (200k vectors, whole-corpus
    * query stream) serving measured 35.6 s and the segment-serving twin
    * 35.8 s — cost parity — so the flip point is where the index stops
    * fitting, not where it stops being fast. Deployments with small
    * driver heaps lower it via `spark.graft.annServeCap`. */
  val AnnServeCap = 10000000L

  def annServeCap(s: SparkSession): Long =
    graft.Conf.long(s, graft.Conf.AnnServeCapConf, AnnServeCap)

  private val MemoCap = 256
  // LRU, not clear-on-overflow (round 14): the old clear-all wiped every
  // memoized stat on the 257th key, so a long-lived multi-dir session
  // thrashed recounts of its HOT keys. accessOrder=true makes get() a
  // touch; removeEldestEntry evicts only the coldest entry. All access
  // synchronized — guard lookups are rare (one per lane per dir), the
  // compute job itself still runs OUTSIDE the lock.
  private val memo = new java.util.LinkedHashMap[String, java.lang.Long](64, 0.75f, true) {
    override def removeEldestEntry(e: java.util.Map.Entry[String, java.lang.Long]): Boolean =
      size() > MemoCap
  }

  /** Memoized guard statistic: computes (once per session/dir/tag) the
    * caller's max-group-size aggregate. */
  /** Broadcast-hint `df` iff the TABLE it slices is provably small ON
    * DISK — the cliff-free replacement for the r17 forced hints on
    * SF-scaling dims (see [[graft.Conf.DimHintCapConf]]). The guard
    * statistic is the table's total parquet bytes: ground truth (not a
    * plan estimate), memoized with the staleness fingerprint, and
    * monotone in SF — so the hint RELEASES itself as the deployment
    * grows, three orders of magnitude before the 8 GB broadcast
    * hard-fail. A missing/unlistable path (e.g. an hdfs:// URI this
    * local walk can't see) counts as unbounded → no hint; AQE decides,
    * which is always the safe default. */
  def dimHint(s: SparkSession, d: String, table: String,
      df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val cap = graft.Conf.long(s, graft.Conf.DimHintCapConf, 268435456L)
    if (cap > 0 && tableBytes(s, d, table) <= cap)
      org.apache.spark.sql.functions.broadcast(df)
    else df
  }

  private[graft] def tableBytes(s: SparkSession, d: String, table: String): Long =
    maxGroupRows(s, d, s"dim_bytes_$table") {
      def sizeOf(f: java.io.File): Long =
        if (f.isFile) f.length()
        else if (f.isDirectory) {
          val kids = f.listFiles()
          if (kids == null) 0L else kids.foldLeft(0L)(_ + sizeOf(_))
        } else 0L
      val root = new java.io.File(s"$d/$table.parquet")
      if (!root.exists()) Long.MaxValue else sizeOf(root)
    }

  def maxGroupRows(s: SparkSession, d: String, tag: String)(compute: => Long): Long = {
    // dirFingerprint (round 13): data regenerated/appended under the same
    // path invalidates the stat, so the guard re-counts and can FLIP the
    // plan — a stale "under cap" must never keep a single-sort plan under
    // exactly the skew the guard exists for.
    val key = graft.Registry.sessionToken(s) + "|" + d + "|" +
      graft.Registry.dirFingerprint(d) + "|" + tag
    val hit = memo.synchronized(memo.get(key))
    if (hit != null) hit.longValue
    else {
      val v = compute // outside the lock: no monitor held across the job
      memo.synchronized {
        val prev = memo.get(key)
        if (prev != null) prev.longValue
        else { memo.put(key, java.lang.Long.valueOf(v)); v }
      }
    }
  }
}
