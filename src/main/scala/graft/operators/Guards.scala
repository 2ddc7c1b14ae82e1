package graft.operators

import org.apache.spark.sql.SparkSession

/** Shared plan-guard statistics for operators that pick between a
  * single-sort window plan and its two-phase distributed twin at runtime.
  *
  * The guard statistic (max rows in one window partition) costs one
  * hash-agg count job, so it is memoized per (session, dir, tag) — the
  * bpeMemo/pairsMemo lifetime contract: keyed by [[graft.Registry
  * .sessionToken]]'s per-session UUID plus the data dir (STRINGS, never
  * the session object), bounded with clear-on-overflow (a miss just
  * recomputes), and the count job runs OUTSIDE any map lock. */
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

  def funnelSortCap(s: SparkSession): Long =
    graft.Conf.long(s, graft.Conf.FunnelSortCapConf, FunnelSortCap)

  private val MemoCap = 256
  private val memo =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()

  /** Memoized guard statistic: computes (once per session/dir/tag) the
    * caller's max-group-size aggregate. */
  def maxGroupRows(s: SparkSession, d: String, tag: String)(compute: => Long): Long = {
    // dirFingerprint (round 13): data regenerated/appended under the same
    // path invalidates the stat, so the guard re-counts and can FLIP the
    // plan — a stale "under cap" must never keep a single-sort plan under
    // exactly the skew the guard exists for.
    val key = graft.Registry.sessionToken(s) + "|" + d + "|" +
      graft.Registry.dirFingerprint(d) + "|" + tag
    val hit = memo.get(key)
    if (hit != null) hit.longValue
    else {
      val v = compute // outside the map: no bin lock held across the job
      if (memo.size >= MemoCap) memo.clear()
      val prev = memo.putIfAbsent(key, java.lang.Long.valueOf(v))
      if (prev != null) prev.longValue else v
    }
  }
}
