package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** STREAMING window funnel — the live twin of batch `q_window_funnel`
  * (the ClickHouse `windowFunnel` shape): per user, the max level reached
  * by a strictly ordered view→click→purchase chain whose whole span fits
  * the window; the stream emits a row whenever a user's level INCREASES
  * (level 1 on first view, 2 when a qualifying click lands, 3 when a
  * chain completes), so last-emission-per-user is the user's current
  * level — exactly the batch op's value over the same history.
  *
  * State per user: the funnel events still able to participate in a NEW
  * chain, plus the scalar max level. Eviction is watermark-driven: a
  * chain's span is ≤ W, so an event with `us + W < watermark` cannot
  * combine with any future arrival (arrivals respect the watermark — see
  * the late guard) — it evicts, and the retained suffix is always
  * sufficient to detect every chain by the time its completing event
  * arrives (each member of a chain ending at `p` has
  * `us ≥ p.us − W ≥ wm − W`). The level recomputation runs the SAME
  * greedy kernel as the batch op
  * ([[graft.operators.AnalyticsExt.funnelLevel]]), so stream and batch
  * agree event-for-event, tie rule included.
  *
  * Two guards keep the operator honest under real traffic:
  *   - WATERMARK-LATE ROWS ARE DROPPED AT ENTRY. `flatMapGroupsWithState`
  *     (unlike windowed aggregation) delivers late rows to the group
  *     function; processing one would splice an event below the eviction
  *     horizon into chains whose other members may already be gone —
  *     results would then depend on arrival order, which batch replay
  *     can't reproduce. Dropping rows with `us < watermark` is the same
  *     contract the built-in stateful operators apply.
  *   - IDLE STATE EXPIRES. The event buffer already drains via the
  *     watermark, but the O(1) max-level scalar is the emission-dedup
  *     memory and previously lived forever — an unbounded user-cardinality
  *     leak at ingest scale. An event-time timeout now removes a user's
  *     whole state once idle for `idleTtlUs` (default 7 days). A user
  *     reappearing after expiry restarts from level 0, which can re-emit
  *     low levels; consumers fold emissions with max-per-user (as the
  *     parity spec does), for which re-emissions are harmless — a
  *     post-expiry subset of history can never exceed the full-history
  *     level, and no viable chain member is ever expired (the buffer must
  *     already be empty). COUNT-style consumers (e.g. "level-ups per
  *     user") would double-count around an expiry boundary: this
  *     operator's output contract is max-fold-only — aggregate emissions
  *     with max per user, never count them. If a count-style consumer
  *     ever becomes a requirement, add a restart marker to [[LevelUp]]
  *     (emitted on the first post-expiry event) rather than weakening
  *     the TTL.
  *
  * `events`: streaming (user_id, event_id, event_type, ts) with
  * `withWatermark("ts", lateness)` applied upstream; the watermarked ts
  * column itself must survive to this operator (the repo's documented
  * projection pitfall). */
object StreamWindowFunnel {

  /** One level-increase emission. */
  final case class LevelUp(user_id: Long, level: Int)

  /** Per-user state (public for encoder codegen, as StreamAsof).
    * `lastUs`: newest event time seen for this user — the idle clock. */
  final case class FunnelState(maxLevel: Int, evs: Vector[(String, Long, Long)],
      lastUs: Long)

  def levels(events: DataFrame, windowUs: Long = 86400000000L,
      idleTtlUs: Long = 7L * 86400000000L): Dataset[LevelUp] = {
    val s = events.sparkSession
    import s.implicits._
    events
      .filter(col("event_type").isin("view", "click", "purchase"))
      .select(col("user_id").cast("long"), col("event_id").cast("long"),
        col("event_type"), col("ts"))
      .as[(Long, Long, String, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[FunnelState, LevelUp](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (uid, rawIt, state) =>
          def usOf(ts: java.sql.Timestamp): Long =
            Math.floorDiv(ts.getTime, 1000L) * 1000000L + ts.getNanos / 1000L
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          // late guard: below-watermark rows are dropped, not processed
          val incoming = rawIt.map { case (_, eid, tpe, ts) => (tpe, usOf(ts), eid) }
            .filter(e => wmUs == 0L || e._2 >= wmUs).toVector
          val existing = state.getOption
          // nothing fresh and no state: do not mint a state row (a purely
          // late batch for an unknown user must leave zero footprint)
          if (incoming.isEmpty && existing.isEmpty) Iterator.empty
          else {
            var st = existing.getOrElse(FunnelState(0, Vector.empty, 0L))
            val out = Vector.newBuilder[LevelUp]
            if (incoming.nonEmpty) {
              val all = st.evs ++ incoming
              val lvl = graft.operators.AnalyticsExt.funnelLevel(all.toArray, windowUs)
              if (lvl > st.maxLevel) {
                // emit every skipped rung too, so the emission protocol is
                // "one row per level", not "one row per batch"
                ((st.maxLevel + 1) to lvl).foreach(l => out += LevelUp(uid, l))
                st = st.copy(maxLevel = lvl)
              }
              st = st.copy(evs = all,
                lastUs = math.max(st.lastUs, incoming.iterator.map(_._2).max))
            }
            // watermark-bounded compaction (also reached via the idle sweep)
            if (wmUs > 0) st = st.copy(evs = st.evs.filter(_._2 + windowUs >= wmUs))
            if (st.evs.isEmpty && wmUs > 0 && st.lastUs + idleTtlUs < wmUs) {
              state.remove() // idle past TTL: the scalar goes too
            } else {
              state.update(st)
              // wake at the next compaction point while the buffer drains,
              // then once more at TTL expiry to self-destruct
              val wmMs = wmUs / 1000L
              val wake =
                if (st.evs.nonEmpty) wmMs + 60000L
                else (st.lastUs + idleTtlUs) / 1000L + 1L
              state.setTimeoutTimestamp(math.max(wake, wmMs + 1L))
            }
            out.result().iterator
          }
      }
  }
}
