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
  * combine with any future arrival (arrivals respect the watermark) —
  * it evicts, and the retained suffix is always sufficient to detect
  * every chain by the time its completing event arrives (each member of
  * a chain ending at `p` has `us ≥ p.us − W ≥ wm − W`). The level
  * recomputation runs the SAME greedy kernel as the batch op
  * ([[graft.operators.AnalyticsExt.funnelLevel]]), so stream and batch
  * agree event-for-event, tie rule included. An event-time timeout
  * sweeps idle users' event buffers; the O(1) max-level scalar persists
  * (it is the answer, not a cache).
  *
  * `events`: streaming (user_id, event_id, event_type, ts) with
  * `withWatermark("ts", lateness)` applied upstream; the watermarked ts
  * column itself must survive to this operator (the repo's documented
  * projection pitfall). */
object StreamWindowFunnel {

  /** One level-increase emission. */
  final case class LevelUp(user_id: Long, level: Int)

  /** Per-user state (public for encoder codegen, as StreamAsof). */
  final case class FunnelState(maxLevel: Int, evs: Vector[(String, Long, Long)])

  def levels(events: DataFrame, windowUs: Long = 86400000000L): Dataset[LevelUp] = {
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
          var st = state.getOption.getOrElse(FunnelState(0, Vector.empty))
          val incoming = rawIt.map { case (_, eid, tpe, ts) => (tpe, usOf(ts), eid) }.toVector
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
            st = st.copy(evs = all)
          }
          // watermark-bounded compaction (also reached via the idle sweep)
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          if (wmUs > 0) st = st.copy(evs = st.evs.filter(_._2 + windowUs >= wmUs))
          state.update(st)
          if (st.evs.nonEmpty && wmUs > 0)
            state.setTimeoutTimestamp(wmUs / 1000L + 60000L)
          out.result().iterator
      }
  }
}
