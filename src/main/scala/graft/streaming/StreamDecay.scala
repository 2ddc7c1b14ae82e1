package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful recency-decayed per-user value over the live event stream —
  * the streaming twin of the batch `q_decayed_sum` operator.
  *
  * The decay anchor is a FIXED frontier timestamp supplied by the caller
  * (a training-cutoff / report date): each event contributes
  * `cents · 2²⁰ // 2^min(days-before-frontier, 20)` — the identical exact
  * fixed-point arithmetic as the batch op, so a stream fed the same events
  * converges to bit-equal totals (spec-asserted). State per user is three
  * longs (count, fp-sum, last-seen µs) — O(users), independent of event
  * volume; the arithmetic is integer, so re-feeding a batch after a crash
  * recomputes the same totals (commutative + associative merge).
  */
object StreamDecay {

  case class DecayState(n: Long, fp: Long, lastUs: Long)
  case class DecayRow(user_id: Long, n_events: Long, decayed_fp: Long, last_us: Long)

  /** events: a streaming DataFrame with (user_id, ts, value). Emits the
    * updated per-user running decay row each micro-batch (Update mode). */
  def decayedValue(events: DataFrame, frontierUs: Long): Dataset[DecayRow] = {
    val s = events.sparkSession
    import s.implicits._
    events
      .select(col("user_id").cast("long"), unix_micros(col("ts")).as("us"),
        round(col("value") * 100).cast("long").as("cents"))
      .as[(Long, Long, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState[DecayState, DecayRow](GroupStateTimeout.NoTimeout) {
        (uid, it, state: GroupState[DecayState]) =>
          var st = state.getOption.getOrElse(DecayState(0L, 0L, Long.MinValue))
          it.foreach { case (_, us, cents) =>
            val d = math.min(math.max((frontierUs - us) / 86400000000L, 0L), 20L)
            st = DecayState(st.n + 1, st.fp + (cents * 1048576L) / (1L << d),
              math.max(st.lastUs, us))
          }
          state.update(st)
          DecayRow(uid, st.n, st.fp, st.lastUs)
      }
  }

  /** Output mode the stateful operator requires. */
  val outputMode: OutputMode = OutputMode.Update()
}
