package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Live funnel-stage tracking — the streaming twin of the batch
  * `q_funnel_metrics` operator's per-user stage table: per key, the
  * EARLIEST signup/view/purchase event times, maintained incrementally so
  * the funnel report (stage counts + conversion rates over the ordered
  * stage conditions) is always current without rescanning history.
  *
  * State per user is three longs (min-timestamps; MaxValue = unseen) —
  * O(keys), independent of event volume; minima are commutative, so
  * replayed micro-batches converge to the same state and a stream fed the
  * batch corpus emits stage rows whose funnel aggregate equals the batch
  * op's row exactly (spec-asserted).
  */
object StreamFunnel {

  case class StageState(s: Long, v: Long, p: Long)

  /** One user's current earliest-stage times (None = not reached yet). */
  case class UserStages(user_id: Long, t_signup_us: Option[Long],
      t_view_us: Option[Long], t_purchase_us: Option[Long])

  /** `events`: streaming DataFrame with (user_id, event_type, ts). Emits
    * the user's updated stage row each micro-batch it changes in
    * (Update mode). */
  def userStages(events: DataFrame): Dataset[UserStages] = {
    val sess = events.sparkSession
    import sess.implicits._
    def opt(x: Long): Option[Long] = if (x == Long.MaxValue) None else Some(x)
    events
      .select(col("user_id").cast("long"), col("event_type"), unix_micros(col("ts")).as("us"))
      .as[(Long, String, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState[StageState, UserStages](GroupStateTimeout.NoTimeout) {
        (uid, it, state: GroupState[StageState]) =>
          var st = state.getOption.getOrElse(
            StageState(Long.MaxValue, Long.MaxValue, Long.MaxValue))
          it.foreach { case (_, tpe, us) =>
            tpe match {
              case "signup"   => if (us < st.s) st = st.copy(s = us)
              case "view"     => if (us < st.v) st = st.copy(v = us)
              case "purchase" => if (us < st.p) st = st.copy(p = us)
              case _          => ()
            }
          }
          state.update(st)
          UserStages(uid, opt(st.s), opt(st.v), opt(st.p))
      }
  }

  /** Output mode the stateful operator requires. */
  val outputMode: OutputMode = OutputMode.Update()
}
