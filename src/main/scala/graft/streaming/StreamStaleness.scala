package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming staleness monitor — the streaming twin of the batch
  * `cdc_staleness` operator (the `maxwell_ts` watermark role): emit a key
  * the moment the stream's EVENT TIME has moved `staleAfter` past the
  * key's last event, i.e. "this key has gone quiet relative to the
  * frontier", without ever scanning the replica.
  *
  * Mechanism: `flatMapGroupsWithState` with EVENT-time timeouts — each key
  * arms a timeout at `last_event + staleAfter`; the timeout fires when the
  * stream's watermark (not wall clock) passes it, so results are
  * deterministic under replay and independent of processing speed — the
  * property ProcessingTimeTimeout lacks and the reason it isn't used here.
  * A stale key's state is dropped on emission: state is O(live keys within
  * the staleness horizon), and a key that resumes sending simply starts a
  * fresh lifecycle (its next silence emits again — each quiet period
  * surfaces once).
  */
object StreamStaleness {

  case class KeyState(lastUs: Long, nEvents: Long)

  /** One stale-key report: the key, when it was last seen, and how many
    * events it had sent by then. */
  case class StaleKey(user_id: Long, last_us: Long, n_events: Long)

  /** `events`: streaming DataFrame with (user_id, ts). `staleAfter` must
    * be at most the watermark delay's order of magnitude coarser — the
    * timeout can only fire once the watermark passes it. */
  def staleKeys(events: DataFrame, staleAfterMs: Long,
      watermarkDelay: String = "10 minutes"): Dataset[StaleKey] = {
    val s = events.sparkSession
    import s.implicits._
    events
      .select(col("user_id").cast("long"), col("ts"))
      .withWatermark("ts", watermarkDelay)
      .as[(Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[KeyState, StaleKey](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (uid, it, state: GroupState[KeyState]) =>
          if (state.hasTimedOut) {
            val st = state.get
            state.remove() // next activity starts a fresh lifecycle
            Iterator.single(StaleKey(uid, st.lastUs, st.nEvents))
          } else {
            var st = state.getOption.getOrElse(KeyState(Long.MinValue, 0L))
            it.foreach { case (_, ts) =>
              st = KeyState(math.max(st.lastUs, ts.getTime * 1000L), st.nEvents + 1)
            }
            state.update(st)
            // arm the event-time alarm: fires when the WATERMARK passes it
            state.setTimeoutTimestamp(st.lastUs / 1000L + staleAfterMs)
            Iterator.empty
          }
      }
  }

  /** Output mode the stateful operator requires. */
  val outputMode: OutputMode = OutputMode.Append()
}
