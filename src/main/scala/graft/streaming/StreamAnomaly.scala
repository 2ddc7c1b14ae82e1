package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Online per-key 3σ anomaly detection over the live event stream — the
  * streaming twin of the batch `q_value_anomalies` operator.
  *
  * Each event is scored against the running statistics of the key's PRIOR
  * events only, in (ts, event_id) order, using the identical exact integer
  * test as the batch op: (n·x−S)² > 9·(n·Q−S²) over cents — integer
  * arithmetic, so a stream fed the same events emits bit-equal anomaly
  * rows (spec-asserted), and crash-replayed micro-batches rebuild the same
  * state. Warm-up: a key's first 8 events only feed the stats.
  *
  * State per key is three longs (n, Σx, Σx²) — O(keys), independent of
  * event volume. Events are sorted by (ts, event_id) WITHIN each
  * micro-batch group (micro-batch iterators carry no order guarantee);
  * cross-batch order is the source's delivery order, as with every replay
  * operator here.
  */
object StreamAnomaly {

  case class StatState(n: Long, s: Long, q: Long)

  /** One anomaly report, matching the batch op's row shape. */
  case class Anomaly(event_id: Long, user_id: Long, cents: Long, n_prior: Long)

  /** Score one observation against the prior state and fold it in.
    * Round 15: the 3σ COMPARISON runs in BigInt — the r15 hot-key drill
    * measured (n·x−S)² ≈ 1e20 at just a 1M-row key, so the old
    * Math.*Exact test's fail-loud ceiling sat well inside real per-key
    * volumes; BigInt keeps the test exact at any n and preserves
    * bit-parity with the batch twin's decimal(38,0) compare
    * (q_value_anomalies, OrderedStats.scala). The STATE accumulation
    * stays Long + Math.*Exact fail-loud: Σx² overflows only past ~9e10
    * rows/key × cents², and wrapping state silently would poison every
    * later decision, so that ceiling still throws (spec'd). */
  def step(st: StatState, x: Long): (Boolean, StatState) = {
    val lhs = BigInt(st.n) * x - st.s
    val anomaly = st.n >= 8 &&
      lhs * lhs > 9 * (BigInt(st.n) * st.q - BigInt(st.s) * st.s)
    (anomaly, StatState(st.n + 1, Math.addExact(st.s, x),
      Math.addExact(st.q, Math.multiplyExact(x, x))))
  }

  /** `events`: streaming DataFrame with (user_id, event_id, ts, value). */
  def anomalies(events: DataFrame): Dataset[Anomaly] = {
    val s = events.sparkSession
    import s.implicits._
    events
      .select(col("user_id").cast("long"), col("event_id").cast("long"),
        unix_micros(col("ts")).as("us"),
        round(col("value") * 100).cast("long").as("cents"))
      .as[(Long, Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[StatState, Anomaly](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (uid, it, state: GroupState[StatState]) =>
          var st = state.getOption.getOrElse(StatState(0L, 0L, 0L))
          val out = Vector.newBuilder[Anomaly]
          it.toVector.sortBy { case (_, eid, us, _) => (us, eid) }.foreach {
            case (_, eid, _, x) =>
              val (anomaly, next) = step(st, x)
              if (anomaly) out += Anomaly(eid, uid, x, st.n)
              st = next
          }
          state.update(st)
          out.result().iterator
      }
  }

  /** Output mode the stateful operator requires. */
  val outputMode: OutputMode = OutputMode.Append()
}
