package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Live SCD-2 dimension maintenance — the streaming twin of the batch
  * `cdc_scd2` operator: every event opens a new version of its key and
  * closes the previous one (`valid_to` = the newcomer's `valid_from`),
  * so the sink always holds the full validity-interval history a
  * warehouse dimension table carries.
  *
  * Emission protocol (Append mode, chained-stateful-safe): each arriving
  * event emits (a) the PREVIOUS version re-emitted with its interval now
  * closed and (b) the new version with an open (null) `valid_to_us`. A
  * version row is therefore emitted at most twice — once open, once
  * closed — and "keep the LAST emission per (user_id, event_id)"
  * reconstructs exactly the batch operator's output (spec-asserted
  * bit-equality, including the `round(value, 2)` HALF_UP parity via
  * [[StreamScd2.round2]]).
  *
  * State per key is ONE open version (five fields) — O(keys), independent
  * of history length; the history lives in the sink, not the state store.
  * Events are sorted by (ts, event_id) within each micro-batch group;
  * cross-batch order is the source's delivery order, as with every replay
  * operator here.
  */
object StreamScd2 {

  /** One version row, matching batch `cdc_scd2`'s shape. */
  case class Scd2Row(user_id: Long, event_id: Long, op: String,
      valid_from_us: Long, valid_to_us: Option[Long], value: Double)

  /** State: the key's single open version (encoder codegen requires the
    * class to be public). */
  case class OpenVersion(event_id: Long, op: String,
      valid_from_us: Long, value: Double)

  /** Batch `round(value, 2)` in JVM arithmetic — Spark rounds doubles via
    * `BigDecimal(d).setScale(2, HALF_UP)` (away from zero on .5 for both
    * signs), NOT `math.round` semantics (see StreamChecksum.centsOf). */
  def round2(v: Double): Double =
    BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** The batch op's event_type → op mapping (Cdc.opOf). */
  def opOf(eventType: String): String = eventType match {
    case "signup" => "insert"
    case "error"  => "delete"
    case _        => "update"
  }

  /** `events`: streaming DataFrame with (user_id, event_id, event_type,
    * ts, value). */
  def versions(events: DataFrame): Dataset[Scd2Row] = {
    val s = events.sparkSession
    import s.implicits._
    events
      .select(col("user_id").cast("long"), col("event_id").cast("long"),
        col("event_type"), unix_micros(col("ts")).as("us"), col("value"))
      .as[(Long, Long, String, Long, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[OpenVersion, Scd2Row](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (uid, it, state: GroupState[OpenVersion]) =>
          var open = state.getOption
          val out = Vector.newBuilder[Scd2Row]
          it.toVector.sortBy { case (_, eid, _, us, _) => (us, eid) }.foreach {
            case (_, eid, typ, us, v) =>
              open.foreach { o =>
                out += Scd2Row(uid, o.event_id, o.op, o.valid_from_us,
                  Some(us), o.value)
              }
              val nv = OpenVersion(eid, opOf(typ), us, round2(v))
              out += Scd2Row(uid, nv.event_id, nv.op, nv.valid_from_us,
                None, nv.value)
              open = Some(nv)
          }
          open.foreach(state.update)
          out.result().iterator
      }
  }

  /** Output mode the stateful operator requires. */
  val outputMode: OutputMode = OutputMode.Append()
}
