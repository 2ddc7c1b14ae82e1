package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Live AS-OF enrichment — the streaming twin of the batch `q_asof_join`
  * operator: every purchase is tagged with the latest click of the same
  * user at-or-before it (event-time, the window `max(click.ts) OVER
  * (... ROWS UNBOUNDED PRECEDING)` semantics, including its tie rule: a
  * click at the SAME timestamp counts only if its event_id sorts lower).
  *
  * Emission protocol (Append mode): a purchase emits immediately with its
  * current best match; a LATE click that improves an open purchase's
  * match re-emits that purchase with the better `click_us`. `click_us`
  * is strictly increasing across a purchase's emissions (null lowest),
  * so "keep the emission with the greatest `click_us` per purchase_id"
  * reconstructs exactly the batch operator's output (spec-asserted).
  *
  * State per key is WATERMARK-BOUNDED, the part that matters at 100 TB:
  *   - open purchases: only those with `ts >= watermark` — once the
  *     watermark passes a purchase, any click that could still improve it
  *     (`click.ts <= purchase.ts < watermark`) would itself be
  *     late-beyond-watermark, so the purchase is final and evicted;
  *   - clicks: those with `ts < watermark` can only match FUTURE
  *     purchases (`purchase.ts >= watermark > click.ts`), for which only
  *     the latest one matters — they compact to ONE max timestamp
  *     (`maxOldClickUs`), and only in-flight clicks stay individual.
  * So state is O(events inside the lateness window) + one long per key,
  * independent of stream length. Compaction runs whenever the key sees
  * traffic AND on an event-time timeout one lateness-window past the
  * watermark, so idle keys sweep themselves down to the single compacted
  * click maximum without waiting for their next event.
  *
  * Reference anchor: the batch operator at operators/Olap.scala
  * (`q_asof_join`); same output schema and rounding (`round(value, 2)`
  * HALF_UP via [[StreamScd2.round2]]).
  */
object StreamAsof {

  /** One enrichment row, matching batch `q_asof_join`'s shape. */
  case class AsofRow(purchase_id: Long, user_id: Long, purchase_us: Long,
      click_us: Option[Long], purchase_value: Double)

  /** An open (still-improvable) purchase and its current best match. */
  case class OpenPurchase(event_id: Long, us: Long, value: Double,
      bestUs: Option[Long])

  /** Per-user state (encoder codegen requires the class to be public). */
  case class AsofState(maxOldClickUs: Option[Long],
      clicks: Vector[(Long, Long)], open: Vector[OpenPurchase])

  /** The batch tie rule: click (cUs, cEid) counts for purchase (pUs, pEid)
    * iff it sorts strictly earlier by (ts, event_id). */
  private def counts(cUs: Long, cEid: Long, pUs: Long, pEid: Long): Boolean =
    cUs < pUs || (cUs == pUs && cEid < pEid)

  /** `events`: streaming DataFrame with (user_id, event_id, event_type,
    * ts, value); apply `withWatermark("ts", lateness)` upstream to bound
    * state. Non-click/purchase rows are filtered here, as in the batch
    * op. */
  def enriched(events: DataFrame): Dataset[AsofRow] = {
    val s = events.sparkSession
    import s.implicits._
    events
      .filter(col("event_type").isin("click", "purchase"))
      // keep the WATERMARKED ts column itself, uncast — projecting it into
      // a long OR re-casting it aliases a fresh attribute without the
      // watermark tag, which EventTimeTimeout rejects; µs derive inside
      // the group function
      .select(col("user_id").cast("long"), col("event_id").cast("long"),
        col("event_type"), col("ts"), col("value"))
      .as[(Long, Long, String, java.sql.Timestamp, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[AsofState, AsofRow](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (uid, rawIt, state: GroupState[AsofState]) =>
          def usOf(ts: java.sql.Timestamp): Long =
            Math.floorDiv(ts.getTime, 1000L) * 1000000L + ts.getNanos / 1000L
          val it = rawIt.map { case (u, eid, typ, ts, v) => (u, eid, typ, usOf(ts), v) }
          var st = state.getOption.getOrElse(AsofState(None, Vector.empty, Vector.empty))
          val out = Vector.newBuilder[AsofRow]
          it.toVector.sortBy { case (_, eid, _, us, _) => (us, eid) }.foreach {
            case (_, eid, "click", us, _) =>
              // a late click may improve open purchases it precedes
              st = st.copy(
                clicks = st.clicks :+ ((us, eid)),
                open = st.open.map { p =>
                  if (counts(us, eid, p.us, p.event_id) && p.bestUs.forall(_ < us)) {
                    val np = p.copy(bestUs = Some(us))
                    out += AsofRow(np.event_id, uid, np.us, np.bestUs, np.value)
                    np
                  } else p
                })
            case (_, eid, _, us, v) => // purchase
              val fromRecent = st.clicks
                .filter { case (cUs, cEid) => counts(cUs, cEid, us, eid) }
                .map(_._1).maxOption
              val best = (st.maxOldClickUs.toSeq ++ fromRecent.toSeq).maxOption
              val p = OpenPurchase(eid, us, StreamScd2.round2(v), best)
              out += AsofRow(p.event_id, uid, p.us, p.bestUs, p.value)
              st = st.copy(open = st.open :+ p)
          }
          // watermark-bounded compaction (ms → µs); also reached by the
          // event-time timeout with an empty iterator — the idle-key sweep
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          if (wmUs > 0) {
            val (oldClicks, liveClicks) = st.clicks.partition(_._1 < wmUs)
            st = AsofState(
              (st.maxOldClickUs.toSeq ++ oldClicks.map(_._1)).maxOption,
              liveClicks,
              st.open.filter(_.us >= wmUs))
          }
          state.update(st)
          // while anything un-compacted remains, re-sweep one lateness
          // window after the current watermark even if the key goes idle
          if ((st.clicks.nonEmpty || st.open.nonEmpty) && wmUs > 0)
            state.setTimeoutTimestamp(wmUs / 1000L + 60000L)
          out.result().iterator
      }
  }

  /** TWO-STREAM as-of (the trades×quotes shape): independent probe and
    * reference streams tag their lane and UNION before the keyed state —
    * the `cdc_merge_sources` topology — so one watermark and one state
    * store cover both inputs. `probes`/`refs`: streaming DataFrames with
    * (user_id, event_id, ts, value), each with `withWatermark("ts", …)`
    * already applied (Spark advances the joint watermark to the minimum
    * of the lanes); every probe row is enriched with the latest
    * at-or-before reference row, same protocol and bounds as
    * [[enriched]]. */
  def enriched2(probes: DataFrame, refs: DataFrame): Dataset[AsofRow] = {
    val cols = Seq("user_id", "event_id", "event_type", "ts", "value").map(col)
    enriched(
      probes.withColumn("event_type", lit("purchase")).select(cols: _*)
        .unionByName(
          refs.withColumn("event_type", lit("click")).select(cols: _*)))
  }

  /** Output mode the stateful operator requires. */
  val outputMode: OutputMode = OutputMode.Append()
}
