package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Incrementally-maintained replica reconciliation digests — the streaming
  * twin of the batch `cdc_replica_checksum` operator: instead of
  * re-digesting the whole replica per reconciliation (O(N)), each replica
  * change updates its bucket's digest in O(1), so source↔replica compare
  * stays a `buckets`-row diff that is ALWAYS current.
  *
  * Digest arithmetic is identical to the batch op: md5 of the canonical
  * `id|event_id|cents` state string → first 15 hex chars as a 60-bit int →
  * mod 2³¹, summed per bucket (order-independent; Long-exact to ~4×10⁹
  * keys per bucket). A stream fed the same events therefore converges to
  * bit-equal digests (spec-asserted against the batch op).
  *
  * State per bucket is the pk→digest map — the same O(keys) the replica
  * itself holds; `buckets` bounds the group count (digest parallelism),
  * not the state size.
  */
object StreamChecksum {

  /** One bucket's current digest row, matching the batch op's shape. */
  case class BucketDigest(bucket: Int, n_keys: Long, checksum: Long)

  /** The batch op's digest, re-expressed in JVM arithmetic:
    * `conv(substring(md5(s), 1, 15), 16, 10) % 2^31` — identical values
    * because md5 hex and base-16 parsing agree. */
  def digestOf(id: String, eventId: String, cents: Long): Long = {
    val s = s"$id|$eventId|$cents"
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16) % 2147483648L
  }

  /** `changes`: the replica changelog (e.g. [[MaxwellStream.replicaChangelog]]
    * over a maxwellified feed, whose `state` carries id/value/event_id).
    * Emits every touched bucket's updated digest each micro-batch
    * (Update mode). */
  def bucketDigests(changes: Dataset[MaxwellStream.StateChange],
      buckets: Int = 16): Dataset[BucketDigest] = {
    val s = changes.sparkSession
    import s.implicits._
    changes
      .groupByKey(c => (math.abs(c.pk.toLong) % buckets).toInt)
      // flatMapGroupsWithState in APPEND mode, not mapGroupsWithState:
      // this runs downstream of replicaChangelog's own stateful operator,
      // and Spark only allows chained state ops when ALL are
      // flatMapGroupsWithState in append mode. Each emitted row is a
      // final monitoring record of the bucket's digest as of that batch.
      .flatMapGroupsWithState[Map[String, Long], BucketDigest](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (bucket, it, state: GroupState[Map[String, Long]]) =>
          var m = state.getOption.getOrElse(Map.empty[String, Long])
          // (ts, seq) apply order within the batch, as everywhere in replay
          it.toVector.sortBy(c => (c.ts.getTime, c.seq)).foreach { c =>
            if (c.op == "tombstone") m -= c.pk
            else {
              // same rounding as the batch op's round(value*100) on positive
              // doubles (HALF_UP)
              val cents = math.round(c.state("value").toDouble * 100)
              m += c.pk -> digestOf(c.state("id"), c.state("event_id"), cents)
            }
          }
          state.update(m)
          Iterator.single(BucketDigest(bucket, m.size.toLong, m.values.sum))
      }
  }

  /** Output mode the chained stateful query requires. */
  val outputMode: OutputMode = OutputMode.Append()
}
