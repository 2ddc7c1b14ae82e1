package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}
import graft.functions.Dialect

/** Batch CDC core — the reference's event model and `process_events()`
  * replay semantics (`/root/reference/cdc_plpgsql_functions.sql:103-241`,
  * `/root/reference/cdc_periodic_load.sql`) re-expressed as declarative
  * Spark plans over the `events` table.
  *
  * Event model mapping (Maxwell-style op classification): `signup` rows act
  * as INSERT, `error` rows as DELETE tombstones, everything else as UPDATE;
  * `user_id` is the primary key, `(ts, event_id)` is the total event order,
  * matching the reference's `ORDER BY ts ASC` replay with a deterministic
  * tie-break the reference lacks.
  *
  * Scale notes: every keyed operator here shuffles ONCE on the primary key
  * and expresses replay as a window/aggregation over that single exchange;
  * at 100 TB the replica materialization is a linear scan + hash exchange,
  * never a driver-side loop like the reference's row-at-a-time plpgsql.
  */
object Cdc {

  /** Maxwell `type` classification (INSERT/UPDATE/DELETE). */
  def opOf(eventType: Column): Column =
    when(eventType === "signup", "insert")
      .when(eventType === "error", "delete")
      .otherwise("update")

  private val opSql =
    "CASE WHEN event_type = 'signup' THEN 'insert' WHEN event_type = 'error' THEN 'delete' ELSE 'update' END"

  private def ev(s: SparkSession, d: String) = Tables.events(s, d)

  /** Maxwell-style event parsing: JSON payload extraction plus the
    * reference's sec-vs-ms timestamp normalization
    * (`cdc_periodic_load.sql:5` checks length 13 and divides by 1000).
    * Even event ids arrive as epoch-millis, odd ones as epoch-seconds; the
    * normalizer recovers epoch-seconds for both. */
  val cdcParse: QueryDef = QueryDef(
    "cdc_parse",
    (s, d) =>
      ev(s, d)
        .select(
          col("event_id"),
          col("user_id"),
          opOf(col("event_type")).as("op"),
          when(col("event_id") % 2 === 0, unix_millis(col("ts")))
            .otherwise(expr("unix_millis(ts) div 1000")).as("raw_ts")
        , Tables.propsK.cast("int").as("prop_k"))
        .withColumn(
          "ts_sec",
          when(col("raw_ts") >= 100000000000L, expr("raw_ts div 1000")).otherwise(col("raw_ts"))
        )
        .select("event_id", "user_id", "op", "ts_sec", "prop_k")
        .orderBy("event_id"),
    Some(s"""
      SELECT event_id, user_id,
             $opSql AS op,
             CASE WHEN raw_ts >= 100000000000 THEN raw_ts // 1000 ELSE raw_ts END AS ts_sec,
             json_extract_string(props, '$$.k')::INT AS prop_k
      FROM (
        SELECT *,
               CASE WHEN event_id % 2 = 0 THEN epoch_us(ts) // 1000
                    ELSE epoch_us(ts) // 1000000 END AS raw_ts
        FROM events)
      ORDER BY event_id
    """.stripMargin.trim)
  )

  /** events -> ordered changelog rows (seq, pk, op, ts, payload). */
  val cdcChangelog: QueryDef = QueryDef(
    "cdc_changelog",
    (s, d) =>
      ev(s, d)
        .select(
          col("event_id").as("seq"),
          col("user_id").as("pk"),
          opOf(col("event_type")).as("op"),
          unix_micros(col("ts")).as("ts_us"),
          round(col("value"), 2).as("payload_value")
        )
        .orderBy("seq"),
    Some(s"""
      SELECT event_id AS seq, user_id AS pk,
             $opSql AS op,
             epoch_us(ts) AS ts_us,
             round(value, 2) AS payload_value
      FROM events
      ORDER BY seq
    """.stripMargin.trim)
  )

  /** Event-archive rollup per (day, op) — the query shape served by the
    * reference's month-partitioned `maxwell_event` archive
    * (`maxwell_gpdb.sql:25-31`). */
  val cdcArchiveStats: QueryDef = QueryDef(
    "cdc_archive_stats",
    (s, d) =>
      ev(s, d)
        .groupBy(
          date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"),
          opOf(col("event_type")).as("op")
        )
        .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("total_value"))
        .orderBy("day", "op"),
    Some(s"""
      SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
             $opSql AS op,
             count(*) AS n_events, round(sum(value), 2) AS total_value
      FROM events
      GROUP BY 1, 2
      ORDER BY day, op
    """.stripMargin.trim)
  )

  /** The replica: latest state per primary key after replaying
    * insert/update/delete in event order; keys whose final op is a DELETE
    * tombstone vanish — exactly what `process_events()` leaves behind.
    *
    * HOT-KEY GUARD (round 15): above [[graft.operators.Guards
    * .singleSortCap]] rows for any key this delegates to
    * [[graft.operators.ScalePatterns.cdcSnapshotDist]]'s struct-max
    * aggregate (identical output, same oracle) — latest-per-key reduces,
    * so the twin's partial agg absorbs the hot key map-side with no
    * per-key sort at all. Same memoized "events_user" count as
    * cdc_late_arrivals/q_sessionize. */
  val cdcSnapshot: QueryDef = QueryDef(
    "cdc_snapshot",
    (s, d) => {
      val hottest = graft.operators.Guards.maxGroupRows(s, d, "events_user") {
        ev(s, d).groupBy(col("user_id")).agg(count(lit(1)).as("n"))
          .agg(max(col("n"))).first().getLong(0)
      }
      if (hottest > graft.operators.Guards.singleSortCap(s))
        graft.operators.ScalePatterns.cdcSnapshotDist.fn(s, d)
      else {
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts").desc, col("event_id").desc)
        ev(s, d)
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1 && opOf(col("event_type")) =!= "delete")
          .select(
            col("user_id"),
            col("event_id").as("last_event_id"),
            opOf(col("event_type")).as("last_op"),
            unix_micros(col("ts")).as("last_ts_us"),
            round(col("value"), 2).as("last_value")
          )
          .orderBy("user_id")
      }
    },
    Some(s"""
      SELECT user_id, event_id AS last_event_id,
             $opSql AS last_op,
             epoch_us(ts) AS last_ts_us,
             round(value, 2) AS last_value
      FROM (
        SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        FROM events)
      WHERE rn = 1 AND event_type <> 'error'
      ORDER BY user_id
    """.stripMargin.trim)
  )

  /** Partial-update merge: the reference's UPDATE only touches columns
    * present in the event's `old` field (cdc_plpgsql_functions.sql:128-144).
    * Model: `purchase` events carry column A, `click` events carry column B;
    * the replica holds, per key, the most recent value of EACH column
    * independently. One shuffle: filter to carriers, rank per (pk, column),
    * pivot the rank-1 rows. */
  val cdcSnapshotMerge: QueryDef = QueryDef(
    "cdc_snapshot_merge",
    (s, d) => {
      val w = Window
        .partitionBy(col("user_id"), col("event_type"))
        .orderBy(col("ts").desc, col("event_id").desc)
      val latestPerCol = ev(s, d)
        .filter(col("event_type").isin("purchase", "click"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .groupBy(col("user_id"))
        .agg(
          round(max(when(col("event_type") === "purchase", col("value"))), 2).as("last_purchase_value"),
          round(max(when(col("event_type") === "click", col("value"))), 2).as("last_click_value")
        )
      ev(s, d)
        .select(col("user_id")).distinct()
        .join(latestPerCol, Seq("user_id"), "left")
        .orderBy("user_id")
    },
    Some("""
      WITH ranked AS (
        SELECT user_id, event_type, value,
               row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
        WHERE event_type IN ('purchase', 'click')
      ), latest AS (
        SELECT user_id,
               round(max(CASE WHEN event_type = 'purchase' THEN value END), 2) AS last_purchase_value,
               round(max(CASE WHEN event_type = 'click' THEN value END), 2) AS last_click_value
        FROM ranked WHERE rn = 1 GROUP BY user_id
      )
      SELECT u.user_id, last_purchase_value, last_click_value
      FROM (SELECT DISTINCT user_id FROM events) u
      LEFT JOIN latest USING (user_id)
      ORDER BY user_id
    """.stripMargin.trim)
  )

  /** SCD type-2 history: every event becomes a version row with a
    * [valid_from, valid_to) interval per key.
    *
    * HOT-KEY GUARD (round 13; the cdc_late_arrivals pattern): the
    * per-key lead window funnels a hot key's whole history through one
    * task's sort, so above [[graft.operators.Guards.singleSortCap]]
    * rows for any key this delegates to [[graft.operators.ScalePatterns
    * .cdcScd2Dist]]'s bucketed-lead twin (identical output, same oracle;
    * spec-proven row-identity on an 80%-hot frame) — reading the SAME
    * memoized "events_user" count as cdc_late_arrivals/q_sessionize. */
  val cdcScd2: QueryDef = QueryDef(
    "cdc_scd2",
    (s, d) => {
      val hottest = graft.operators.Guards.maxGroupRows(s, d, "events_user") {
        ev(s, d).groupBy(col("user_id")).agg(count(lit(1)).as("n"))
          .agg(max(col("n"))).first().getLong(0)
      }
      if (hottest > graft.operators.Guards.singleSortCap(s))
        graft.operators.ScalePatterns.cdcScd2Dist.fn(s, d)
      else {
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        ev(s, d)
          .select(
            col("user_id"),
            col("event_id"),
            opOf(col("event_type")).as("op"),
            unix_micros(col("ts")).as("valid_from_us"),
            unix_micros(lead(col("ts"), 1).over(w)).as("valid_to_us"),
            round(col("value"), 2).as("value")
          )
          .orderBy("user_id", "valid_from_us", "event_id")
      }
    },
    Some(s"""
      SELECT user_id, event_id,
             $opSql AS op,
             epoch_us(ts) AS valid_from_us,
             epoch_us(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) AS valid_to_us,
             round(value, 2) AS value
      FROM events
      ORDER BY user_id, valid_from_us, event_id
    """.stripMargin.trim)
  )

  /** Audit: op mix + activity bounds per key. */
  val cdcOpCounts: QueryDef = QueryDef(
    "cdc_op_counts",
    (s, d) =>
      ev(s, d)
        .groupBy(col("user_id"))
        .agg(
          sum(when(opOf(col("event_type")) === "insert", 1).otherwise(0)).as("n_insert"),
          sum(when(opOf(col("event_type")) === "update", 1).otherwise(0)).as("n_update"),
          sum(when(opOf(col("event_type")) === "delete", 1).otherwise(0)).as("n_delete"),
          min(unix_micros(col("ts"))).as("first_us"),
          max(unix_micros(col("ts"))).as("last_us")
        )
        .orderBy("user_id"),
    Some(s"""
      SELECT user_id,
             sum(CASE WHEN $opSql = 'insert' THEN 1 ELSE 0 END)::BIGINT AS n_insert,
             sum(CASE WHEN $opSql = 'update' THEN 1 ELSE 0 END)::BIGINT AS n_update,
             sum(CASE WHEN $opSql = 'delete' THEN 1 ELSE 0 END)::BIGINT AS n_delete,
             min(epoch_us(ts)) AS first_us,
             max(epoch_us(ts)) AS last_us
      FROM events
      GROUP BY user_id
      ORDER BY user_id
    """.stripMargin.trim)
  )

  /** Exactly-once repair: duplicate deliveries (at-least-once transport,
    * like the reference's un-acked RabbitMQ redelivery) collapse by event
    * identity. Simulated by doubling the stream. */
  val cdcDedupEvents: QueryDef = QueryDef(
    "cdc_dedup_events",
    (s, d) => {
      val e = ev(s, d).select("event_id", "user_id", "event_type")
      e.unionAll(e)
        .dropDuplicates("event_id")
        .orderBy("event_id")
    },
    Some("""
      SELECT DISTINCT event_id, user_id, event_type
      FROM (SELECT * FROM events UNION ALL SELECT * FROM events)
      ORDER BY event_id
    """.stripMargin.trim)
  )

  /** DDL translation: MySQL statements (CREATE/ALTER/DROP, as the reference
    * handles in its TABLE-CREATE/ALTER/DROP branches) rendered per part row,
    * then translated + schema-qualified via [[graft.functions.Dialect]]. */
  val translateDdl: QueryDef = QueryDef(
    "translate_ddl",
    (s, d) => {
      val ddl = when(
        col("p_partkey") % 3 === 0,
        concat(
          lit("CREATE TABLE `part_"), col("p_partkey"),
          lit("` (id INT, name LONGTEXT, price DOUBLE, created DATETIME, flag TINYINT(1), img LONGBLOB) ENGINE=InnoDB")
        )
      ).when(
        col("p_partkey") % 3 === 1,
        concat(lit("ALTER TABLE `part_"), col("p_partkey"), lit("` ADD COLUMN price DOUBLE"))
      ).otherwise(concat(lit("DROP TABLE IF EXISTS `part_"), col("p_partkey"), lit("`")))
      Tables.part(s, d)
        .select(col("p_partkey"), ddl.as("mysql_ddl"))
        .withColumn("ansi_ddl", Dialect.toAnsi(lit("music"), col("mysql_ddl")))
        .orderBy("p_partkey")
    },
    Some("""
      WITH src AS (
        SELECT p_partkey,
               CASE
                 WHEN p_partkey % 3 = 0 THEN 'CREATE TABLE `part_' || p_partkey ||
                   '` (id INT, name LONGTEXT, price DOUBLE, created DATETIME, flag TINYINT(1), img LONGBLOB) ENGINE=InnoDB'
                 WHEN p_partkey % 3 = 1 THEN 'ALTER TABLE `part_' || p_partkey || '` ADD COLUMN price DOUBLE'
                 ELSE 'DROP TABLE IF EXISTS `part_' || p_partkey || '`'
               END AS mysql_ddl
        FROM part
      ), translated AS (
        SELECT p_partkey, mysql_ddl,
               regexp_replace(
                 regexp_replace(
                   regexp_replace(
                     regexp_replace(
                       regexp_replace(
                         regexp_replace(
                           regexp_replace(upper(mysql_ddl), '\bENGINE\s*=\s*\S+', '', 'g'),
                           '`', '', 'g'),
                         'TINYINT\(1\)', 'SMALLINT', 'g'),
                       'DOUBLE', 'FLOAT8', 'g'),
                     'DATETIME', 'TIMESTAMP', 'g'),
                   'LONGBLOB', 'BYTEA', 'g'),
                 'LONGTEXT', 'TEXT', 'g') AS step1
        FROM src
      )
      SELECT p_partkey, mysql_ddl,
             regexp_replace(step1,
               '((?:CREATE|DROP|ALTER)\s+TABLE(?:\s+IF EXISTS)?)\s+(\w+)',
               '\1 MUSIC.\2') AS ansi_ddl
      FROM translated
      ORDER BY p_partkey
    """.stripMargin.trim)
  )

  /** Undo stream — the reference's own roadmap item (`README.md:157`:
    * "Consider how an 'undo' would work, since we can reverse any
    * action"). Every event maps to its inverse (insert<->delete, update
    * stays update with prior values), emitted in reverse replay order.
    *
    * HOT-KEY GUARD (round 15): the per-key DESC rank funnels a hot key's
    * whole history through one task's sort, so above
    * [[graft.operators.Guards.singleSortCap]] rows/key this delegates to
    * [[graft.operators.ScalePatterns.cdcUndoDist]]'s bucketed-rank twin
    * (identical rows, same oracle). Same memoized "events_user" count. */
  val cdcUndo: QueryDef = QueryDef(
    "cdc_undo",
    (s, d) => {
      val hottest = graft.operators.Guards.maxGroupRows(s, d, "events_user") {
        ev(s, d).groupBy(col("user_id")).agg(count(lit(1)).as("n"))
          .agg(max(col("n"))).first().getLong(0)
      }
      if (hottest > graft.operators.Guards.singleSortCap(s))
        graft.operators.ScalePatterns.cdcUndoDist.fn(s, d)
      else ev(s, d)
        .select(
          col("event_id").as("undo_of"),
          col("user_id").as("pk"),
          opOf(col("event_type")).as("orig_op"),
          unix_micros(col("ts")).as("ts_us")
        )
        .withColumn(
          "undo_op",
          when(col("orig_op") === "insert", "delete")
            .when(col("orig_op") === "delete", "insert")
            .otherwise("update")
        )
        // BIGINT undo_seq on BOTH lanes (round 15, review): the dist
        // twin's bucketed rank is natively Long, and an Int cast there
        // reintroduced a 2^31 ceiling on exactly the over-cap keys the
        // twin exists for. DuckDB row_number is BIGINT already.
        .withColumn("undo_seq", row_number().over(
          Window.partitionBy(col("pk")).orderBy(col("ts_us").desc, col("undo_of").desc))
          .cast("long"))
        .orderBy("pk", "undo_seq")
    },
    oracle = Some(s"""
      SELECT undo_of, pk, orig_op, ts_us,
             CASE WHEN orig_op = 'insert' THEN 'delete'
                  WHEN orig_op = 'delete' THEN 'insert'
                  ELSE 'update' END AS undo_op,
             row_number() OVER (PARTITION BY pk ORDER BY ts_us DESC, undo_of DESC) AS undo_seq
      FROM (
        SELECT event_id AS undo_of, user_id AS pk,
               $opSql AS orig_op,
               epoch_us(ts) AS ts_us
        FROM events)
      ORDER BY pk, undo_seq
    """.stripMargin.trim)
  )

  /** Point-in-time replica: the state `process_events()` would have left if
    * replay had stopped at time T — what the reference's month-partitioned
    * event archive exists to make possible.
    *
    * HOT-KEY GUARD (round 15): same shape as [[cdcSnapshot]], same
    * delegation — [[graft.operators.ScalePatterns.cdcReplayAtDist]]'s
    * struct-max aggregate over the time-sliced archive. The guard reads
    * the UNSLICED "events_user" memo: an over-cap key in the full archive
    * may be under-cap inside the cutoff, but the agg twin is never worse
    * there, so the conservative stat costs nothing. */
  val cdcReplayAt: QueryDef = QueryDef(
    "cdc_replay_at",
    (s, d) => {
      val hottest = graft.operators.Guards.maxGroupRows(s, d, "events_user") {
        ev(s, d).groupBy(col("user_id")).agg(count(lit(1)).as("n"))
          .agg(max(col("n"))).first().getLong(0)
      }
      if (hottest > graft.operators.Guards.singleSortCap(s))
        graft.operators.ScalePatterns.cdcReplayAtDist.fn(s, d)
      else {
      val cutoff = lit("2024-01-15 00:00:00")
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts").desc, col("event_id").desc)
      ev(s, d)
        .filter(col("ts") <= cutoff)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1 && opOf(col("event_type")) =!= "delete")
        .select(
          col("user_id"),
          col("event_id").as("last_event_id"),
          opOf(col("event_type")).as("last_op"),
          unix_micros(col("ts")).as("last_ts_us"),
          round(col("value"), 2).as("last_value")
        )
        .orderBy("user_id")
      }
    },
    Some(s"""
      SELECT user_id, event_id AS last_event_id,
             $opSql AS last_op,
             epoch_us(ts) AS last_ts_us,
             round(value, 2) AS last_value
      FROM (
        SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
        WHERE ts <= TIMESTAMP '2024-01-15 00:00:00')
      WHERE rn = 1 AND event_type <> 'error'
      ORDER BY user_id
    """.stripMargin.trim)
  )

  /** Replication-staleness monitor: per key, how far behind the newest
    * event in the archive its last change is — the operational view the
    * reference keeps via the `maxwell_ts` watermark table
    * (`maxwell_gpdb.sql:34-36`). Deterministic: measured against the
    * archive's own max timestamp, not wall clock. */
  val cdcStaleness: QueryDef = QueryDef(
    "cdc_staleness",
    (s, d) => {
      val e = ev(s, d)
      val frontier = e.agg(max(unix_micros(col("ts"))).as("frontier_us"))
      e.groupBy(col("user_id"))
        .agg(max(unix_micros(col("ts"))).as("last_us"), count(lit(1)).as("n_events"))
        .crossJoin(broadcast(frontier))
        .select(
          col("user_id"),
          col("last_us"),
          (col("frontier_us") - col("last_us")).as("staleness_us"),
          col("n_events")
        )
        .orderBy("user_id")
    },
    Some("""
      SELECT user_id, last_us,
             (SELECT max(epoch_us(ts)) FROM events) - last_us AS staleness_us,
             n_events
      FROM (SELECT user_id, max(epoch_us(ts)) AS last_us, count(*) AS n_events
            FROM events GROUP BY user_id)
      ORDER BY user_id
    """.stripMargin.trim)
  )

  /** MERGE a stored replica (cdc_snapshot shape) with events newer than the
    * watermark: both sides become changelog rows, rank-1 per key wins,
    * tombstones vanish. The algebra that makes `prior ⊕ increment ≡ full
    * recompute`: a live prior row re-enters the race at its own
    * (ts, event_id); a key tombstoned in the prior range is simply absent
    * and can only be re-created by newer events — exactly the reference's
    * `process_events()` restart-from-`maxwell_ts` behavior. */
  def incrementalReplica(prior: DataFrame, newEvents: DataFrame): DataFrame = {
    val priorLog = prior.select(
      col("user_id"),
      col("last_event_id").as("event_id"),
      col("last_op").as("op"),
      col("last_ts_us").as("ts_us"),
      col("last_value").as("value"))
    val newLog = newEvents.select(
      col("user_id"),
      col("event_id"),
      opOf(col("event_type")).as("op"),
      unix_micros(col("ts")).as("ts_us"),
      round(col("value"), 2).as("value"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us").desc, col("event_id").desc)
    priorLog.unionByName(newLog)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 && col("op") =!= "delete")
      .select(
        col("user_id"),
        col("event_id").as("last_event_id"),
        col("op").as("last_op"),
        col("ts_us").as("last_ts_us"),
        col("value").as("last_value"))
      .orderBy("user_id")
  }

  /** The reference's PERIODIC batch loop (`cdc_periodic_load.sql`,
    * `maxwell_gpdb.sql:34-36`): process only events newer than the stored
    * `maxwell_ts` watermark against a month-partitioned archive. The
    * `event_month >= month(watermark)` predicate is a PARTITION filter —
    * the scan prunes every older month directory (asserted in CdcSpec) —
    * and the fine-grained `ts > watermark` filter lands on the survivors.
    * At 100 TB of archive this reads only the current month(s), which is
    * the entire point of the reference's range partitioning. */
  def incrementalLoad(spark: SparkSession, archiveDir: String,
      priorReplica: DataFrame, watermarkUs: Long): DataFrame = {
    val newEvents = spark.read.parquet(archiveDir)
      .filter(col("event_month") >=
        date_format(timestamp_micros(lit(watermarkUs)), "yyyy-MM"))
      .filter(unix_micros(col("ts")) > watermarkUs)
    incrementalReplica(priorReplica, newEvents)
  }

  /** Oracle-gated demonstration that the incremental merge is exact: build
    * the "stored replica" from events up to a watermark (frontier − 30
    * days), apply only newer events via [[incrementalReplica]], and the
    * result must hash-match the full-recompute snapshot SQL. */
  val cdcIncremental: QueryDef = QueryDef(
    "cdc_incremental",
    (s, d) => {
      val e = ev(s, d)
      val wm = broadcast(e.agg(
        (max(unix_micros(col("ts"))) - lit(30L * 24 * 3600 * 1000000L)).as("wm_us")))
      val withWm = e.crossJoin(wm)
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts").desc, col("event_id").desc)
      val prior = withWm.filter(unix_micros(col("ts")) <= col("wm_us"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1 && opOf(col("event_type")) =!= "delete")
        .select(
          col("user_id"),
          col("event_id").as("last_event_id"),
          opOf(col("event_type")).as("last_op"),
          unix_micros(col("ts")).as("last_ts_us"),
          round(col("value"), 2).as("last_value"))
      val increment = withWm.filter(unix_micros(col("ts")) > col("wm_us"))
      incrementalReplica(prior, increment)
    },
    // The oracle is the FULL recompute — incremental must be indistinguishable.
    Some(s"""
      SELECT user_id, event_id AS last_event_id,
             $opSql AS last_op,
             epoch_us(ts) AS last_ts_us,
             round(value, 2) AS last_value
      FROM (
        SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        FROM events)
      WHERE rn = 1 AND event_type <> 'error'
      ORDER BY user_id
    """.stripMargin.trim)
  )

  /** Per-key lifecycle audit over the changelog: op mix, resurrection
    * count (a DELETE later followed by an INSERT for the same pk — the
    * anomaly class the reference's PK-matched replay can silently mask),
    * and the key's final op. Both windows (the lag and the last-op rank)
    * share the one user_id exchange; the aggregate rides the same
    * partitioning, so the whole diagnostic is a single shuffle at any
    * scale. */
  val cdcKeyLifecycle: QueryDef = QueryDef(
    "cdc_key_lifecycle",
    (s, d) => {
      val wAsc = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val wDesc = Window.partitionBy(col("user_id")).orderBy(col("ts").desc, col("event_id").desc)
      ev(s, d)
        .select(col("user_id"), col("ts"), col("event_id"), opOf(col("event_type")).as("op"))
        .withColumn("prev_op", lag(col("op"), 1).over(wAsc))
        .withColumn("rn_desc", row_number().over(wDesc))
        .groupBy(col("user_id"))
        .agg(
          count(lit(1)).as("n_ops"),
          sum((col("op") === "insert").cast("long")).as("n_inserts"),
          sum((col("op") === "update").cast("long")).as("n_updates"),
          sum((col("op") === "delete").cast("long")).as("n_deletes"),
          sum((col("prev_op") === "delete" && col("op") === "insert").cast("long"))
            .as("n_resurrections"),
          max(when(col("rn_desc") === 1, col("op"))).as("last_op"))
        .orderBy("user_id")
    },
    Some(s"""
      WITH c AS (
        SELECT user_id, event_id, ts, $opSql AS op FROM events
      ), o AS (
        SELECT user_id, op,
               lag(op) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_op,
               row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn_desc
        FROM c
      )
      SELECT user_id, count(*) AS n_ops,
             sum(CASE WHEN op = 'insert' THEN 1 ELSE 0 END)::BIGINT AS n_inserts,
             sum(CASE WHEN op = 'update' THEN 1 ELSE 0 END)::BIGINT AS n_updates,
             sum(CASE WHEN op = 'delete' THEN 1 ELSE 0 END)::BIGINT AS n_deletes,
             sum(CASE WHEN prev_op = 'delete' AND op = 'insert' THEN 1 ELSE 0 END)::BIGINT AS n_resurrections,
             max(CASE WHEN rn_desc = 1 THEN op END) AS last_op
      FROM o
      GROUP BY user_id
      ORDER BY user_id
    """.stripMargin.trim)
  )

  /** Out-of-order delivery audit: per key, events whose event_id (the
    * source sequence) runs BACKWARD relative to replay order (ts,
    * event_id) — the exact condition under which naive "apply in arrival
    * order" and the reference's `ORDER BY ts ASC` replay diverge, and why
    * the streaming path re-sorts each micro-batch by (ts, seq). A row is
    * late iff some earlier-replayed row of the same key carries a LARGER
    * event_id (running max over the preceding frame). One user_id
    * exchange shared by the window and the aggregate.
    *
    * HOT-KEY GUARD (round 12; the q_ntile pattern): a per-user ordered
    * window is irreducibly sequential per key, so one user holding
    * more than [[graft.operators.Guards.SingleSortCap]] rows becomes a
    * straggler task (GenSkew measurements: 1M-row hot user → plain
    * 10.9 s still beats the twin's 12.2; 5M-row → 32.3 vs 24.1 and a
    * 6.7× degradation from unskewed). Above the cap this lane DELEGATES
    * to [[graft.operators.ScalePatterns.qLateArrivalsDist]]'s two-phase
    * prefix scan — IDENTICAL output, same oracle SQL (spec-proven
    * row-identity on an 80%-hot frame) — so the user no longer has to
    * know to pick the `_dist` twin by hand. The guard's max-rows-per-key
    * count job is memoized per (session, dir) in [[graft.operators.Guards]]. */
  val cdcLateArrivals: QueryDef = QueryDef(
    "cdc_late_arrivals",
    (s, d) => {
      val hottest = graft.operators.Guards.maxGroupRows(s, d, "events_user") {
        ev(s, d).groupBy(col("user_id")).agg(count(lit(1)).as("n"))
          .agg(max(col("n"))).first().getLong(0)
      }
      if (hottest > graft.operators.Guards.singleSortCap(s))
        graft.operators.ScalePatterns.qLateArrivalsDist.fn(s, d)
      else {
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, -1)
        ev(s, d)
          .withColumn("prev_max_id", max(col("event_id")).over(w))
          .groupBy(col("user_id"))
          .agg(
            count(lit(1)).as("n_events"),
            sum(when(col("prev_max_id") > col("event_id"), 1L).otherwise(0L)).as("n_late"),
            max(when(col("prev_max_id") > col("event_id"), col("prev_max_id") - col("event_id"))).as("worst_inversion"))
          .orderBy("user_id")
      }
    },
    Some("""
      SELECT user_id, count(*) AS n_events,
             sum(CASE WHEN prev_max_id > event_id THEN 1 ELSE 0 END)::BIGINT AS n_late,
             max(CASE WHEN prev_max_id > event_id THEN prev_max_id - event_id END) AS worst_inversion
      FROM (
        SELECT user_id, event_id,
               max(event_id) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max_id
        FROM events)
      GROUP BY user_id
      ORDER BY user_id
    """.stripMargin.trim)
  )

  /** COMPOSITE-primary-key replica: latest state per (user_id, prop_k) —
    * row identity is the TUPLE, matching on every PK column at once. The
    * reference's `get_pk_cols` returns a SET and the apply WHERE is meant
    * to AND all of them (cdc_plpgsql_functions.sql:80-99,148-155; its loop
    * actually overwrites `pk_clause`, keeping only the last column — we
    * implement the intended semantics, as the streaming path does via
    * MaxwellStream.encodePk). Same single composite-key exchange as
    * cdc_snapshot: one window over (user_id, prop_k) — keying on user_id
    * alone would collapse each user's per-k rows into one colliding state. */
  val cdcSnapshotComposite: QueryDef = QueryDef(
    "cdc_snapshot_composite",
    (s, d) => {
      val w = Window.partitionBy(col("user_id"), col("prop_k"))
        .orderBy(col("ts").desc, col("event_id").desc)
      ev(s, d)
        // project BEFORE the window: the exchange must carry the extracted
        // key, never the raw props JSON blob it came from
        .select(col("user_id"), col("event_id"), col("event_type"), col("ts"), col("value"),
          Tables.propsK.cast("int").as("prop_k"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1 && opOf(col("event_type")) =!= "delete")
        .select(
          col("user_id"),
          col("prop_k"),
          col("event_id").as("last_event_id"),
          opOf(col("event_type")).as("last_op"),
          unix_micros(col("ts")).as("last_ts_us"),
          round(col("value"), 2).as("last_value")
        )
        .orderBy("user_id", "prop_k")
    },
    Some(s"""
      SELECT user_id, prop_k, event_id AS last_event_id,
             $opSql AS last_op,
             epoch_us(ts) AS last_ts_us,
             round(value, 2) AS last_value
      FROM (
        SELECT *, json_extract_string(props, '$$.k')::INT AS prop_k,
               row_number() OVER (PARTITION BY user_id, json_extract_string(props, '$$.k')::INT
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events)
      WHERE rn = 1 AND event_type <> 'error'
      ORDER BY user_id, prop_k
    """.stripMargin.trim)
  )

  /** Multi-source changelog merge — the reference runs a LIVE pipeline
    * (Maxwell → Kafka → gpdb) beside PERIODIC batch loads of the same
    * tables (`/root/reference/cdc_periodic_load.sql`,
    * `demo/04_mysql_traffic.sh`); when both lanes carry the same key the
    * replica must resolve to one truth. Model: even event_ids are the
    * "stream" lane, odd the "backfill" lane; the winner per key is the
    * last writer across the UNION in (ts, event_id) order — the same
    * total order every replay op here uses — with per-lane counts and a
    * conflict flag (both lanes touched the key) for reconciliation
    * audits.
    *
    * Scale: ONE user_id exchange; the ranking window and both lane
    * counters are window functions over that same partitioning (no
    * join-back, no second exchange before the output sort). */
  val cdcMergeSources: QueryDef = QueryDef(
    "cdc_merge_sources",
    (s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts").desc, col("event_id").desc)
      val wAll = Window.partitionBy(col("user_id"))
      ev(s, d)
        .withColumn("source", when(col("event_id") % 2 === 0, "stream").otherwise("backfill"))
        .select(col("user_id"), col("source"), col("ts"), col("event_id"), col("value"),
          row_number().over(w).as("rn"),
          sum(when(col("source") === "stream", 1L).otherwise(0L)).over(wAll).as("n_stream"),
          sum(when(col("source") === "backfill", 1L).otherwise(0L)).over(wAll).as("n_backfill"))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("source").as("winner_source"),
          round(col("value"), 2).as("final_value"),
          unix_micros(col("ts")).as("last_ts_us"),
          col("n_stream"), col("n_backfill"),
          (col("n_stream") > 0 && col("n_backfill") > 0).as("conflict"))
        .orderBy("user_id")
    },
    Some("""
      WITH t AS (
        SELECT *, CASE WHEN event_id % 2 = 0 THEN 'stream' ELSE 'backfill' END AS source
        FROM events
      ), r AS (
        SELECT *,
               row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn,
               sum(CASE WHEN source = 'stream' THEN 1 ELSE 0 END)
                 OVER (PARTITION BY user_id) AS n_stream,
               sum(CASE WHEN source = 'backfill' THEN 1 ELSE 0 END)
                 OVER (PARTITION BY user_id) AS n_backfill
        FROM t
      )
      SELECT user_id, source AS winner_source, round(value, 2) AS final_value,
             epoch_us(ts) AS last_ts_us, n_stream::BIGINT AS n_stream,
             n_backfill::BIGINT AS n_backfill,
             (n_stream > 0 AND n_backfill > 0) AS conflict
      FROM r
      WHERE rn = 1
      ORDER BY user_id
    """.stripMargin.trim)
  )

  /** Purge audit — the compliance lane a CDC archive needs: (a) ERASURE:
    * a key whose stream carries a delete tombstone must have its ENTIRE
    * event history purged from the archive (the reference only stops
    * replicating the row — `process_events` applies the DELETE and moves
    * on, the month-partitioned `maxwell_event` archive keeps the full
    * history forever, `maxwell_gpdb.sql:25-31`); erasure requests arrive
    * OUT OF BAND (a forget-list), not as stream tombstones; (b)
    * RETENTION: events
    * older than the retention horizon (21 days before the stream
    * frontier) purge regardless. The audit reports, per affected key, the
    * reason ('erasure' dominates), how many events go, and the
    * aggregate-then-forget value total that may be retained anonymously
    * after the rows are gone.
    *
    * Scale: frontier is a 1-row broadcast (the cdc_incremental pattern);
    * the erased-key set broadcasts; ONE user_id exchange aggregates the
    * audit. */
  val cdcPurgeAudit: QueryDef = QueryDef(
    "cdc_purge_audit",
    (s, d) => {
      val horizonUs = 21L * 86400000000L
      val frontier = ev(s, d).agg(max(unix_micros(col("ts"))).as("f"))
      // The forget-list is an EXTERNAL input in real systems (erasure
      // requests arrive out of band, not in the stream); stand-in: every
      // 20th key filed one. Every key here has delete EVENTS (row deletes,
      // not account erasure), so keying on tombstones would purge everyone.
      val erased = ev(s, d).filter(col("user_id") % 20 === 0)
        .select(col("user_id")).distinct().withColumn("er", lit(1))
      ev(s, d)
        .select(col("user_id"), unix_micros(col("ts")).as("us"),
          round(col("value") * 100).cast("long").as("cents"))
        .join(broadcast(frontier))
        // the erasure registry scales with the user population (a 5% slice
        // here) — no broadcast hint; AQE decides at runtime.
        .join(erased, Seq("user_id"), "left")
        .filter(col("er").isNotNull || col("us") < col("f") - horizonUs)
        .groupBy(col("user_id"))
        .agg(
          max(coalesce(col("er"), lit(0))).as("erflag"),
          count(lit(1)).as("n_purged"),
          sum(col("cents")).as("cents_forgotten"))
        .select(col("user_id"),
          when(col("erflag") === 1, "erasure").otherwise("retention").as("purge_reason"),
          col("n_purged"), col("cents_forgotten"))
        .orderBy("user_id")
    },
    Some("""
      WITH f AS (SELECT max(epoch_us(ts)) AS f FROM events),
      er AS (SELECT DISTINCT user_id FROM events WHERE user_id % 20 = 0),
      c AS (
        SELECT e.user_id, epoch_us(e.ts) AS us,
               CAST(round(e.value * 100) AS BIGINT) AS cents,
               (er.user_id IS NOT NULL) AS erased
        FROM events e CROSS JOIN f LEFT JOIN er ON e.user_id = er.user_id
        WHERE er.user_id IS NOT NULL OR epoch_us(e.ts) < f - 21 * 86400000000
      )
      SELECT user_id,
             CASE WHEN bool_or(erased) THEN 'erasure' ELSE 'retention' END AS purge_reason,
             count(*) AS n_purged,
             sum(cents)::BIGINT AS cents_forgotten
      FROM c
      GROUP BY user_id
      ORDER BY user_id
    """.stripMargin.trim)
  )

  /** Bucketed replica checksums — the pt-table-checksum reconciliation
    * role: source and replica each compute per-bucket order-independent
    * digests of final state and compare 16 rows instead of every key;
    * a diverged bucket pinpoints where row-level repair
    * (`cdc_snapshot` on that bucket) must run. Digest: md5 of the
    * canonical state string → 60-bit int (the md5Bucket parity trick —
    * `conv(hex)` on Spark ≡ `('0x'||…)::BIGINT` on DuckDB) reduced
    * mod 2³¹, SUMMED per bucket — addition is order-independent, and
    * 31-bit terms keep the Long sum exact to ~4×10⁹ rows per bucket (the
    * documented DECIMAL(38) swap beyond).
    *
    * Scale: the snapshot's ONE pk exchange plus a 16-row aggregate. */
  val cdcReplicaChecksum: QueryDef = QueryDef(
    "cdc_replica_checksum",
    (s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts").desc, col("event_id").desc)
      val state = ev(s, d)
        .select(col("user_id"), col("event_id"), col("event_type"), col("ts"),
          round(col("value") * 100).cast("long").as("cents"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1 && opOf(col("event_type")) =!= "delete")
        .select(col("user_id"), col("event_id"), col("cents"))
      state
        .withColumn("h",
          pmod(conv(substring(md5(concat_ws("|",
            col("user_id"), col("event_id"), col("cents"))), 1, 15), 16, 10)
            .cast("long"), lit(2147483648L)))
        .groupBy(pmod(col("user_id"), lit(16)).cast("int").as("bucket"))
        .agg(count(lit(1)).as("n_keys"), sum(col("h")).as("checksum"))
        .orderBy("bucket")
    },
    Some("""
      WITH snap AS (
        SELECT user_id, event_id, CAST(round(value * 100) AS BIGINT) AS cents
        FROM (
          SELECT *, row_number() OVER (PARTITION BY user_id
                                       ORDER BY ts DESC, event_id DESC) AS rn
          FROM events)
        WHERE rn = 1 AND event_type <> 'error'
      )
      SELECT CAST(user_id % 16 AS INT) AS bucket, count(*) AS n_keys,
             sum(('0x' || substr(md5(user_id || '|' || event_id || '|' || cents), 1, 15))::BIGINT
                 % 2147483648)::BIGINT AS checksum
      FROM snap
      GROUP BY bucket
      ORDER BY bucket
    """.stripMargin.trim)
  )

  /** Targeted replica repair — the second half of the pt-table-checksum
    * story [[cdcReplicaChecksum]] starts: given a stale replica (state as
    * of the [[cdcReplayAt]] cutoff) and the current source state, compare
    * ONLY the 16 bucket digests, and emit row-level repair actions
    * (upsert/delete with the fresh payload) for keys in DIVERGED buckets
    * alone — the partition-scoped fix, never a full re-sync.
    *
    * Scale: BOTH snapshots ride one user_id exchange (the stale head is a
    * rank-1 window whose sort simply orders pre-cutoff rows first), the
    * per-key head pairs collapse to one row each (reusing that exchange),
    * digests are a 16-row aggregate, and the diverged-bucket list
    * broadcasts back over the cached per-key frame (O(keys) — the same
    * frame a real repairer would scan; two consumers, so cached per the
    * typed-subtree rule). Digest arithmetic identical to
    * cdc_replica_checksum (md5 → 60-bit → mod 2³¹, summed). */
  val cdcBucketRepair: QueryDef = QueryDef(
    "cdc_bucket_repair",
    (s, d) => {
      val cutoff = lit("2024-01-15 00:00:00")
      val wNow = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").desc, col("event_id").desc)
      val wOld = Window.partitionBy(col("user_id"))
        .orderBy((col("ts") <= cutoff).desc, col("ts").desc, col("event_id").desc)
      val heads = ev(s, d)
        .select(col("user_id"), col("event_id"), col("event_type"), col("ts"),
          round(col("value") * 100).cast("long").as("cents"))
        .withColumn("rn_now", row_number().over(wNow))
        .withColumn("rn_old", row_number().over(wOld))
        .withColumn("now_live",
          col("rn_now") === 1 && opOf(col("event_type")) =!= "delete")
        .withColumn("old_live",
          col("rn_old") === 1 && col("ts") <= cutoff &&
            opOf(col("event_type")) =!= "delete")
        .filter(col("now_live") || col("old_live"))
      val perUser = heads
        .groupBy(col("user_id"))
        .agg(
          max(when(col("now_live"), struct(col("event_id"), col("cents")))).as("nowS"),
          max(when(col("old_live"), struct(col("event_id"), col("cents")))).as("oldS"))
        .withColumn("bucket", pmod(col("user_id"), lit(16)).cast("int"))
        .cache()
      def dig(c: Column): Column = sum(when(c.isNotNull,
        pmod(conv(substring(md5(concat_ws("|",
          col("user_id"), c.getField("event_id"), c.getField("cents"))), 1, 15), 16, 10)
          .cast("long"), lit(2147483648L))).otherwise(0L))
      val diverged = perUser
        .groupBy(col("bucket"))
        .agg(dig(col("nowS")).as("d_now"), dig(col("oldS")).as("d_old"),
          count(col("nowS")).as("k_now"), count(col("oldS")).as("k_old"))
        .filter(col("d_now") =!= col("d_old") || col("k_now") =!= col("k_old"))
        .select(col("bucket"))
      perUser
        .join(broadcast(diverged), Seq("bucket"))
        .filter(!(col("nowS") <=> col("oldS")))
        .select(col("bucket"), col("user_id"),
          when(col("nowS").isNull, "delete").otherwise("upsert").as("action"),
          col("nowS").getField("event_id").as("event_id"),
          col("nowS").getField("cents").as("cents"))
        .orderBy("bucket", "user_id")
    },
    Some("""
      WITH e AS (
        SELECT user_id, event_id, event_type, ts,
               CAST(round(value * 100) AS BIGINT) AS cents
        FROM events
      ), r AS (
        SELECT *,
          row_number() OVER (PARTITION BY user_id
                             ORDER BY ts DESC, event_id DESC) AS rn_now,
          row_number() OVER (PARTITION BY user_id
                             ORDER BY (ts <= TIMESTAMP '2024-01-15 00:00:00') DESC,
                                      ts DESC, event_id DESC) AS rn_old
        FROM e
      ), h AS (
        SELECT *,
               (rn_now = 1 AND event_type <> 'error') AS now_live,
               (rn_old = 1 AND ts <= TIMESTAMP '2024-01-15 00:00:00'
                AND event_type <> 'error') AS old_live
        FROM r
        WHERE (rn_now = 1 AND event_type <> 'error')
           OR (rn_old = 1 AND ts <= TIMESTAMP '2024-01-15 00:00:00'
               AND event_type <> 'error')
      ), p AS (
        SELECT user_id, CAST(user_id % 16 AS INT) AS bucket,
               max(CASE WHEN now_live THEN event_id END) AS now_eid,
               max(CASE WHEN now_live THEN cents END) AS now_cents,
               bool_or(now_live) AS has_now,
               max(CASE WHEN old_live THEN event_id END) AS old_eid,
               max(CASE WHEN old_live THEN cents END) AS old_cents,
               bool_or(old_live) AS has_old
        FROM h GROUP BY user_id
      ), dg AS (
        SELECT bucket,
               sum(CASE WHEN has_now THEN ('0x' || substr(md5(user_id || '|' || now_eid || '|' || now_cents), 1, 15))::BIGINT % 2147483648 ELSE 0 END)::BIGINT AS d_now,
               sum(CASE WHEN has_old THEN ('0x' || substr(md5(user_id || '|' || old_eid || '|' || old_cents), 1, 15))::BIGINT % 2147483648 ELSE 0 END)::BIGINT AS d_old,
               count(CASE WHEN has_now THEN 1 END) AS k_now,
               count(CASE WHEN has_old THEN 1 END) AS k_old
        FROM p GROUP BY bucket
      ), div AS (
        SELECT bucket FROM dg WHERE d_now <> d_old OR k_now <> k_old
      )
      SELECT p.bucket, user_id,
             CASE WHEN NOT has_now THEN 'delete' ELSE 'upsert' END AS action,
             CASE WHEN has_now THEN now_eid END AS event_id,
             CASE WHEN has_now THEN now_cents END AS cents
      FROM p JOIN div ON p.bucket = div.bucket
      WHERE has_now <> has_old
         OR now_eid IS DISTINCT FROM old_eid
         OR now_cents IS DISTINCT FROM old_cents
      ORDER BY p.bucket, user_id
    """.stripMargin.trim)
  )

  val all: Seq[QueryDef] = Seq(
    cdcParse, cdcChangelog, cdcArchiveStats, cdcSnapshot, cdcSnapshotMerge,
    cdcScd2, cdcOpCounts, cdcDedupEvents, translateDdl, cdcUndo, cdcReplayAt,
    cdcStaleness, cdcIncremental, cdcKeyLifecycle, cdcLateArrivals,
    cdcSnapshotComposite, cdcMergeSources, cdcPurgeAudit, cdcReplicaChecksum,
    cdcBucketRepair
  )
}
