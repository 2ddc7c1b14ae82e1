package graft.operators

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge

import graft.{QueryDef, Tables}
import graft.functions.Sketches
import graft.plans.BloomMightContain

/** Round-3 analytics surface: grouping sets, histograms, cohort retention,
  * modal statistics, sliding frames, multi-distinct expansion, an explicit
  * runtime bloom join filter, and Misra–Gries heavy hitters — the remaining
  * reporting/diagnostic query shapes the reference's Greenplum warehouse
  * serves (cdc_plpgsql_functions.sql builds the replica these run over).
  */
object Advanced {

  /** Explicit GROUPING SETS: detail, per-returnflag subtotal, grand total in
    * one pass. Spark expands to one Expand node feeding a single hash
    * aggregate — 3 grouping sets cost one shuffle, not three scans.
    * Base columns are never NULL, so `coalesce(_, 'ALL')` labels subtotal
    * rows unambiguously (and keeps the ORDER BY NULL-free on both engines).
    *
    * EXACT accumulation as LONG CENTS (round 16; was decimal(18,2) since
    * r10 when the grand-total double sum crossed a 2 dp rounding boundary
    * at sf1): both measures are 2-dp sources, so `round(x·100)::long` is
    * lossless, the integer sum is exact, and ONE cast-to-double + /100.0
    * at the end reproduces the decimal form bit for bit — while the hot
    * 3× Expand stream sums primitive longs instead of Decimal objects
    * (the repo's worst covered-set ratio, 27.5× DuckDB at sf10, was this
    * lane's decimal agg). Headroom: Σcents ≤ ~6e14 at sf10 extendedprice,
    * ~6e16 at 100× — far under 2⁶³; the double conversion of the exact
    * integer sum is the same single rounding both engines perform. */
  val qGroupingSets: QueryDef = QueryDef(
    "q_grouping_sets",
    (s, d) =>
      Tables.lineitem(s, d)
        .select(col("l_returnflag"), col("l_linestatus"),
          round(col("l_quantity") * 100).cast("long").as("qty_c"),
          round(col("l_extendedprice") * 100).cast("long").as("price_c"))
        .groupingSets(
          Seq(Seq(col("l_returnflag"), col("l_linestatus")), Seq(col("l_returnflag")), Seq()),
          col("l_returnflag"), col("l_linestatus"))
        .agg(
          count(lit(1)).as("n_rows"),
          round(sum(col("qty_c")).cast("double") / 100.0, 2).as("sum_qty"),
          round(sum(col("price_c")).cast("double") / 100.0, 2).as("sum_price"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
          col("n_rows"), col("sum_qty"), col("sum_price"))
        .orderBy("returnflag", "linestatus"),
    Some("""
      SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
             coalesce(l_linestatus, 'ALL') AS linestatus,
             count(*) AS n_rows,
             round(CAST(sum(round(l_quantity * 100)::BIGINT)::BIGINT AS DOUBLE) / 100.0, 2) AS sum_qty,
             round(CAST(sum(round(l_extendedprice * 100)::BIGINT)::BIGINT AS DOUBLE) / 100.0, 2) AS sum_price
      FROM lineitem
      GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
      ORDER BY returnflag, linestatus
    """.stripMargin.trim)
  )

  /** Fixed-width value histogram (the width_bucket shape): one partial-agg
    * shuffle keyed by ≤10 buckets; the bucket id is a narrow codegen'd
    * expression so the scan stays whole-stage. */
  val qHistogram: QueryDef = QueryDef(
    "q_histogram",
    (s, d) =>
      Tables.orders(s, d)
        .groupBy(least(floor(col("o_totalprice") / 50000), lit(9)).cast("long").as("bucket"))
        .agg(
          count(lit(1)).as("n_orders"),
          round(sum(col("o_totalprice")), 2).as("sum_price"),
          round(avg(col("o_totalprice")), 2).as("avg_price"))
        .orderBy("bucket"),
    Some("""
      SELECT least(floor(o_totalprice / 50000), 9)::BIGINT AS bucket,
             count(*) AS n_orders,
             round(sum(o_totalprice), 2) AS sum_price,
             round(avg(o_totalprice), 2) AS avg_price
      FROM orders
      GROUP BY 1
      ORDER BY bucket
    """.stripMargin.trim)
  )

  /** Weekly cohort retention: users grouped by first-seen week, activity
    * counted per (cohort, weeks-since). The first-seen week is a whole-
    * partition window `min` over user_id — the same shuffle a groupBy
    * would cost, but with NO join and NO broadcast: first-seen is one row
    * per distinct user (O(users), corpus-scaled), so broadcasting it back
    * would blow the driver/8 GB broadcast cap at 100 TB. After the window,
    * only the tiny (cohort, week_no) aggregate key shuffles. */
  val qRetentionCohort: QueryDef = QueryDef(
    "q_retention_cohort",
    (s, d) => {
      val ev = Tables.events(s, d)
        .select(col("user_id"), date_trunc("week", col("ts")).as("week"))
      val withCohort = ev.withColumn(
        "cohort_week", min(col("week")).over(Window.partitionBy(col("user_id"))))
      withCohort
        .groupBy(col("cohort_week"), expr("datediff(week, cohort_week) div 7").as("week_no"))
        .agg(countDistinct(col("user_id")).as("n_active"))
        .select(
          date_format(col("cohort_week"), "yyyy-MM-dd").as("cohort"),
          col("week_no"), col("n_active"))
        .orderBy("cohort", "week_no")
    },
    Some("""
      WITH ev AS (SELECT user_id, date_trunc('week', ts) AS week FROM events),
           fw AS (SELECT user_id, min(week) AS cohort_week FROM ev GROUP BY 1)
      SELECT strftime(cohort_week, '%Y-%m-%d') AS cohort,
             date_diff('day', cohort_week, week) // 7 AS week_no,
             count(DISTINCT ev.user_id) AS n_active
      FROM ev JOIN fw ON ev.user_id = fw.user_id
      GROUP BY cohort_week, week_no
      ORDER BY cohort, week_no
    """.stripMargin.trim)
  )

  /** Modal hour-of-day per event type (mode over a derived dimension):
    * aggregate first (5×24 rows), then a rank-1 window over the tiny
    * aggregate — the window never touches fact-table cardinality. */
  val qModeHour: QueryDef = QueryDef(
    "q_mode_hour",
    (s, d) => {
      val counts = Tables.events(s, d)
        .groupBy(col("event_type"), hour(col("ts")).as("hr"))
        .agg(count(lit(1)).as("n"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("n").desc, col("hr"))
      counts
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("event_type"), col("hr"), col("n"))
        .orderBy("event_type")
    },
    Some("""
      WITH c AS (SELECT event_type, hour(ts) AS hr, count(*) AS n FROM events GROUP BY 1, 2)
      SELECT event_type, hr, n
      FROM (SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY n DESC, hr) AS rn FROM c)
      WHERE rn = 1
      ORDER BY event_type
    """.stripMargin.trim)
  )

  /** 7-event sliding average per user (ROWS frame — the row-count cousin of
    * q_range_frame's value-based RANGE frame). One shuffle on user_id,
    * frame evaluation is streaming within each sorted partition. */
  val qMovingAvg: QueryDef = QueryDef(
    "q_moving_avg",
    (s, d) => {
      // HOT-KEY GUARD (round 15): the bounded frame is O(n) but still
      // sorts a hot key on one task; above Guards.singleSortCap rows/key
      // delegate to ScalePatterns.qMovingAvgDist's rank scatter-gather
      // (identical rows, same oracle). Same memoized "events_user" count.
      val hottest = Guards.maxGroupRows(s, d, "events_user") {
        Tables.events(s, d).groupBy(col("user_id")).agg(count(lit(1)).as("n"))
          .agg(max(col("n"))).first().getLong(0)
      }
      if (hottest > Guards.singleSortCap(s)) ScalePatterns.qMovingAvgDist.fn(s, d)
      else {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        .rowsBetween(-6, Window.currentRow)
      // Exact-arithmetic frame mean: sliding float sums associate
      // differently across engines (DuckDB segment tree vs Spark's running
      // frame) and exact .0005 quotients (e.g. 12939¢/4) round differently
      // under HALF_UP vs binary-double views. So: sum exact integer cents
      // (values are 2-decimal), integer-divide to milli-units, and present
      // as a 3-decimal double. Integer division agrees on negatives too:
      // BOTH Spark `div` and DuckDB integer `//` truncate toward zero
      // (verified empirically, -7/2 = -3 on each), so the quotient is
      // bit-identical whatever the sign of the cents sum.
      Tables.events(s, d)
        .select(col("user_id"), col("event_id"),
          sum(round(col("value") * 100).cast("long")).over(w).as("cents"),
          count(lit(1)).over(w).as("cnt"))
        .select(col("user_id"), col("event_id"),
          (expr("(10 * cents) div cnt") / 1000.0).as("avg7"))
        .orderBy("user_id", "event_id")
      }
    },
    Some("""
      SELECT user_id, event_id,
             ((10 * sum(CAST(round(value * 100) AS BIGINT)) OVER w) //
              count(*) OVER w) / 1000.0 AS avg7
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
      ORDER BY user_id, event_id
    """.stripMargin.trim)
  )

  /** Several filtered DISTINCT aggregates in one pass — Spark compiles the
    * mixed-distinct agg into a single Expand + two-stage aggregate, so the
    * fact table is still read and shuffled once (not once per distinct). */
  val qMultiDistinct: QueryDef = QueryDef(
    "q_multi_distinct",
    (s, d) =>
      Tables.events(s, d)
        .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"))
        .agg(
          countDistinct(col("user_id")).as("n_users"),
          countDistinct(when(col("event_type") === "purchase", col("user_id"))).as("n_purchasers"),
          countDistinct(when(col("event_type") === "click", col("user_id"))).as("n_clickers"),
          count(lit(1)).as("n_events"))
        .orderBy("day"),
    Some("""
      SELECT strftime(ts, '%Y-%m-%d') AS day,
             count(DISTINCT user_id) AS n_users,
             count(DISTINCT CASE WHEN event_type = 'purchase' THEN user_id END) AS n_purchasers,
             count(DISTINCT CASE WHEN event_type = 'click' THEN user_id END) AS n_clickers,
             count(*) AS n_events
      FROM events
      GROUP BY 1
      ORDER BY day
    """.stripMargin.trim)
  )

  /** Semi join with an explicit runtime bloom prefilter (the pattern AQE's
    * runtime row-level filters automate): a bloom over the filtered build
    * side drops non-matching fact rows BEFORE the join shuffle. False
    * positives fall out of the exact semi join that follows, so the result
    * is identical to the plain join — asserted by spec equality and the
    * shared oracle. At 100 TB the bloom (driver-built over the ~dim-sized
    * build side, one reference object in the plan) cuts fact shuffle volume
    * to plausibly-matching rows only. */
  val qBloomSemiJoin: QueryDef = QueryDef(
    "q_bloom_semi_join",
    (s, d) => bloomSemiJoin(s, d, useBloom = true),
    Some("""
      SELECT l_returnflag, count(*) AS n_items, round(sum(l_extendedprice), 2) AS sum_price
      FROM lineitem
      WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT')
      GROUP BY 1
      ORDER BY l_returnflag
    """.stripMargin.trim)
  )

  /** Build-side row cap for the explicit bloom prefilter: ~8M keys ≈ 10 MB
    * of bloom bits at 1% fpp — the dim-sized regime where shipping the
    * filter as a plan constant is cheaper than the shuffle rows it saves.
    * The build side here is a FILTERED FACT (orders at ~20% selectivity),
    * which scales with the corpus, so above the cap the bloom would become
    * a multi-GB driver object serialized into every task binary; the op
    * then falls back to the plain semi join (identical result, just no
    * prefilter). */
  val BloomBuildRowCap = 8L << 20

  /** Shared body so the spec can assert bloom-on == bloom-off. */
  def bloomSemiJoin(s: SparkSession, d: String, useBloom: Boolean): DataFrame = {
    val urgent = Tables.orders(s, d)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"))
    val li = Tables.lineitem(s, d)
    // Build-side pass: same O(build) cost class as materializing a
    // broadcast; 1% fpp over the build keys. Sized from the row count so
    // the bits scale with the build side — and capped, because this build
    // side is fact-derived, not a dimension.
    val buildRows = if (useBloom) urgent.count() else 0L
    val prefiltered =
      if (!useBloom || buildRows > BloomBuildRowCap) li
      else {
        val bloom = urgent.stat.bloomFilter("o_orderkey", math.max(buildRows, 1L), 0.01)
        val bytes = new ByteArrayOutputStream()
        bloom.writeTo(bytes)
        li.filter(Bridge.column(
          BloomMightContain(Bridge.expression(col("l_orderkey")), bytes.toByteArray)))
      }
    prefiltered
      .join(urgent, prefiltered("l_orderkey") === urgent("o_orderkey"), "left_semi")
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_items"), round(sum(col("l_extendedprice")), 2).as("sum_price"))
      .orderBy("l_returnflag")
  }

  /** Misra–Gries heavy-hitter tokens, exact-confirmed. Pass 1: one narrow
    * scan folds every token into k=256 MG counters (map-side partial merge,
    * zero token shuffle) alongside the total count. Pass 2: only the ≤k
    * candidates' exact counts are aggregated (an InSet prefilter keeps the
    * shuffle candidate-sized). Any token above the 0.5% output threshold is
    * guaranteed captured (0.005 > 1/(k+1)), and exact confirmation removes
    * spurious candidates — so the result is deterministic and oracle-exact
    * while no full token-frequency shuffle ever happens. */
  val sketchTopkTokens: QueryDef = QueryDef(
    "sketch_topk_tokens",
    (s, d) => {
      import s.implicits._
      def tokens = Tables.documents(s, d)
        .select(col("text"))
        .as[String]
        .flatMap(t => t.toLowerCase(java.util.Locale.ROOT).split(" ", -1).iterator)
        .toDF("token")
      // Two deliberate passes over the (recomputed) token stream: caching
      // the full stream is exactly what does not scale at 100 TB.
      val sketchRow = tokens
        .agg(count(lit(1)).as("n_total"), Sketches.misraGries(256)(col("token")).as("cands"))
        .head()
      val total = sketchRow.getLong(0)
      val cands = sketchRow.getSeq[String](1)
      tokens
        .filter(col("token").isin(cands: _*))
        .groupBy(col("token"))
        .agg(count(lit(1)).as("n"))
        .filter(col("n") > lit(total) * 0.005)
        .select(col("token"), col("n"), round(col("n") / lit(total.toDouble), 6).as("share"))
        .orderBy(col("n").desc, col("token"))
    },
    Some("""
      WITH t AS (SELECT unnest(string_split(lower(text), ' ')) AS token FROM documents),
           tot AS (SELECT count(*) AS total FROM t)
      SELECT token, count(*) AS n,
             round(count(*) / (SELECT total FROM tot)::DOUBLE, 6) AS share
      FROM t
      GROUP BY token
      HAVING count(*) > (SELECT total FROM tot) * 0.005
      ORDER BY n DESC, token
    """.stripMargin.trim)
  )

  /** Gap-based sessions via Spark's NATIVE session_window operator (the
    * declarative alternative to q_sessionize's lag+cumsum formulation, and
    * the exact batch twin of the streaming StreamSessions.userSessions).
    * Adjacent [ts, ts+gap) intervals MERGE (verified empirically — an event
    * exactly gap-after the previous one joins its session), so the oracle
    * starts a new session only when the gap is strictly greater than 30
    * minutes — the boundary case is spec-asserted. */
  val qSessionWindow: QueryDef = QueryDef(
    "q_session_window",
    (s, d) =>
      graft.streaming.StreamSessions.userSessions(Tables.events(s, d))
        .orderBy("user_id", "session_start_us"),
    Some("""
      WITH e AS (
        SELECT user_id, event_id, ts, value,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR ts - lag(ts) OVER w > INTERVAL 30 MINUTES
                    THEN 1 ELSE 0 END AS new_sess
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      ), se AS (
        SELECT *, (sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                       ROWS UNBOUNDED PRECEDING))::BIGINT AS sess_id
        FROM e
      )
      SELECT user_id,
             epoch_us(min(ts)) AS session_start_us,
             epoch_us(max(ts) + INTERVAL 30 MINUTES) AS session_end_us,
             count(*) AS n_events,
             sum(CAST(round(value * 100) AS BIGINT)) / 100.0 AS session_value
      FROM se
      GROUP BY user_id, sess_id
      ORDER BY user_id, session_start_us
    """.stripMargin.trim)
  )

  /** First-touch attribution: purchases credited to the user's FIRST-ever
    * event type. The rank-1 window and the purchaser set are both
    * user-keyed, so the whole query is one shuffle on user_id reused by
    * the window, the distinct, and the join; WindowGroupLimit prunes each
    * group to its first row before the sort completes. */
  val qFirstTouch: QueryDef = QueryDef(
    "q_first_touch",
    (s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val firstTouch = Tables.events(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_type").as("first_type"))
      val purchasers = Tables.events(s, d)
        .filter(col("event_type") === "purchase")
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_purchases"))
      firstTouch.join(purchasers, Seq("user_id"))
        .groupBy(col("first_type"))
        .agg(count(lit(1)).as("n_users"), sum(col("n_purchases")).as("n_purchases"))
        .orderBy("first_type")
    },
    Some("""
      WITH ft AS (
        SELECT user_id, event_type AS first_type
        FROM (SELECT user_id, event_type,
                     row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
              FROM events)
        WHERE rn = 1
      ), p AS (
        SELECT user_id, count(*) AS n_purchases FROM events
        WHERE event_type = 'purchase' GROUP BY user_id
      )
      SELECT first_type, count(*) AS n_users, sum(n_purchases)::BIGINT AS n_purchases
      FROM ft JOIN p USING (user_id)
      GROUP BY first_type
      ORDER BY first_type
    """.stripMargin.trim)
  )

  /** Typed extraction from the JSON props payload (the event-properties
    * lane cdc_parse opens): per event type, stats over props.k. The
    * extraction is the shared [[Tables.propsK]] kernel — get_json_object,
    * kept after the round-16 from_json probe on query-level numbers (the
    * adjudication lives at propsK's scaladoc: from_json wins the isolated
    * parse kernel but breaks whole-stage codegen and loses at the query
    * level). The sum is exact integer so avg is the identical division on
    * both engines. */
  val qPropsExtract: QueryDef = QueryDef(
    "q_props_extract",
    (s, d) =>
      Tables.events(s, d)
        .select(col("event_type"), Tables.propsK.cast("long").as("k"))
        .groupBy(col("event_type"))
        .agg(
          count(col("k")).as("n"),
          min(col("k")).as("min_k"),
          max(col("k")).as("max_k"),
          sum(col("k")).as("sum_k"))
        // truncate-to-4-decimals via integer division: a rounded float
        // quotient can land exactly on a .00005 boundary (the q_moving_avg
        // lesson). Both engines truncate integer division toward zero
        // (verified: -7/2 = -3 under Spark `div` AND DuckDB `//`), so the
        // quotient matches for any sign.
        .withColumn("avg_k", expr("(10000 * sum_k) div n") / 10000.0)
        .orderBy("event_type"),
    Some("""
      SELECT event_type, n, min_k, max_k, sum_k,
             ((10000 * sum_k) // n) / 10000.0 AS avg_k
      FROM (SELECT event_type,
                   count(k) AS n, min(k) AS min_k, max(k) AS max_k,
                   sum(k)::BIGINT AS sum_k
            FROM (SELECT event_type, json_extract_string(props, '$.k')::BIGINT AS k FROM events)
            GROUP BY event_type)
      ORDER BY event_type
    """.stripMargin.trim)
  )

  /** Recency-decayed per-user activity value: each event contributes
    * `value · 2^-d` where d = full days since the corpus frontier (the
    * half-life feature every recommender/abuse model derives from an event
    * stream). The decay is EXACT fixed-point — cents · 2^20 floor-divided
    * by 2^min(d,20) — so both engines sum identical integers; no
    * float exp() whose libm rounding could diverge between JVM and C++.
    * The frontier is a 1-row aggregate broadcast into a narrow map; the
    * only data-sized shuffle is the final user_id aggregate. */
  val qDecayedSum: QueryDef = QueryDef(
    "q_decayed_sum",
    (s, d) => {
      val evs = Tables.events(s, d).select(
        col("user_id"),
        unix_micros(col("ts")).as("us"),
        round(col("value") * 100).cast("long").as("cents"))
      val frontier = evs.agg(max(col("us")).as("t_us"))
      evs.crossJoin(broadcast(frontier))
        .withColumn("dday", expr("(t_us - us) div 86400000000"))
        .withColumn("fp", expr("(cents * 1048576) div shiftleft(1, cast(least(dday, 20) as int))"))
        .groupBy(col("user_id"))
        .agg(
          count(lit(1)).as("n_events"),
          min(col("dday")).as("days_since_last"),
          sum(col("fp")).as("decayed_fp"))
        .select(
          col("user_id"), col("n_events"), col("days_since_last"), col("decayed_fp"),
          round(col("decayed_fp") / 104857600.0, 4).as("decayed_value"))
        .orderBy("user_id")
    },
    Some("""
      WITH e AS (
        SELECT user_id, epoch_us(ts) AS us, CAST(round(value * 100) AS BIGINT) AS cents
        FROM events
      ), m AS (SELECT max(us) AS t_us FROM e),
      f AS (
        SELECT user_id, (t_us - us) // 86400000000 AS dday,
               (cents * 1048576) // (1::BIGINT << least((t_us - us) // 86400000000, 20)) AS fp
        FROM e CROSS JOIN m
      )
      SELECT user_id, count(*) AS n_events,
             min(dday)::BIGINT AS days_since_last,
             sum(fp)::BIGINT AS decayed_fp,
             round(sum(fp)::BIGINT / 104857600.0, 4) AS decayed_value
      FROM f
      GROUP BY user_id
      ORDER BY user_id
    """.stripMargin.trim)
  )

  /** Wide→long UNPIVOT (melt): the per-user event-type count matrix back
    * to (user, metric, n) triples — the reporting shape that feeds generic
    * metric stores. Spark's native `unpivot` expands in-place (an Expand
    * node, no join, no shuffle beyond the source aggregate). */
  val qUnpivot: QueryDef = QueryDef(
    "q_unpivot",
    (s, d) => {
      val types = Seq("click", "view", "purchase", "signup", "error")
      val wide = Tables.events(s, d)
        .groupBy(col("user_id"))
        .agg(types.map(t =>
          sum((col("event_type") === t).cast("long")).as(s"n_$t")).head,
          types.tail.map(t => sum((col("event_type") === t).cast("long")).as(s"n_$t")): _*)
      wide.unpivot(
          Array(col("user_id")),
          types.map(t => col(s"n_$t")).toArray,
          "metric", "n")
        .orderBy("user_id", "metric")
    },
    Some("""
      WITH wide AS (
        SELECT user_id,
               sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)::BIGINT AS n_click,
               sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)::BIGINT AS n_view,
               sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)::BIGINT AS n_purchase,
               sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)::BIGINT AS n_signup,
               sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)::BIGINT AS n_error
        FROM events
        GROUP BY user_id
      )
      SELECT user_id, metric, n
      FROM wide UNPIVOT (n FOR metric IN (n_click, n_view, n_purchase, n_signup, n_error))
      ORDER BY user_id, metric
    """.stripMargin.trim)
  )

  /** Median absolute deviation per event type — the robust dispersion
    * statistic (outlier-insensitive, unlike q_zscore's stddev). All
    * arithmetic stays EXACT: values become integer cents, the interpolated
    * median lands on half-cents and the deviation median on quarter-cents
    * — dyadic rationals that binary doubles represent exactly, so both
    * engines interpolate identically with no rounding at the boundary.
    * The 5-row median table broadcasts back onto the stream. (Exact
    * percentile buffers each group — the documented q_percentile caveat;
    * q_percentile_dist's bucketed ranking is the 100 TB path.) */
  val qMad: QueryDef = QueryDef(
    "q_mad",
    (s, d) => {
      val e = Tables.events(s, d)
        .select(col("event_type"), round(col("value") * 100).cast("long").cast("double").as("cents"))
      val med = e.groupBy(col("event_type"))
        .agg(expr("percentile(cents, 0.5)").as("med_cents"))
      e.join(broadcast(med), Seq("event_type"))
        .select(col("event_type"), col("med_cents"), abs(col("cents") - col("med_cents")).as("dev"))
        .groupBy(col("event_type"))
        .agg(
          count(lit(1)).as("n"),
          round(min(col("med_cents")) / 100.0, 4).as("med"),
          round(expr("percentile(dev, 0.5)") / 100.0, 4).as("mad"))
        .orderBy("event_type")
    },
    Some("""
      WITH e AS (
        SELECT event_type, CAST(round(value * 100) AS BIGINT)::DOUBLE AS cents FROM events
      ), m AS (
        SELECT event_type, quantile_cont(cents, 0.5) AS med_cents FROM e GROUP BY event_type
      )
      SELECT e.event_type, count(*) AS n,
             round(min(med_cents) / 100.0, 4) AS med,
             round(quantile_cont(abs(cents - med_cents), 0.5) / 100.0, 4) AS mad
      FROM e JOIN m USING (event_type)
      GROUP BY e.event_type
      ORDER BY event_type
    """.stripMargin.trim)
  )

  /** ROLLUP with `grouping()` / `grouping_id()` — the standard way to tell
    * a subtotal row from a genuine NULL key (the other rollup/cube queries
    * label with coalesce, which conflates the two when keys are nullable).
    * grouping_id is computed bit-identically on the DuckDB side as
    * 2·g(flag)+g(status); Spark's grouping_id() uses the same bit order
    * (first grouping column = most significant bit). One Expand + one
    * aggregation exchange, like q_grouping_sets. */
  val qGroupingId: QueryDef = QueryDef(
    "q_grouping_id",
    (s, d) =>
      Tables.lineitem(s, d)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(
          count(lit(1)).as("n"),
          grouping(col("l_returnflag")).cast("long").as("g_flag"),
          grouping(col("l_linestatus")).cast("long").as("g_status"),
          grouping_id().cast("long").as("gid"))
        .select(
          coalesce(col("l_returnflag"), lit("-")).as("flag"),
          coalesce(col("l_linestatus"), lit("-")).as("status"),
          col("g_flag"), col("g_status"), col("gid"), col("n"))
        .orderBy("gid", "flag", "status"),
    Some("""
      SELECT coalesce(l_returnflag, '-') AS flag,
             coalesce(l_linestatus, '-') AS status,
             GROUPING(l_returnflag)::BIGINT AS g_flag,
             GROUPING(l_linestatus)::BIGINT AS g_status,
             (2 * GROUPING(l_returnflag) + GROUPING(l_linestatus))::BIGINT AS gid,
             count(*) AS n
      FROM lineitem
      GROUP BY ROLLUP(l_returnflag, l_linestatus)
      ORDER BY gid, flag, status
    """.stripMargin.trim)
  )

  val all: Seq[QueryDef] = Seq(
    qGroupingSets, qHistogram, qRetentionCohort, qModeHour, qMovingAvg,
    qMultiDistinct, qBloomSemiJoin, qSessionWindow, sketchTopkTokens,
    qFirstTouch, qPropsExtract, qDecayedSum, qUnpivot, qMad, qGroupingId)
}
