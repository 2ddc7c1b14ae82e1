package graft.operators

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}

/** Order-dependent statistics the reference's warehouse serves over replica
  * tables (`/root/reference/README.md:14-16` — the "complex, analytical
  * queries" Greenplum exists for): sweep-line interval concurrency, tied
  * rankings, and exact second moments. Each is exact-integer end to end so
  * the DuckDB oracle hash-matches bit for bit.
  */
object OrderedStats {

  private val DayUs = 86400000000L

  /** Sweep-line max concurrency (the "meeting rooms" pattern): each event
    * opens a half-open interval `[ts, ts + k seconds)` (k from the JSON
    * props), clamped to its UTC day; per (event_type, day) report how many
    * intervals were ever open at once.
    *
    * The sweep is the scale-correct plan for interval overlap: ±1 boundary
    * deltas, one `(event_type, day)` exchange, and a running sum inside each
    * partition — never interval×interval. The default RANGE window frame
    * (peers = equal (t, delta)) makes every row's running sum
    * order-independent under ties, and identical deltas within a tie group
    * yield the same prefix multiset either way — both engines agree row by
    * row, not just on the max. Ends sort before starts at equal t (delta
    * −1 < +1), giving half-open semantics. Day arithmetic is pure integer
    * floor-division on epoch micros — no calendar/timezone functions to
    * diverge. The 2-element boundary array is constant-cost, so the
    * Generate re-evaluation pitfall (see CLAUDE.md) doesn't apply. */
  val qIntervalOverlap: QueryDef = QueryDef(
    "q_interval_overlap",
    (s, d) => {
      val iv = Tables.events(s, d).select(
        col("event_type"),
        unix_micros(col("ts")).as("s_us"),
        Tables.propsK.cast("long").as("k"))
        .withColumn("day", expr(s"s_us div $DayUs"))
        .withColumn("e_us", least(col("s_us") + col("k") * 1000000L, (col("day") + 1) * DayUs))
      val bounds = iv.select(
        col("event_type"), col("day"),
        explode(array(
          struct(col("s_us").as("t"), lit(1).as("delta")),
          struct(col("e_us").as("t"), lit(-1).as("delta")))).as("b"))
        .select(col("event_type"), col("day"), col("b.t").as("t"), col("b.delta").as("delta"))
      val w = Window.partitionBy(col("event_type"), col("day")).orderBy(col("t"), col("delta"))
      bounds
        .withColumn("conc", sum(col("delta")).over(w))
        .groupBy(col("event_type"), col("day"))
        .agg(
          count(when(col("delta") === 1, 1)).as("n_intervals"),
          max(col("conc")).cast("long").as("max_concurrency"))
        .orderBy("event_type", "day")
    },
    Some(s"""
      WITH iv AS (
        SELECT event_type, epoch_us(ts) AS s_us,
               json_extract_string(props, '$$.k')::BIGINT AS k
        FROM events
      ), iv2 AS (
        SELECT event_type, s_us // $DayUs AS day, s_us,
               least(s_us + 1000000 * k, (s_us // $DayUs + 1) * $DayUs) AS e_us
        FROM iv
      ), b AS (
        SELECT event_type, day, s_us AS t, 1 AS delta FROM iv2
        UNION ALL
        SELECT event_type, day, e_us AS t, -1 AS delta FROM iv2
      ), c AS (
        SELECT event_type, day, delta,
               sum(delta) OVER (PARTITION BY event_type, day ORDER BY t, delta) AS conc
        FROM b
      )
      SELECT event_type, day,
             count(*) FILTER (delta = 1) AS n_intervals,
             max(conc)::BIGINT AS max_concurrency
      FROM c
      GROUP BY event_type, day
      ORDER BY event_type, day
    """.stripMargin.trim)
  )

  /** rank / dense_rank under REAL ties — every other ranking query here is
    * deliberately tie-free (deterministic output), so the tie semantics
    * (rank gaps, dense_rank compaction) were never actually exercised.
    * Values are bucketed to force ties (integer cents div 1000 — no float
    * rounding to diverge), ranked within (event_type, day), then collapsed
    * by (…, v): rank is a function of v within its partition, so the
    * grouped output is deterministic while the window still ranks raw tied
    * rows. 150 window partitions — parallel, no single-task sort. */
  val qRankTies: QueryDef = QueryDef(
    "q_rank_ties",
    (s, d) => {
      val evs = Tables.events(s, d).select(
        col("event_type"),
        date_format(col("ts"), "yyyy-MM-dd").as("day"),
        expr("cast(round(value * 100) as bigint) div 1000").as("v"))
      val w = Window.partitionBy(col("event_type"), col("day")).orderBy(col("v"))
      evs
        .withColumn("rnk", rank().over(w))
        .withColumn("drnk", dense_rank().over(w))
        .groupBy(col("event_type"), col("day"), col("v"))
        .agg(count(lit(1)).as("cnt"), min(col("rnk")).as("rnk"), min(col("drnk")).as("drnk"))
        .orderBy("event_type", "day", "v")
    },
    Some("""
      WITH evs AS (
        SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
               round(value * 100)::BIGINT // 1000 AS v
        FROM events
      ), r AS (
        SELECT event_type, day, v,
               rank() OVER w AS rnk, dense_rank() OVER w AS drnk
        FROM evs
        WINDOW w AS (PARTITION BY event_type, day ORDER BY v)
      )
      SELECT event_type, day, v, count(*) AS cnt,
             min(rnk)::BIGINT AS rnk, min(drnk)::BIGINT AS drnk
      FROM r
      GROUP BY event_type, day, v
      ORDER BY event_type, day, v
    """.stripMargin.trim)
  )

  /** EXACT covariance / variance per group. Float covariance can never
    * hash-match across engines (sum association order differs), so the
    * moments are accumulated exactly and the n·Σxy − Σx·Σy forms are
    * divided down to integer basis points with the verified
    * truncate-toward-zero integer division; DuckDB mirrors with HUGEINT.
    *
    * ROUND 17 (r16 verdict #5): the second moments accumulate as SPLIT
    * LONG pairs, not decimal(38,0). Σy² clears int64 around 10⁶
    * rows/group (the sf1 bench found it under ANSI checking), and the
    * r15 fix widened each product to decimal BEFORE the sum — exact, but
    * a decimal(38) aggregation buffer is a BigDecimal add per row (Spark
    * keeps precision >18 boxed), 5 of them per row here. Instead each
    * big product splits at a power of two — y² = (y² div 2²³)·2²³ +
    * (y² mod 2²³), x·y at 2¹⁶ — and the two HALVES sum as plain longs
    * (primitive codegen HashAggregate buffer), recombined in decimal on
    * the 3 OUTPUT rows. Exactness bound: summand magnitudes cap at
    * max(y²/2²³, 2²³, y) ≈ 1.4e7 at the corpus's y ≤ ~1.1e7 cents, so
    * sums stay exact below ~6e11 rows/GROUP (~100-TB-scale lineitem);
    * a runtime guard computes the actual bound from max(y) and n and
    * raise_errors past it (silent long wrap is the corruption mode the
    * r17 q_string_agg guard also closes) — the decimal form remains the
    * documented fallback beyond. */
  val qCovExact: QueryDef = QueryDef(
    "q_cov_exact",
    (s, d) => {
      val M = 1L << 23 // balance point: sqrt(max y²) ≈ 1.1e7 ≈ 2^23
      Tables.lineitem(s, d)
        .select(
          col("l_returnflag"),
          round(col("l_quantity")).cast("long").as("x"),
          round(col("l_extendedprice") * 100).cast("long").as("y"))
        .groupBy(col("l_returnflag"))
        .agg(
          count(lit(1)).as("n"),
          max(col("y")).as("maxy"),
          sum(col("x")).as("sx"),
          sum(col("y")).as("sy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(expr("(x * y) div 65536")).as("sxy_hi"),
          sum(expr("(x * y) % 65536")).as("sxy_lo"),
          sum(expr(s"(y * y) div $M")).as("syy_hi"),
          sum(expr(s"(y * y) % $M")).as("syy_lo"))
        // recombine the split sums in decimal — 3 rows, not 60M
        .withColumn("nd", col("n").cast("decimal(38,0)"))
        .withColumn("sxd", col("sx").cast("decimal(38,0)"))
        .withColumn("syd", col("sy").cast("decimal(38,0)"))
        .withColumn("sxxd", col("sxx").cast("decimal(38,0)"))
        .withColumn("sxyd",
          (col("sxy_hi").cast("decimal(38,0)") * 65536 + col("sxy_lo")).cast("decimal(38,0)"))
        .withColumn("syyd",
          (col("syy_hi").cast("decimal(38,0)") * M + col("syy_lo")).cast("decimal(38,0)"))
        .select(
          col("l_returnflag"),
          // loud headroom guard: every long summand is ≤ per_elem, so the
          // sums are exact iff n·per_elem fits int64 (double math is a
          // conservative check, margin 8e18 < 2^63)
          when(col("n").cast("double") *
              greatest(col("maxy").cast("double") * col("maxy") / M,
                lit(M.toDouble), col("maxy").cast("double")) < 8e18, col("n"))
            .otherwise(expr("raise_error(concat('q_cov_exact: split-long headroom " +
              "exceeded at n=', cast(n AS STRING), ', max_cents=', cast(maxy AS STRING), " +
              "' - use the decimal(38,0) accumulation form'))")).as("n"),
          expr("(10000 * (nd * sxyd - sxd * syd)) div (nd * (nd - 1))").as("cov_bp"),
          expr("(10000 * (nd * sxxd - sxd * sxd)) div (nd * (nd - 1))").as("var_x_bp"),
          expr("(10000 * (nd * syyd - syd * syd)) div (nd * (nd - 1))").as("var_y_bp"))
        .orderBy("l_returnflag")
    },
    Some("""
      WITH m AS (
        SELECT l_returnflag,
               count(*)::HUGEINT AS n,
               sum(x)::HUGEINT AS sx, sum(y)::HUGEINT AS sy,
               sum(x * y)::HUGEINT AS sxy,
               sum(x * x)::HUGEINT AS sxx,
               sum(y * y)::HUGEINT AS syy
        FROM (SELECT l_returnflag,
                     round(l_quantity)::BIGINT AS x,
                     round(l_extendedprice * 100)::BIGINT AS y
              FROM lineitem)
        GROUP BY l_returnflag
      )
      SELECT l_returnflag, n::BIGINT AS n,
             ((10000 * (n * sxy - sx * sy)) // (n * (n - 1)))::BIGINT AS cov_bp,
             ((10000 * (n * sxx - sx * sx)) // (n * (n - 1)))::BIGINT AS var_x_bp,
             ((10000 * (n * syy - sy * sy)) // (n * (n - 1)))::BIGINT AS var_y_bp
      FROM m
      ORDER BY l_returnflag
    """.stripMargin.trim)
  )

  /** EXACT 7-day sliding distinct users per day — the metric that's easy
    * to write as a range self-join (`e.day BETWEEN d.day-6 AND d.day` —
    * O(days × events), a non-starter at scale) and easy to approximate,
    * but has an exact linear construction: each user's active day covers
    * result-days `[day, day+6]` TRIMMED at the user's next active day, so
    * the per-user coverage intervals are disjoint and each (user,
    * result-day) pair appears exactly once — `count(*)` IS the distinct
    * count, no distinct aggregation over the fan-out. Fan-out ≤ 7 rows per
    * user-day (the sequence child is two longs — constant Generate cost).
    * The ORACLE deliberately uses the naive range-join formulation:
    * an independent computation, not a translation — a stronger check.
    * Output restricted to days that actually occur in the data. */
  val qSlidingDistinct: QueryDef = QueryDef(
    "q_sliding_distinct",
    (s, d) => {
      val ud = Tables.events(s, d)
        .select(col("user_id"), expr(s"unix_micros(ts) div $DayUs").as("day"))
        .distinct()
      val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
      val cover = ud
        .withColumn("nxt", lead(col("day"), 1).over(w))
        .withColumn("cend", least(col("day") + 6, coalesce(col("nxt") - 1, col("day") + 6)))
        .select(col("user_id"), explode(sequence(col("day"), col("cend"))).as("rday"))
      val days = ud.select(col("day")).distinct()
      cover.join(days, cover("rday") === days("day"))
        .groupBy(col("day"))
        .agg(count(lit(1)).as("u7"))
        .orderBy("day")
    },
    Some(s"""
      WITH e AS (
        SELECT DISTINCT user_id, epoch_us(ts) // $DayUs AS day FROM events
      ), d AS (SELECT DISTINCT day FROM e)
      SELECT d.day, count(DISTINCT e.user_id) AS u7
      FROM d JOIN e ON e.day BETWEEN d.day - 6 AND d.day
      GROUP BY d.day
      ORDER BY d.day
    """.stripMargin.trim)
  )

  /** PERCENTILE_DISC — the discrete quantile (an ACTUAL data value, the
    * ceil(p·n)-th smallest), distinct from `q_percentile`'s interpolated
    * quantile_cont. Formulated as min value whose cume_dist ≥ p, which
    * selects the same element: cume_dist k/n is an exact IEEE quotient at
    * the p=k/n boundaries, so the ≥ comparison agrees with DuckDB's
    * ceil-position definition. Values flow as integer cents (the selected
    * element is exact; only the final /100 presents a decimal). Window is
    * per-priority like q_percentile. ROUND 15: guarded like its r12
    * siblings — ~5 priority groups make this a handful of single-task
    * whole-group sorts at any SF (the most DuckDB-lagging lane at sf10,
    * 13.26 s vs 0.43 s), so above [[graft.operators.Guards]]'
    * singleSortCap rows in any group it delegates to
    * [[ScalePatterns.qPercentileDiscDist]]'s two-phase bucketed rank
    * (identical output, same oracle); the guard stat is the SAME memoized
    * (session, dir, "orders_priority") count q_percentile/q_cume_dist
    * read — no extra job. */
  val qPercentileDisc: QueryDef = QueryDef(
    "q_percentile_disc",
    (s, d) => {
      if (Guards.maxGroupRows(s, d, "orders_priority") {
        Tables.orders(s, d).groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
          .agg(max(col("n"))).first().getLong(0)
      } > Guards.singleSortCap(s)) ScalePatterns.qPercentileDiscDist.fn(s, d)
      else {
      val w = Window.partitionBy(col("o_orderpriority")).orderBy(col("cents"))
      Tables.orders(s, d)
        .select(col("o_orderpriority"), round(col("o_totalprice") * 100).cast("long").as("cents"))
        .withColumn("cd", cume_dist().over(w))
        .groupBy(col("o_orderpriority"))
        .agg(
          min(when(col("cd") >= 0.5, col("cents"))).as("p50c"),
          min(when(col("cd") >= 0.9, col("cents"))).as("p90c"),
          count(lit(1)).as("n_orders"))
        .select(
          col("o_orderpriority"),
          (col("p50c") / 100.0).as("p50_disc"),
          (col("p90c") / 100.0).as("p90_disc"),
          col("n_orders"))
        .orderBy("o_orderpriority")
      }
    },
    Some("""
      SELECT o_orderpriority,
             quantile_disc(cents, 0.5) / 100.0 AS p50_disc,
             quantile_disc(cents, 0.9) / 100.0 AS p90_disc,
             count(*) AS n_orders
      FROM (SELECT o_orderpriority, round(o_totalprice * 100)::BIGINT AS cents FROM orders)
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority
    """.stripMargin.trim)
  )

  /** LOCF gap-fill (last observation carried forward): every event row
    * carries the user's most recent purchase value — `last(..., ignoreNulls)`
    * over the preceding frame, the IGNORE NULLS window surface none of the
    * other operators exercise (the as-of family runs max/min over
    * timestamps; this carries a VALUE forward through nulls). Integer
    * cents so the carried value hash-matches exactly; one user_id
    * exchange. */
  val qGapFill: QueryDef = QueryDef(
    "q_gap_fill",
    (s, d) => {
      // Hot-key guard (round 14; the qAsofJoin pattern — same memoized
      // "events_user" stat): above the cap the LOCF decomposes through
      // ScalePatterns.qGapFillDist's struct-max bucketed prefix.
      if (Guards.maxGroupRows(s, d, "events_user") {
        Tables.events(s, d).groupBy(col("user_id")).agg(count(lit(1)).as("n"))
          .agg(max(col("n"))).first().getLong(0)
      } > Guards.singleSortCap(s)) ScalePatterns.qGapFillDist.fn(s, d)
      else {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, d)
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"), col("value"))
        .withColumn("purchase_cents",
          when(col("event_type") === "purchase", round(col("value") * 100).cast("long")))
        .withColumn("carried_cents", last(col("purchase_cents"), ignoreNulls = true).over(w))
        .select(
          col("event_id"),
          col("user_id"),
          col("event_type"),
          (col("carried_cents") / 100.0).as("last_purchase_value"))
        .orderBy("event_id")
      }
    },
    Some("""
      SELECT event_id, user_id, event_type,
             last_value(purchase_cents IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) / 100.0
               AS last_purchase_value
      FROM (
        SELECT event_id, user_id, event_type, ts,
               CASE WHEN event_type = 'purchase'
                    THEN round(value * 100)::BIGINT END AS purchase_cents
        FROM events)
      ORDER BY event_id
    """.stripMargin.trim)
  )

  /** Online 3σ anomaly detection, batch form: each event is scored against
    * the running statistics of its user's PRIOR events only (exclusive
    * prefix frame), exactly as a live detector that has seen the stream up
    * to that point would score it — so the streaming twin
    * ([[graft.streaming.StreamAnomaly]]) converges to bit-equal rows
    * (spec-asserted). The 3σ test runs in EXACT integer arithmetic:
    * (x−S/n)² > 9·(nQ−S²)/n²  ⟺  (n·x−S)² > 9·(n·Q−S²) over cents, so no
    * float variance can diverge between engines or between batch and
    * stream. Warm-up: a user's first 8 events only feed the stats.
    * Magnitudes: every term is ≤ n²·cents² ≈ 4×10¹⁶ at sf0.1 — Long-safe;
    * at 100 TB per-key event counts push n·Q past 2⁶³, the documented swap
    * to DECIMAL(38) (the q_cov_exact pattern).
    *
    * Scale: count/sum/sum-of-squares share ONE (user_id) exchange and one
    * Window node; anomalies filter before the output sort.
    *
    * HOT-KEY GUARD (round 15): that one Window still sorts a hot key on
    * one task, so above [[Guards.singleSortCap]] rows/key this delegates
    * to [[ScalePatterns.qValueAnomaliesDist]]'s bucketed prefix-sums twin
    * (bit-equal rows, same oracle). Same memoized "events_user" count. */
  /** The 3σ comparison, shared by the plain lane and its dist twin.
    * Round 15: the r14 docs called n·Q > 2⁶³ "the documented swap to
    * DECIMAL(38)" — the sf10hot drill then MEASURED that ceiling biting
    * at just a 1M-row hot key ((n·x−S)² ≈ 1e20 under ANSI mode =
    * SparkArithmeticException, both lanes), so the swap is now real: the
    * COMPARISON runs in decimal(38,0) (exact; new ceiling ~1e38, i.e.
    * n ≳ 1e14 rows/key), while the window sums stay Long (Σx² overflows
    * only past ~9e10 rows/key × cents² — fail-loud under ANSI, same
    * contract as the streaming twin's Math.addExact accumulation). */
  private[operators] def anomalyTest: Column = {
    def d(c: Column) = c.cast("decimal(38,0)")
    val lhs = d(col("n_prior")) * d(col("cents")) - d(col("s"))
    col("n_prior") >= 8 &&
      lhs * lhs > lit(9).cast("decimal(38,0)") *
        (d(col("n_prior")) * d(col("q")) - d(col("s")) * d(col("s")))
  }
  val qValueAnomalies: QueryDef = QueryDef(
    "q_value_anomalies",
    (s, d) => {
      val hottest = Guards.maxGroupRows(s, d, "events_user") {
        Tables.events(s, d).groupBy(col("user_id")).agg(count(lit(1)).as("n"))
          .agg(max(col("n"))).first().getLong(0)
      }
      if (hottest > Guards.singleSortCap(s)) ScalePatterns.qValueAnomaliesDist.fn(s, d)
      else {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("ts"),
          round(col("value") * 100).cast("long").as("cents"))
        .select(col("user_id"), col("event_id"), col("cents"),
          count(lit(1)).over(w).as("n_prior"),
          sum(col("cents")).over(w).as("s"),
          sum(col("cents") * col("cents")).over(w).as("q"))
        .filter(anomalyTest)
        .select(col("event_id"), col("user_id"), col("cents"), col("n_prior"))
        .orderBy("event_id")
      }
    },
    Some("""
      WITH c AS (
        SELECT user_id, event_id, ts,
               CAST(round(value * 100) AS BIGINT) AS cents
        FROM events
      ), r AS (
        SELECT user_id, event_id, cents,
               count(*) OVER w AS n_prior,
               sum(cents) OVER w AS s,
               sum(cents * cents) OVER w AS q
        FROM c
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
      )
      SELECT event_id, user_id, cents, n_prior::BIGINT AS n_prior
      FROM r
      WHERE n_prior >= 8
        AND (n_prior * cents - s) * (n_prior * cents - s) > 9 * (n_prior * q - s * s)
      ORDER BY event_id
    """.stripMargin.trim)
  )

  /** The order-cadence gap stream shared by [[qOrderCadence]] and
    * [[ScalePatterns.qOrderCadenceDist]]: per-customer consecutive-order
    * day gaps, labelled with the customer market segment (AQE-joined —
    * customer scales with SF, so the hint is the planner's call).
    * Columns (key = c_mktsegment, v = gap_days, id = o_orderkey) — the
    * bucketedRank input contract; id is unique (one gap per non-first
    * order row). The lag runs over the o_custkey exchange —
    * high-cardinality, scale-safe; only the SEGMENT grouping downstream
    * differs between the two lanes. */
  private[operators] def orderCadenceGaps(
      s: SparkSession, d: String): org.apache.spark.sql.DataFrame = {
    val wCust = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val gaps = Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"))
      .withColumn("prev", lag(col("o_orderdate"), 1).over(wCust))
      .filter(col("prev").isNotNull)
      .select(col("o_custkey"), col("o_orderkey"),
        datediff(col("o_orderdate"), col("prev")).cast("long").as("gap_days"))
    // customer scales with SF — size-guarded hint (releases at scale).
    val seg = Guards.dimHint(s, d, "customer",
      Tables.customer(s, d).select(col("c_custkey"), col("c_mktsegment")))
    gaps.join(seg, col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment").as("key"), col("gap_days").as("v"),
        col("o_orderkey").as("id"))
  }

  /** Order-cadence distribution: per market segment, the median / p90 /
    * mean days between a customer's CONSECUTIVE orders — the
    * purchase-rhythm view behind churn models and replenishment
    * campaigns. Discrete percentiles via the [[qPercentileDisc]]
    * cume_dist ≡ quantile_disc identity (value-based, so tied gaps can't
    * diverge); the mean is exact (integer day-sums are exact in doubles).
    *
    * Scale (ROUND 16): gaps come from a lag over the o_custkey exchange
    * (high-cardinality, fine); the percentile window sorts per SEGMENT —
    * 5 natural partitions, so the whole gap stream funnelled through 5
    * tasks (11.5 s vs DuckDB's 0.69 s at sf10, the last unguarded
    * low-cardinality ranking window). Guarded like its r12/r15 siblings:
    * above [[Guards.singleSortCap]] rows in any segment it delegates to
    * [[ScalePatterns.qOrderCadenceDist]]'s (segment, gap) COUNT HISTOGRAM
    * — deliberately NOT bucketedRank, which would read the lag-derived
    * gap stream 3× (measured 38.8 s; see the twin's scaladoc) —
    * (identical output, same oracle; cap=1 plan-flip spec); the guard
    * stat is one memoized broadcast-join count per (session, dir). */
  val qOrderCadence: QueryDef = QueryDef(
    "q_order_cadence",
    (s, d) => {
      if (Guards.maxGroupRows(s, d, "orders_mktsegment") {
        Tables.orders(s, d).select(col("o_custkey"))
          .join(
            Tables.customer(s, d).select(col("c_custkey"), col("c_mktsegment")),
            col("o_custkey") === col("c_custkey"))
          .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
          .agg(max(col("n"))).first().getLong(0)
      } > Guards.singleSortCap(s)) ScalePatterns.qOrderCadenceDist.fn(s, d)
      else {
      val wSeg = Window.partitionBy(col("key")).orderBy(col("v"))
      orderCadenceGaps(s, d)
        .withColumn("cd", cume_dist().over(wSeg))
        .groupBy(col("key"))
        .agg(
          count(lit(1)).as("n_gaps"),
          min(when(col("cd") >= 0.5, col("v"))).as("p50_gap"),
          min(when(col("cd") >= 0.9, col("v"))).as("p90_gap"),
          round(avg(col("v")), 2).as("avg_gap"))
        .select(col("key").as("c_mktsegment"), col("n_gaps"),
          col("p50_gap"), col("p90_gap"), col("avg_gap"))
        .orderBy("c_mktsegment")
      }
    },
    Some("""
      WITH g AS (
        SELECT o_custkey,
               datediff('day',
                 lag(o_orderdate) OVER (PARTITION BY o_custkey
                                        ORDER BY o_orderdate, o_orderkey),
                 o_orderdate) AS gap_days
        FROM orders
      ), j AS (
        SELECT c_mktsegment, gap_days
        FROM g JOIN customer ON o_custkey = c_custkey
        WHERE gap_days IS NOT NULL
      )
      SELECT c_mktsegment, count(*) AS n_gaps,
             quantile_disc(gap_days, 0.5) AS p50_gap,
             quantile_disc(gap_days, 0.9) AS p90_gap,
             round(avg(gap_days), 2) AS avg_gap
      FROM j GROUP BY c_mktsegment ORDER BY c_mktsegment
    """.stripMargin.trim)
  )

  val all: Seq[QueryDef] = Seq(
    qIntervalOverlap, qRankTies, qCovExact, qSlidingDistinct, qPercentileDisc, qGapFill,
    qValueAnomalies, qOrderCadence)
}
