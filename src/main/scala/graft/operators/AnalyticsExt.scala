package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}

/** Extended analytics surface: additional query shapes Greenplum serves in
  * the reference architecture — quantile bucketing, exact distincts,
  * correlated aggregates, ratio-to-report, event gaps, and set operations.
  */
object AnalyticsExt {

  /** Quartile bucketing within groups (ntile window). Above
    * [[Guards.SingleSortCap]] rows in one priority group the plain
    * windowed lane DELEGATES to its scale-safe twin
    * [[ScalePatterns.qNtileDist]] (identical output, shared oracle): a
    * window partitioned by 5 priorities funnels each group through ONE
    * task's sort, which at sf10 means ~3M-row single-reducer sorts
    * (measured 19.6 s vs the twin's 9.3 s) and at 100 TB is a dead
    * plan. Under the bound the single-sort window IS the right plan (no
    * two-phase overhead), so bench-SF runs keep the baseline shape; the
    * guard count job is memoized per (session, dir) in [[Guards]]. */
  val qNtile: QueryDef = QueryDef(
    "q_ntile",
    (s, d) => {
      val maxGroup = Guards.maxGroupRows(s, d, "orders_priority") {
        Tables.orders(s, d)
          .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
          .agg(max(col("n"))).first().getLong(0)
      }
      if (maxGroup > Guards.singleSortCap(s)) ScalePatterns.qNtileDist.fn(s, d)
      else {
        val w = Window.partitionBy(col("o_orderpriority")).orderBy(col("o_totalprice"), col("o_orderkey"))
        Tables.orders(s, d)
          .withColumn("quartile", ntile(4).over(w))
          .groupBy(col("o_orderpriority"), col("quartile"))
          .agg(
            count(lit(1)).as("n_orders"),
            round(min(col("o_totalprice")), 2).as("min_price"),
            round(max(col("o_totalprice")), 2).as("max_price")
          )
          .orderBy("o_orderpriority", "quartile")
      }
    },
    Some("""
      SELECT o_orderpriority, quartile, count(*) AS n_orders,
             round(min(o_totalprice), 2) AS min_price,
             round(max(o_totalprice), 2) AS max_price
      FROM (SELECT o_orderpriority, o_totalprice,
                   ntile(4) OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey) AS quartile
            FROM orders)
      GROUP BY o_orderpriority, quartile
      ORDER BY o_orderpriority, quartile
    """.stripMargin.trim)
  )

  /** Exact distinct counting per group (the shape approx sketches replace at
    * scale; exact here so the oracle can hash-match). */
  val qDistinctUsers: QueryDef = QueryDef(
    "q_distinct_users",
    (s, d) =>
      Tables.events(s, d)
        .groupBy(col("event_type"))
        .agg(
          countDistinct(col("user_id")).as("n_users"),
          count(lit(1)).as("n_events"),
          round(sum(col("value")), 2).as("total_value")
        )
        .orderBy("event_type"),
    Some("""
      SELECT event_type, count(DISTINCT user_id) AS n_users, count(*) AS n_events,
             round(sum(value), 2) AS total_value
      FROM events
      GROUP BY event_type
      ORDER BY event_type
    """.stripMargin.trim)
  )

  /** Correlated aggregate: customers above their nation's average balance.
    * Spark-first: the correlation is decorrelated explicitly into a
    * broadcast join against the per-nation aggregate. */
  val qCorrSubquery: QueryDef = QueryDef(
    "q_corr_subquery",
    (s, d) => {
      // nation_avg is rounded to cents BEFORE the comparison: acctbals are
      // 2-decimal, so the predicate becomes exact-integer-like and immune
      // to engine-dependent ulp noise in the average.
      val navg = Tables.customer(s, d)
        .groupBy(col("c_nationkey"))
        .agg(round(avg(col("c_acctbal")), 2).as("nation_avg"))
      Tables.customer(s, d)
        .join(broadcast(navg), Seq("c_nationkey"))
        .filter(col("c_acctbal") > col("nation_avg"))
        .select(col("c_custkey"), col("c_name"), round(col("c_acctbal"), 2).as("acctbal"))
        .orderBy("c_custkey")
    },
    Some("""
      SELECT c_custkey, c_name, round(c_acctbal, 2) AS acctbal
      FROM customer c
      WHERE c_acctbal > (SELECT round(avg(c2.c_acctbal), 2) FROM customer c2
                         WHERE c2.c_nationkey = c.c_nationkey)
      ORDER BY c_custkey
    """.stripMargin.trim)
  )

  /** Ratio-to-report: each nation's share of yearly revenue (window sum as
    * the denominator; numerator rounded first so both engines divide the
    * same doubles). */
  val qMarketShare: QueryDef = QueryDef(
    "q_market_share",
    (s, d) => {
      // EXACT arithmetic end to end (the q_cov_exact treatment, applied
      // here after the sf1 sweep caught it): a double revenue sum agrees
      // with the oracle only until the sums grow enough that association-
      // order ulps cross the 2 dp rounding boundary (2.85 % of groups at
      // sf1). extendedprice and discount are 2 dp quantities, so
      // price·(1−disc) is the exact INTEGER cents·(100−disc_pct) in
      // ten-thousandths — ROUND 17: summed as a plain LONG (primitive
      // codegen HashAggregate; the r16 decimal(18,2)×decimal(4,2) form
      // has product precision 23 > 18, i.e. a boxed BigDecimal
      // multiply+add per join-output row), recombined in decimal on the
      // ≤years×nations output rows. Measured honestly: QUERY-NEUTRAL on
      // a quiet box (~9.7 s either way at sf10 — the lineitem⨝orders
      // exchange dominates) but 3× less load-sensitive (in-session A/B
      // under a concurrent sf100 drive: 32.7 s boxed vs 10.4 s long —
      // BigDecimal churn amplifies under contention); kept for the
      // robustness and the primitive buffer. round(·,2) HALF_UP on a
      // nonnegative scale-4 integer is (rev_c + 50) div 100. Headroom:
      // elements ≤ ~1.1e9, so sums are exact below ~8e9 rows/(year,
      // nation) group (~200-TB lineitem); guarded loudly like
      // q_cov_exact.
      val rev = Tables.lineitem(s, d)
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        // customer scales with SF — size-guarded hint (Guards.dimHint:
        // broadcast while the table's bytes prove it small, AQE beyond).
        .join(Guards.dimHint(s, d, "customer",
            Tables.customer(s, d).select("c_custkey", "c_nationkey")),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .groupBy(year(col("o_orderdate")).as("order_year"), col("n_name"))
        .agg(
          sum(round(col("l_extendedprice") * 100).cast("long") *
            (lit(100L) - round(col("l_discount") * 100).cast("long"))).as("rev_l"),
          count(lit(1)).as("n"),
          max(round(col("l_extendedprice") * 100).cast("long")).as("maxc"))
        .select(col("order_year"), col("n_name"),
          when(col("n").cast("double") * col("maxc").cast("double") * 100.0 < 8e18,
            (expr("(rev_l + 50) div 100").cast("double") / 100.0))
            .otherwise(expr("raise_error('q_market_share: long revenue-sum headroom " +
              "exceeded - use the decimal accumulation form')")).as("revenue"),
          col("rev_l").cast("decimal(38,0)").as("rev_c"))
      val w = Window.partitionBy(col("order_year"))
      rev
        .withColumn("total_c", sum(col("rev_c")).over(w))
        .withColumn("share_ppm", expr("(1000000 * rev_c) div total_c"))
        .select(col("order_year"), col("n_name"), col("revenue"), col("share_ppm"))
        .orderBy("order_year", "n_name")
    },
    Some("""
      WITH rev AS (
        SELECT year(o_orderdate) AS order_year, n_name,
               sum(l_extendedprice::DECIMAL(18,2) * (1 - l_discount)::DECIMAL(4,2)) AS rev_d
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY 1, 2
      ), c AS (
        SELECT order_year, n_name,
               round(rev_d, 2)::DOUBLE AS revenue,
               (rev_d * 10000)::HUGEINT AS rev_c
        FROM rev
      )
      SELECT order_year, n_name, revenue,
             ((1000000 * rev_c) // CAST(sum(rev_c) OVER (PARTITION BY order_year) AS HUGEINT))::BIGINT AS share_ppm
      FROM c
      ORDER BY order_year, n_name
    """.stripMargin.trim)
  )

  /** Inter-event gap: days between each customer's first and second order. */
  val qFirstOrderGap: QueryDef = QueryDef(
    "q_first_order_gap",
    (s, d) => {
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
      Tables.orders(s, d)
        .withColumn("rn", row_number().over(w))
        .withColumn("next_date", lead(col("o_orderdate"), 1).over(w))
        .filter(col("rn") === 1 && col("next_date").isNotNull)
        .select(
          col("o_custkey"),
          unix_micros(col("o_orderdate").cast("timestamp")).as("first_us"),
          unix_micros(col("next_date").cast("timestamp")).as("second_us"),
          ((unix_micros(col("next_date").cast("timestamp")) -
            unix_micros(col("o_orderdate").cast("timestamp"))) / lit(86400000000L))
            .cast("long").as("gap_days")
        )
        .orderBy("o_custkey")
    },
    Some("""
      SELECT o_custkey,
             epoch_us(o_orderdate) AS first_us,
             epoch_us(next_date) AS second_us,
             (epoch_us(next_date) - epoch_us(o_orderdate)) // 86400000000 AS gap_days
      FROM (SELECT o_custkey, o_orderdate,
                   row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn,
                   lead(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS next_date
            FROM orders)
      WHERE rn = 1 AND next_date IS NOT NULL
      ORDER BY o_custkey
    """.stripMargin.trim)
  )

  /** Set operation: customers active in both the first and last order year. */
  val qSetOps: QueryDef = QueryDef(
    "q_set_ops",
    (s, d) => {
      val o = Tables.orders(s, d)
      val early = o.filter(year(col("o_orderdate")) === 1995).select(col("o_custkey"))
      val late = o.filter(year(col("o_orderdate")) === 2001).select(col("o_custkey"))
      early.intersect(late).orderBy("o_custkey")
    },
    Some("""
      SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
      INTERSECT
      SELECT o_custkey FROM orders WHERE year(o_orderdate) = 2001
      ORDER BY o_custkey
    """.stripMargin.trim)
  )

  /** Left outer join with aggregate over the nullable side. */
  val qLeftJoin: QueryDef = QueryDef(
    "q_left_join",
    (s, d) => {
      val big = Tables.orders(s, d).filter(col("o_totalprice") > 400000)
        .select(col("o_custkey"), col("o_totalprice"))
      Tables.customer(s, d)
        .join(big, col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"), col("c_name"))
        .agg(
          sum(when(col("o_custkey").isNotNull, 1).otherwise(0)).as("n_big_orders"),
          round(coalesce(sum(col("o_totalprice")), lit(0.0)), 2).as("big_total")
        )
        .orderBy("c_custkey")
    },
    Some("""
      SELECT c_custkey, c_name,
             sum(CASE WHEN o_custkey IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_big_orders,
             round(coalesce(sum(o_totalprice), 0.0), 2) AS big_total
      FROM customer
      LEFT JOIN (SELECT o_custkey, o_totalprice FROM orders WHERE o_totalprice > 400000) o
        ON c_custkey = o_custkey
      GROUP BY c_custkey, c_name
      ORDER BY c_custkey
    """.stripMargin.trim)
  )

  /** Full outer join: event actors vs the customer dimension — rows survive
    * from both unmatched sides. */
  val qFullOuter: QueryDef = QueryDef(
    "q_full_outer",
    (s, d) => {
      val actors = Tables.events(s, d).groupBy(col("user_id")).agg(count(lit(1)).as("n_events"))
      val cust = Tables.customer(s, d).select(col("c_custkey"), col("c_mktsegment"))
      actors
        .join(cust, col("user_id") === col("c_custkey"), "full_outer")
        .select(
          coalesce(col("user_id"), col("c_custkey")).as("entity_id"),
          coalesce(col("n_events"), lit(0L)).as("n_events"),
          coalesce(col("c_mktsegment"), lit("(none)")).as("segment"),
          (col("user_id").isNotNull && col("c_custkey").isNotNull).as("matched")
        )
        .orderBy("entity_id")
    },
    Some("""
      SELECT coalesce(user_id, c_custkey) AS entity_id,
             coalesce(n_events, 0) AS n_events,
             coalesce(c_mktsegment, '(none)') AS segment,
             (user_id IS NOT NULL AND c_custkey IS NOT NULL) AS matched
      FROM (SELECT user_id, count(*) AS n_events FROM events GROUP BY user_id) a
      FULL OUTER JOIN (SELECT c_custkey, c_mktsegment FROM customer) c
        ON user_id = c_custkey
      ORDER BY entity_id
    """.stripMargin.trim)
  )

  /** LIKE / regexp predicate filters over text. */
  val qLikeFilter: QueryDef = QueryDef(
    "q_like_filter",
    (s, d) =>
      Tables.documents(s, d)
        .filter(col("text").like("%spark%") && col("source").like("src1%"))
        .withColumn("has_pair", col("text").rlike("window (join|merge)"))
        .groupBy(col("source"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(when(col("has_pair"), 1).otherwise(0)).as("n_pair_docs")
        )
        .orderBy("source"),
    Some("""
      SELECT source, count(*) AS n_docs,
             sum(CASE WHEN regexp_matches(text, 'window (join|merge)') THEN 1 ELSE 0 END)::BIGINT AS n_pair_docs
      FROM documents
      WHERE text LIKE '%spark%' AND source LIKE 'src1%'
      GROUP BY source
      ORDER BY source
    """.stripMargin.trim)
  )

  /** Full CUBE over two dimensions (all four grouping sets). */
  val qCube: QueryDef = QueryDef(
    "q_cube",
    (s, d) =>
      Tables.orders(s, d)
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"), round(avg(col("o_totalprice")), 4).as("avg_price"))
        .select(
          coalesce(col("o_orderstatus"), lit("(all)")).as("orderstatus"),
          coalesce(col("o_orderpriority"), lit("(all)")).as("orderpriority"),
          col("n_orders"),
          col("avg_price")
        )
        .orderBy("orderstatus", "orderpriority"),
    Some("""
      SELECT coalesce(o_orderstatus, '(all)') AS orderstatus,
             coalesce(o_orderpriority, '(all)') AS orderpriority,
             count(*) AS n_orders,
             round(avg(o_totalprice), 4) AS avg_price
      FROM orders
      GROUP BY CUBE (o_orderstatus, o_orderpriority)
      ORDER BY orderstatus, orderpriority
    """.stripMargin.trim)
  )

  /** Ordered string aggregation (LISTAGG / string_agg): sorted distinct
    * active years per customer, comma-joined. */
  val qStringAgg: QueryDef = QueryDef(
    "q_string_agg",
    (s, d) =>
      // BIT-MASK year set (round 16; was collect_set): distinct years per
      // customer live in [1970, 2033], so the set is one bit_or over
      // shiftleft(1, year−1970) — a primitive-long codegen HashAggregate
      // with map-side partials instead of an ObjectHashAggregate carrying
      // a boxed set per group (13.0 s / 7.2× DuckDB at sf10). The mask
      // decodes to the same ascending comma-joined string AFTER the
      // aggregate — a ≤64-element HOF per OUTPUT row (1.5M), not per
      // input row (15M), outside the hot aggregate path.
      // Domain guard (r17, advisor): Java shift semantics wrap the shift
      // amount mod 64, so a year outside [1970, 2033] would fold onto a
      // WRONG year's bit — plausible output, silent corruption. The old
      // collect_set form was domain-safe; this one raises instead.
      Tables.orders(s, d)
        .groupBy(col("o_custkey"))
        .agg(
          expr("""bit_or(shiftleft(1L,
                 CASE WHEN year(o_orderdate) BETWEEN 1970 AND 2033
                      THEN year(o_orderdate) - 1970
                      ELSE raise_error(concat(
                        'q_string_agg: orderdate year outside the [1970,2033] bit-mask domain: ',
                        cast(year(o_orderdate) AS STRING))) END))""").as("mask"),
          count(lit(1)).as("n_orders"))
        .select(
          col("o_custkey"),
          expr("""array_join(transform(
                    filter(sequence(0, 63), b -> (shiftright(mask, b) & 1L) = 1L),
                    b -> cast(b + 1970 as string)), ',')""").as("active_years"),
          col("n_orders"))
        .orderBy("o_custkey"),
    Some("""
      SELECT o_custkey,
             array_to_string(list_sort(list_distinct(list(year(o_orderdate)))), ',') AS active_years,
             count(*) AS n_orders
      FROM orders
      GROUP BY o_custkey
      ORDER BY o_custkey
    """.stripMargin.trim)
  )

  /** EXCEPT set operation: customers active early but not late. */
  val qExcept: QueryDef = QueryDef(
    "q_except",
    (s, d) => {
      val o = Tables.orders(s, d)
      val early = o.filter(year(col("o_orderdate")) === 1995).select(col("o_custkey"))
      val late = o.filter(year(col("o_orderdate")) >= 1999).select(col("o_custkey"))
      early.except(late).orderBy("o_custkey")
    },
    Some("""
      SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
      EXCEPT
      SELECT o_custkey FROM orders WHERE year(o_orderdate) >= 1999
      ORDER BY o_custkey
    """.stripMargin.trim)
  )

  /** Statistical outlier filter: events whose value is >= 2 rounded
    * standard deviations from their user's mean — the data-quality
    * filtering shape (both sides compare the same rounded z).
    *
    * Per-user mu/sigma/n ride whole-partition window frames over ONE
    * user_id exchange — no self-join and no broadcast of a per-user
    * stats frame (which scales with the user population and would
    * hard-fail the 8 GB broadcast ceiling on a billion-user corpus). */
  val qZscoreOutliers: QueryDef = QueryDef(
    "q_zscore_outliers",
    (s, d) => {
      val w = Window.partitionBy(col("user_id"))
      Tables.events(s, d)
        .withColumn("mu", avg(col("value")).over(w))
        .withColumn("sigma", stddev_samp(col("value")).over(w))
        .withColumn("n", count(lit(1)).over(w))
        .filter(col("n") >= 3 && col("sigma") > 0)
        .withColumn("z", round((col("value") - col("mu")) / col("sigma"), 3))
        .filter(abs(col("z")) >= 2.0)
        .select(col("event_id"), col("user_id"), round(col("value"), 2).as("value"), col("z"))
        .orderBy("event_id")
    },
    Some("""
      SELECT event_id, user_id, round(value, 2) AS value, z
      FROM (
        SELECT e.event_id, e.user_id, e.value,
               round((e.value - s.mu) / s.sigma, 3) AS z
        FROM events e
        JOIN (SELECT user_id, avg(value) AS mu, stddev_samp(value) AS sigma, count(*) AS n
              FROM events GROUP BY user_id) s
          ON e.user_id = s.user_id
        WHERE s.n >= 3 AND s.sigma > 0)
      WHERE abs(z) >= 2.0
      ORDER BY event_id
    """.stripMargin.trim)
  )

  /** Gaps-and-islands: per-user consecutive-active-day streaks via the
    * classic `day − row_number` island key (consecutive days share it).
    * Everything — the (user, day) distinct, the ordering window, and both
    * aggregates — rides ONE user_id exchange chain; integers end to end. */
  val qStreaks: QueryDef = QueryDef(
    "q_streaks",
    (s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
      val days = Tables.events(s, d)
        .select(col("user_id"), to_date(col("ts")).as("day"))
        .distinct()
      val islands = days
        .withColumn("island", datediff(col("day"), lit("2024-01-01")) - row_number().over(w))
        .groupBy(col("user_id"), col("island"))
        .agg(count(lit(1)).as("len"))
      islands
        .groupBy(col("user_id"))
        .agg(
          sum(col("len")).as("n_active_days"),
          max(col("len")).as("longest_streak"),
          count(lit(1)).as("n_streaks"))
        .orderBy("user_id")
    },
    Some("""
      WITH days AS (SELECT DISTINCT user_id, ts::DATE AS day FROM events),
      isl AS (
        SELECT user_id,
               date_diff('day', DATE '2024-01-01', day) - row_number() OVER (PARTITION BY user_id ORDER BY day) AS island
        FROM days
      ), streaks AS (
        SELECT user_id, island, count(*) AS len FROM isl GROUP BY user_id, island
      )
      SELECT user_id, sum(len)::BIGINT AS n_active_days,
             max(len)::BIGINT AS longest_streak, count(*) AS n_streaks
      FROM streaks
      GROUP BY user_id
      ORDER BY user_id
    """.stripMargin.trim)
  )

  /** Day-over-day change per event type in exact basis points. The delta
    * is routinely NEGATIVE here, which exercises the integer-division
    * agreement on real data: BOTH engines truncate toward zero (verified
    * empirically: Spark `div` and DuckDB integer `//` each give
    * -7/2 = -3), so the plain quotient is bit-identical. */
  val qPercentChange: QueryDef = QueryDef(
    "q_percent_change",
    (s, d) => {
      val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
      Tables.events(s, d)
        .groupBy(col("event_type"), date_format(col("ts"), "yyyy-MM-dd").as("day"))
        .agg(sum(round(col("value") * 100).cast("long")).as("v"))
        .withColumn("prev", lag(col("v"), 1).over(w))
        .select(col("event_type"), col("day"), (col("v") / 100.0).as("value"),
          expr("(10000 * (v - prev)) div prev").as("change_bp"))
        .orderBy("event_type", "day")
    },
    Some("""
      WITH daily AS (
        SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
               sum(CAST(round(value * 100) AS BIGINT))::BIGINT AS v
        FROM events
        GROUP BY event_type, day
      )
      SELECT event_type, day, v / 100.0 AS value,
             (10000 * (v - lag(v) OVER w)) // (lag(v) OVER w) AS change_bp
      FROM daily
      WINDOW w AS (PARTITION BY event_type ORDER BY day)
      ORDER BY event_type, day
    """.stripMargin.trim)
  )

  /** Bag-semantics set operations — INTERSECT ALL / EXCEPT ALL keep
    * MULTIPLICITY (min/difference of per-row counts), a different operator
    * from [[qSetOps]]/[[qExcept]]'s set semantics: a customer with 3 early
    * and 2 late orders appears twice in the intersection and once in the
    * difference. Spark plans both as count-aggregate + generate (one
    * shuffle each) rather than a join per duplicate. The grouped output
    * keeps the result deterministic. */
  val qSetOpsAll: QueryDef = QueryDef(
    "q_set_ops_all",
    (s, d) => {
      val o = Tables.orders(s, d)
      val early = o.filter(year(col("o_orderdate")) === 1995).select(col("o_custkey"))
      val late = o.filter(year(col("o_orderdate")) =!= 1995).select(col("o_custkey"))
      val both = early.intersectAll(late).groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n")).withColumn("op", lit("intersect_all"))
      val diff = early.exceptAll(late).groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n")).withColumn("op", lit("except_all"))
      both.unionByName(diff)
        .select(col("op"), col("o_custkey"), col("n"))
        .orderBy("op", "o_custkey")
    },
    Some("""
      WITH early AS (SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995),
      late AS (SELECT o_custkey FROM orders WHERE year(o_orderdate) <> 1995),
      ia AS (SELECT o_custkey FROM early INTERSECT ALL SELECT o_custkey FROM late),
      ea AS (SELECT o_custkey FROM early EXCEPT ALL SELECT o_custkey FROM late)
      SELECT 'intersect_all' AS op, o_custkey, count(*) AS n FROM ia GROUP BY o_custkey
      UNION ALL
      SELECT 'except_all' AS op, o_custkey, count(*) AS n FROM ea GROUP BY o_custkey
      ORDER BY op, o_custkey
    """.stripMargin.trim)
  )

  /** Event-type transition matrix (first-order Markov estimate): for every
    * consecutive pair in a user's (ts, event_id)-ordered stream, count
    * (from → to) transitions and report each row's share of its FROM
    * state in exact integer per-mille — the behavioral-flow diagnostic
    * behind session/funnel design (funnels assert a FIXED order; the
    * matrix measures every observed order). One user_id exchange for the
    * lag; the matrix aggregate and the per-FROM share window run over
    * ≤types² cells. */
  val qEventMarkov: QueryDef = QueryDef(
    "q_event_markov",
    (s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val trans = Tables.events(s, d)
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
        .withColumn("next_type", lead(col("event_type"), 1).over(w))
        .filter(col("next_type").isNotNull)
        .groupBy(col("event_type").as("from_type"), col("next_type").as("to_type"))
        .agg(count(lit(1)).as("n_trans"))
      trans
        .withColumn("from_total",
          sum(col("n_trans")).over(Window.partitionBy(col("from_type"))))
        .select(col("from_type"), col("to_type"), col("n_trans"),
          expr("(1000 * n_trans) div from_total").as("share_pm"))
        .orderBy("from_type", "to_type")
    },
    Some("""
      WITH t AS (
        SELECT event_type AS from_type,
               lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_type
        FROM events
      ), m AS (
        SELECT from_type, to_type, count(*) AS n_trans
        FROM t
        WHERE to_type IS NOT NULL
        GROUP BY from_type, to_type
      )
      SELECT from_type, to_type, n_trans,
             ((1000 * n_trans) // (sum(n_trans) OVER (PARTITION BY from_type)))::BIGINT AS share_pm
      FROM m
      ORDER BY from_type, to_type
    """.stripMargin.trim)
  )

  /** Cumulative adoption curve per event type: running distinct users is
    * NOT windowable directly at scale (a cumulative count(DISTINCT)
    * buffers every key per frame) — the linear form reduces each
    * (user, type) pair to its FIRST day (one exchange, min-aggregated
    * map-side), rolls those up to per-(type, day) first-adoptions, and
    * prefix-sums the ≤types×days aggregate. The daily adopter delta rides
    * along. */
  val qRunningDistinct: QueryDef = QueryDef(
    "q_running_distinct",
    (s, d) => {
      val firstSeen = Tables.events(s, d)
        .select(col("user_id"), col("event_type"),
          date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"))
        .groupBy(col("user_id"), col("event_type"))
        .agg(min(col("day")).as("first_day"))
      firstSeen
        .groupBy(col("event_type"), col("first_day").as("day"))
        .agg(count(lit(1)).as("new_adopters"))
        .withColumn("cum_adopters",
          sum(col("new_adopters")).over(
            Window.partitionBy(col("event_type")).orderBy(col("day"))))
        .select(col("event_type"), col("day"), col("new_adopters"), col("cum_adopters"))
        .orderBy("event_type", "day")
    },
    Some("""
      WITH fs AS (
        SELECT user_id, event_type,
               min(strftime(date_trunc('day', ts), '%Y-%m-%d')) AS first_day
        FROM events
        GROUP BY user_id, event_type
      ), daily AS (
        SELECT event_type, first_day AS day, count(*) AS new_adopters
        FROM fs GROUP BY event_type, first_day
      )
      SELECT event_type, day, new_adopters,
             (sum(new_adopters) OVER (PARTITION BY event_type ORDER BY day
                                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::BIGINT
               AS cum_adopters
      FROM daily
      ORDER BY event_type, day
    """.stripMargin.trim)
  )

  /** WINDOW FUNNEL (the ClickHouse `windowFunnel` shape) — the time-bound
    * sequential form the stage-count funnels (`q_funnel`/`q_funnel_metrics`)
    * don't cover: a user reaches level L iff a strictly ordered
    * view → click → purchase chain EXISTS with the whole chain inside a
    * 24 h window of its first event; the table is the level histogram
    * (0..3 → user count). Ordering is strict (ts, event_id) — the repo's
    * as-of tie rule — so levels are deterministic under same-ts events.
    *
    * The JVM pass is greedy-optimal per start: for a fixed first view,
    * the earliest strictly-later click admits the earliest purchase, so
    * scanning views in order finds a chain iff one exists (⇔ the oracle's
    * EXISTS triple join, which is quadratic only in DuckDB).
    *
    * Scale shape: ONE user_id exchange, per-user work linear in that
    * user's events (sort + two monotone pointers per level) — no
    * self-joins; the level fold is a ≤4-row aggregate. */
  /** The shared greedy funnel kernel: max level reached by a strictly
    * (us, eid)-ordered view→click→purchase chain whose span fits
    * `windowUs`. Greedy-optimal per start (earliest later click admits
    * the earliest purchase), so it equals the EXISTS-chain semantics.
    * Used by the batch op's per-user group pass AND the streaming twin
    * ([[graft.streaming.StreamWindowFunnel]]) so both compute identical
    * levels. `evs`: (event_type, us, event_id), any order. */
  private[graft] def funnelLevel(evs: Array[(String, Long, Long)],
      windowUs: Long): Int = {
    val sorted = evs.sortBy { case (_, us, eid) => (us, eid) }
    def firstAfter(tpe: String, from: Int): Int = {
      var i = from
      while (i < sorted.length && sorted(i)._1 != tpe) i += 1
      i
    }
    var level = 0
    var vi = firstAfter("view", 0)
    if (vi < sorted.length) level = 1
    while (vi < sorted.length && level < 3) {
      if (sorted(vi)._1 == "view") {
        val ci = firstAfter("click", vi + 1)
        if (ci < sorted.length) {
          if (level < 2 && sorted(ci)._2 - sorted(vi)._2 <= windowUs) level = 2
          val pi = firstAfter("purchase", ci + 1)
          if (pi < sorted.length && sorted(pi)._2 - sorted(vi)._2 <= windowUs)
            level = 3
        }
      }
      vi += 1
    }
    level
  }

  /** One-pass funnel level over rows ALREADY (us, eid)-ordered — the
    * spill-safe batch kernel. Equivalent to [[funnelLevel]] (both decide
    * the EXISTS-chain predicate; PropertySpec cross-checks them on random
    * histories) but O(1) memory per user instead of materializing and
    * sorting the user's events in an array — the difference between a
    * hot user (≥100k events) spilling through Spark's external sort and
    * one task buffering the whole history on heap.
    *
    * State: `lastViewUs` (the latest view so far — if it isn't within W
    * of a click, no earlier view is) and `maxPairViewUs` (the max view
    * time over view<click pairs — the only chain fact a future purchase
    * needs, since the span check depends on the view alone). */
  private[graft] def funnelLevelOrdered(evs: Iterator[(String, Long)],
      windowUs: Long): Int = {
    var lastViewUs = Long.MinValue
    var maxPairViewUs = Long.MinValue
    var level = 0
    while (level < 3 && evs.hasNext) {
      val (tpe, us) = evs.next()
      tpe match {
        case "view" =>
          if (level < 1) level = 1
          lastViewUs = us // ascending order: always the latest so far
        case "click" =>
          if (lastViewUs != Long.MinValue) {
            if (level < 2 && us - lastViewUs <= windowUs) level = 2
            if (lastViewUs > maxPairViewUs) maxPairViewUs = lastViewUs
          }
        case "purchase" =>
          if (maxPairViewUs != Long.MinValue && us - maxPairViewUs <= windowUs)
            level = 3
        case _ => ()
      }
    }
    level
  }

  /** Per-user funnel levels of any events-shaped frame (user_id,
    * event_type, ts, event_id) — the distributable core of
    * [[qWindowFunnel]], exposed so specs can drive synthetic hot users
    * through the exact production topology. ONE user_id exchange;
    * `flatMapSortedGroups` folds the (us, eid) secondary order into the
    * exchange's existing group sort (external, spill-capable), so the
    * kernel sees each user's rows ordered without any per-user buffer. */
  private[graft] def windowFunnelLevels(events: DataFrame,
      windowUs: Long): DataFrame = {
    val s = events.sparkSession
    import s.implicits._
    events
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"), col("event_id"))
      .as[(Long, String, Long, Long)]
      .groupByKey(_._1)
      .flatMapSortedGroups(col("us"), col("event_id")) { (uid, it) =>
        Iterator.single(
          (uid, funnelLevelOrdered(it.map { case (_, t, us, _) => (t, us) },
            windowUs)))
      }
      .toDF("user_id", "level")
  }

  /** HOT-KEY GUARD (round 13; the cdc_late_arrivals pattern): the
    * flatMapSortedGroups kernel funnels a hot user's whole sequence
    * through one task's external sort, so above [[Guards.funnelSortCap]]
    * rows for any one user — the SAME memoized "events_user" stat the
    * sessionize/scd2/late-arrivals guards read, one count job for all
    * four lanes — this delegates to [[ScalePatterns.qWindowFunnelDist]]'s
    * chained-prefix-max twin (identical output, same oracle; spec-proven
    * level-identity on an 80%-hot frame). The cap is the funnel's OWN
    * (default 32M, not the shared 2M): the fold is O(1)-state streaming
    * over the SPILLABLE group sort — no heap ceiling, one output row per
    * user — and the measured crossover vs the corpus-bound twin sits at
    * ~50M hot rows on the 32-core box (1M: 6.6 vs 16.4 s; 5M: 15.6 vs
    * 23.7; 20M: 71.7 vs 169.4; 50M: 163.7 vs 167.5 — curve in PLANS.md
    * round 13). */
  val qWindowFunnel: QueryDef = QueryDef(
    "q_window_funnel",
    (s, d) => {
      val hottest = Guards.maxGroupRows(s, d, "events_user") {
        Tables.events(s, d).groupBy(col("user_id")).agg(count(lit(1)).as("n"))
          .agg(max(col("n"))).first().getLong(0)
      }
      if (hottest > Guards.funnelSortCap(s)) ScalePatterns.qWindowFunnelDist.fn(s, d)
      else
        // no event-type prefilter: a user with no funnel events still owns a
        // group and lands at level 0 (the oracle's all-users frame); the
        // one-pass kernel skips non-funnel rows for free
        windowFunnelLevels(Tables.events(s, d), 86400000000L)
          .groupBy(col("level"))
          .agg(count(lit(1)).as("n_users"))
          .orderBy("level")
    },
    Some("""
      WITH e AS (
        SELECT user_id, event_type, epoch_us(ts) AS us, event_id
        FROM events WHERE event_type IN ('view', 'click', 'purchase')
      ), l3 AS (
        SELECT DISTINCT a.user_id FROM e a JOIN e b USING (user_id) JOIN e c USING (user_id)
        WHERE a.event_type = 'view' AND b.event_type = 'click' AND c.event_type = 'purchase'
          AND (b.us > a.us OR (b.us = a.us AND b.event_id > a.event_id))
          AND (c.us > b.us OR (c.us = b.us AND c.event_id > b.event_id))
          AND c.us - a.us <= 86400000000
      ), l2 AS (
        SELECT DISTINCT a.user_id FROM e a JOIN e b USING (user_id)
        WHERE a.event_type = 'view' AND b.event_type = 'click'
          AND (b.us > a.us OR (b.us = a.us AND b.event_id > a.event_id))
          AND b.us - a.us <= 86400000000
      ), l1 AS (
        SELECT DISTINCT user_id FROM e WHERE event_type = 'view'
      ), lv AS (
        SELECT user_id,
               CASE WHEN user_id IN (SELECT user_id FROM l3) THEN 3
                    WHEN user_id IN (SELECT user_id FROM l2) THEN 2
                    WHEN user_id IN (SELECT user_id FROM l1) THEN 1
                    ELSE 0 END AS level
        FROM (SELECT DISTINCT user_id FROM events)
      )
      SELECT level, count(*)::BIGINT AS n_users
      FROM lv GROUP BY level ORDER BY level
    """.stripMargin.trim)
  )

  val all: Seq[QueryDef] = Seq(
    qNtile, qDistinctUsers, qCorrSubquery, qMarketShare, qFirstOrderGap, qSetOps,
    qLeftJoin, qFullOuter, qLikeFilter, qCube, qStringAgg, qExcept, qZscoreOutliers,
    qStreaks, qPercentChange, qSetOpsAll, qEventMarkov, qRunningDistinct,
    qWindowFunnel
  )
}
