package graft.operators

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}

/** Scale-pattern operators: plan shapes that only matter at 100 TB, with
  * results that stay oracle-checkable at any SF.
  */
object ScalePatterns {

  /** Skew-resilient fact/dim join via key salting.
    *
    * The fact side gets a deterministic salt in [0, S); the dim side is
    * replicated S times; the join key becomes (key, salt). The RESULT is
    * identical to the plain join — salting only changes the partitioning —
    * so the oracle is the unsalted SQL join. At 100 TB this is the pattern
    * for hot keys that overwhelm a single reducer; here S=8.
    * (AQE's skew-join handles moderate skew automatically; explicit salting
    * is the deterministic fallback when one key exceeds every split
    * threshold.) */
  val qSkewJoinSalted: QueryDef = QueryDef(
    "q_skew_join_salted",
    (s, d) => {
      val S = 8
      // ROUND 17 probe, adjudicated KEEP (r16 verdict #5): a keys-only
      // salted join with the dim's (c_name, c_mktsegment) attached
      // post-agg LOSES at sf10 — broadcast attach 13.5 s / shuffle attach
      // 11.8 s vs 8.9 s for this shape (A/B'd in-session, 2 rounds) — the
      // extra join stage costs more than the 8×-replicated ~40 B of
      // strings it saves; the partial agg downstream of the salted join
      // is one pipeline here. Revisit only if the dim grows wide enough
      // that replicated bytes dominate a stage boundary.
      val fact = Tables.events(s, d)
        .select(col("user_id"), col("value"), col("event_id"))
        .withColumn("salt", pmod(col("event_id"), lit(S)).cast("int"))
      val dim = Tables.customer(s, d)
        .select(col("c_custkey").as("user_id"), col("c_name"), col("c_mktsegment"))
        .withColumn("salt", explode(sequence(lit(0), lit(S - 1))))
      fact
        .join(dim, Seq("user_id", "salt"))
        .groupBy(col("user_id"), col("c_name"), col("c_mktsegment"))
        .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("total_value"))
        .orderBy("user_id")
    },
    Some("""
      SELECT user_id, c_name, c_mktsegment,
             count(*) AS n_events, round(sum(value), 2) AS total_value
      FROM events
      JOIN customer ON user_id = c_custkey
      GROUP BY user_id, c_name, c_mktsegment
      ORDER BY user_id
    """.stripMargin.trim)
  )

  /** ANALYZE-style per-column statistics — the Spark-side analog of the
    * reference's `maintenance_gpdb.sh` (vacuum/analyzedb upkeep): row
    * counts, null counts, distinct counts, and min/max rendered per column.
    * One pass over the table, one aggregate. */
  val cdcTableStats: QueryDef = QueryDef(
    "cdc_table_stats",
    (s, d) => {
      val o = Tables.orders(s, d)
      val stats = o.agg(
        count(lit(1)).as("n_rows"),
        sum(when(col("o_orderstatus").isNull, 1).otherwise(0)).as("nulls_status"),
        countDistinct(col("o_orderstatus")).as("nd_status"),
        countDistinct(col("o_custkey")).as("nd_custkey"),
        round(min(col("o_totalprice")), 2).as("min_price"),
        round(max(col("o_totalprice")), 2).as("max_price"),
        date_format(min(col("o_orderdate")), "yyyy-MM-dd").as("min_date"),
        date_format(max(col("o_orderdate")), "yyyy-MM-dd").as("max_date")
      )
      stats
    },
    Some("""
      SELECT count(*) AS n_rows,
             sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END)::BIGINT AS nulls_status,
             count(DISTINCT o_orderstatus) AS nd_status,
             count(DISTINCT o_custkey) AS nd_custkey,
             round(min(o_totalprice), 2) AS min_price,
             round(max(o_totalprice), 2) AS max_price,
             strftime(min(o_orderdate), '%Y-%m-%d') AS min_date,
             strftime(max(o_orderdate), '%Y-%m-%d') AS max_date
      FROM orders
    """.stripMargin.trim)
  )

  /** KMV-sketch distinct counting per group — the 100 TB substitute for
    * `count(DISTINCT ...)` (no full key-space shuffle; fixed-size mergeable
    * buffers). With k=4096 > |user space at every tested SF| the sketch
    * degenerates to EXACT, so the oracle is plain `count(DISTINCT ...)` —
    * round 5's sf0.1 parity sweep caught the original k=256 estimating
    * (1755 vs 1500 exact) once distinct users outgrew k, so k now clears
    * sf0.1's 1500 with headroom. The approximate regime is bounds-tested
    * in the spec with a small k and by sketch_window_merge's 3σ spec. */
  val sketchDistinctUsers: QueryDef = QueryDef(
    "sketch_distinct_users",
    (s, d) => {
      val kmv = graft.functions.Sketches.kmvDistinct(4096)
      Tables.events(s, d)
        .withColumn("h", xxhash64(col("user_id")))
        .groupBy(col("event_type"))
        .agg(kmv(col("h")).cast("long").as("n_users_sketch"), count(lit(1)).as("n_events"))
        .orderBy("event_type")
    },
    Some("""
      SELECT event_type, count(DISTINCT user_id) AS n_users_sketch, count(*) AS n_events
      FROM events
      GROUP BY event_type
      ORDER BY event_type
    """.stripMargin.trim)
  )

  /** Range (time-window) join: for every purchase, count the clicks from
    * ANY user in the preceding 15 minutes.
    *
    * Spark has no native inequality-join fast path — a raw theta join is a
    * broadcast nested loop (O(n*m), dead at scale). The scale-safe pattern:
    * quantize time into window-sized buckets, equi-join on bucket (probe
    * side explodes to the 2 buckets that can contain matches), then apply
    * the exact range predicate. Join fan-out is bounded by bucket
    * population, not table size. */
  val qRangeJoin: QueryDef = QueryDef(
    "q_range_join",
    (s, d) => {
      val winUs = 900000000L // 15 minutes in microseconds
      val ev = Tables.events(s, d)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), unix_micros(col("ts")).as("p_us"))
        .withColumn("bucket", explode(array(
          expr(s"p_us div $winUs") - 1, expr(s"p_us div $winUs"))))
      val clicks = ev.filter(col("event_type") === "click")
        .select(unix_micros(col("ts")).as("c_us"))
        .withColumn("bucket", expr(s"c_us div $winUs"))
      purchases
        .join(clicks, Seq("bucket"), "left")
        .withColumn("hit",
          col("c_us").isNotNull && col("c_us") >= col("p_us") - winUs && col("c_us") < col("p_us"))
        .groupBy(col("purchase_id"), col("p_us"))
        .agg(sum(when(col("hit"), 1).otherwise(0)).as("n_recent_clicks"))
        .orderBy("purchase_id")
    },
    Some("""
      SELECT p.event_id AS purchase_id, epoch_us(p.ts) AS p_us,
             sum(CASE WHEN c.ts IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_recent_clicks
      FROM (SELECT event_id, ts FROM events WHERE event_type = 'purchase') p
      LEFT JOIN (SELECT ts FROM events WHERE event_type = 'click') c
        ON epoch_us(c.ts) >= epoch_us(p.ts) - 900000000 AND epoch_us(c.ts) < epoch_us(p.ts)
      GROUP BY 1, 2
      ORDER BY purchase_id
    """.stripMargin.trim)
  )

  /** Pre-bucketed two-phase EXACT ranking — the scale-safe replacement for
    * `... OVER (PARTITION BY key ORDER BY v, id)` when `key` has few
    * distinct values (which caps window parallelism at #keys and sorts
    * N/#keys rows on single tasks — an OOM at 100×):
    *
    *  1. per-key min/max/count — one tiny broadcast aggregate;
    *  2. every row maps to one of B value-range buckets (narrow);
    *  3. per-(key, bucket) counts + a running-sum window over the
    *     keys×B-row aggregate give each bucket's global rank OFFSET;
    *  4. a row_number window partitioned by (key, bucket) — parallelism
    *     keys×B, each slice ~N/(keys×B) — plus the broadcast offset is the
    *     exact global rank.
    *
    * Input columns (key, v, id); output adds `c` (per-key count) and `r`
    * (exact 1-based global rank by (v, id) within key). Shared with
    * [[TpchMore.qRfmSegments]]' quintile scoring. */
  private[operators] def bucketedRank(data: org.apache.spark.sql.DataFrame,
      nBuckets: Int = 256): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bounds = broadcast(data.groupBy("key")
      .agg(min("v").as("vmin"), max("v").as("vmax"), count(lit(1)).as("c")))
    val bucketed = data.join(bounds, "key")
      .withColumn("bkt",
        least(lit(nBuckets - 1),
          floor((col("v") - col("vmin")) / (col("vmax") - col("vmin") + lit(1e-9)) * nBuckets))
          .cast("int"))
    val offsets = broadcast(
      bucketed.groupBy(col("key"), col("bkt")).agg(count(lit(1)).as("bn"))
        .withColumn("off", coalesce(
          sum(col("bn")).over(Window.partitionBy(col("key")).orderBy(col("bkt"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .select("key", "bkt", "off"))
    val wLocal = Window.partitionBy(col("key"), col("bkt")).orderBy(col("v"), col("id"))
    bucketed.join(offsets, Seq("key", "bkt"))
      .withColumn("r", row_number().over(wLocal) + col("off"))
  }

  /** [[bucketedRank]] RESTRICTED to a handful of target ranks (round 17,
    * r16 verdict #5): when a query needs only specific global ranks per
    * key (discrete/interpolated percentiles — ≤4 ranks), ranking every
    * row is waste. Same three scans and the same bucket arithmetic as
    * bucketedRank, but the per-(key, bucket) count aggregate — which
    * already determines that bucket b covers global ranks
    * [off+1, off+bn] — keeps ONLY the buckets containing a target rank,
    * and the final scan inner-joins that broadcast: non-target rows die
    * at the scan, and the row_number exchange carries ~|ranks|/B of the
    * corpus instead of all of it (measured 13.9 → 8.1 s at sf10 for the
    * disc twin, in-session A/B). `ranks` are Column expressions over the
    * per-key count `c`; output rows are exactly the target-rank rows with
    * the same (key, v, id, c, r) the full ranking would give them. */
  private def targetRankRows(data: org.apache.spark.sql.DataFrame,
      ranks: Seq[org.apache.spark.sql.Column],
      nBuckets: Int = 256): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bounds = broadcast(data.groupBy("key")
      .agg(min("v").as("vmin"), max("v").as("vmax"), count(lit(1)).as("c")))
    def bucketOf(df: org.apache.spark.sql.DataFrame) =
      df.join(bounds, "key")
        .withColumn("bkt",
          least(lit(nBuckets - 1),
            floor((col("v") - col("vmin")) / (col("vmax") - col("vmin") + lit(1e-9)) * nBuckets))
            .cast("int"))
    val targets = broadcast(
      bucketOf(data).groupBy(col("key"), col("bkt")).agg(count(lit(1)).as("bn"))
        .withColumn("off", coalesce(
          sum(col("bn")).over(Window.partitionBy(col("key")).orderBy(col("bkt"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .join(bounds.select("key", "c"), "key")
        .filter(ranks.map(t => t > col("off") && t <= col("off") + col("bn"))
          .reduce(_ || _))
        .select("key", "bkt", "off"))
    bucketOf(data).join(targets, Seq("key", "bkt"))
      .withColumn("r", row_number().over(
        Window.partitionBy(col("key"), col("bkt")).orderBy(col("v"), col("id"))) + col("off"))
      .filter(ranks.map(col("r") === _).reduce(_ || _))
  }

  /** SQL ntile(n) computed arithmetically from [[bucketedRank]]'s exact
    * global rank `r` and per-key count `c`: the first (c mod n) tiles hold
    * (c div n)+1 rows, the rest (c div n); c < n degenerates to the first
    * branch entirely (the otherwise-branch's div-by-zero is never taken). */
  private[operators] def sqlTile(n: Int): org.apache.spark.sql.Column =
    when(col("r") <= (col("c") % n) * (expr(s"c div $n") + 1),
      expr(s"(r - 1) div ((c div $n) + 1) + 1"))
      .otherwise(expr(s"(c % $n) + ((r - (c % $n) * ((c div $n) + 1) - 1) div (c div $n)) + 1"))
      .cast("int")

  /** Distributed EXACT ntile via [[bucketedRank]]; the SQL ntile
    * bucket-size convention (first c mod n tiles get the extra row) is
    * computed arithmetically from (rank, count). Output and oracle are
    * IDENTICAL to [[AnalyticsExt.qNtile]] — the same answer, from a plan
    * whose widest sort is 1/B the size. */
  val qNtileDist: QueryDef = QueryDef(
    "q_ntile_dist",
    (s, d) => {
      val data = Tables.orders(s, d)
        .select(col("o_orderpriority").as("key"), col("o_totalprice").as("v"),
          col("o_orderkey").as("id"))
      val ranked = bucketedRank(data)
        .withColumn("quartile", sqlTile(4))
      ranked.groupBy(col("key").as("o_orderpriority"), col("quartile"))
        .agg(
          count(lit(1)).as("n_orders"),
          round(min(col("v")), 2).as("min_price"),
          round(max(col("v")), 2).as("max_price"))
        .orderBy("o_orderpriority", "quartile")
    },
    // the oracle is plain windowed ntile — same answer, different plan
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

  /** Distributed EXACT percentiles (p50/p90 with linear interpolation) via
    * the same pre-bucketed two-phase ranking as [[qNtileDist]]: Spark's
    * `percentile()` buffers EVERY group value in executor memory (an OOM at
    * 100× with few groups); here only the ≤4 rows at the interpolation
    * ranks per group survive the rank filter, and the interpolation uses
    * exactly Spark's formula (`v_lo·(hi−pos) + v_hi·(pos−lo)`). Output and
    * oracle are IDENTICAL to [[Olap.qPercentile]]. */
  val qPercentileDist: QueryDef = QueryDef(
    "q_percentile_dist",
    (s, d) => {
      val data = Tables.orders(s, d)
        .select(col("o_orderpriority").as("key"), col("o_totalprice").as("v"),
          col("o_orderkey").as("id"))
      def pos(p: Double) = lit(p) * (col("c") - 1) // Spark: percentage * (count-1)
      def loR(p: Double) = floor(pos(p)) + 1 // 1-based rank of the lower value
      def hiR(p: Double) = ceil(pos(p)) + 1
      // round 17: only the ≤4 interpolation-rank buckets reach the window
      val ranked = targetRankRows(data,
        Seq(loR(0.5), hiR(0.5), loR(0.9), hiR(0.9)))
      def interp(p: Double, vlo: org.apache.spark.sql.Column, vhi: org.apache.spark.sql.Column) =
        when(floor(pos(p)) === ceil(pos(p)), vlo)
          .otherwise(vlo * (ceil(pos(p)) - pos(p)) + vhi * (pos(p) - floor(pos(p))))
      ranked.groupBy(col("key"), col("c"))
        .agg(
          max(when(col("r") === loR(0.5), col("v"))).as("v50lo"),
          max(when(col("r") === hiR(0.5), col("v"))).as("v50hi"),
          max(when(col("r") === loR(0.9), col("v"))).as("v90lo"),
          max(when(col("r") === hiR(0.9), col("v"))).as("v90hi"))
        .select(
          col("key").as("o_orderpriority"),
          round(interp(0.5, col("v50lo"), col("v50hi")), 4).as("p50"),
          round(interp(0.9, col("v90lo"), col("v90hi")), 4).as("p90"),
          col("c").as("n_orders"))
        .orderBy(col("o_orderpriority"))
    },
    // the oracle is the buffering percentile aggregate — same answer
    Some("""
      SELECT o_orderpriority,
             round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
             round(quantile_cont(o_totalprice, 0.9), 4) AS p90,
             count(*) AS n_orders
      FROM orders
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority
    """.stripMargin.trim)
  )

  /** Distributed EXACT rank distributions via [[bucketedRank]]: the window
    * ordering (v, id) is tie-free (id is the unique order key), so
    * `percent_rank = (r−1)/(c−1)` and `cume_dist = r/c` follow directly
    * from the exact global rank. Output and oracle are IDENTICAL to
    * [[Olap.qCumeDist]] — same answer, no #keys-bounded window sort. */
  val qCumeDistDist: QueryDef = QueryDef(
    "q_cume_dist_dist",
    (s, d) => {
      val data = Tables.orders(s, d)
        .filter(col("o_orderstatus") === "F")
        .select(col("o_orderpriority").as("key"), col("o_totalprice").as("v"),
          col("o_orderkey").as("id"))
      bucketedRank(data)
        .select(
          col("key").as("o_orderpriority"),
          col("id").as("o_orderkey"),
          // SQL percent_rank() is DEFINED as 0.0 for a 1-row partition;
          // the raw (r-1)/(c-1) would be 0/0 there. No bench corpus has a
          // 1-row priority group, but the guarded q_cume_dist delegation
          // must stay row-identical on ANY corpus shape.
          round(when(col("c") === 1, lit(0.0))
            .otherwise((col("r") - 1).cast("double") / (col("c") - 1)), 6).as("pct_rank"),
          round(col("r").cast("double") / col("c"), 6).as("cume"))
        .orderBy("o_orderpriority", "o_orderkey")
    },
    // the oracle is the plain windowed form — same answer
    Some("""
      SELECT o_orderpriority, o_orderkey,
             round(percent_rank() OVER w, 6) AS pct_rank,
             round(cume_dist() OVER w, 6) AS cume
      FROM orders
      WHERE o_orderstatus = 'F'
      WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
      ORDER BY o_orderpriority, o_orderkey
    """.stripMargin.trim)
  )

  /** Distributed EXACT discrete percentiles — the disc twin of
    * [[qPercentileDist]] and the scale path for
    * [[OrderedStats.qPercentileDisc]] (round 15: that lane was the last
    * unguarded low-cardinality ranking window — ~5 single-task whole-group
    * sorts at any SF, measured 30.9× behind DuckDB at sf10). The discrete
    * quantile is the value at exact global rank ceil(p·c), computed in
    * INTEGER arithmetic ((p_num·c + p_den − 1) div p_den) — no float
    * boundary can disagree with the plain lane's `min(v | cume_dist ≥ p)`
    * for any c below ~3e15 rows/group (the fl(0.9)·c drift bound).
    *
    * ROUND 17 (r16 verdict #5): routed through [[targetRankRows]] — the
    * full [[bucketedRank]] ranked EVERY row (full (key, bkt) exchange +
    * sort) when this query only needs 2 ranks per key; the pruned form
    * measures 13.9 → 8.1 s at sf10 (in-session A/B). Output identical
    * (oracle and the cap=1 plan-flip spec unchanged). */
  val qPercentileDiscDist: QueryDef = QueryDef(
    "q_percentile_disc_dist",
    (s, d) => {
      val data = Tables.orders(s, d)
        .select(col("o_orderpriority").as("key"),
          round(col("o_totalprice") * 100).cast("long").as("v"),
          col("o_orderkey").as("id"))
      val t50 = expr("(c + 1) div 2")        // ceil(0.5·c)
      val t90 = expr("(9 * c + 9) div 10")   // ceil(0.9·c)
      targetRankRows(data, Seq(t50, t90))
        .groupBy(col("key"), col("c"))
        .agg(
          max(when(col("r") === t50, col("v"))).as("p50c"),
          max(when(col("r") === t90, col("v"))).as("p90c"))
        .select(
          col("key").as("o_orderpriority"),
          (col("p50c") / 100.0).as("p50_disc"),
          (col("p90c") / 100.0).as("p90_disc"),
          col("c").as("n_orders"))
        .orderBy("o_orderpriority")
    },
    // the oracle is the buffering discrete-quantile aggregate — same answer
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

  /** Distributed order-cadence distribution (round 16) — the scale twin of
    * [[OrderedStats.qOrderCadence]] and the last lane off the unguarded
    * low-cardinality-window list: the plain form's cume_dist over 5 market
    * segments funnels the whole gap stream through 5 tasks (11.5 s vs
    * DuckDB 0.69 s at sf10). Not [[bucketedRank]] here (it reads its
    * input 3× — expensive when the input is the lag-window gap stream,
    * measured 38.8 s at sf10): gap_days has a TINY value domain (bounded
    * by the corpus's day span, ~2.5k distinct values), so the exact
    * distribution is a per-(segment, gap) COUNT HISTOGRAM — one hash
    * aggregate with map-side partials over the gap stream, ≤ segments ×
    * days rows out — and the discrete p50/p90 are the smallest gaps whose
    * cumulative count reaches ceil(p·c), computed by a running sum over
    * that tiny frame (integer comparisons; identical to the plain lane's
    * min(v | cume_dist ≥ p) by definition of cume_dist = cum/c). The mean
    * is Σ(gap·cnt)/c: every partial is an integer-valued double < 2⁵³
    * (Σ ≤ max_gap·n ≈ 2500·1.5e9 at 100×), so double accumulation is
    * EXACT in any order and equals the plain lane's avg(long) bit for
    * bit. Output and oracle are IDENTICAL to the plain lane; the domain
    * stays ~2.5k at any SF (the date RANGE is fixed — more data adds
    * count, not distinct gaps). */
  val qOrderCadenceDist: QueryDef = QueryDef(
    "q_order_cadence_dist",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val hist = OrderedStats.orderCadenceGaps(s, d)
        .groupBy(col("key"), col("v")).agg(count(lit(1)).as("cnt"))
      val wCum = Window.partitionBy(col("key")).orderBy(col("v"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wSeg = Window.partitionBy(col("key"))
      hist
        .withColumn("cum", sum(col("cnt")).over(wCum))
        .withColumn("c", sum(col("cnt")).over(wSeg))
        .withColumn("s", sum(col("v") * col("cnt")).over(wSeg))
        .groupBy(col("key"))
        .agg(
          max(col("c")).as("n_gaps"),
          min(when(col("cum") >= expr("(c + 1) div 2"), col("v"))).as("p50_gap"),
          min(when(col("cum") >= expr("(9 * c + 9) div 10"), col("v"))).as("p90_gap"),
          round(max(col("s")).cast("double") / max(col("c")), 2).as("avg_gap"))
        .select(col("key").as("c_mktsegment"), col("n_gaps"),
          col("p50_gap"), col("p90_gap"), col("avg_gap"))
        .orderBy("c_mktsegment")
    },
    // the oracle is the plain lane's buffering quantile_disc — same answer
    OrderedStats.qOrderCadence.oracle
  )

  /** Mergeable-sketch window rollup — the materialized-partial pattern that
    * makes 100 TB distinct counts cheap: persist a tiny KMV state per
    * (day), then answer ANY window (week here; month, quarter, arbitrary
    * ranges identically) by merging states — the raw corpus is scanned
    * ONCE ever, not once per window. KMV union is lossless (the k smallest
    * hashes of a union are among the union of per-day k-smallest), so the
    * merged estimate is BIT-IDENTICAL to a direct single-pass sketch of
    * the window — both are emitted side by side, and the spec asserts
    * their equality plus the 3σ error bound vs the exact count (k=64 →
    * σ ≈ 1/√62 ≈ 12.7%). sf0.001 weeks hold < k distinct users (exact
    * mode, estimate == count); sf0.01+ exercise the k-th-minimum
    * estimator branch.
    *
    * Approximate by construction → no SQL oracle (the driver's rows-only
    * check applies); `n_users_exact` rides along so every row still shows
    * the truth it approximates. */
  val sketchWindowMerge: QueryDef = QueryDef(
    "sketch_window_merge",
    (s, d) => {
      val k = 64
      val st = graft.functions.Sketches.kmvState(k)
      val hashed = Tables.events(s, d).select(
        date_format(date_trunc("week", col("ts")), "yyyy-MM-dd").as("week"),
        date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"),
        col("user_id"))
      // the persisted layer: one k-long state per day (k·8 bytes each)
      val daily = hashed
        .groupBy(col("week"), col("day"))
        .agg(st(xxhash64(col("user_id"))).as("state"))
      // window answer = merge of its days' states; collect_list order is
      // nondeterministic but distinct+sort+slice makes the merge canonical
      val merged = daily
        .groupBy(col("week"))
        .agg(count(lit(1)).as("n_days"),
          slice(array_sort(array_distinct(flatten(collect_list(col("state"))))), 1, k)
            .as("mstate"))
        .select(col("week"), col("n_days"),
          round(graft.functions.Sketches.kmvEstimate(col("mstate"), k), 2)
            .as("est_merged"))
      // direct one-pass sketch + exact truth, for the equality/error columns
      val direct = hashed
        .groupBy(col("week"))
        .agg(round(graft.functions.Sketches.kmvDistinct(k)(xxhash64(col("user_id"))), 2)
          .as("est_direct"))
      val exact = hashed.select(col("week"), col("user_id")).distinct()
        .groupBy(col("week")).agg(count(lit(1)).as("n_users_exact"))
      merged.join(direct, "week").join(exact, "week")
        .orderBy("week")
    },
    None // approximate: merged==direct equality + 3σ bound in the spec
  )

  /** JOIN-KEY SKEW REPORT — the diagnostic run BEFORE choosing between a
    * plain shuffle join, a salted join ([[qSkewJoinSalted]]) and an AQE
    * skew split: the per-key frequency profile of a prospective join
    * column (orders.o_custkey here) folded to one row — key cardinality,
    * min/max/mean frequency and the mass share of the heaviest 1 / 10
    * keys in per-mille. top1_pm near 1000 means one key owns the join:
    * salt or broadcast; flat top10_pm means a plain hash join is fine.
    *
    * Scale shape: one per-key count aggregate (the exchange the join
    * itself would pay), then a 1-row overall fold and a TakeOrdered
    * top-10 fold (never a whole-frame rank over the key spectrum); the
    * two 1-row sides meet in a broadcast nested-loop — the deliberate
    * 1-row pattern of q_idle_customers/pipeline_dataset_card. Everything
    * integer-exact. */
  val qKeySkewReport: QueryDef = QueryDef(
    "q_key_skew_report",
    (s, d) => {
      val counts = Tables.orders(s, d)
        .groupBy(col("o_custkey")).agg(count(lit(1)).as("cnt"))
      val overall = counts.agg(
        count(lit(1)).as("n_keys"), sum(col("cnt")).as("total"),
        min(col("cnt")).as("min_cnt"), max(col("cnt")).as("max_cnt"))
      val top10 = counts.orderBy(col("cnt").desc, col("o_custkey"))
        .limit(10).agg(max(col("cnt")).as("top1"), sum(col("cnt")).as("top10"))
      overall.crossJoin(broadcast(top10))
        .select(
          col("n_keys"), col("total"), col("min_cnt"), col("max_cnt"),
          expr("(1000 * total) div n_keys").as("mean_pm"),
          expr("(1000 * top1) div total").as("top1_pm"),
          expr("(1000 * top10) div total").as("top10_pm"))
        .orderBy("n_keys")
    },
    Some("""
      WITH c AS (
        SELECT o_custkey, count(*)::BIGINT AS cnt FROM orders GROUP BY o_custkey
      ), o AS (
        SELECT count(*)::BIGINT AS n_keys, sum(cnt)::BIGINT AS total,
               min(cnt)::BIGINT AS min_cnt, max(cnt)::BIGINT AS max_cnt
        FROM c
      ), t AS (
        SELECT max(cnt)::BIGINT AS top1, sum(cnt)::BIGINT AS top10
        FROM (SELECT cnt FROM c ORDER BY cnt DESC, o_custkey LIMIT 10)
      )
      SELECT n_keys, total, min_cnt, max_cnt,
             (1000 * total) // n_keys AS mean_pm,
             (1000 * top1) // total AS top1_pm,
             (1000 * top10) // total AS top10_pm
      FROM o, t
      ORDER BY n_keys
    """.stripMargin.trim)
  )

  /** KMV SET-OPERATION sketch — the θ-sketch intersection (Dasgupta et
    * al., "Theta Sketch Framework", 2016) over the SAME mergeable KMV
    * states [[sketchWindowMerge]] persists: estimated click-user /
    * purchase-user cardinalities AND their overlap, without ever
    * shuffling the user key space. θ = min of the two states' k-th
    * minima; hashes below θ present in BOTH states are a uniform sample
    * of the intersection at rate θ, so |A∩B| ≈ |common < θ| / θ. The
    * whole estimator is Column arithmetic over two broadcast 1-row
    * states (array_intersect + filter on k=512 arrays) — no driver math,
    * no UDF in the fold.
    *
    * Approximate (σ ≈ 1/√(k−2) ≈ 4.4% at k=512, the spec bounds it) →
    * rows-only; deterministic: same hashes, same states, same answer on
    * every run/partitioning. */
  /** The θ-intersection fold over two 1-row KMV-state frames (columns
    * `ca` / `pa`) — Column arithmetic only; shared by the operator (k=512)
    * and the approximate-regime spec (small k over synthetic sets). */
  private[graft] def thetaOverlapFold(a: org.apache.spark.sql.DataFrame,
      b: org.apache.spark.sql.DataFrame, k: Int): org.apache.spark.sql.DataFrame = {
    def fracOf(h: Column): Column =
      (h.cast("double") - lit(Long.MinValue.toDouble)) / lit(1.8446744073709552e19)
    def thetaOf(state: Column): Column =
      when(size(state) < k, lit(1.0)).otherwise(fracOf(element_at(state, k)))
    a.crossJoin(broadcast(b))
      .withColumn("theta", least(thetaOf(col("ca")), thetaOf(col("pa"))))
      .withColumn("common",
        size(filter(array_intersect(col("ca"), col("pa")),
          h => fracOf(h) < col("theta"))))
      .select(
        round(graft.functions.Sketches.kmvEstimate(col("ca"), k)).cast("long")
          .as("est_click_users"),
        round(graft.functions.Sketches.kmvEstimate(col("pa"), k)).cast("long")
          .as("est_purchase_users"),
        round(col("common") / col("theta")).cast("long").as("est_overlap"))
      .orderBy("est_overlap")
  }

  val sketchOverlapUsers: QueryDef = QueryDef(
    "sketch_overlap_users",
    (s, d) => {
      val k = 512
      val st = graft.functions.Sketches.kmvState(k)
      val states = Tables.events(s, d)
        .filter(col("event_type").isin("click", "purchase"))
        .withColumn("h", xxhash64(col("user_id")))
        .groupBy(col("event_type")).agg(st(col("h")).as("state"))
      thetaOverlapFold(
        states.filter(col("event_type") === "click").select(col("state").as("ca")),
        states.filter(col("event_type") === "purchase").select(col("state").as("pa")),
        k)
    },
    None // approximate sketch: spec bounds vs exact overlap + determinism
  )

  /** CHUNKED-BACKFILL plan — the DBLog/Debezium "incremental snapshot"
    * chunk table (Andradinata & et al., DBLog 2019; the parallel form of
    * the reference's dump-then-follow bootstrap): the key space of the
    * table to backfill splits into fixed-size chunks of consecutive keys,
    * each row = one chunk's [key_lo, key_hi] range + its exact key count.
    * A backfill executor runs one bounded range-SELECT per chunk,
    * interleaving with the live changelog (the low/high-watermark dance),
    * so a 10⁹-key table loads as 10⁷ independent 100-key units with
    * resume-on-failure granularity.
    *
    * Exact global key ranks come from [[bucketedRank]] (the two-phase
    * bucketed ranking — never a whole-frame sort of the key spectrum);
    * the chunk fold then aggregates ≤ keys/100 rows. */
  val cdcBackfillPlan: QueryDef = QueryDef(
    "cdc_backfill_plan",
    (s, d) => {
      val keys = Tables.customer(s, d).select(
        graft.Registry.wholeFrameKey(col("c_custkey")).as("key"),
        col("c_custkey").as("v"), col("c_custkey").as("id"))
      bucketedRank(keys)
        .select(col("v"), expr("(r - 1) div 100").as("chunk_id"))
        .groupBy(col("chunk_id"))
        .agg(min(col("v")).as("key_lo"), max(col("v")).as("key_hi"),
          count(lit(1)).as("n_keys"))
        .orderBy("chunk_id")
    },
    Some("""
      WITH r AS (
        SELECT c_custkey,
               CAST(row_number() OVER (ORDER BY c_custkey) AS BIGINT) AS rn
        FROM customer
      )
      SELECT (rn - 1) // 100 AS chunk_id, min(c_custkey) AS key_lo,
             max(c_custkey) AS key_hi, count(*)::BIGINT AS n_keys
      FROM r
      GROUP BY 1
      ORDER BY chunk_id
    """.stripMargin.trim)
  )

  /** CHANGELOG GAP AUDIT — the "did this consumer lose entries" check a
    * CDC replica runs against a sequenced id column (binlog position,
    * Maxwell's xid, a Kafka offset): which ids inside the observed
    * [min, max] range never arrived. Audited here on the purchase lane
    * (a filtered consumer by construction, so gaps exist and the audit
    * is non-degenerate).
    *
    * Scale shape: NEVER a whole-frame lag over the id spectrum — ids
    * group into fixed 512-id BLOCKS (a pure map): per block, missing-
    * inside = (span − count); missing BETWEEN consecutive observed
    * blocks = the whole id range separating them. The only window runs
    * over the N/512-row block frame (tiny, the documented tiny-frame
    * single exchange), and the final fold is one row. Integer-exact. */
  val cdcGapAudit: QueryDef = QueryDef(
    "cdc_gap_audit",
    (s, d) => {
      val whole = org.apache.spark.sql.expressions.Window
        .partitionBy(graft.Registry.wholeFrameKey(col("blk")))
        .orderBy(col("blk"))
      val blocks = Tables.events(s, d)
        .filter(col("event_type") === "purchase")
        .select(col("event_id"), expr("event_id div 512").as("blk"))
        .groupBy(col("blk"))
        .agg(min(col("event_id")).as("lo"), max(col("event_id")).as("hi"),
          count(lit(1)).as("n"))
      blocks
        .withColumn("prev_hi", lag(col("hi"), 1).over(whole))
        .select(
          col("blk"), col("lo"), col("hi"), col("n"),
          (col("hi") - col("lo") + 1 - col("n")).as("miss_in"),
          coalesce(col("lo") - col("prev_hi") - 1, lit(0L)).as("miss_before"))
        .agg(
          count(lit(1)).as("n_blocks"), sum(col("n")).as("n_seen"),
          min(col("lo")).as("first_id"), max(col("hi")).as("last_id"),
          sum(col("miss_in")).as("missing_in_blocks"),
          sum(col("miss_before")).as("missing_between_blocks"),
          (sum(col("miss_in")) + sum(col("miss_before"))).as("missing_total"))
        .orderBy("n_blocks")
    },
    Some("""
      WITH b AS (
        SELECT event_id // 512 AS blk, min(event_id) AS lo, max(event_id) AS hi,
               count(*)::BIGINT AS n
        FROM events WHERE event_type = 'purchase'
        GROUP BY 1
      ), g AS (
        SELECT blk, lo, hi, n,
               hi - lo + 1 - n AS miss_in,
               coalesce(lo - lag(hi) OVER (ORDER BY blk) - 1, 0) AS miss_before
        FROM b
      )
      SELECT count(*)::BIGINT AS n_blocks, sum(n)::BIGINT AS n_seen,
             min(lo) AS first_id, max(hi) AS last_id,
             sum(miss_in)::BIGINT AS missing_in_blocks,
             sum(miss_before)::BIGINT AS missing_between_blocks,
             (sum(miss_in) + sum(miss_before))::BIGINT AS missing_total
      FROM g
      ORDER BY n_blocks
    """.stripMargin.trim)
  )

  /** 8-bit Morton spread: insert a zero between every bit of `x` ∈
    * [0, 256) — the branch-free shift-mask cascade (three rounds), pure
    * integer arithmetic that stays in codegen on the Spark side and is
    * written as the SAME literal arithmetic in the oracle SQL. */
  private[graft] def bitSpread(x: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val a = (x.bitwiseOR(shiftleft(x, 4))).bitwiseAND(lit(0x0F0F))
    val b = (a.bitwiseOR(shiftleft(a, 2))).bitwiseAND(lit(0x3333))
    (b.bitwiseOR(shiftleft(b, 1))).bitwiseAND(lit(0x5555))
  }

  /** Grid cell + Morton bucket columns for a FROZEN (user, time) grid:
    * the same [[bitSpread]] interleave as [[qZorderLayout]], with the
    * bounds as plan literals (the streaming sink's shape — the audit op
    * derives its bounds from the data instead). Out-of-range values
    * clamp to the edge cells (a frozen grid meeting new extremes — the
    * production rule). Expects `user_id` and `us` columns; appends
    * (xb, yb, zbucket). */
  private[graft] def withZBucket(df: org.apache.spark.sql.DataFrame,
      ulo: Long, uhi: Long, tlo: Long, thi: Long): org.apache.spark.sql.DataFrame = {
    // integer `div`, NOT Column.divide: Spark `/` is double division, and
    // for grids whose (us - tlo) * 256 exceeds 2^53 (> ~13 months of epoch
    // micros) the double product loses ulps and a streamed row could land
    // in a different cell than the batch audit's exact arithmetic. This
    // keeps the sink bit-identical to q_zorder_layout at any grid span.
    val xb = greatest(lit(0), least(lit(255),
      expr(s"((user_id - ${ulo}L) * 256) div ${uhi - ulo + 1L}L"))).cast("int")
    val yb = greatest(lit(0), least(lit(255),
      expr(s"((us - ${tlo}L) * 256) div ${thi - tlo + 1L}L"))).cast("int")
    df.withColumn("xb", xb).withColumn("yb", yb)
      .withColumn("zbucket",
        shiftright(bitSpread(col("xb")).bitwiseOR(shiftleft(bitSpread(col("yb")), 1)), 10))
  }

  /** Z-ORDER (Morton) layout audit — the lakehouse multi-column
    * clustering pattern (Delta/Iceberg `OPTIMIZE ZORDER`): events are
    * mapped onto a 256×256 (user, time) value grid (min/max frames from
    * one 1-row broadcast agg), each row gets the 16-bit interleaved
    * Morton code, and rows are laid out by the code's top-6-bit prefix —
    * 64 write buckets, each by construction covering ONE 32×32 square of
    * the grid. The report is the data-skipping story made measurable:
    * per bucket, row count + exact (user, time) bucket spans — every
    * span ≤ 31 on BOTH dimensions, so a point/range predicate on EITHER
    * column prunes ~63/64 of the files (single-column range layout
    * prunes on one dimension only). At 100 TB the same z-prefix is the
    * `repartitionByRange` key of the shard writer; here the audit is the
    * oracle-checkable half: the z math is exact integer arithmetic
    * (shift-mask spread, identical literals in both engines). */
  val qZorderLayout: QueryDef = QueryDef(
    "q_zorder_layout",
    (s, d) => {
      val ev = Tables.events(s, d)
        .select(col("user_id"), unix_micros(col("ts")).as("us"))
      val bounds = broadcast(ev.agg(
        min(col("user_id")).as("ulo"), max(col("user_id")).as("uhi"),
        min(col("us")).as("tlo"), max(col("us")).as("thi")))
      // integer div (Spark's `/` is double division); values non-negative
      val xb = expr("least(255, ((user_id - ulo) * 256) div (uhi - ulo + 1))").cast("int")
      val yb = expr("least(255, ((us - tlo) * 256) div (thi - tlo + 1))").cast("int")
      val z = bitSpread(col("xb")).bitwiseOR(shiftleft(bitSpread(col("yb")), 1))
      ev.crossJoin(bounds)
        .withColumn("xb", xb).withColumn("yb", yb)
        .withColumn("zbucket", shiftright(z, 10))
        .groupBy(col("zbucket"))
        .agg(
          count(lit(1)).as("n_rows"),
          min(col("xb")).as("u_min"), max(col("xb")).as("u_max"),
          min(col("yb")).as("t_min"), max(col("yb")).as("t_max"))
        .orderBy("zbucket")
    },
    Some("""
      WITH b AS (
        SELECT min(user_id) AS ulo, max(user_id) AS uhi,
               min(epoch_us(ts)) AS tlo, max(epoch_us(ts)) AS thi
        FROM events
      ), g AS (
        SELECT least(255, ((user_id - ulo) * 256) // (uhi - ulo + 1)) AS xb,
               least(255, ((epoch_us(ts) - tlo) * 256) // (thi - tlo + 1)) AS yb
        FROM events, b
      ), sp AS (
        SELECT xb, yb,
               (((xb | (xb << 4)) & 3855) | (((xb | (xb << 4)) & 3855) << 2)) & 13107 AS xa,
               (((yb | (yb << 4)) & 3855) | (((yb | (yb << 4)) & 3855) << 2)) & 13107 AS ya
        FROM g
      ), z AS (
        SELECT xb, yb,
               (((xa | (xa << 1)) & 21845) | (((ya | (ya << 1)) & 21845) << 1)) >> 10 AS zbucket
        FROM sp
      )
      SELECT CAST(zbucket AS INT) AS zbucket, count(*) AS n_rows,
             min(xb)::INT AS u_min, max(xb)::INT AS u_max,
             min(yb)::INT AS t_min, max(yb)::INT AS t_max
      FROM z
      GROUP BY zbucket
      ORDER BY zbucket
    """.stripMargin.trim)
  )

  /** Distributed PREFIX SCAN (running max) — the skew-resilient twin of
    * [[Cdc.cdcLateArrivals]], born from this round's hot-key evidence: a
    * per-user ordered window funnels a 10%-mass user's whole event
    * sequence through ONE task's sort (measured 4.79 → 8.59 s at sf10
    * under a planted 10% key). The classic two-phase parallel-scan
    * decomposition fixes that WITHOUT changing the answer:
    *
    *   1. rows bucket by an affine integer map of event time into
    *      [[PrefixBuckets]] per-user time ranges (monotone in ts, so
    *      (bkt, ts, event_id) order ≡ (ts, event_id) order; equal
    *      timestamps always share a bucket);
    *   2. the running max computes WITHIN (user, bucket) — the widest
    *      sort shrinks to 1/B of the hot key;
    *   3. per-(user, bucket) maxima prefix-combine on a users×B-row
    *      frame (window over ≤B rows per user), and
    *      `greatest(local, carry)` splices the carry into every row —
    *      Spark's greatest ignores nulls, so the "no prior row
    *      anywhere" case stays NULL exactly like the single-window
    *      form.
    *
    * Bounds/offsets are users-sized frames: NOT hint-broadcast (a
    * billion-user corpus must shuffle them; AQE broadcasts small sides
    * at runtime on its own). Oracle: cdc_late_arrivals' exact SQL — same
    * answer, skew-safe plan; the spec additionally proves row-identity
    * on the hot-key corpus shape. */
  private val PrefixBuckets = 256

  /** Overflow-safe monotone time bucket shared by every bucketed-prefix
    * kernel: `width = (tmax - tmin) div B + 1`, `bkt = (us - tmin) div
    * width`. Division first means NO multiply of a µs span by B ever
    * happens — the old `(us - tmin) * B` form silently wrapped Long for a
    * per-user span past ~3.6e16 µs (corrupt far-future timestamps) and
    * misbucketed rows. Still monotone in us (equal timestamps share a
    * bucket) and bounded in [0, B): width > span/B, so span/width < B.
    * The kernels only need monotonicity + the bound, not the exact
    * boundaries, so the splice algebra is unchanged. */
  private def timeBucket(B: Int) =
    expr(s"(us - tmin) div ((tmax - tmin) div $B + 1)").cast("int")

  /** Core of [[qLateArrivalsDist]], factored on an arbitrary
    * (user_id, us, event_id) frame so the spec can drive a synthetic
    * hot-key frame through it. */
  private[graft] def prefixMaxBucketed(ev: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val B = PrefixBuckets
    val bounds = ev.groupBy("user_id").agg(min("us").as("tmin"), max("us").as("tmax"))
    val bucketed = ev.join(bounds, "user_id")
      .withColumn("bkt", timeBucket(B))
    val wLocal = Window.partitionBy(col("user_id"), col("bkt"))
      .orderBy(col("us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wBkts = Window.partitionBy(col("user_id")).orderBy(col("bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = bucketed.groupBy(col("user_id"), col("bkt"))
      .agg(max(col("event_id")).as("bmax"))
      .withColumn("carry", max(col("bmax")).over(wBkts))
      .select("user_id", "bkt", "carry")
    bucketed
      .withColumn("lmax", max(col("event_id")).over(wLocal))
      .join(offsets, Seq("user_id", "bkt"))
      .withColumn("prev_max_id", greatest(col("lmax"), col("carry")))
  }

  val qLateArrivalsDist: QueryDef = QueryDef(
    "q_late_arrivals_dist",
    (s, d) => {
      val ev = Tables.events(s, d)
        .select(col("user_id"), unix_micros(col("ts")).as("us"), col("event_id"))
      prefixMaxBucketed(ev)
        .groupBy(col("user_id"))
        .agg(
          count(lit(1)).as("n_events"),
          sum(when(col("prev_max_id") > col("event_id"), 1L).otherwise(0L)).as("n_late"),
          max(when(col("prev_max_id") > col("event_id"), col("prev_max_id") - col("event_id")))
            .as("worst_inversion"))
        .orderBy("user_id")
    },
    // the oracle is the plain single-window form — same answer
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

  /** Distributed SESSIONIZATION core — the skew-resilient twin of
    * [[Olap.qSessionize]]'s lag + cumulative-flag windows, built from the
    * same two-phase prefix-scan decomposition as [[prefixMaxBucketed]]
    * (round-12 verdict #1: GenSkew measured q_sessionize degrading ~2×
    * under a 10%-mass hot user with no twin to delegate to). The
    * session-id computation is two chained monotone prefixes, each of
    * which splices across buckets with a tiny per-(user, bucket) carry:
    *
    *   1. rows bucket by the affine time map (monotone in ts — equal
    *      timestamps always share a bucket, so within-bucket (us,
    *      event_id) order ≡ the global per-user order);
    *   2. the gap FLAG needs each row's predecessor timestamp: a local
    *      lag within (user, bucket), and for each bucket's FIRST row the
    *      carry `max(us) over prior buckets` (us is the primary order
    *      key, so a bucket's last row carries its max us). NULL carry +
    *      NULL lag = the user's very first row, flagged 1 exactly like
    *      the single-window lag;
    *   3. the session ID is the running SUM of flags: a local cumulative
    *      sum within (user, bucket) plus the carry `sum(bucket flag
    *      totals) over prior buckets`.
    *
    * All carries live on users×≤B-row frames (the per-user window over
    * bucket summaries); the widest data sort is 1/B of the hottest key.
    * Bounds/offsets are NOT hint-broadcast (a billion-user corpus must
    * shuffle them; AQE broadcasts small sides at runtime on its own).
    * Factored on an arbitrary (user_id, us, event_id, value) frame so the
    * spec can prove row-identity on a synthetic hot-key frame. */
  private[graft] def sessionIdsBucketed(ev: org.apache.spark.sql.DataFrame,
      gapUs: Long): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val B = PrefixBuckets
    val bounds = ev.groupBy("user_id").agg(min("us").as("tmin"), max("us").as("tmax"))
    val bucketed = ev.join(bounds, "user_id")
      .withColumn("bkt", timeBucket(B))
      .drop("tmin", "tmax")
    val wLocal = Window.partitionBy(col("user_id"), col("bkt"))
      .orderBy(col("us"), col("event_id"))
    val wPrior = Window.partitionBy(col("user_id")).orderBy(col("bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val tsCarry = bucketed.groupBy(col("user_id"), col("bkt"))
      .agg(max(col("us")).as("bmax"))
      .withColumn("carry_us", max(col("bmax")).over(wPrior))
      .select("user_id", "bkt", "carry_us")
    val flagged = bucketed.join(tsCarry, Seq("user_id", "bkt"))
      .withColumn("prev_us", coalesce(lag(col("us"), 1).over(wLocal), col("carry_us")))
      .withColumn("new_sess",
        when(col("prev_us").isNull || col("us") - col("prev_us") > gapUs, 1L).otherwise(0L))
      .drop("carry_us", "prev_us")
    val flagCarry = flagged.groupBy(col("user_id"), col("bkt"))
      .agg(sum(col("new_sess")).as("bflags"))
      .withColumn("fcarry", sum(col("bflags")).over(wPrior))
      .select("user_id", "bkt", "fcarry")
    flagged.join(flagCarry, Seq("user_id", "bkt"))
      .withColumn("sess_id",
        coalesce(col("fcarry"), lit(0L)) +
          sum(col("new_sess")).over(wLocal.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("bkt", "new_sess")
  }

  /** [[Olap.qSessionize]]'s two-phase twin: identical output (same oracle
    * SQL), widest sort 1/B of the hottest user. The guarded plain lane
    * auto-delegates here above [[Guards.singleSortCap]] rows/user. */
  val qSessionizeDist: QueryDef = QueryDef(
    "q_sessionize_dist",
    (s, d) => {
      val ev = Tables.events(s, d)
        .select(col("user_id"), unix_micros(col("ts")).as("us"), col("event_id"), col("value"))
      sessionIdsBucketed(ev, 1800000000L)
        .groupBy(col("user_id"), col("sess_id"))
        .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("sess_value"))
        .orderBy(col("user_id"), col("sess_id"))
    },
    // the oracle is the plain single-window form — same answer
    Olap.qSessionize.oracle
  )

  /** Distributed LEAD — the third member of the bucketed prefix family
    * ([[prefixMaxBucketed]] running max, [[sessionIdsBucketed]] chained
    * prefix sums, this one next-row lookahead): each row's `next_us` is
    * the strictly-next (us, event_id)-ordered row's timestamp within its
    * user, NULL for the user's last row — exactly `lead(us) over (user
    * order by us, event_id)`. Local lead within (user, bucket); each
    * bucket's LAST row splices the carry `min(us) over FOLLOWING buckets`
    * (us is the primary order key, so the next non-empty bucket's first
    * row holds its min us; min over all following equals it because
    * bucket minima are monotone). Columns besides (user_id, us,
    * event_id) pass through untouched. */
  private[graft] def leadUsBucketed(ev: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val B = PrefixBuckets
    val bounds = ev.groupBy("user_id").agg(min("us").as("tmin"), max("us").as("tmax"))
    val bucketed = ev.join(bounds, "user_id")
      .withColumn("bkt", timeBucket(B))
      .drop("tmin", "tmax")
    val wLocal = Window.partitionBy(col("user_id"), col("bkt"))
      .orderBy(col("us"), col("event_id"))
    val wAfter = Window.partitionBy(col("user_id")).orderBy(col("bkt"))
      .rowsBetween(1, Window.unboundedFollowing)
    val carry = bucketed.groupBy(col("user_id"), col("bkt"))
      .agg(min(col("us")).as("bmin"))
      .withColumn("carry_us", min(col("bmin")).over(wAfter))
      .select("user_id", "bkt", "carry_us")
    bucketed
      .withColumn("llead", lead(col("us"), 1).over(wLocal))
      .join(carry, Seq("user_id", "bkt"))
      .withColumn("next_us", coalesce(col("llead"), col("carry_us")))
      .drop("bkt", "llead", "carry_us")
  }

  /** [[Cdc.cdcScd2]]'s two-phase twin: identical version intervals (same
    * oracle SQL) with the per-user lead decomposed through
    * [[leadUsBucketed]] — the guarded plain lane auto-delegates here
    * above [[Guards.singleSortCap]] rows/user. */
  val cdcScd2Dist: QueryDef = QueryDef(
    "cdc_scd2_dist",
    (s, d) => {
      val ev = Tables.events(s, d).select(
        col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"), col("value"))
      leadUsBucketed(ev)
        .select(
          col("user_id"), col("event_id"),
          Cdc.opOf(col("event_type")).as("op"),
          col("us").as("valid_from_us"),
          col("next_us").as("valid_to_us"),
          round(col("value"), 2).as("value"))
        .orderBy("user_id", "valid_from_us", "event_id")
    },
    // the oracle is the plain single-window form — same answer
    Cdc.cdcScd2.oracle
  )

  /** Generic bucketed CONDITIONAL CUMULATIVE MAX (inclusive current row) —
    * round 14, the fourth member of the bucketed prefix family: adds
    * column `out` = `max(mask) over (partition by user_id order by us,
    * event_id rows unbounded preceding .. current row)` with the widest
    * data sort 1/B of the hottest user. `mask` may be any orderable type
    * (a µs long for the as-of lanes; a (us, event_id, value) struct for
    * LOCF — lexicographic struct order IS the window order, so the
    * struct's max carries the latest value). Splice: local cumulative max
    * within (user, bucket) ⊕ carry = max of bucket maxima over PRIOR
    * buckets; `greatest` skips nulls exactly like the window max, so
    * all-null prefixes stay null. Extra columns pass through untouched. */
  private[graft] def cumMaxBucketed(ev: org.apache.spark.sql.DataFrame,
      mask: Column, out: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val B = PrefixBuckets
    val bounds = ev.groupBy("user_id").agg(min("us").as("tmin"), max("us").as("tmax"))
    val bucketed = ev.join(bounds, "user_id")
      .withColumn("bkt", timeBucket(B))
      .drop("tmin", "tmax")
      .withColumn("__m", mask)
    val wLocal = Window.partitionBy(col("user_id"), col("bkt"))
      .orderBy(col("us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wPrior = Window.partitionBy(col("user_id")).orderBy(col("bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val carry = bucketed.groupBy(col("user_id"), col("bkt"))
      .agg(max(col("__m")).as("bmax"))
      .withColumn("__carry", max(col("bmax")).over(wPrior))
      .select(col("user_id"), col("bkt"), col("__carry"))
    bucketed
      .withColumn("__l", max(col("__m")).over(wLocal))
      .join(carry, Seq("user_id", "bkt"))
      .withColumn(out, greatest(col("__l"), col("__carry")))
      .drop("bkt", "__m", "__l", "__carry")
  }

  /** Mirror of [[cumMaxBucketed]]: conditional cumulative MIN over the
    * FORWARD frame (current row .. unbounded following). Carry = min of
    * bucket minima over FOLLOWING buckets; `least` skips nulls like the
    * window min. */
  private[graft] def cumMinFwdBucketed(ev: org.apache.spark.sql.DataFrame,
      mask: Column, out: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val B = PrefixBuckets
    val bounds = ev.groupBy("user_id").agg(min("us").as("tmin"), max("us").as("tmax"))
    val bucketed = ev.join(bounds, "user_id")
      .withColumn("bkt", timeBucket(B))
      .drop("tmin", "tmax")
      .withColumn("__m", mask)
    // DESC-order cumulative local frame ≡ min over (current row ..
    // unbounded following) in ascending order — Spark's
    // UnboundedFollowing frame re-scans the partition remainder per row
    // (O(bucket²), jstack-caught at 1000+ s/core on hot frames); the
    // UnboundedPreceding frame accumulates incrementally, O(bucket).
    // The bucket-summary carry below keeps the following-frame form: its
    // partitions are ≤B rows, where quadratic is noise.
    val wLocal = Window.partitionBy(col("user_id"), col("bkt"))
      .orderBy(col("us").desc, col("event_id").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAfter = Window.partitionBy(col("user_id")).orderBy(col("bkt"))
      .rowsBetween(1, Window.unboundedFollowing)
    val carry = bucketed.groupBy(col("user_id"), col("bkt"))
      .agg(min(col("__m")).as("bmin"))
      .withColumn("__carry", min(col("bmin")).over(wAfter))
      .select(col("user_id"), col("bkt"), col("__carry"))
    bucketed
      .withColumn("__l", min(col("__m")).over(wLocal))
      .join(carry, Seq("user_id", "bkt"))
      .withColumn(out, least(col("__l"), col("__carry")))
      .drop("bkt", "__m", "__l", "__carry")
  }

  /** Click/purchase event frame shared by the as-of twins. */
  private def asofEvents(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.events(s, d)
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("user_id"), unix_micros(col("ts")).as("us"), col("event_id"),
        col("event_type"), col("value"))

  private def clickMask: Column =
    when(col("event_type") === "click", col("us"))

  /** [[Olap.qAsofJoin]]'s two-phase twin (round 14 — the as-of family
    * joins the bucketed-prefix guard program): identical output, same
    * oracle. The backward conditional running max decomposes through
    * [[cumMaxBucketed]]; output rows are purchases, whose own mask is
    * null, so the inclusive-current frame equals the plain lane's. */
  val qAsofJoinDist: QueryDef = QueryDef(
    "q_asof_join_dist",
    (s, d) => {
      cumMaxBucketed(asofEvents(s, d), clickMask, "click_us")
        .filter(col("event_type") === "purchase")
        .select(
          col("event_id").as("purchase_id"),
          col("user_id"),
          col("us").as("purchase_us"),
          col("click_us"),
          round(col("value"), 2).as("purchase_value"))
        .orderBy(col("purchase_id"))
    },
    Olap.qAsofJoin.oracle
  )

  /** [[Olap.qAsofTolerance]]'s two-phase twin: same kernel as
    * [[qAsofJoinDist]], the 1-hour tolerance applied after. */
  val qAsofToleranceDist: QueryDef = QueryDef(
    "q_asof_tolerance_dist",
    (s, d) => {
      cumMaxBucketed(asofEvents(s, d), clickMask, "last_click_us")
        .filter(col("event_type") === "purchase")
        .select(
          col("event_id").as("purchase_id"),
          col("user_id"),
          col("us").as("p_us"),
          when(col("last_click_us") >= col("us") - 3600000000L, col("last_click_us"))
            .as("click_us_within_1h"))
        .orderBy("purchase_id")
    },
    Olap.qAsofTolerance.oracle
  )

  /** [[Olap.qAsofForward]]'s two-phase twin: the forward conditional
    * running min decomposes through [[cumMinFwdBucketed]] (strict vs
    * inclusive frame is immaterial on purchase rows — their own mask is
    * null). */
  val qAsofForwardDist: QueryDef = QueryDef(
    "q_asof_forward_dist",
    (s, d) => {
      cumMinFwdBucketed(asofEvents(s, d), clickMask, "next_click_us")
        .filter(col("event_type") === "purchase")
        .select(
          col("event_id").as("purchase_id"),
          col("user_id"),
          col("us").as("purchase_us"),
          col("next_click_us"),
          round(col("value"), 2).as("purchase_value"))
        .orderBy(col("purchase_id"))
    },
    Olap.qAsofForward.oracle
  )

  /** [[Olap.qAsofNearest]]'s two-phase twin: both directional kernels
    * chained over the same frame (the second kernel's bounds re-derive
    * from the pass-through columns), then the plain lane's tie-break
    * tail verbatim. */
  val qAsofNearestDist: QueryDef = QueryDef(
    "q_asof_nearest_dist",
    (s, d) => {
      val withBack = cumMaxBucketed(asofEvents(s, d), clickMask, "back_us")
      cumMinFwdBucketed(withBack, clickMask, "fwd_us")
        .filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id"),
          col("us").as("purchase_us"), col("back_us"), col("fwd_us"))
        .withColumn("direction",
          when(col("back_us").isNull && col("fwd_us").isNull, lit(null).cast("string"))
            .when(col("fwd_us").isNull, "backward")
            .when(col("back_us").isNull, "forward")
            .when(col("purchase_us") - col("back_us") <= col("fwd_us") - col("purchase_us"),
              "backward")
            .otherwise("forward"))
        .select(col("purchase_id"), col("user_id"), col("purchase_us"),
          when(col("direction") === "backward", col("back_us"))
            .when(col("direction") === "forward", col("fwd_us")).as("click_us"),
          when(col("direction") === "backward", col("purchase_us") - col("back_us"))
            .when(col("direction") === "forward", col("fwd_us") - col("purchase_us"))
            .as("dt_us"),
          col("direction"))
        .orderBy("purchase_id")
    },
    Olap.qAsofNearest.oracle
  )

  /** [[OrderedStats.qGapFill]]'s two-phase twin: LOCF is the conditional
    * cumulative max of the (us, event_id, cents) STRUCT — lexicographic
    * struct order is exactly the window order, so the running struct-max
    * carries the latest purchase's cents forward, null through all-null
    * prefixes. */
  val qGapFillDist: QueryDef = QueryDef(
    "q_gap_fill_dist",
    (s, d) => {
      val ev = Tables.events(s, d)
        .select(col("user_id"), unix_micros(col("ts")).as("us"), col("event_id"),
          col("event_type"), col("value"))
        .withColumn("purchase_cents",
          when(col("event_type") === "purchase", round(col("value") * 100).cast("long")))
      cumMaxBucketed(ev,
        when(col("purchase_cents").isNotNull,
          struct(col("us"), col("event_id"), col("purchase_cents"))), "lp")
        .select(
          col("event_id"),
          col("user_id"),
          col("event_type"),
          (col("lp.purchase_cents") / 100.0).as("last_purchase_value"))
        .orderBy("event_id")
    },
    OrderedStats.qGapFill.oracle
  )

  /** Chained prefix-max pair behind [[qWindowFunnelDist]], factored on an
    * arbitrary (user_id, event_type, us, event_id) frame so the spec can
    * drive a synthetic hot-key frame through it. [[AnalyticsExt
    * .funnelLevelOrdered]]'s sequential fold is algebraically two chained
    * MONOTONE prefix maxes over the (us, event_id)-ordered stream:
    *
    *   - `pv_us`  = `lastViewUs`: max us over view rows STRICTLY before
    *     this row;
    *   - `pcv_us` = `maxPairViewUs`: max of `pv_us`-at-a-click over click
    *     rows strictly before this row (pv_us is non-decreasing in row
    *     order, so the running max over clicks of their pv_us is exactly
    *     the fold's maxPairViewUs).
    *
    * Each prefix computes within (user, bucket) — widest sort 1/B of the
    * hottest user — and splices across buckets with a per-(user, bucket)
    * carry, the [[prefixMaxBucketed]] recipe applied twice (the second
    * carry aggregates the FIRST prefix's output, so the chain stays two
    * narrow exchanges, no user-wide sort anywhere). */
  private[graft] def funnelPrefixesBucketed(ev: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val B = PrefixBuckets
    val bounds = ev.groupBy("user_id").agg(min("us").as("tmin"), max("us").as("tmax"))
    val bucketed = ev.join(bounds, "user_id")
      .withColumn("bkt", timeBucket(B))
      .drop("tmin", "tmax")
    val wLocal = Window.partitionBy(col("user_id"), col("bkt"))
      .orderBy(col("us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wPrior = Window.partitionBy(col("user_id")).orderBy(col("bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val vMask = when(col("event_type") === "view", col("us"))
    val vCarry = bucketed.groupBy(col("user_id"), col("bkt"))
      .agg(max(vMask).as("bvmax"))
      .withColumn("vcarry", max(col("bvmax")).over(wPrior))
      .select("user_id", "bkt", "vcarry")
    val withPv = bucketed
      .withColumn("lv", max(vMask).over(wLocal))
      .join(vCarry, Seq("user_id", "bkt"))
      .withColumn("pv_us", greatest(col("lv"), col("vcarry")))
      .drop("lv", "vcarry")
    val cMask = when(col("event_type") === "click", col("pv_us"))
    val cCarry = withPv.groupBy(col("user_id"), col("bkt"))
      .agg(max(cMask).as("bcmax"))
      .withColumn("ccarry", max(col("bcmax")).over(wPrior))
      .select("user_id", "bkt", "ccarry")
    withPv
      .withColumn("lcv", max(cMask).over(wLocal))
      .join(cCarry, Seq("user_id", "bkt"))
      .withColumn("pcv_us", greatest(col("lcv"), col("ccarry")))
      .drop("lcv", "ccarry", "bkt")
  }

  /** [[AnalyticsExt.qWindowFunnel]]'s two-phase twin: identical level
    * histogram (same oracle SQL). The heavy prefix pipeline runs on the
    * funnel-typed rows only; the plain lane's all-users frame (users with
    * no funnel events land at level 0) is restored from two 1-row
    * aggregates. The guarded plain lane auto-delegates here above
    * [[Guards.funnelSortCap]] rows/user (the funnel's OWN cap — its
    * measured crossover sits ~25× right of the shared 2M because the
    * plain fold is O(1)-state streaming; curve at
    * [[graft.Conf.FunnelSortCapConf]]). */
  val qWindowFunnelDist: QueryDef = QueryDef(
    "q_window_funnel_dist",
    (s, d) => {
      val windowUs = 86400000000L
      val evAll = Tables.events(s, d)
      val evF = evAll
        .filter(col("event_type").isin("view", "click", "purchase"))
        .select(col("user_id"), col("event_type"),
          unix_micros(col("ts")).as("us"), col("event_id"))
      val perUser = funnelPrefixesBucketed(evF)
        .groupBy(col("user_id"))
        .agg(max(
          when(col("event_type") === "purchase" &&
            col("pcv_us").isNotNull && col("us") - col("pcv_us") <= windowUs, 3)
            .when(col("event_type") === "click" &&
              col("pv_us").isNotNull && col("us") - col("pv_us") <= windowUs, 2)
            .when(col("event_type") === "view", 1)
            .otherwise(0)).as("level"))
      // ≤4 rows; localCheckpoint so the union + the funnel-user count
      // below don't re-run the prefix pipeline (typed-free plan, but an
      // eager cut is cheaper than trusting exchange reuse at scale)
      val lvls = perUser.groupBy(col("level"))
        .agg(count(lit(1)).as("n_users")).localCheckpoint()
      // users with NO funnel-typed events sit at level 0 (the plain
      // lane's all-users frame): two 1-row aggregates, a 1-row crossJoin
      // coalesce: a corpus with ZERO funnel-typed events makes lvls empty,
      // so a bare sum is NULL and the all-users level-0 row would vanish
      val extra = evAll.agg(countDistinct(col("user_id")).as("total"))
        .crossJoin(lvls.agg(coalesce(sum(col("n_users")), lit(0L)).as("fu")))
        .select(lit(0).as("level"), (col("total") - col("fu")).as("n_users"))
      lvls.unionByName(extra)
        .groupBy(col("level")).agg(sum(col("n_users")).as("n_users"))
        .filter(col("n_users") > 0)
        .orderBy("level")
    },
    // the oracle is the plain one-pass-kernel form — same answer
    AnalyticsExt.qWindowFunnel.oracle
  )

  /** Generic bucketed EXACT per-user rank over the canonical (us,
    * event_id) event order — round 15, the sixth member of the bucketed
    * prefix family: adds column `r` = `row_number() over (partition by
    * user_id order by us [desc], event_id [desc])` with the widest data
    * sort 1/B of the hottest user. Local row_number within (user,
    * bucket); the carry is the row COUNT of prior buckets (asc) or
    * following buckets (desc) — a per-user window over ≤B bucket-summary
    * rows, where the following frame's quadratic evaluator is noise.
    * Extra columns pass through untouched. */
  private[graft] def rankTimeBucketed(ev: org.apache.spark.sql.DataFrame,
      descOrder: Boolean): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val B = PrefixBuckets
    val bounds = ev.groupBy("user_id").agg(min("us").as("tmin"), max("us").as("tmax"))
    val bucketed = ev.join(bounds, "user_id")
      .withColumn("bkt", timeBucket(B))
      .drop("tmin", "tmax")
    val wLocal =
      if (descOrder)
        Window.partitionBy(col("user_id"), col("bkt"))
          .orderBy(col("us").desc, col("event_id").desc)
      else
        Window.partitionBy(col("user_id"), col("bkt"))
          .orderBy(col("us"), col("event_id"))
    val wCarry =
      if (descOrder)
        Window.partitionBy(col("user_id")).orderBy(col("bkt"))
          .rowsBetween(1, Window.unboundedFollowing)
      else
        Window.partitionBy(col("user_id")).orderBy(col("bkt"))
          .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = bucketed.groupBy(col("user_id"), col("bkt"))
      .agg(count(lit(1)).as("bn"))
      .withColumn("off", coalesce(sum(col("bn")).over(wCarry), lit(0L)))
      .select("user_id", "bkt", "off")
    bucketed.join(offsets, Seq("user_id", "bkt"))
      .withColumn("r", row_number().over(wLocal) + col("off"))
      .drop("bkt")
  }

  /** [[Cdc.cdcSnapshot]]'s scale twin: latest-row-per-key as ONE hash
    * aggregate — `max(struct(ts_us, event_id, …))` picks the window
    * order's last row because lexicographic struct order on the unique
    * (ts_us, event_id) prefix IS the order, and the trailing fields ride
    * along. Partial aggregation combines the hot key MAP-SIDE, so no
    * task ever sorts a key's history at all — for a reduce-to-one-row
    * window this beats any bucketed sort decomposition. */
  val cdcSnapshotDist: QueryDef = QueryDef(
    "cdc_snapshot_dist",
    (s, d) =>
      Tables.events(s, d)
        .groupBy(col("user_id"))
        .agg(max(struct(unix_micros(col("ts")).as("ts_us"), col("event_id"),
          col("event_type"), col("value"))).as("m"))
        .filter(Cdc.opOf(col("m.event_type")) =!= "delete")
        .select(
          col("user_id"),
          col("m.event_id").as("last_event_id"),
          Cdc.opOf(col("m.event_type")).as("last_op"),
          col("m.ts_us").as("last_ts_us"),
          round(col("m.value"), 2).as("last_value"))
        .orderBy("user_id"),
    // the oracle is the plain single-window form — same answer
    Cdc.cdcSnapshot.oracle
  )

  /** [[Cdc.cdcReplayAt]]'s scale twin: the same struct-max aggregate as
    * [[cdcSnapshotDist]] over the time-sliced archive — the cutoff filter
    * pushes into the scan, then one partial-agg pass. */
  val cdcReplayAtDist: QueryDef = QueryDef(
    "cdc_replay_at_dist",
    (s, d) =>
      Tables.events(s, d)
        .filter(col("ts") <= lit("2024-01-15 00:00:00"))
        .groupBy(col("user_id"))
        .agg(max(struct(unix_micros(col("ts")).as("ts_us"), col("event_id"),
          col("event_type"), col("value"))).as("m"))
        .filter(Cdc.opOf(col("m.event_type")) =!= "delete")
        .select(
          col("user_id"),
          col("m.event_id").as("last_event_id"),
          Cdc.opOf(col("m.event_type")).as("last_op"),
          col("m.ts_us").as("last_ts_us"),
          round(col("m.value"), 2).as("last_value"))
        .orderBy("user_id"),
    Cdc.cdcReplayAt.oracle
  )

  /** [[Cdc.cdcUndo]]'s two-phase twin: the reverse replay sequence is
    * [[rankTimeBucketed]]'s DESC rank — identical rows (same oracle SQL),
    * widest sort 1/B of the hottest key. undo_seq is Long on BOTH lanes
    * (round 15, review): an Int cast here reintroduced a 2^31 ceiling on
    * exactly the over-cap keys this twin exists for. */
  val cdcUndoDist: QueryDef = QueryDef(
    "cdc_undo_dist",
    (s, d) => {
      val e = Tables.events(s, d).select(
        col("event_id"), col("user_id"),
        Cdc.opOf(col("event_type")).as("orig_op"),
        unix_micros(col("ts")).as("us"))
      rankTimeBucketed(e, descOrder = true)
        .select(
          col("event_id").as("undo_of"),
          col("user_id").as("pk"),
          col("orig_op"),
          col("us").as("ts_us"),
          when(col("orig_op") === "insert", "delete")
            .when(col("orig_op") === "delete", "insert")
            .otherwise("update").as("undo_op"),
          col("r").as("undo_seq"))
        .orderBy("pk", "undo_seq")
    },
    Cdc.cdcUndo.oracle
  )

  /** [[OrderedStats.qValueAnomalies]]'s two-phase twin: the exclusive
    * prefix (count, Σcents, Σcents²) triple decomposes like
    * [[sessionIdsBucketed]]'s chained sums — local INCLUSIVE cumulative
    * sums within (user, bucket) minus the row's own contribution, plus
    * the prior buckets' totals carried on a users×≤B summary frame. The
    * 3σ integer test then runs on identical (n, S, Q) values, so the
    * anomaly set is bit-equal to the plain lane's. */
  val qValueAnomaliesDist: QueryDef = QueryDef(
    "q_value_anomalies_dist",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val B = PrefixBuckets
      val e = Tables.events(s, d).select(
        col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"),
        round(col("value") * 100).cast("long").as("cents"))
      val bounds = e.groupBy("user_id").agg(min("us").as("tmin"), max("us").as("tmax"))
      val bucketed = e.join(bounds, "user_id")
        .withColumn("bkt", timeBucket(B))
        .drop("tmin", "tmax")
      val wLocal = Window.partitionBy(col("user_id"), col("bkt"))
        .orderBy(col("us"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wPrior = Window.partitionBy(col("user_id")).orderBy(col("bkt"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val carry = bucketed.groupBy(col("user_id"), col("bkt"))
        .agg(count(lit(1)).as("bc"), sum(col("cents")).as("bs"),
          sum(col("cents") * col("cents")).as("bq"))
        .withColumn("cc", coalesce(sum(col("bc")).over(wPrior), lit(0L)))
        .withColumn("cs", coalesce(sum(col("bs")).over(wPrior), lit(0L)))
        .withColumn("cq", coalesce(sum(col("bq")).over(wPrior), lit(0L)))
        .select("user_id", "bkt", "cc", "cs", "cq")
      bucketed.join(carry, Seq("user_id", "bkt"))
        .select(col("user_id"), col("event_id"), col("cents"),
          (col("cc") + count(lit(1)).over(wLocal) - 1).as("n_prior"),
          (col("cs") + sum(col("cents")).over(wLocal) - col("cents")).as("s"),
          (col("cq") + sum(col("cents") * col("cents")).over(wLocal) -
            col("cents") * col("cents")).as("q"))
        .filter(OrderedStats.anomalyTest) // shared decimal(38,0) 3σ compare
        .select(col("event_id"), col("user_id"), col("cents"), col("n_prior"))
        .orderBy("event_id")
    },
    OrderedStats.qValueAnomalies.oracle
  )

  /** [[Advanced.qMovingAvg]]'s two-phase twin: a BOUNDED 7-row frame is
    * a scatter-gather over [[rankTimeBucketed]]'s exact rank — each row
    * contributes its cents to the frames anchored at ranks r..r+6 (a
    * 7-element sequence explode: constant-size array, trivial to
    * re-evaluate, unlike the banned expensive-array case), and one hash
    * aggregate per (user, target rank) rebuilds each frame's (Σcents,
    * count) with full parallelism. Frames whose anchor rank has no row
    * (the r+j > c spill past each user's end) identify as null-event_id
    * and drop. Shuffle volume is 7×N rows of 4 longs — the price of
    * removing the per-user sort entirely; the widest SORT is the rank
    * kernel's 1/B slice. */
  val qMovingAvgDist: QueryDef = QueryDef(
    "q_moving_avg_dist",
    (s, d) => {
      val e = Tables.events(s, d).select(
        col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"),
        round(col("value") * 100).cast("long").as("cents"))
      rankTimeBucketed(e, descOrder = false)
        .withColumn("tgt", explode(sequence(col("r"), col("r") + lit(6L))))
        .groupBy(col("user_id"), col("tgt"))
        .agg(sum(col("cents")).as("cents"), count(lit(1)).as("cnt"),
          max(when(col("r") === col("tgt"), col("event_id"))).as("event_id"))
        .filter(col("event_id").isNotNull)
        .select(col("user_id"), col("event_id"),
          (expr("(10 * cents) div cnt") / 1000.0).as("avg7"))
        .orderBy("user_id", "event_id")
    },
    Advanced.qMovingAvg.oracle
  )

  val all: Seq[QueryDef] = Seq(
    qSkewJoinSalted, cdcTableStats, sketchDistinctUsers, qRangeJoin, qNtileDist,
    qPercentileDist, qPercentileDiscDist, qCumeDistDist, sketchWindowMerge, qKeySkewReport,
    cdcBackfillPlan, sketchOverlapUsers, cdcGapAudit, qZorderLayout,
    qLateArrivalsDist, qSessionizeDist, cdcScd2Dist, qWindowFunnelDist,
    qAsofJoinDist, qAsofToleranceDist, qAsofForwardDist, qAsofNearestDist,
    qGapFillDist, cdcSnapshotDist, cdcReplayAtDist, cdcUndoDist,
    qValueAnomaliesDist, qMovingAvgDist, qOrderCadenceDist)
}
