package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}

/** Second TPC-H-shape OLAP wave — the classic warehouse query shapes the
  * reference's Greenplum serve lane (`/root/reference/README.md:14-16`,
  * `demo/05_gpdb_poll.sh`) answers that the first wave didn't cover:
  * min-per-group supplier selection (Q2), global-share HAVING against a
  * scalar aggregate (Q11), the zero-inclusive per-customer order
  * distribution (Q13), and threshold-group semi selection (Q18).
  *
  * Monetary comparisons and orderings run on exact integer cents (the
  * 2-decimal prices round-trip exactly), so rank-1 picks and HAVING
  * thresholds can't diverge between engines on float ties.
  */
object TpchMore {

  private def cents(c: String) = round(col(c) * 100).cast("long")

  /** TPC-H Q2 flavor: for every small part, the supplier quoting the
    * lowest line price. Rank-1 window over l_partkey after a broadcast
    * semi-reduction to the small-part subset — the fact table shuffles
    * once on partkey, WindowGroupLimit prunes each group to its first row
    * before the full sort; nation is the only force-broadcast dim (part
    * and supplier scale with SF, so their join sides are AQE's call). */
  val qMinCostSupplier: QueryDef = QueryDef(
    "q_min_cost_supplier",
    (s, d) => {
      val sp = Tables.part(s, d).filter(col("p_size") <= 5)
        .select(col("p_partkey"), col("p_name"))
      val w = Window.partitionBy(col("l_partkey")).orderBy(col("cents"), col("l_suppkey"))
      Tables.lineitem(s, d)
        .select(col("l_partkey"), col("l_suppkey"), cents("l_extendedprice").as("cents"))
        // sp (part slice) and supplier scale with SF — size-guarded hints
        // (release at scale); only the 25-row nation dim is force-broadcast.
        .join(Guards.dimHint(s, d, "part", sp), col("l_partkey") === col("p_partkey"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .join(Guards.dimHint(s, d, "supplier", Tables.supplier(s, d)),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
        .select(col("p_partkey"), col("p_name"), col("s_name"), col("n_name"),
          (col("cents") / 100.0).as("best_price"))
        .orderBy("p_partkey")
    },
    Some("""
      WITH sp AS (SELECT p_partkey, p_name FROM part WHERE p_size <= 5),
      r AS (
        SELECT l_partkey, l_suppkey, CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
               row_number() OVER (PARTITION BY l_partkey
                                  ORDER BY CAST(round(l_extendedprice * 100) AS BIGINT), l_suppkey) AS rn
        FROM lineitem JOIN sp ON l_partkey = sp.p_partkey
      )
      SELECT sp.p_partkey, sp.p_name, s_name, n_name, cents / 100.0 AS best_price
      FROM r
      JOIN sp ON r.l_partkey = sp.p_partkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      WHERE rn = 1
      ORDER BY p_partkey
    """.stripMargin.trim)
  )

  /** TPC-H Q11 flavor: suppliers holding more than 1% of global line
    * value. The global total is a 1-row aggregate broadcast back; the
    * HAVING comparison is pure integer arithmetic (`100·v > g`), and the
    * reported share is exact basis points via integer division. */
  val qGroupShare: QueryDef = QueryDef(
    "q_group_share",
    (s, d) => {
      // Whole-frame window over the per-supplier AGGREGATE (supplier-count
      // rows, not the fact) — one lineitem scan; the scalar-aggregate
      // crossJoin form was measured to re-scan the fact (no exchange
      // reuse). Partition key: Registry.wholeFrameKey (survives constant
      // folding, so no WindowExec empty-spec WARN).
      val perSup = Tables.lineitem(s, d)
        .select(col("l_suppkey"), cents("l_extendedprice").as("c"))
        .groupBy(col("l_suppkey"))
        .agg(sum(col("c")).as("v"))
        .withColumn("g", sum(col("v")).over(
          Window.partitionBy(graft.Registry.wholeFrameKey(col("v")))))
      // The filtered frame is provably ≤100 rows (each survivor holds >1%
      // of a total that sums to 100%) — supplier scales, so the hint goes
      // on the BOUNDED side, not the dim.
      perSup
        .filter(col("v") * 100 > col("g"))
        .hint("broadcast")
        .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"),
          (col("v") / 100.0).as("value"),
          expr("(10000 * v) div g").as("share_bp"))
        .orderBy(col("value").desc, col("s_suppkey"))
    },
    Some("""
      WITH perSup AS (
        SELECT l_suppkey, sum(CAST(round(l_extendedprice * 100) AS BIGINT))::BIGINT AS v
        FROM lineitem GROUP BY l_suppkey
      ), ps AS (SELECT *, (sum(v) OVER ())::BIGINT AS g FROM perSup)
      SELECT s_suppkey, s_name, v / 100.0 AS value, (10000 * v) // g AS share_bp
      FROM ps
      JOIN supplier ON l_suppkey = s_suppkey
      WHERE v * 100 > g
      ORDER BY value DESC, s_suppkey
    """.stripMargin.trim)
  )

  /** TPC-H Q13: how many customers placed 0, 1, 2, … orders. The left
    * join keeps order-less customers (the distribution's zero bucket —
    * what an inner join silently drops); two aggregations, each on its
    * natural key. */
  val qOrderCountDist: QueryDef = QueryDef(
    "q_order_count_dist",
    (s, d) => {
      val oc = Tables.customer(s, d)
        .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
      oc.groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    },
    Some("""
      WITH oc AS (
        SELECT c_custkey, count(o_orderkey) AS c_count
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        GROUP BY c_custkey
      )
      SELECT c_count, count(*) AS custdist
      FROM oc
      GROUP BY c_count
      ORDER BY custdist DESC, c_count DESC
    """.stripMargin.trim)
  )

  /** TPC-H Q18 flavor: orders whose total quantity tops 300 units, with
    * their customers. The threshold group-filter reduces lineitem to a
    * handful of orderkeys BEFORE any join; quantities are integral
    * doubles, so the sum and threshold are exact. */
  val qBigSpenders: QueryDef = QueryDef(
    "q_big_spenders",
    (s, d) => {
      val big = Tables.lineitem(s, d)
        .groupBy(col("l_orderkey"))
        .agg(sum(col("l_quantity")).as("sum_qty"))
        .filter(col("sum_qty") > 300)
      big
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_date"),
          round(col("o_totalprice"), 2).as("o_totalprice"),
          col("sum_qty").cast("long").as("sum_qty"))
        .orderBy("o_orderkey")
    },
    Some("""
      WITH big AS (
        SELECT l_orderkey, sum(l_quantity) AS sum_qty
        FROM lineitem
        GROUP BY l_orderkey
        HAVING sum(l_quantity) > 300
      )
      SELECT c_name, c_custkey, o_orderkey,
             strftime(o_orderdate, '%Y-%m-%d') AS o_date,
             round(o_totalprice, 2) AS o_totalprice,
             CAST(sum_qty AS BIGINT) AS sum_qty
      FROM big
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      ORDER BY o_orderkey
    """.stripMargin.trim)
  )

  /** TPC-H Q21 shape: suppliers who were the SOLE slow supplier on a
    * finished multi-supplier order ("slow" = shipped >60 days after the
    * order date; the testdata carries no commit/receipt dates). The classic
    * form is EXISTS + NOT EXISTS over a twice-self-joined fact — three
    * lineitem scans. Spark-first decorrelation: both existentials are
    * per-order supplier-set facts, so ONE window over the l_orderkey
    * exchange (distinct-supplier count and distinct-SLOW-supplier count via
    * collect_set — order groups are ≤13 suppliers here, bounded by order
    * width, never corpus-scaled) replaces both self-joins: EXISTS(other
    * supplier) ⇔ n_supp > 1, NOT EXISTS(other slow supplier) ⇔ n_slow_supp
    * == 1 for a row that is itself slow. One fact scan, one exchange; the
    * oracle runs the literal EXISTS/NOT-EXISTS form — an independent
    * algorithm, not a transliteration. */
  val qWaitingSuppliers: QueryDef = QueryDef(
    "q_waiting_suppliers",
    (s, d) => {
      val slowLine = col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAY")
      val li = Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
        .join(Tables.orders(s, d)
          .filter(col("o_orderstatus") === "F")
          .select(col("o_orderkey"), col("o_orderdate")),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("l_orderkey"), col("l_suppkey"), slowLine.as("slow"))
      val w = Window.partitionBy(col("l_orderkey"))
      li
        // one select, not two withColumn: same-spec window exprs collapse
        // into a single Window node (no Project between them to block it)
        .select(col("l_suppkey"), col("slow"),
          size(collect_set(col("l_suppkey")).over(w)).as("n_supp"),
          size(collect_set(when(col("slow"), col("l_suppkey"))).over(w)).as("n_slow_supp"))
        .filter(col("slow") && col("n_supp") > 1 && col("n_slow_supp") === 1)
        .groupBy(col("l_suppkey"))
        .agg(count(lit(1)).as("numwait"))
        // supplier scales with SF — size-guarded hint (releases at scale).
        .join(Guards.dimHint(s, d, "supplier", Tables.supplier(s, d)),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"), col("numwait"))
        .orderBy(col("numwait").desc, col("s_suppkey"))
    },
    Some("""
      SELECT s_suppkey, s_name, count(*) AS numwait
      FROM lineitem l1
      JOIN orders ON o_orderkey = l1.l_orderkey
      JOIN supplier ON s_suppkey = l1.l_suppkey
      WHERE o_orderstatus = 'F'
        AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
        AND EXISTS (
          SELECT 1 FROM lineitem l2
          WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
        AND NOT EXISTS (
          SELECT 1 FROM lineitem l3
          JOIN orders o3 ON o3.o_orderkey = l3.l_orderkey
          WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
            AND l3.l_shipdate > o3.o_orderdate + INTERVAL 60 DAY)
      GROUP BY 1, 2
      ORDER BY numwait DESC, s_suppkey
    """.stripMargin.trim)
  )

  /** TPC-H Q17 shape: revenue that would be lost by refusing small-quantity
    * orders — lines of one brand's parts with quantity under half the
    * part's average, reported as exact-cents yearly revenue. The classic
    * form correlates a per-part scalar subquery; decorrelated here as a
    * window average over the SAME l_partkey partition the filter reads —
    * one fact scan, one exchange of only the brand-filtered lines (the
    * part filter prunes first; AQE broadcasts it while it fits). Quantities are integer-valued
    * doubles, so the average is IEEE-exact and the threshold comparison
    * cannot diverge between engines; revenue stays in integer cents with
    * truncating div (both engines truncate toward zero on positives —
    * settled round 4). */
  val qSmallQtyRevenue: QueryDef = QueryDef(
    "q_small_qty_revenue",
    (s, d) => {
      val brandParts = Tables.part(s, d)
        .filter(col("p_brand") === "Brand#4").select(col("p_partkey"))
      val w = Window.partitionBy(col("l_partkey"))
      Tables.lineitem(s, d)
        .select(col("l_partkey"), col("l_quantity"), cents("l_extendedprice").as("c"))
        // brandParts is a fixed FRACTION of part — size-guarded hint only.
        .join(Guards.dimHint(s, d, "part", brandParts),
          col("l_partkey") === col("p_partkey"))
        .withColumn("avg_qty", avg(col("l_quantity")).over(w))
        .filter(col("l_quantity") < lit(0.5) * col("avg_qty"))
        .agg(sum(col("c")).as("sum_c"), count(lit(1)).as("n_small_lines"))
        .select(
          (expr("sum_c div 7") / 100.0).as("avg_yearly"),
          col("n_small_lines"))
    },
    Some("""
      SELECT (sum_c // 7) / 100.0 AS avg_yearly, n_small_lines
      FROM (
        SELECT sum(CAST(round(l_extendedprice * 100) AS BIGINT))::BIGINT AS sum_c,
               count(*) AS n_small_lines
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        WHERE p_brand = 'Brand#4'
          AND l_quantity < (
            SELECT 0.5 * avg(l_quantity) FROM lineitem l2
            WHERE l2.l_partkey = lineitem.l_partkey))
    """.stripMargin.trim)
  )

  /** TPC-H Q22 shape: well-funded customers with NO orders of a class
    * (urgent), grouped by nation — the scalar-average threshold + anti-join
    * decorrelation pattern. (Classic Q22 anti-joins ALL orders; every
    * testdata customer has some order, so the class filter keeps the shape
    * AND a non-empty result.) Balances compare in integer cents against a
    * 1-row broadcast average (float sums would order-diverge across
    * engines); the anti join is a broadcast of the filtered key set at this
    * SF and a shuffled left-anti at scale — both AQE's call. */
  val qIdleCustomers: QueryDef = QueryDef(
    "q_idle_customers",
    (s, d) => {
      val cust = Tables.customer(s, d)
        .select(col("c_custkey"), col("c_nationkey"), cents("c_acctbal").as("cb"))
      // 1-row positive-balance average: broadcast, not a correlated rescan
      val avgPos = cust.filter(col("cb") > 0).agg(avg(col("cb")).as("a"))
      val urgent = Tables.orders(s, d)
        .filter(col("o_orderpriority") === "1-URGENT").select(col("o_custkey"))
      cust
        .join(broadcast(avgPos))
        .filter(col("cb") > col("a"))
        .join(urgent, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("numcust"), (sum(col("cb")) / 100.0).as("totacctbal"))
        .orderBy("c_nationkey")
    },
    Some("""
      WITH cb AS (
        SELECT c_custkey, c_nationkey,
               CAST(round(c_acctbal * 100) AS BIGINT) AS cb
        FROM customer
      ), ab AS (SELECT avg(cb) AS a FROM cb WHERE cb > 0)
      SELECT c_nationkey, count(*) AS numcust, sum(cb) / 100.0 AS totacctbal
      FROM cb, ab
      WHERE cb > a
        AND NOT EXISTS (SELECT 1 FROM orders
                        WHERE o_custkey = cb.c_custkey
                          AND o_orderpriority = '1-URGENT')
      GROUP BY c_nationkey
      ORDER BY c_nationkey
    """.stripMargin.trim)
  )

  /** RFM customer segmentation — the classic CRM cube: per-customer
    * Recency (days since last order, against the corpus's latest order
    * date), Frequency (order count) and Monetary (exact cents) quintiles,
    * rolled up to the ≤125 (r,f,m) cells with customer counts and cell
    * value. Quintile ties are broken by custkey so the buckets are
    * deterministic on both engines.
    *
    * Scale: one orders scan → per-customer aggregate (the only data-sized
    * exchange); each quintile is [[ScalePatterns.bucketedRank]]'s two-phase
    * ranking (value-range buckets + a keys×B offset window + per-bucket
    * row_number — widest sort is 1/B of the frame) + [[ScalePatterns
    * .sqlTile]]'s exact ntile arithmetic, so NO whole-frame single-task
    * sort survives at any corpus size. The `latest` scalar the oracle's
    * recency ntile reads never needs computing at all: `recency_days =
    * datediff(latest, last_order)` is strictly order-reversing in
    * `last_order`, so ranking ascending recency IS ranking descending
    * `last_order` (identical ties — same date, same custkey tiebreak). */
  val qRfmSegments: QueryDef = QueryDef(
    "q_rfm_segments",
    (s, d) => {
      // Pinned eagerly: FOUR consumers read this keys-sized frame (the
      // three independent quintile chains — whose bucketedRank bounds/
      // offsets passes each re-scan their input — plus the final join);
      // without it the plan re-runs the orders scan + aggregate 13×
      // (probe census: 13 parquet scans, 42 exchanges, ZERO
      // ReusedExchange across the AQE-compiled subtrees). ~30 B/customer,
      // orders of magnitude below the fact at any SF.
      val per = Tables.orders(s, d)
        .groupBy(col("o_custkey"))
        .agg(
          max(col("o_orderdate")).as("last_order"),
          count(lit(1)).as("freq"),
          sum(cents("o_totalprice")).as("monetary_c"))
        .localCheckpoint(true)
      // bucketedRank wants (key, v, id): key is the non-foldable constant
      // (single logical frame — parallelism comes from the B value buckets,
      // not the key), v the ORDER BY value, id the custkey tiebreak. Each
      // quintile ranks a NARROW (key, v, id) projection independently —
      // the three rank chains carry 24-byte rows through their exchanges
      // and their stages have no mutual dependencies (vs. chaining, which
      // serializes them and threads every prior score column through each
      // exchange) — then joins its score back on custkey.
      def quintile(v: org.apache.spark.sql.Column,
          name: String): org.apache.spark.sql.DataFrame =
        ScalePatterns.bucketedRank(per.select(
            graft.Registry.wholeFrameKey(col("o_custkey")).as("key"),
            v.as("v"), col("o_custkey").as("id")))
          .withColumn(name, ScalePatterns.sqlTile(5))
          .select(col("id").as("o_custkey"), col(name))
      val scored = per.select(col("o_custkey"), col("monetary_c"))
        .join(quintile(-unix_date(col("last_order").cast("date")), "r_score"), "o_custkey")
        .join(quintile(-col("freq"), "f_score"), "o_custkey")
        .join(quintile(-col("monetary_c"), "m_score"), "o_custkey")
      scored
        .groupBy(col("r_score"), col("f_score"), col("m_score"))
        .agg(
          count(lit(1)).as("n_customers"),
          round(sum(col("monetary_c")) / 100.0, 2).as("cell_value"))
        .orderBy("r_score", "f_score", "m_score")
    },
    Some("""
      WITH per AS (
        SELECT o_custkey, max(o_orderdate) AS last_order, count(*) AS freq,
               sum(CAST(round(o_totalprice * 100) AS BIGINT))::BIGINT AS monetary_c
        FROM orders GROUP BY o_custkey
      ), latest AS (
        SELECT max(last_order) AS mx FROM per
      ), scored AS (
        SELECT o_custkey, monetary_c,
               ntile(5) OVER (ORDER BY datediff('day', last_order, mx),
                              o_custkey) AS r_score,
               ntile(5) OVER (ORDER BY freq DESC, o_custkey) AS f_score,
               ntile(5) OVER (ORDER BY monetary_c DESC, o_custkey) AS m_score
        FROM per, latest
      )
      SELECT r_score, f_score, m_score, count(*) AS n_customers,
             round(sum(monetary_c) / 100.0, 2) AS cell_value
      FROM scored
      GROUP BY r_score, f_score, m_score
      ORDER BY r_score, f_score, m_score
    """.stripMargin.trim)
  )

  /** Market-basket affinity: the 20 part pairs most often bought together
    * (distinct parts per order, so a double-shipped part can't inflate
    * its pairs). The classic co-purchase/recommendation seed query.
    *
    * Scale (ROUND 18, r17 verdict #3 probe): ONE full-corpus exchange.
    * The r17 distinct + equi-self-join form paid two — the (ok, pk)
    * distinct exchange (which removed almost nothing: 59.99M of 60M
    * rows survived at sf10) and the orderkey join exchange. Here the
    * fact repartitions by orderkey once, sorts within partitions, and a
    * streaming typed pass dedups consecutive (ok, pk) AND emits each
    * order's pairs in place (order sizes are bounded — ≤13 parts, so
    * ≤78 pairs and a ≤13-slot buffer; no collect_set object aggregate,
    * whose external-sort fallback under session pressure killed the r12
    * form). Pair counts partially aggregate map-side before their own
    * exchange; top-20 folds to TakeOrdered (per-partition heaps +
    * driver merge), never a whole-frame rank. Ties at the cut break
    * deterministically by (p1, p2). Measured (sf10, alternated twice
    * in-session): shipped 44.2/25.6 s vs this form 28.9/19.7 s —
    * parity-exact, ~1.4x, and one fewer corpus exchange at any scale. */
  val qCopurchasePairs: QueryDef = QueryDef(
    "q_copurchase_pairs",
    (s, d) => {
      import s.implicits._
      val sorted = Tables.lineitem(s, d)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        .repartition(col("ok"))
        .sortWithinPartitions("ok", "pk")
        .as[(Long, Long)]
      sorted.mapPartitions { it =>
        val pks = scala.collection.mutable.ArrayBuffer.empty[Long]
        var curOk = Long.MinValue
        var started = false
        val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
        def flush(): Array[(Long, Long)] = {
          out.clear()
          var i = 0
          while (i < pks.length) {
            var j = i + 1
            while (j < pks.length) { out += ((pks(i), pks(j))); j += 1 }
            i += 1
          }
          pks.clear()
          out.toArray
        }
        new Iterator[(Long, Long)] {
          private var pending: Iterator[(Long, Long)] = Iterator.empty
          private def advance(): Unit = {
            while (!pending.hasNext && it.hasNext) {
              val (ok, pk) = it.next()
              if (!started || ok == curOk) {
                started = true; curOk = ok
                // sorted within order: consecutive dups collapse
                if (pks.isEmpty || pks.last != pk) pks += pk
              } else {
                val fl = flush()
                curOk = ok
                pks += pk
                pending = fl.iterator
              }
            }
            if (!pending.hasNext && !it.hasNext && pks.nonEmpty)
              pending = flush().iterator
          }
          def hasNext: Boolean = { advance(); pending.hasNext }
          def next(): (Long, Long) = { advance(); pending.next() }
        }
      }.toDF("p1", "p2")
        .groupBy(col("p1"), col("p2"))
        .agg(count(lit(1)).as("n_orders"))
        .orderBy(col("n_orders").desc, col("p1"), col("p2"))
        .limit(20)
    },
    Some("""
      WITH items AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem)
      SELECT a.pk AS p1, b.pk AS p2, count(*) AS n_orders
      FROM items a JOIN items b ON a.ok = b.ok AND a.pk < b.pk
      GROUP BY p1, p2
      ORDER BY n_orders DESC, p1, p2
      LIMIT 20
    """.stripMargin.trim)
  )

  val all: Seq[QueryDef] = Seq(qMinCostSupplier, qGroupShare, qOrderCountDist,
    qBigSpenders, qWaitingSuppliers, qSmallQtyRevenue, qIdleCustomers, qRfmSegments,
    qCopurchasePairs)
}
