package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}

/** Third TPC-H-shape wave — the remaining classic warehouse shapes the
  * Greenplum serve lane (`/root/reference/README.md:14-16`,
  * `demo/05_gpdb_poll.sh`) answers that waves one and two don't cover:
  * date-windowed EXISTS (Q4), the two-bucket CASE rollup (Q12), the
  * conditional-share scalar (Q14), the excluded-set distinct count (Q16),
  * the disjunctive OR-of-ANDs pushdown probe (Q19), and the half-of-total
  * correlated threshold (Q20). Column substitutions (the testdata carries
  * no commitdate/shipmode/partsupp) keep every JOIN/decorrelation shape
  * intact — the shape, not the column, is what's exercised.
  *
  * Monetary sums run on exact integer cents; shares are integer basis
  * points via truncating div (both engines truncate toward zero — settled
  * round 4); every query ends in a total ORDER BY.
  */
object TpchThird {

  private def cents(c: String) = round(col(c) * 100).cast("long")

  /** TPC-H Q4: orders placed in a quarter that had at least one LATE line
    * (shipped >30 days after order date; the testdata has no
    * commit/receipt dates), counted by priority. The correlated EXISTS is
    * a LEFT SEMI join on orderkey with the lateness predicate riding in
    * the join condition — the quarter filter prunes orders BEFORE the
    * join, lineitem sends only (orderkey, shipdate), and the semi join
    * stops probing an order at its first late line. One exchange per side
    * on orderkey; at 100 TB both sides bucket on orderkey and the
    * exchange disappears. */
  val qOrderPriority: QueryDef = QueryDef(
    "q_order_priority",
    (s, d) => {
      val q = Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("date") &&
          col("o_orderdate") < lit("1996-04-01").cast("date"))
        .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      val li = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_shipdate"))
      q.join(li,
          col("o_orderkey") === col("l_orderkey") &&
            col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 30 DAY"),
          "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
        .orderBy("o_orderpriority")
    },
    Some("""
      SELECT o_orderpriority, count(*) AS order_count
      FROM orders
      WHERE o_orderdate >= DATE '1996-01-01'
        AND o_orderdate < DATE '1996-04-01'
        AND EXISTS (
          SELECT 1 FROM lineitem
          WHERE l_orderkey = o_orderkey
            AND l_shipdate > o_orderdate + INTERVAL 30 DAY)
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority
    """.stripMargin.trim)
  )

  /** TPC-H Q12: lines shipped in a year, bucketed by linestatus (the
    * testdata's stand-in for shipmode), counting critical-priority orders
    * (URGENT/HIGH) against the rest — the two-bucket CASE rollup. The year
    * filter prunes the fact scan (pushed to parquet); orders project only
    * (orderkey, priority); one orderkey exchange each side. */
  val qPriorityShipping: QueryDef = QueryDef(
    "q_priority_shipping",
    (s, d) => {
      val crit = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("date") &&
          col("l_shipdate") < lit("1997-01-01").cast("date"))
        .select(col("l_orderkey"), col("l_linestatus"))
        .join(Tables.orders(s, d).select(col("o_orderkey"), col("o_orderpriority")),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_linestatus"))
        .agg(
          sum(when(crit, 1L).otherwise(0L)).as("high_line_count"),
          sum(when(crit, 0L).otherwise(1L)).as("low_line_count"))
        .orderBy("l_linestatus")
    },
    Some("""
      SELECT l_linestatus,
             sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                      THEN 1 ELSE 0 END)::BIGINT AS high_line_count,
             sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                      THEN 0 ELSE 1 END)::BIGINT AS low_line_count
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      WHERE l_shipdate >= DATE '1996-01-01'
        AND l_shipdate < DATE '1997-01-01'
      GROUP BY l_linestatus
      ORDER BY l_linestatus
    """.stripMargin.trim)
  )

  /** TPC-H Q14: share of a month's line revenue coming from PROMO-type
    * parts — the conditional-share scalar. One fact scan month-pruned at
    * the parquet level, the part-type join is AQE's call (part scales
    * with SF — no forced broadcast), and the share is exact
    * integer basis points ((10000·promo) div total) beside the two exact
    * cent sums — no float ratio to diverge between engines. */
  val qPromoRevenue: QueryDef = QueryDef(
    "q_promo_revenue",
    (s, d) => {
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1996-03-01").cast("date") &&
          col("l_shipdate") < lit("1996-04-01").cast("date"))
        .select(col("l_partkey"), cents("l_extendedprice").as("c"))
        // part scales with SF — size-guarded hint (releases at scale).
        .join(Guards.dimHint(s, d, "part",
            Tables.part(s, d).select(col("p_partkey"), col("p_type"))),
          col("l_partkey") === col("p_partkey"))
        .agg(
          sum(when(col("p_type") === "PROMO", col("c")).otherwise(0L)).as("promo_cents"),
          sum(col("c")).as("total_cents"))
        .select(
          col("promo_cents"), col("total_cents"),
          expr("(10000 * promo_cents) div total_cents").as("promo_share_bp"))
    },
    Some("""
      SELECT promo_cents, total_cents,
             (10000 * promo_cents) // total_cents AS promo_share_bp
      FROM (
        SELECT sum(CASE WHEN p_type = 'PROMO'
                        THEN CAST(round(l_extendedprice * 100) AS BIGINT)
                        ELSE 0 END)::BIGINT AS promo_cents,
               sum(CAST(round(l_extendedprice * 100) AS BIGINT))::BIGINT AS total_cents
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= DATE '1996-03-01'
          AND l_shipdate < DATE '1996-04-01')
    """.stripMargin.trim)
  )

  /** TPC-H Q16: how many distinct suppliers can deliver each
    * (brand, type, size) combination, excluding a brand, restricting to
    * the classic size IN-list, and dropping "complained-about" suppliers
    * (negative balance — the NOT IN subquery). The testdata has no
    * partsupp, so the part↔supplier association is the distinct
    * (l_partkey, l_suppkey) pairs actually shipped — same shape, one extra
    * distinct. Both filter frames are SF-scaling slices of part/supplier,
    * so the join strategy is AQE's call (broadcast while small); the
    * distinct + count-distinct both key on partkey-derived groups. */
  val qSupplierVariety: QueryDef = QueryDef(
    "q_supplier_variety",
    (s, d) => {
      val badSupp = Tables.supplier(s, d)
        .filter(col("s_acctbal") < 0).select(col("s_suppkey"))
      val parts = Tables.part(s, d)
        .filter(col("p_brand") =!= "Brand#1" &&
          col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35))
        .select(col("p_partkey"), col("p_brand"), col("p_type"), col("p_size"))
      // the join filters run BEFORE the distinct, so the only fact-scaled
      // exchange carries just the matching-part pairs (~16% here), partially
      // aggregated map-side; the count after it reuses a tiny exchange
      Tables.lineitem(s, d)
        .select(col("l_partkey"), col("l_suppkey"))
        .join(Guards.dimHint(s, d, "part", parts), col("l_partkey") === col("p_partkey"))
        .join(Guards.dimHint(s, d, "supplier", badSupp),
          col("l_suppkey") === col("s_suppkey"), "left_anti")
        .select(col("p_brand"), col("p_type"), col("p_size"), col("l_suppkey"))
        .distinct()
        .groupBy(col("p_brand"), col("p_type"), col("p_size"))
        .agg(count(lit(1)).as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))
    },
    Some("""
      SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
      FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
      JOIN part ON p_partkey = l_partkey
      WHERE p_brand <> 'Brand#1'
        AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
        AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
      GROUP BY p_brand, p_type, p_size
      ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """.stripMargin.trim)
  )

  /** TPC-H Q19: revenue from three disjunctive brand×size×quantity
    * channels — the OR-of-ANDs predicate probe. The per-branch part
    * predicates OR together into one build-side filter (so only parts
    * matching SOME branch ship to the join at all), and the full
    * disjunction evaluates in the join condition; the quantity bounds
    * cover all branches (1..30), pushed to the fact scan. */
  val qDisjunctiveRev: QueryDef = QueryDef(
    "q_disjunctive_rev",
    (s, d) => {
      def branch(brand: String, szLo: Int, szHi: Int, qLo: Int, qHi: Int) =
        col("p_brand") === brand &&
          col("p_size").between(szLo, szHi) &&
          col("l_quantity").between(qLo, qHi)
      val anyBrand = col("p_brand").isin("Brand#2", "Brand#3", "Brand#4")
      val disj = branch("Brand#2", 1, 5, 1, 11) ||
        branch("Brand#3", 1, 10, 10, 20) ||
        branch("Brand#4", 1, 15, 20, 30)
      Tables.lineitem(s, d)
        .filter(col("l_quantity").between(1, 30))
        .select(col("l_partkey"), col("l_quantity"), cents("l_extendedprice").as("c"))
        // the branch filter keeps a fixed FRACTION of part (SF-scaling) —
        // size-guarded hint (releases at scale, AQE beyond).
        .join(Guards.dimHint(s, d, "part", Tables.part(s, d)
            .filter(anyBrand && col("p_size").between(1, 15))
            .select(col("p_partkey"), col("p_brand"), col("p_size"))),
          col("l_partkey") === col("p_partkey") && disj)
        .agg((sum(col("c")) / 100.0).as("revenue"), count(lit(1)).as("n_lines"))
    },
    Some("""
      SELECT sum(CAST(round(l_extendedprice * 100) AS BIGINT)) / 100.0 AS revenue,
             count(*) AS n_lines
      FROM lineitem
      JOIN part ON l_partkey = p_partkey
      WHERE (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 5
             AND l_quantity BETWEEN 1 AND 11)
         OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 10
             AND l_quantity BETWEEN 10 AND 20)
         OR (p_brand = 'Brand#4' AND p_size BETWEEN 1 AND 15
             AND l_quantity BETWEEN 20 AND 30)
    """.stripMargin.trim)
  )

  /** TPC-H Q20 shape: suppliers who DOMINATED a part — shipped more than
    * half of some 'small …' part's total 1997 volume. Classic Q20
    * correlates ps_availqty against a scalar half-sum per (part, supplier);
    * with no partsupp the threshold is re-anchored to shipped volume:
    * per-(part, supplier) quantity vs half the part's total. Decorrelated
    * as a window sum over the SAME l_partkey exchange the pair aggregation
    * already made — one fact scan, one exchange, no self-join; the oracle
    * runs the literal correlated-subquery form. Quantities are integral
    * doubles → the 2·q > total comparison is exact. */
  val qDominantSuppliers: QueryDef = QueryDef(
    "q_dominant_suppliers",
    (s, d) => {
      val smallParts = Tables.part(s, d)
        .filter(col("p_name").startsWith("small ")).select(col("p_partkey"))
      val pairQty = Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("date") &&
          col("l_shipdate") < lit("1998-01-01").cast("date"))
        .select(col("l_partkey"), col("l_suppkey"), col("l_quantity"))
        .join(Guards.dimHint(s, d, "part", smallParts),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(sum(col("l_quantity")).as("sq"))
      pairQty
        .withColumn("total", sum(col("sq")).over(Window.partitionBy(col("l_partkey"))))
        .filter(col("sq") * 2 > col("total"))
        .groupBy(col("l_suppkey"))
        .agg(count(lit(1)).as("n_parts_dominated"))
        // supplier scales with SF — size-guarded hint (releases at scale).
        .join(Guards.dimHint(s, d, "supplier", Tables.supplier(s, d)),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"), col("n_parts_dominated"))
        .orderBy(col("n_parts_dominated").desc, col("s_suppkey"))
    },
    Some("""
      WITH pq AS (
        SELECT l_partkey, l_suppkey, sum(l_quantity) AS sq
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        WHERE p_name LIKE 'small %'
          AND l_shipdate >= DATE '1997-01-01'
          AND l_shipdate < DATE '1998-01-01'
        GROUP BY l_partkey, l_suppkey
      )
      SELECT s_suppkey, s_name, count(*) AS n_parts_dominated
      FROM pq
      JOIN supplier ON s_suppkey = pq.l_suppkey
      WHERE sq * 2 > (SELECT sum(sq) FROM pq p2 WHERE p2.l_partkey = pq.l_partkey)
      GROUP BY s_suppkey, s_name
      ORDER BY n_parts_dominated DESC, s_suppkey
    """.stripMargin.trim)
  )

  /** TPC-H Q7: trade volume between nation PAIRS — supplier nation on the
    * line side, customer nation through orders, grouped by (pair, year).
    * The 25-row nation dim broadcasts twice under different aliases; the
    * supplier/customer name maps are AQE's call (they scale with SF); the
    * only fact-scaled exchange is the lineitem↔orders orderkey join; the
    * (pair, year) rollup is partially aggregated map-side. */
  val qNationTrade: QueryDef = QueryDef(
    "q_nation_trade",
    (s, d) => {
      val supNation = Tables.supplier(s, d)
        .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("supp_nation"))
      val custNation = Tables.customer(s, d)
        .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("n_name").as("cust_nation"))
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("date") &&
          col("l_shipdate") < lit("1998-01-01").cast("date"))
        .select(col("l_orderkey"), col("l_suppkey"),
          year(col("l_shipdate")).as("l_year"), cents("l_extendedprice").as("c"))
        .join(Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        // supNation/custNation scale with supplier/customer — size-guarded
        // hints keyed on the BASE tables' bytes (the nation join adds 25
        // rows of names, not scale).
        .join(Guards.dimHint(s, d, "supplier", supNation),
          col("l_suppkey") === col("s_suppkey"))
        .join(Guards.dimHint(s, d, "customer", custNation),
          col("o_custkey") === col("c_custkey"))
        .filter(col("supp_nation") =!= col("cust_nation"))
        .groupBy(col("supp_nation"), col("cust_nation"), col("l_year"))
        .agg((sum(col("c")) / 100.0).as("revenue"), count(lit(1)).as("n_lines"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    },
    Some("""
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             year(l_shipdate) AS l_year,
             sum(CAST(round(l_extendedprice * 100) AS BIGINT)) / 100.0 AS revenue,
             count(*) AS n_lines
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE l_shipdate >= DATE '1996-01-01'
        AND l_shipdate < DATE '1998-01-01'
        AND n1.n_name <> n2.n_name
      GROUP BY 1, 2, 3
      ORDER BY 1, 2, 3
    """.stripMargin.trim)
  )

  /** TPC-H Q10: customers who returned goods in a quarter, ranked by lost
    * revenue — the returned-item report. The return-flag + quarter filters
    * prune the fact before its only exchange; customer joins after the
    * per-customer aggregate (key-sized, not fact-sized). */
  val qReturnedRevenue: QueryDef = QueryDef(
    "q_returned_revenue",
    (s, d) => {
      val perCust = Tables.lineitem(s, d)
        .filter(col("l_returnflag") === "R")
        .select(col("l_orderkey"), cents("l_extendedprice").as("c"))
        .join(Tables.orders(s, d)
            .filter(col("o_orderdate") >= lit("1996-01-01").cast("date") &&
              col("o_orderdate") < lit("1996-04-01").cast("date"))
            .select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_custkey"))
        .agg(sum(col("c")).as("rc"), count(lit(1)).as("n_ret_lines"))
      perCust
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("c_name"), col("n_name"),
          (col("rc") / 100.0).as("revenue"), col("n_ret_lines"))
        .orderBy(col("rc").desc, col("c_custkey"))
        .limit(20)
    },
    Some("""
      SELECT c_custkey, c_name, n_name,
             sum(CAST(round(l_extendedprice * 100) AS BIGINT)) / 100.0 AS revenue,
             count(*) AS n_ret_lines
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      WHERE l_returnflag = 'R'
        AND o_orderdate >= DATE '1996-01-01'
        AND o_orderdate < DATE '1996-04-01'
      GROUP BY 1, 2, 3
      ORDER BY sum(CAST(round(l_extendedprice * 100) AS BIGINT)) DESC, c_custkey
      LIMIT 20
    """.stripMargin.trim)
  )

  /** TPC-H Q15: the top supplier(s) by a quarter's revenue — the
    * view-then-max shape, WITH ties kept (the spec's revenue0 view can
    * return several). The global max is a whole-frame window over the
    * supplier-count aggregate (Registry.wholeFrameKey per the WindowExec
    * rule), never a rescan; exact-cents revenue means ties are real ties,
    * not float accidents. */
  val qTopSupplier: QueryDef = QueryDef(
    "q_top_supplier",
    (s, d) => {
      val rev = Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("date") &&
          col("l_shipdate") < lit("1996-04-01").cast("date"))
        .select(col("l_suppkey"), cents("l_extendedprice").as("c"))
        .groupBy(col("l_suppkey"))
        .agg(sum(col("c")).as("rc"))
      rev
        .withColumn("mx", max(col("rc")).over(
          Window.partitionBy(graft.Registry.wholeFrameKey(col("rc")))))
        // the max-filtered frame is tie-sized (≈1 row) — hint THAT side;
        // supplier scales with SF.
        .filter(col("rc") === col("mx"))
        .hint("broadcast")
        .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"), (col("rc") / 100.0).as("total_revenue"))
        .orderBy("s_suppkey")
    },
    Some("""
      WITH rev AS (
        SELECT l_suppkey, sum(CAST(round(l_extendedprice * 100) AS BIGINT))::BIGINT AS rc
        FROM lineitem
        WHERE l_shipdate >= DATE '1996-01-01'
          AND l_shipdate < DATE '1996-04-01'
        GROUP BY l_suppkey
      )
      SELECT s_suppkey, s_name, rc / 100.0 AS total_revenue
      FROM rev
      JOIN supplier ON l_suppkey = s_suppkey
      WHERE rc = (SELECT max(rc) FROM rev)
      ORDER BY s_suppkey
    """.stripMargin.trim)
  )

  /** TPC-H Q9 shape: product-line profit by supplier nation and order
    * year (the testdata carries no ps_supplycost, so "profit" is the
    * revenue-minus-10%-of-retail proxy — same 5-table star + 3-key rollup
    * shape: part type × nation × year). Only the 25-row nation dim is
    * force-broadcast (part/supplier scale with SF); the fact pays only
    * the lineitem↔orders orderkey exchange; exact cents throughout. */
  val qProductProfit: QueryDef = QueryDef(
    "q_product_profit",
    (s, d) => {
      val supNation = Tables.supplier(s, d)
        .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name"))
      val parts = Tables.part(s, d)
        .select(col("p_partkey"), col("p_type"), cents("p_retailprice").as("rp"))
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
          col("l_quantity"), cents("l_extendedprice").as("c"))
        .join(Tables.orders(s, d).select(col("o_orderkey"), year(col("o_orderdate")).as("o_year")),
          col("l_orderkey") === col("o_orderkey"))
        // parts/supNation scale with SF — size-guarded hints.
        .join(Guards.dimHint(s, d, "part", parts), col("l_partkey") === col("p_partkey"))
        .join(Guards.dimHint(s, d, "supplier", supNation),
          col("l_suppkey") === col("s_suppkey"))
        // profit proxy: line revenue minus 10% of retail per unit, exact
        // cents (qty is an integral double → the product is exact; `div`,
        // not `/`, which would be double division)
        .withColumn("profit_c",
          col("c") - expr("(rp * CAST(l_quantity AS BIGINT)) div 10"))
        .groupBy(col("n_name").as("nation"), col("o_year"), col("p_type"))
        .agg((sum(col("profit_c")) / 100.0).as("profit"), count(lit(1)).as("n_lines"))
        .orderBy("nation", "o_year", "p_type")
    },
    Some("""
      SELECT n_name AS nation, year(o_orderdate) AS o_year, p_type,
             sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                 - (CAST(round(p_retailprice * 100) AS BIGINT)
                    * CAST(l_quantity AS BIGINT)) // 10) / 100.0 AS profit,
             count(*) AS n_lines
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN part ON l_partkey = p_partkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      GROUP BY 1, 2, 3
      ORDER BY 1, 2, 3
    """.stripMargin.trim)
  )

  /** Year-over-year monthly revenue growth — the classic reporting query
    * every finance dashboard runs. YoY compares each (year, month) cell
    * to the SAME calendar month a year earlier, so the lag window
    * partitions on month-of-year (12 natural partitions — no whole-frame
    * sort); the growth rate is exact integer basis points over cents
    * (`div`/`//` parity on negative deltas is the q_percent_change
    * precedent), and a gap year yields NULL rather than comparing to the
    * wrong year (prev-year guard).
    *
    * Scale: one orders scan → ≤years×12-cell aggregate; the window runs
    * over the aggregate, not the fact. */
  val qYoyRevenue: QueryDef = QueryDef(
    "q_yoy_revenue",
    (s, d) => {
      val w = Window.partitionBy(col("mo")).orderBy(col("yr"))
      Tables.orders(s, d)
        .groupBy(year(col("o_orderdate")).as("yr"),
          month(col("o_orderdate")).as("mo"))
        .agg(sum(cents("o_totalprice")).as("rev_c"))
        .withColumn("prev_c", lag(col("rev_c"), 1).over(w))
        .withColumn("prev_yr", lag(col("yr"), 1).over(w))
        .select(col("yr"), col("mo"),
          round(col("rev_c") / 100.0, 2).as("revenue"),
          when(col("prev_yr") === col("yr") - 1,
            expr("(10000 * (rev_c - prev_c)) div prev_c")).as("yoy_bp"))
        .orderBy("yr", "mo")
    },
    Some("""
      WITH monthly AS (
        SELECT CAST(year(o_orderdate) AS INT) AS yr,
               CAST(month(o_orderdate) AS INT) AS mo,
               sum(CAST(round(o_totalprice * 100) AS BIGINT))::BIGINT AS rev_c
        FROM orders GROUP BY yr, mo
      ), lagged AS (
        SELECT yr, mo, rev_c,
               lag(rev_c) OVER w AS prev_c,
               lag(yr) OVER w AS prev_yr
        FROM monthly
        WINDOW w AS (PARTITION BY mo ORDER BY yr)
      )
      SELECT yr, mo, round(rev_c / 100.0, 2) AS revenue,
             CASE WHEN prev_yr = yr - 1
                  THEN (10000 * (rev_c - prev_c)) // prev_c END AS yoy_bp
      FROM lagged
      ORDER BY yr, mo
    """.stripMargin.trim)
  )

  val all: Seq[QueryDef] = Seq(qOrderPriority, qPriorityShipping, qPromoRevenue,
    qSupplierVariety, qDisjunctiveRev, qDominantSuppliers, qNationTrade,
    qReturnedRevenue, qTopSupplier, qProductProfit, qYoyRevenue)
}
