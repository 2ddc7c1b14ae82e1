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
    * before the full sort, and all three name dims broadcast. */
  val qMinCostSupplier: QueryDef = QueryDef(
    "q_min_cost_supplier",
    (s, d) => {
      val sp = Tables.part(s, d).filter(col("p_size") <= 5)
        .select(col("p_partkey"), col("p_name"))
      val w = Window.partitionBy(col("l_partkey")).orderBy(col("cents"), col("l_suppkey"))
      Tables.lineitem(s, d)
        .select(col("l_partkey"), col("l_suppkey"), cents("l_extendedprice").as("cents"))
        .join(broadcast(sp), col("l_partkey") === col("p_partkey"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .join(broadcast(Tables.supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
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
      // crossJoin form would run the fact aggregation twice. partitionBy
      // (lit(1)) rather than (): same single-partition exchange of the tiny
      // aggregate, but without WindowExec's empty-spec WARN spam (see
      // pipeline_domain_mix).
      val perSup = Tables.lineitem(s, d)
        .select(col("l_suppkey"), cents("l_extendedprice").as("c"))
        .groupBy(col("l_suppkey"))
        .agg(sum(col("c")).as("v"))
        .withColumn("g", sum(col("v")).over(Window.partitionBy(lit(1))))
      perSup
        .filter(col("v") * 100 > col("g"))
        .join(broadcast(Tables.supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
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

  val all: Seq[QueryDef] = Seq(qMinCostSupplier, qGroupShare, qOrderCountDist, qBigSpenders)
}
