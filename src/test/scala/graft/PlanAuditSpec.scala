package graft

import graft.operators.{Cdc, Olap}

/** Shuffle-discipline audit: keyed operators must introduce exactly ONE
  * hash exchange (windows/aggs on the same key reuse it); the only other
  * exchange allowed is the range partitioning of the deterministic output
  * ORDER BY. Guards against regressions that silently add shuffles. */
class PlanAuditSpec extends SparkSpec {

  private def hashExchanges(plan: String): Int =
    "Exchange hashpartitioning".r.findAllIn(plan).length

  private def planOf(q: QueryDef): String =
    q.fn(spark, sfDir).queryExecution.executedPlan.toString

  test("single hash exchange: snapshot, scd2, sessionize, as-of join, q1") {
    Seq(Cdc.cdcSnapshot, Cdc.cdcScd2, Olap.qSessionize, Olap.qAsofJoin, Olap.q1PricingSummary)
      .foreach { q =>
        val n = hashExchanges(planOf(q))
        assert(n <= 1, s"${q.name}: expected <=1 hash exchange, found $n")
      }
  }

  test("q5 star join broadcasts every dimension (no fact-side hash shuffle before agg)") {
    val plan = planOf(Olap.q5LocalVolume)
    assert("BroadcastHashJoin".r.findAllIn(plan).length >= 4, plan)
    // the only hash exchange is the final groupBy(n_name) aggregation
    assert(hashExchanges(plan) <= 1, plan)
  }

  test("q6 reads only needed columns with pushed filters") {
    val plan = planOf(Olap.q6ForecastRevenue)
    assert(plan.contains("PushedFilters"))
    assert(!plan.contains("l_orderkey"), "q6 should not read unneeded columns")
  }
}
