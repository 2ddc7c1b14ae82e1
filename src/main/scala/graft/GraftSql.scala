package graft

import org.apache.spark.sql.SparkSession

/** The SQL serving surface — the Greenplum role in the reference pipeline
  * is answering plain SQL over the replicated tables
  * (`/root/reference/demo/05_gpdb_poll.sh`, README.md:14-16). Two lanes
  * expose the whole operator library to SQL-only users:
  *
  *  1. `graft_run('name')` — a table-valued function injected by
  *     [[graft.plans.GraftExtensions]]; works on any session created with
  *     `spark.sql.extensions=graft.plans.GraftExtensions`, no Scala calls
  *     at all. The data directory comes from the `spark.graft.dataDir`
  *     session conf (overridable per call: `graft_run('name', '/dir')`).
  *  2. [[serve]] — registers every operator as a temp view named by its
  *     key, plus the base tables, for ad-hoc joining/filtering over
  *     operator results.
  *
  * Both lanes splice the operator's LOGICAL plan into the calling query —
  * views and TVF results are lazy, so a `WHERE`/column selection written
  * around them still reaches the parquet scans via Catalyst (filter
  * pushdown and pruning are preserved; nothing is materialized up front).
  */
object GraftSql {

  /** Conf key the `graft_run` TVF reads when no directory argument is
    * given. */
  val DataDirConf = "spark.graft.dataDir"

  /** Resolve a named operator to its DataFrame on `dir`, with a helpful
    * error listing valid names. */
  def run(spark: SparkSession, name: String, dir: String) =
    SparkEntry.queries.get(name) match {
      case Some(fn) => fn(spark, dir)
      case None =>
        throw new IllegalArgumentException(
          s"unknown graft operator '$name'; known operators: " +
            SparkEntry.queries.keys.toSeq.sorted.mkString(", "))
    }

  /** Register the base tables and EVERY batch operator as temp views, so a
    * SQL session can `SELECT * FROM q_asof_join WHERE ...` or join operator
    * outputs. Views are lazy logical plans — registering all ~120 costs
    * nothing until queried. */
  def serve(spark: SparkSession, dir: String): Unit = {
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "documents", "embeddings")
      .foreach(t => Tables.table(spark, dir, t).createOrReplaceTempView(t))
    Tables.events(spark, dir).createOrReplaceTempView("events")
    SparkEntry.queries.foreach { case (name, fn) =>
      fn(spark, dir).createOrReplaceTempView(name)
    }
  }
}
