package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch main for plan/volume probes — contents change per investigation. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // hot-key join evidence: plain vs salted fact/dim join on the
    // sf10hot corpus (one user = 10% of events)
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/data/sf10hot")
    def fact = Tables.events(spark, d).select(col("user_id"), col("value"), col("event_id"))
    def dim = Tables.customer(spark, d)
      .select(col("c_custkey").as("user_id"), col("c_name"), col("c_mktsegment"))
    def time(tag: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      val n = df.count()
      System.err.println(f"[probe] $tag rows=$n ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    def agg(j: org.apache.spark.sql.DataFrame) = j
      .groupBy(col("user_id"), col("c_name"), col("c_mktsegment"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("total_value"))
    time("warmup-scan")(fact.join(dim, Seq("user_id")))
    val joined = agg(fact.join(dim, Seq("user_id")))
    System.err.println("[probe] plain join strategy: " +
      "SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin".r
        .findAllIn(joined.queryExecution.executedPlan.toString).toSeq.distinct)
    for (r <- 1 to 2) {
      // plain sort-merge join, AQE default (skew-join rule active)
      time(s"plain+aqe#$r")(agg(fact.join(dim, Seq("user_id"))))
      // plain join with AQE skew handling OFF (the naive plan)
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
      time(s"plain-noskewjoin#$r")(agg(fact.join(dim, Seq("user_id"))))
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      // the library's salted form
      time(s"salted#$r")(graft.operators.ScalePatterns.qSkewJoinSalted.fn(spark, d))
    }
    spark.stop()
  }
}
