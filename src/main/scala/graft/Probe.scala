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
    // q_rfm_segments watch adjudication: same-session repeats + plan census
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def time(tag: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      val n = df.count()
      System.err.println(f"[probe] $tag rows=$n ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val q = graft.operators.TpchMore.qRfmSegments.fn(spark, d)
    val plan = q.queryExecution.executedPlan.toString
    System.err.println(s"[probe] scans=${plan.split("Scan parquet").length - 1} " +
      s"exchanges=${plan.split("Exchange").length - 1} " +
      s"reused=${plan.split("ReusedExchange").length - 1}")
    for (r <- 1 to 4)
      time(s"q_rfm_segments#$r")(graft.operators.TpchMore.qRfmSegments.fn(spark, d))
  }
}
