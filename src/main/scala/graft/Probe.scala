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
    // emb_knn_graph elected-lane plan: same-session repeats at sf1 to
    // separate fixed (JIT/codegen/cache-build) cost from per-run work
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/data/sf1")
    def time(tag: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      val n = df.count()
      System.err.println(f"[probe] $tag rows=$n ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    for (r <- 1 to 3)
      time(s"emb_knn_graph#$r")(graft.operators.Similarity.embKnnGraph.fn(spark, d))
  }
}
