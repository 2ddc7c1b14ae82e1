package graft

import org.apache.spark.sql.SparkSession

/** Scratch probe main — current contents change per investigation.
  * Round 17 (cont.): emb_knn_graph variance — filtered cold runs at
  * sf10 swing 70-343 s vs the committed warm-bench 20.15 s. Run the
  * lane 3x in one JVM to split cold-start from steady-state. */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/data/sf10")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.io.compression.codec", "zstd")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1000000")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (rnd <- 1 to 3) {
      val t0 = System.nanoTime()
      graft.operators.Similarity.embKnnGraph.fn(spark, sfDir).collect()
      println(f"[probe] run=$rnd emb_knn_graph ${(System.nanoTime() - t0) / 1e9}%.2f s")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
