package graft

import org.apache.spark.sql.SparkSession

/** Scratch profiling main (not part of the driver contract). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1000000")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    // recall@5 of the two IVF variants vs brute force at this SF
    val exact = operators.Similarity.annBruteforce.fn(spark, d)
      .select("query_id", "neighbor_id").localCheckpoint(true)
    for (name <- Seq("ann_ivf", "ann_ivf_k")) {
      val approx = SparkEntry.queries(name)(spark, d).select("query_id", "neighbor_id")
      val hit = approx.intersect(exact).count().toDouble
      println(s"RECALL $name: ${hit / exact.count()}")
    }
    spark.stop()
  }
}
