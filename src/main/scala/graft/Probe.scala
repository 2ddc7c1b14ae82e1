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
    import graft.plans.VectorExpressions
    // routed-recall measurement on the spec's 600-member over-cap label
    val raw = Tables.embeddings(spark, "/root/testdata/sf0.1")
      .filter(col("vec_id") < 600)
      .select(lit(0).as("label"), col("vec_id"), col("embedding"))
    val base = raw
      .withColumn("nrm", sqrt(VectorExpressions.floatDot(col("embedding"), col("embedding"))))
      .withColumn("label_n", lit(600L))
    val got = operators.Similarity.knnGraphFor(spark, base, 512).collect()
      .map(r => (r.getAs[Long]("src"), r.getAs[Long]("dst"))).toSet
    val exact = operators.Similarity.knnGraphFor(spark, base, 1024).collect()
      .map(r => (r.getAs[Long]("src"), r.getAs[Long]("dst"))).toSet
    System.err.println(f"[probe] routed recall ${got.intersect(exact).size.toDouble / exact.size}%.4f" +
      s" (${got.intersect(exact).size}/${exact.size})")
  }
}
