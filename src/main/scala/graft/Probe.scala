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
    // measured recall of the routed (over-cap) kNN-graph leg on the
    // 600-member synthetic label the spec uses
    val raw = Tables.embeddings(spark, "/root/testdata/sf0.1")
      .filter(col("vec_id") < 600)
      .select(lit(0).as("label"), col("vec_id"), col("embedding"))
    val base = raw
      .withColumn("nrm", sqrt(graft.plans.VectorExpressions.floatDot(col("embedding"), col("embedding"))))
      .withColumn("label_n", lit(600L))
    val got = graft.operators.Similarity.knnGraphFor(spark, base, 512).collect()
      .map(r => (r.getAs[Long]("src"), r.getAs[Long]("dst"))).toSet
    val exact = graft.operators.Similarity.knnGraphFor(spark, base, 1024).collect()
      .map(r => (r.getAs[Long]("src"), r.getAs[Long]("dst"))).toSet
    System.err.println(s"[probe] routed=${got.size} exact=${exact.size} " +
      s"recall=${got.intersect(exact).size.toDouble / exact.size}")
    spark.stop()
  }
}
