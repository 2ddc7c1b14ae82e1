package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch main for plan/volume probes — contents change per investigation. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.io.compression.codec", "zstd")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.plans.VectorExpressions
    import spark.implicits._

    // round-13 recall/cost curve: routed kNN recall at probe depth 0/1/2
    // on (a) the spec's LSH-worst-case uniform 600-member label and (b) a
    // correlated corpus (60 clusters x 10 members — the real-embedding
    // shape where LSH buckets align with structure).
    def recallOn(base: org.apache.spark.sql.DataFrame, tag: String): Unit = {
      val exact = operators.Similarity.knnGraphFor(spark, base, 100000).collect()
        .map(r => (r.getAs[Long]("src"), r.getAs[Long]("dst"))).toSet
      for (p <- Seq(0, 1, 2)) {
        spark.conf.set(Conf.KnnProbeConf, p.toString)
        val t0 = System.nanoTime()
        val got = operators.Similarity.knnGraphFor(spark, base, 512).collect()
          .map(r => (r.getAs[Long]("src"), r.getAs[Long]("dst"))).toSet
        val dt = (System.nanoTime() - t0) / 1e9
        System.err.println(f"[probe] $tag nProbe=$p recall ${got.intersect(exact).size.toDouble / exact.size}%.4f" +
          f" (${got.intersect(exact).size}/${exact.size}) ${dt}%.2f s")
      }
      spark.conf.unset(Conf.KnnProbeConf)
    }

    val uniform = Tables.embeddings(spark, "/root/testdata/sf0.1")
      .filter(col("vec_id") < 600)
      .select(lit(0).as("label"), col("vec_id"), col("embedding"))
      .withColumn("nrm", sqrt(VectorExpressions.floatDot(col("embedding"), col("embedding"))))
      .withColumn("label_n", lit(600L))
    recallOn(uniform, "uniform600")

    // correlated corpus: deterministic splitmix64 centers + small noise
    def mix(x: Long): Long = {
      var z = x + 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
    def unit(seed: Long, i: Int): Double =
      (mix(seed * 1024 + i) & 0xFFFFFF).toDouble / 0xFFFFFF.toDouble - 0.5
    val dim = 64
    val corr = (0 until 600).map { id =>
      val c = id / 10 // 60 clusters of 10
      val v = Array.tabulate(dim)(i => (unit(c + 7000, i) + 0.15 * unit(id + 90000, i)).toFloat)
      (0, id.toLong, v)
    }.toDF("label", "vec_id", "embedding")
      .withColumn("nrm", sqrt(VectorExpressions.floatDot(col("embedding"), col("embedding"))))
      .withColumn("label_n", lit(600L))
    recallOn(corr, "correlated600")
  }
}
