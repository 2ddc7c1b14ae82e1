package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe main — current contents change per investigation. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.io.compression.codec", "zstd")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // round-14: serving vs segment-serving parity at sf0.1 and, batched
    // (annQueryBatch=700 -> 3 batches at 2000 vectors), batch-split
    // invariance of the distributed path.
    val d = "/root/testdata/sf0.1"
    val serving = operators.Similarity.lshTopK(spark, d, distributed = false)
    val dist = operators.Similarity.lshTopK(spark, d, distributed = true)
    val a = serving.exceptAll(dist).count()
    val b = dist.exceptAll(serving).count()
    System.err.println(s"sf0.1 parity: onlyServing=$a onlyDist=$b")
    spark.conf.set(Conf.AnnQueryBatchConf, "700")
    val dist3 = operators.Similarity.lshTopK(spark, d, distributed = true)
    val c = dist3.exceptAll(serving).count()
    val e = serving.exceptAll(dist3).count()
    System.err.println(s"sf0.1 batched(3) parity: onlyBatched=$c onlyServing=$e")
  }
}
