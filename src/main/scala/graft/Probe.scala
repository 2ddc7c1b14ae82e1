package graft

import org.apache.spark.sql.SparkSession

/** Scratch probe main — current contents change per investigation.
  * Round 17 (cont.): sf10 recall of the perceptual df windows for the
  * audio and video lanes (image was measured rule-side in DuckDB:
  * 0.9996 at the default 1024). Windowed output is a strict subset
  * with exactly-reported counts, so recall = windowed count / full
  * count. */
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

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[probe] $name%-22s rows=$n%10d  ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    time("video_windowed_2048") {
      graft.operators.Multimodal.videoPhashPairs(spark, sfDir, 2048).count()
    }
    spark.catalog.clearCache()
    time("video_full") {
      graft.operators.Multimodal.videoPhashPairs(spark, sfDir, Int.MaxValue).count()
    }
    spark.catalog.clearCache()
    time("audio_windowed_1024") {
      graft.operators.Multimodal.bandedHammingPairs(spark, sfDir,
        graft.operators.Multimodal.audioFp64, 1024).count()
    }
    spark.catalog.clearCache()
    time("audio_full") {
      graft.operators.Multimodal.bandedHammingPairs(spark, sfDir,
        graft.operators.Multimodal.audioFp64, Int.MaxValue).count()
    }
    spark.stop()
  }
}
