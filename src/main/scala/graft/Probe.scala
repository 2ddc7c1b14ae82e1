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
    // does the shared-evidence floor (minShared 1 -> 2) change the sf1
    // containment ANSWER, or only trim confirm volume?
    val d = "/root/repo/data/sf1"
    def rows(ms: Int) = graft.operators.Dedup.containmentTop3(spark, d, 256, 16, ms)
      .collect().map(_.toString).toSeq
    val base = rows(1)
    val capped = rows(2)
    System.err.println(s"[probe] minShared=1 rows=${base.size} minShared=2 rows=${capped.size} " +
      s"identical=${base == capped}")
    if (base != capped)
      System.err.println(s"[probe] diff: ${base.diff(capped).take(3)} vs ${capped.diff(base).take(3)}")
    spark.stop()
  }
}
