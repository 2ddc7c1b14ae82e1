package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Operational upkeep for the parquet event archive — the Spark-side analog
  * of the reference's `maintenance_gpdb.sh` (VACUUM/REINDEX/analyzedb): a
  * streaming archive accretes one small file per micro-batch per partition,
  * and scan efficiency decays until the files are compacted.
  */
object Maintenance {

  /** Compact a partitioned parquet directory to ~1 file per partition
    * value. Returns (files before, files after). Stages through a sibling
    * `.compact` directory and swaps via rename, so a crash leaves either
    * the old or the new layout, never a mix. */
  def compactArchive(spark: SparkSession, dir: String, partitionCol: String): (Long, Long) = {
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

    def countDataFiles(p: String): Long = {
      val it = fs.listFiles(new Path(p), true)
      var n = 0L
      while (it.hasNext) { if (it.next().getPath.getName.endsWith(".parquet")) n += 1 }
      n
    }

    val before = countDataFiles(dir)
    val tmp = dir + ".compact"
    spark.read.parquet(dir)
      .repartition(col(partitionCol)) // one shuffle partition per value -> one file
      .write.mode("overwrite").partitionBy(partitionCol).parquet(tmp)
    val old = dir + ".old"
    fs.rename(new Path(dir), new Path(old))
    fs.rename(new Path(tmp), new Path(dir))
    fs.delete(new Path(old), true)
    (before, countDataFiles(dir))
  }
}
