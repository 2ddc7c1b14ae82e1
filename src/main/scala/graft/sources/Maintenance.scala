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

  /** Recover a directory from an interrupted [[compactArchive]] swap.
    * Idempotent; call on startup (compactArchive also calls it first).
    * States a crash can leave behind, and their recovery:
    *   - `dir` missing, `dir.old` present  → crashed between the two
    *     renames: restore by renaming `dir.old` back.
    *   - `dir` present, `dir.old` present  → crashed before the final
    *     delete: the swap completed, drop the stale `dir.old`.
    *   - `dir.compact` present             → incomplete staging write,
    *     never swapped: discard it.
    */
  def recoverArchive(spark: SparkSession, dir: String): Unit = {
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val (d, old, tmp) = (new Path(dir), new Path(dir + ".old"), new Path(dir + ".compact"))
    if (!fs.exists(d) && fs.exists(old)) fs.rename(old, d)
    if (fs.exists(d) && fs.exists(old)) fs.delete(old, true)
    if (fs.exists(tmp)) fs.delete(tmp, true)
  }

  /** Compact a partitioned parquet directory to ~1 file per partition
    * value. Returns (files before, files after). Stages through a sibling
    * `.compact` directory, then swaps with two renames. The swap is NOT
    * atomic: there is a window where `dir` does not exist, and a crash
    * inside it strands the data at `dir.old` — readers racing the swap must
    * tolerate a transient missing directory, and [[recoverArchive]] (run
    * here and on startup) restores the invariant that `dir` holds either
    * the old or the new layout, never a mix. A truly atomic swap needs a
    * transactional table format or an indirection pointer; on raw
    * parquet + HDFS-style rename this staged swap + recovery is the
    * honest contract. */
  def compactArchive(spark: SparkSession, dir: String, partitionCol: String): (Long, Long) = {
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    recoverArchive(spark, dir)

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
