package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch main for plan/volume probes — contents change per investigation. */
object Probe {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/data/sf10")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // candidate-volume census for dedup_embedding's over-cap LSH leg:
    // per-lane bucket populations -> pre-dedup pair count sum C(pop, 2)
    val nTables = 16
    val emb = Tables.embeddings(spark, d)
    val maxBig = emb.groupBy(col("label")).count()
      .agg(max("count")).head.getLong(0)
    val nPlanes = math.max(8,
      64 - java.lang.Long.numberOfLeadingZeros(math.max(1L, (maxBig + 7) / 8 - 1)))
    System.err.println(s"[probe] maxBig=$maxBig nPlanes=$nPlanes")
    def wgt(t: Int, p: Int, i: Int): Double =
      ((((t * 7919L + p * 131L + i * 31L + 7L) * 2654435761L) % 1000003L + 1000003L) % 1000003L)
        .toDouble / 1000003.0 - 0.5
    val planes: Array[Array[Double]] =
      (for { t <- 0 until nTables; p <- 0 until nPlanes } yield
        Array.tabulate(64)(i => wgt(t, p, i))).toArray
    val nWords = (nTables * nPlanes + 63) / 64
    val laneMask = (1L << nPlanes) - 1
    val sig = emb.select(col("label"), col("vec_id"),
      graft.plans.VectorExpressions.hyperplaneSig(col("embedding"), planes).as("sig"))
    val words = (0 until nWords).map(i => element_at(col("sig"), i + 1).as(s"w$i"))
    val sw = sig.select(col("label") +: col("vec_id") +: words: _*)
    val laneCols = (0 until nTables).map { t =>
      val start = t * nPlanes
      val i0 = start >>> 6
      val sh = start & 63
      val low = shiftrightunsigned(col(s"w$i0"), sh)
      val b =
        if (sh + nPlanes > 64 && i0 + 1 < nWords)
          low.bitwiseOR(shiftleft(col(s"w${i0 + 1}"), 64 - sh)).bitwiseAND(lit(laneMask))
        else low.bitwiseAND(lit(laneMask))
      struct(lit(t).as("t"), b.as("bucket"))
    }
    val pops = sw.select(col("label"), explode(array(laneCols: _*)).as("lane"))
      .groupBy(col("label"), col("lane.t"), col("lane.bucket")).count()
    val stats = pops.agg(
      sum(expr("count * (count - 1) / 2")).as("pairs"),
      max("count").as("max_pop"), count(lit(1)).as("n_buckets")).head
    System.err.println(s"[probe] pre-dedup pairs=${stats.get(0)} max_pop=${stats.get(1)} buckets=${stats.get(2)}")
    spark.stop()
  }
}
