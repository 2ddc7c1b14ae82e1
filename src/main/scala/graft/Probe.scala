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
    val d = args.headOption.getOrElse("/root/testdata/sf0.01")
    def top5(name: String): Map[Long, Set[Long]] =
      SparkEntry.queries(name)(spark, d).collect()
        .groupBy(_.getAs[Long]("query_id"))
        .map { case (q, rs) => q -> rs.map(_.getAs[Long]("neighbor_id")).toSet }
    val exact = top5("ann_bruteforce")
    for (name <- Seq("ann_pq", "ann_ivfpq")) {
      val pq = top5(name)
      val recalls = exact.keys.toSeq.sorted.map { q =>
        (exact(q) & pq.getOrElse(q, Set.empty)).size.toDouble / exact(q).size
      }
      println(f"##MEAN $name## ${recalls.sum / recalls.size}%.3f")
    }
    val codes = SparkEntry.queries("emb_pq_codes")(spark, d)
    codes.show(5, false)
    println("##ERR## " + codes.agg(org.apache.spark.sql.functions.avg("err")).head.getDouble(0))
    spark.stop()
  }
}
