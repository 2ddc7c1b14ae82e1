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
    // q_market_share same-session repeats: separate fixed overhead from
    // per-run work, and check whether exact-decimal arithmetic is hot
    val d = "/root/testdata/sf0.1"
    def time(tag: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      val n = df.collect().length
      System.err.println(f"[probe] $tag rows=$n ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    for (r <- 1 to 4)
      time(s"q_market_share#$r")(graft.operators.AnalyticsExt.qMarketShare.fn(spark, d))
    // contrast: the same join tree with plain double arithmetic
    def doubleVariant = {
      val rev = Tables.lineitem(spark, d)
        .join(Tables.orders(spark, d), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.customer(spark, d).select("c_custkey", "c_nationkey")),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(spark, d)), col("c_nationkey") === col("n_nationkey"))
        .groupBy(year(col("o_orderdate")).as("order_year"), col("n_name"))
        .agg(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
      rev.orderBy("order_year", "n_name")
    }
    for (r <- 1 to 2) time(s"double-arith#$r")(doubleVariant)
    // hybrid: exact per-row arithmetic in LONG cents (extprice is 2 dp,
    // discount 2 dp -> product exact in 1e-4 units), decimal only in the
    // sum accumulator (overflow-safe at any corpus size)
    def hybrid = {
      val rowC = (col("l_extendedprice").cast("decimal(18,2)") * 100)
        .cast("long") * (lit(100) - (col("l_discount").cast("decimal(4,2)") * 100).cast("long"))
      val rev = Tables.lineitem(spark, d)
        .join(Tables.orders(spark, d), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.customer(spark, d).select("c_custkey", "c_nationkey")),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(spark, d)), col("c_nationkey") === col("n_nationkey"))
        .groupBy(year(col("o_orderdate")).as("order_year"), col("n_name"))
        .agg(sum(rowC.cast("decimal(38,0)")).as("rev_c"))
        .select(col("order_year"), col("n_name"),
          round((col("rev_c").cast("decimal(38,4)") / 10000), 2).cast("double").as("revenue"),
          col("rev_c"))
      val w = org.apache.spark.sql.expressions.Window.partitionBy(col("order_year"))
      rev.withColumn("total_c", sum(col("rev_c")).over(w))
        .withColumn("share_ppm", expr("(1000000 * rev_c) div total_c"))
        .select(col("order_year"), col("n_name"), col("revenue"), col("share_ppm"))
        .orderBy("order_year", "n_name")
    }
    for (r <- 1 to 2) time(s"hybrid-longcents#$r")(hybrid)
    // answers must be identical
    val a = graft.operators.AnalyticsExt.qMarketShare.fn(spark, d).collect().map(_.toString).toSeq
    val b = hybrid.collect().map(_.toString).toSeq
    System.err.println(s"[probe] hybrid identical=${a == b}" +
      (if (a != b) s" diff=${a.diff(b).take(2)} vs ${b.diff(a).take(2)}" else ""))
    spark.stop()
  }
}
