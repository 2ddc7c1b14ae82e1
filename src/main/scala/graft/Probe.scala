package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe main — current contents change per investigation.
  * Round 17: A/B the three r16-verdict-#5 tail lanes at sf10 — the
  * SHIPPED r17 shapes vs inline copies of their r16 shapes, alternated
  * twice in one session so box noise cancels within the run:
  *  - q_percentile_disc_dist: full bucketedRank vs target-bucket-pruned
  *  - q_cov_exact: decimal(38,0) moment sums vs split-long pairs
  *  - q_skew_join_salted: wide-dim salted join vs keys-only + post-agg
  *    attribute attach. */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/data/sf10")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.expressions.Window

    // --- r16 q_percentile_disc_dist: rank EVERY row (bucketedRank copy) ---
    def oldPercentileDisc(): Unit = {
      val nBuckets = 256
      val data = Tables.orders(spark, sfDir)
        .select(col("o_orderpriority").as("key"),
          round(col("o_totalprice") * 100).cast("long").as("v"),
          col("o_orderkey").as("id"))
      val bounds = broadcast(data.groupBy("key")
        .agg(min("v").as("vmin"), max("v").as("vmax"), count(lit(1)).as("c")))
      val bucketed = data.join(bounds, "key")
        .withColumn("bkt",
          least(lit(nBuckets - 1),
            floor((col("v") - col("vmin")) / (col("vmax") - col("vmin") + lit(1e-9)) * nBuckets))
            .cast("int"))
      val offsets = broadcast(
        bucketed.groupBy(col("key"), col("bkt")).agg(count(lit(1)).as("bn"))
          .withColumn("off", coalesce(
            sum(col("bn")).over(Window.partitionBy(col("key")).orderBy(col("bkt"))
              .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
          .select("key", "bkt", "off"))
      val t50 = expr("(c + 1) div 2")
      val t90 = expr("(9 * c + 9) div 10")
      bucketed.join(offsets, Seq("key", "bkt"))
        .withColumn("r", row_number().over(
          Window.partitionBy(col("key"), col("bkt")).orderBy(col("v"), col("id"))) + col("off"))
        .filter(col("r") === t50 || col("r") === t90)
        .groupBy(col("key"), col("c"))
        .agg(max(when(col("r") === t50, col("v"))).as("p50c"),
          max(when(col("r") === t90, col("v"))).as("p90c"))
        .collect()
    }

    // --- r16 q_cov_exact: decimal(38,0) sums per row ---
    def oldCovExact(): Unit = {
      Tables.lineitem(spark, sfDir)
        .select(col("l_returnflag"),
          round(col("l_quantity")).cast("long").as("x"),
          round(col("l_extendedprice") * 100).cast("long").as("y"))
        .groupBy(col("l_returnflag"))
        .agg(
          count(lit(1)).cast("decimal(38,0)").as("n"),
          sum(col("x").cast("decimal(38,0)")).cast("decimal(38,0)").as("sx"),
          sum(col("y").cast("decimal(38,0)")).cast("decimal(38,0)").as("sy"),
          sum((col("x") * col("y")).cast("decimal(38,0)")).cast("decimal(38,0)").as("sxy"),
          sum((col("x") * col("x")).cast("decimal(38,0)")).cast("decimal(38,0)").as("sxx"),
          sum((col("y") * col("y")).cast("decimal(38,0)")).cast("decimal(38,0)").as("syy"))
        .select(col("l_returnflag"), col("n").cast("long").as("n"),
          expr("(10000 * (n * sxy - sx * sy)) div (n * (n - 1))").as("cov_bp"),
          expr("(10000 * (n * sxx - sx * sx)) div (n * (n - 1))").as("var_x_bp"),
          expr("(10000 * (n * syy - sy * sy)) div (n * (n - 1))").as("var_y_bp"))
        .collect()
    }

    // --- r16 q_skew_join_salted: wide dim attrs ride the salted join ---
    def oldSkewJoin(): Unit = {
      val S = 8
      val fact = Tables.events(spark, sfDir)
        .select(col("user_id"), col("value"), col("event_id"))
        .withColumn("salt", pmod(col("event_id"), lit(S)).cast("int"))
      val dim = Tables.customer(spark, sfDir)
        .select(col("c_custkey").as("user_id"), col("c_name"), col("c_mktsegment"))
        .withColumn("salt", explode(sequence(lit(0), lit(S - 1))))
      fact.join(dim, Seq("user_id", "salt"))
        .groupBy(col("user_id"), col("c_name"), col("c_mktsegment"))
        .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("total_value"))
        .orderBy("user_id").collect()
    }

    // keys-only salted join, attrs attached by SHUFFLE join (no broadcast
    // build of the 1.5M-row dim on the driver)
    def skewShuffleAttach(): Unit = {
      val S = 8
      val fact = Tables.events(spark, sfDir)
        .select(col("user_id"), col("value"), col("event_id"))
        .withColumn("salt", pmod(col("event_id"), lit(S)).cast("int"))
      val dimKeys = Tables.customer(spark, sfDir)
        .select(col("c_custkey").as("user_id"))
        .withColumn("salt", explode(sequence(lit(0), lit(S - 1))))
      val dimAttrs = Tables.customer(spark, sfDir)
        .select(col("c_custkey").as("user_id"), col("c_name"), col("c_mktsegment"))
        .hint("shuffle_hash")
      fact.join(dimKeys, Seq("user_id", "salt"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("total_value"))
        .join(dimAttrs, "user_id")
        .select(col("user_id"), col("c_name"), col("c_mktsegment"),
          col("n_events"), col("total_value"))
        .orderBy("user_id").collect()
    }

    // q_market_share with the revenue product/sum in LONG ten-thousandths
    // (exact: cents × (100 − disc_pct)) instead of boxed decimal(22,4)
    def marketShareLong(): Unit = {
      import org.apache.spark.sql.expressions.Window
      val rev = Tables.lineitem(spark, sfDir)
        .join(Tables.orders(spark, sfDir), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.customer(spark, sfDir).select("c_custkey", "c_nationkey")),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(spark, sfDir)), col("c_nationkey") === col("n_nationkey"))
        .groupBy(year(col("o_orderdate")).as("order_year"), col("n_name"))
        .agg(sum(round(col("l_extendedprice") * 100).cast("long") *
          (lit(100L) - round(col("l_discount") * 100).cast("long"))).as("rev_c"))
        .select(col("order_year"), col("n_name"),
          (expr("(rev_c + 50) div 100").cast("double") / 100.0).as("revenue"),
          col("rev_c").cast("decimal(38,0)").as("rev_cd"))
      val w = Window.partitionBy(col("order_year"))
      rev
        .withColumn("total_c", sum(col("rev_cd")).over(w))
        .withColumn("share_ppm", expr("(1000000 * rev_cd) div total_c"))
        .select(col("order_year"), col("n_name"), col("revenue"), col("share_ppm"))
        .orderBy("order_year", "n_name").collect()
    }

    val variants: Seq[(String, () => Unit)] = Seq(
      "pdisc_old" -> (() => oldPercentileDisc()),
      "pdisc_new" -> (() => { graft.operators.ScalePatterns.qPercentileDiscDist.fn(spark, sfDir).collect(); () }),
      "cov_old" -> (() => oldCovExact()),
      "cov_new" -> (() => { graft.operators.OrderedStats.qCovExact.fn(spark, sfDir).collect(); () }),
      "skew_old" -> (() => oldSkewJoin()),
      "skew_new" -> (() => { graft.operators.ScalePatterns.qSkewJoinSalted.fn(spark, sfDir).collect(); () }),
      "skew_shuf" -> (() => skewShuffleAttach()),
      "mkt_old" -> (() => { graft.operators.AnalyticsExt.qMarketShare.fn(spark, sfDir).collect(); () }),
      "mkt_long" -> (() => marketShareLong())
    )
    for (round <- 1 to 2; (name, f) <- variants) {
      val t0 = System.nanoTime()
      f()
      println(f"[probe] round=$round $name%-10s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
