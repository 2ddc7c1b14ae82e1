package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe main — current contents change per investigation.
  * Round 16: q_props_extract extraction-kernel cost —
  * get_json_object vs from_json(1-field schema) vs variant parse_json,
  * alternated twice each over the same sf events scan. */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/data/sf10")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val ev = Tables.events(spark, sfDir)

    def agg(k: org.apache.spark.sql.Column): Long =
      ev.select(col("event_type"), k.cast("long").as("k"))
        .groupBy(col("event_type"))
        .agg(count(col("k")).as("n"), sum(col("k")).as("s"))
        .agg(sum(col("s"))).head().getLong(0)

    val variants: Seq[(String, () => Long)] = Seq(
      "get_json_object" -> (() => agg(get_json_object(col("props"), "$.k"))),
      "from_json" -> (() => agg(
        from_json(col("props"), org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("k",
            org.apache.spark.sql.types.LongType)))).getField("k"))),
      "variant_get" -> (() => agg(
        expr("variant_get(parse_json(props), '$.k', 'long')")))
    )
    for (round <- 1 to 2; (name, f) <- variants) {
      val t0 = System.nanoTime()
      val v = f()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[probe] round $round $name%-16s $secs%7.2f s (sum=$v)")
    }
    spark.stop()
  }
}
