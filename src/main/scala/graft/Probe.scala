package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe main — current contents change per investigation.
  * Round 17 (cont.): A/B pipeline_pii_scrub's r16 shape (6 java.util
  * .regex passes as Column expressions: 3 regexp_count + 3 chained
  * regexp_replace) vs the shipped r17 PiiScan hand-scanner typed map.
  * Correctness cross-check runs FIRST on sf0.1 (full row compare incl.
  * md5 digests), then 3 alternated timing rounds at the arg dir. */
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

    // --- the r16 regex-chain shape, inlined ---
    def oldPii(dir: String): org.apache.spark.sql.DataFrame = {
      val emailRe = """[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"""
      val ipRe    = """\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"""
      val phoneRe = """\b\d{3}-\d{4}\b"""
      val seeded = concat(
        col("text"),
        lit(" contact user"), col("doc_id").cast("string"), lit("@example.com"),
        lit(" via 10."), pmod(col("doc_id"), lit(256)).cast("string"), lit(".0."),
        pmod(col("doc_id"), lit(100)).cast("string"),
        when(pmod(col("doc_id"), lit(3)) === 0,
          concat(lit(" cc admin"), col("doc_id").cast("string"), lit("@mail.example.org")))
          .otherwise(lit("")),
        lit(" tel 555-"), (pmod(col("doc_id"), lit(9000)) + 1000).cast("string"))
      val clean = regexp_replace(
        regexp_replace(
          regexp_replace(seeded, emailRe, "[EMAIL]"),
          ipRe, "[IP]"),
        phoneRe, "[PHONE]")
      Tables.documents(spark, dir)
        .select(
          col("doc_id"),
          regexp_count(seeded, lit(emailRe)).as("n_emails"),
          regexp_count(seeded, lit(ipRe)).as("n_ips"),
          regexp_count(seeded, lit(phoneRe)).as("n_phones"),
          (length(seeded) - length(clean)).cast("long").as("chars_redacted"),
          md5(clean).as("clean_md5"))
        .orderBy("doc_id")
    }

    // --- correctness first: full-corpus row compare on sf0.1 ---
    val small = "/root/testdata/sf0.1"
    val a = oldPii(small).collect()
    val b = graft.operators.Curation.pipelinePiiScrub.fn(spark, small).collect()
    require(a.length == b.length, s"row count ${a.length} vs ${b.length}")
    a.zip(b).foreach { case (x, y) =>
      require(x == y, s"MISMATCH: regex=$x scanner=$y")
    }
    println(s"[probe] correctness: ${a.length} rows identical on sf0.1")

    val variants: Seq[(String, () => Unit)] = Seq(
      "pii_regex"   -> (() => { oldPii(sfDir).collect(); () }),
      "pii_scanner" -> (() => { graft.operators.Curation.pipelinePiiScrub.fn(spark, sfDir).collect(); () })
    )
    for (round <- 1 to 3; (name, f) <- variants) {
      val t0 = System.nanoTime()
      f()
      println(f"[probe] round=$round $name%-12s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
