package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch probe main — current contents change per investigation.
  * Round 18 continuation: verify the shipped confirm-before-dedup
  * bandedHammingPairs splice against the r17 form (dedup full candidate
  * stream, then two hash-fetch joins) — timing alternated in one
  * session + EXACT pair-set parity (count + order-free decimal
  * checksum) for both the image and audio hash kernels at the probe
  * SF. */
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
    import graft.Tables
    import graft.operators.Multimodal

    val maxDf = 1024

    // the r17 form, inline: dedup the full candidate stream, then fetch
    // hashes back through two joins
    def oldForm(hashFn: String => Option[(Long, Long)], tag: String): DataFrame = {
      import spark.implicits._
      val hashes = graft.Registry.boundedCache(spark, s"mm_banded|$tag|$sfDir",
        Tables.documents(spark, sfDir)
          .select(col("doc_id"), col("text"))
          .as[(Long, String)]
          .flatMap { case (id, text) =>
            hashFn(text).map { case (hi, lo) => (id, hi, lo) }
          }
          .toDF("doc_id", "h_hi", "h_lo"))
      val bands = hashes.select(col("doc_id"), posexplode(array(
        expr("h_lo & 65535"), expr("shiftright(h_lo, 16) & 65535"),
        expr("h_hi & 65535"), expr("shiftright(h_hi, 16) & 65535")))
        .as(Seq("band_idx", "band_val")))
      val windowed = bands.join(
        bands.groupBy(col("band_idx"), col("band_val"))
          .agg(count(lit(1)).as("df"))
          .filter(col("df").between(2, maxDf))
          .select("band_idx", "band_val"),
        Seq("band_idx", "band_val"))
      windowed.as("a").join(windowed.as("b"), Seq("band_idx", "band_val"))
        .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"))
        .filter(col("id1") < col("id2"))
        .dropDuplicates("id1", "id2")
        .join(hashes.select(col("doc_id").as("id1"),
          col("h_hi").as("hi1"), col("h_lo").as("lo1")), "id1")
        .join(hashes.select(col("doc_id").as("id2"),
          col("h_hi").as("hi2"), col("h_lo").as("lo2")), "id2")
        .withColumn("hamming",
          expr("bit_count(hi1 ^ hi2) + bit_count(lo1 ^ lo2)").cast("long"))
        .filter(col("hamming") <= 3)
        .select(col("id1"), col("id2"), col("hamming"))
        .orderBy("id1", "id2")
    }

    def newForm(hashFn: String => Option[(Long, Long)], tag: String): DataFrame =
      Multimodal.bandedHammingPairs(spark, sfDir, hashFn, maxDf, tag)

    def time(tag: String)(f: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      f.write.format("noop").mode("overwrite").save()
      println(f"[probe] $tag%-12s ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    def sig(df: DataFrame): (Long, java.math.BigDecimal) = {
      val r = df.agg(count(lit(1)),
        sum(xxhash64(col("id1"), col("id2"), col("hamming")).cast("decimal(38,0)")))
        .collect()(0)
      (r.getLong(0), r.getDecimal(1))
    }
    // image lane: warm the shared hash cache, then alternate
    newForm(Multimodal.phash64, "phash").agg(count(lit(1))).collect()
    for (_ <- 1 to 2) {
      time("old:image")(oldForm(Multimodal.phash64, "phash"))
      time("new:image")(newForm(Multimodal.phash64, "phash"))
    }
    val ai = sig(oldForm(Multimodal.phash64, "phash"))
    val bi = sig(newForm(Multimodal.phash64, "phash"))
    println(s"[probe] image parity old=$ai new=$bi equal=${ai == bi}")
    // audio lane
    newForm(Multimodal.audioFp64, "aphash").agg(count(lit(1))).collect()
    for (_ <- 1 to 2) {
      time("old:audio")(oldForm(Multimodal.audioFp64, "aphash"))
      time("new:audio")(newForm(Multimodal.audioFp64, "aphash"))
    }
    val aa = sig(oldForm(Multimodal.audioFp64, "aphash"))
    val ba = sig(newForm(Multimodal.audioFp64, "aphash"))
    println(s"[probe] audio parity old=$aa new=$ba equal=${aa == ba}")
    spark.stop()
  }
}
