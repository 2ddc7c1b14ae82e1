package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe main — current contents change per investigation.
  * Round 18 (r17 verdict #4, part 3): is ann_lsh's 30 s serving map
  * candidate-volume-bound? Compute Σ_b c_b² per table (total visits
  * when every corpus vector queries) from the real sig kernel at the
  * real nPlanes (corpusN=200k → 13), and the hottest buckets. */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/data/sf10")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.io.compression.codec", "zstd")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val corpusN = emb.count()
    val nTables = 16
    val b8 = math.max(6, math.min(8,
      math.ceil(math.log(corpusN / 8.0) / math.log(2)).toInt))
    val bScale = math.min(18,
      math.ceil(math.log(corpusN / 32.0) / math.log(2)).toInt)
    val nPlanes = math.max(b8, bScale)
    println(s"[probe] corpusN=$corpusN nPlanes=$nPlanes buckets/table=${1 << nPlanes}")
    def w(t: Int, p: Int, i: Int): Double =
      ((((t * 7919L + p * 131L + i * 31L + 7L) * 2654435761L) % 1000003L + 1000003L) % 1000003L)
        .toDouble / 1000003.0 - 0.5
    val planes: Array[Array[Double]] =
      (for { t <- 0 until nTables; p <- 0 until nPlanes } yield
        Array.tabulate(64)(i => w(t, p, i))).toArray
    val nWords = (nTables * nPlanes + 63) / 64
    val laneMask = (1L << nPlanes) - 1

    import spark.implicits._
    val sigs = emb.select(
      graft.plans.VectorExpressions.hyperplaneSig(col("embedding"), planes).as("sig"))
      .as[Seq[Long]].collect()
    var total = 0L
    val perTable = new Array[Long](nTables)
    var hottest = 0L
    for (t <- 0 until nTables) {
      val counts = new java.util.HashMap[Integer, Long]()
      sigs.foreach { words =>
        val start = t * nPlanes
        val i0 = start >>> 6
        val sh = start & 63
        val low = words(i0) >>> sh
        val v = if (sh + nPlanes > 64 && i0 + 1 < nWords)
          low | (words(i0 + 1) << (64 - sh))
        else low
        val b = (v & laneMask).toInt
        counts.merge(b, 1L, (a, x) => a + x)
      }
      var s2 = 0L
      counts.forEach { (_, c) => s2 += c * c; if (c > hottest) hottest = c }
      perTable(t) = s2
      total += s2
    }
    println(s"[probe] total_visits=$total avg_per_query=${total / corpusN} " +
      s"hottest_bucket=$hottest uniform_visits=${nTables.toLong * corpusN * corpusN / (1L << nPlanes)}")
    println(s"[probe] per_table_s2=${perTable.mkString(",")}")
    spark.stop()
  }
}
