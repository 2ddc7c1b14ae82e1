package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off: brute-force jaccard>=0.8 pairs at a given SF vs the MinHash-LSH
  * operator's output — confirms full recall where DuckDB brute force is too
  * slow. `RecallCheck <dir> containment` instead measures the
  * dedup_containment candidate window: brute-force containment pairs
  * within (lang, source) blocks vs the production df∈[2,maxDf] +
  * shared≥2 candidate stage, banded by containment score, plus the
  * end-to-end top-3 delta of the forced over-cap path vs the exact one. */
object RecallCheck {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    if (args.lift(1).contains("containment")) { containmentMode(d); return }
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.io.compression.codec", "zstd")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1000000")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val sh = Tables.documents(spark, d)
      .select(col("doc_id"), operators.Dedup.shingles(col("text")).as("sh"))
      .select(col("doc_id"), array_distinct(transform(col("sh"), t => xxhash64(t))).as("hs"))
      .filter(size(col("hs")) > 0)
      .localCheckpoint(true)
    val a = sh.select(col("doc_id").as("id1"), col("hs").as("h1"))
    val b = sh.select(col("doc_id").as("id2"), col("hs").as("h2"))
    // Optional brute-force blocking for the GenScale sf1 corpus: its copies
    // occupy disjoint doc_id strides (copy = doc_id / stride) AND disjoint
    // token spaces (`tok~i` rewrite), so cross-block jaccard is exactly 0 and
    // within-block brute force loses nothing. The check stays adversarial to
    // that assumption: LSH runs on the FULL corpus, so a cross-block pair it
    // confirmed would surface in `extra`.
    val block = sys.env.get("SPARK_GRAFT_BLOCK").map(_.toLong)
    val allPairs = a.crossJoin(b).filter(col("id1") < col("id2"))
    val blocked = block.fold(allPairs)(s =>
      allPairs.filter(expr(s"id1 div $s = id2 div $s")))
    val brute = blocked
      .withColumn("jac", size(array_intersect(col("h1"), col("h2"))).cast("double") /
        size(array_union(col("h1"), col("h2"))))
      .filter(col("jac") >= 0.8)
      .select("id1", "id2", "jac")
      .localCheckpoint(true)
    val lsh = operators.Dedup.dedupMinhashLsh.fn(spark, d).select("id1", "id2")
    val missedRows = brute.join(lsh, Seq("id1", "id2"), "left_anti")
      .orderBy("id1", "id2").limit(20).collect()
    // a missed pair's exact jaccard tells whether it sits at the τ=0.8
    // band-recall boundary (expected O(1) misses per ~25k boundary pairs:
    // capture = 1-(1-j⁴)¹⁶ ≈ 0.9998 at j=0.8) or signals a real defect
    missedRows.foreach(r => System.err.println(
      s"[recall] MISSED pair (${r.getLong(0)}, ${r.getLong(1)}) jac=${r.getDouble(2)}"))
    val missed = brute.select("id1", "id2").exceptAll(lsh).count()
    val extra = lsh.exceptAll(brute.select("id1", "id2")).count()
    println(s"""{"metric":"recall_check","sf":"$d","true_pairs":${brute.count()},"missed":$missed,"extra":$extra}""")
    spark.stop()
  }

  /** Containment-candidate recall: TRUE pairs = all within-(lang,source)
    * pairs with exact containment ≥ 0.3 (brute force, the codegen'd
    * SortedContainment merge — blocks are the operator's own comparison
    * universe, so nothing is lost by blocking); CANDIDATES = the
    * production [[operators.Dedup.containmentCandidates]] stage. Reports
    * per-band recall and the end-to-end top-3 row delta between the
    * FORCED over-cap path (cap=0: every block through postings) and the
    * exact all-pairs path (cap=MaxValue). */
  private def containmentMode(d: String): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.io.compression.codec", "zstd")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs = operators.Dedup.docHashedShingles(spark, d)
      .select(col("doc_id"), col("lang"), col("source"), col("hsh"))
      .filter(size(col("hsh")) > 0)
      .localCheckpoint(true)
    val a = docs.select(col("lang"), col("source"), col("doc_id").as("id1"), col("hsh").as("h1"))
    val b = docs.select(col("lang"), col("source"), col("doc_id").as("id2"), col("hsh").as("h2"))
    val truePairs = a.join(b, Seq("lang", "source"))
      .filter(col("id1") < col("id2"))
      .withColumn("cont",
        graft.plans.VectorExpressions.sortedContainment(col("h1"), col("h2")))
      .filter(col("cont") >= 0.3)
      .select("lang", "source", "id1", "id2", "cont")
      .localCheckpoint(true)
    val cands = operators.Dedup.containmentCandidates(docs, maxDf = 16, minShared = 2)
      .select("id1", "id2")
    val banded = truePairs
      .withColumn("band", when(col("cont") >= 0.8, ">=0.8")
        .when(col("cont") >= 0.5, "0.5-0.8").otherwise("0.3-0.5"))
    val captured = banded.join(cands, Seq("id1", "id2"), "left_semi")
      .groupBy("band").agg(count(lit(1)).as("n_captured"))
    val report = banded.groupBy("band").agg(count(lit(1)).as("n_true"))
      .join(captured, Seq("band"), "left")
      .withColumn("n_captured", coalesce(col("n_captured"), lit(0L)))
      .orderBy("band").collect()
    report.foreach { r =>
      val t = r.getAs[Long]("n_true"); val c = r.getAs[Long]("n_captured")
      System.err.println(f"[containment] band=${r.getString(0)}%-8s true=$t%6d " +
        f"captured=$c%6d recall=${if (t == 0) 1.0 else c.toDouble / t}%.4f")
    }
    // sample what the window misses in the top band, for adjudication
    banded.filter(col("band") === ">=0.8")
      .join(cands, Seq("id1", "id2"), "left_anti")
      .orderBy(col("cont").desc).limit(10).collect()
      .foreach(r => System.err.println(
        s"[containment] MISSED high-band pair (${r.getAs[Long]("id1")}, " +
          s"${r.getAs[Long]("id2")}) cont=${r.getAs[Double]("cont")}"))
    // end-to-end: forced over-cap top-3 vs exact top-3, row-for-row
    val forced = operators.Dedup.containmentTop3(spark, d, cap = 0)
      .collect().map(_.toString).toSeq
    val exact = operators.Dedup.containmentTop3(spark, d, cap = Int.MaxValue)
      .collect().map(_.toString).toSeq
    val diff = forced.diff(exact) ++ exact.diff(forced)
    diff.take(10).foreach(r => System.err.println(s"[containment] TOP3 DELTA: $r"))
    val bands = report.map(r =>
      s""""${r.getString(0)}":[${r.getAs[Long]("n_true")},${r.getAs[Long]("n_captured")}]""")
      .mkString("{", ",", "}")
    println(s"""{"metric":"containment_recall","sf":"$d","bands":$bands,""" +
      s""""top3_rows":${exact.size},"top3_delta":${diff.size}}""")
    spark.stop()
  }
}
