package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiling main (not part of the driver contract). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s   rows=$n")
    }
    time("full ngram_jaccard")(operators.Dedup.dedupNgramJaccard.fn(spark, d).count())
    time("full minhash_lsh")(operators.Dedup.dedupMinhashLsh.fn(spark, d).count())
    time("full ngram 2nd run")(operators.Dedup.dedupNgramJaccard.fn(spark, d).count())
    val docs = spark.read.parquet(s"$d/documents.parquet")
    val sh = docs.select(col("doc_id"), col("lang"), col("source"),
      operators.Dedup.shingles(col("text")).as("sh"))

    time("scan only")(docs.count())
    time("explode count only")(sh.select(explode(col("sh")).as("t")).agg(count(lit(1))).count())
    time("explode after repart")(
      sh.repartition(16).select(explode(col("sh")).as("t")).agg(count(lit(1))).count())
    time("explode rand barrier")(
      sh.withColumn("_r", rand()).select(explode(col("sh")).as("t")).agg(count(lit(1))).count())
    time("explode shuffle barrier")(
      sh.repartition(16, col("doc_id")).select(explode(col("sh")).as("t")).agg(count(lit(1))).count())
    val shEager = sh.localCheckpoint(true)
    time("explode after ckpt")(
      shEager.select(explode(col("sh")).as("t")).agg(count(lit(1))).count())
    time("explode+xxhash ckpt")(
      shEager.select(explode(col("sh")).as("t")).select(xxhash64(col("t")).as("h"))
        .agg(count(col("h"))).count())
    time("shingle arrays")(sh.agg(sum(size(col("sh")))).count())
    time("explode+xxhash")(
      sh.select(explode(col("sh")).as("t")).select(xxhash64(col("t")).as("h"))
        .agg(count(col("h"))).count())
    time("explode+md5conv")(
      sh.select(explode(col("sh")).as("t"))
        .select(operators.Dedup.tokenHash(col("t")).as("h")).agg(count(col("h"))).count())

    val tr = sh.select(col("doc_id"), explode(col("sh")).as("tok"))
      .select(col("doc_id"), operators.Dedup.tokenHashFast(col("tok")).as("h"))
    val aggs = (0 until 64).map(i =>
      min((lit(2654435761L * i + 1) * col("h") + lit(7L * i)) % 2147483647L).as(s"m$i"))
    time("sig 64 min-aggs")(tr.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*).count())

    val hsh = sh.select(col("doc_id"), col("lang"), col("source"),
      array_distinct(transform(col("sh"), t => xxhash64(t))).as("hsh"))
    val a = hsh.select(col("lang"), col("source"), col("doc_id").as("id1"), col("hsh").as("h1"))
    val b = hsh.select(col("lang"), col("source"), col("doc_id").as("id2"), col("hsh").as("h2"))
    val pairs = a.join(b, Seq("lang", "source")).filter(col("id1") < col("id2"))
    time("blocked join no jac")(pairs.agg(count(lit(1))).count())
    time("blocked join + jac")(
      pairs.select((size(array_intersect(col("h1"), col("h2"))).cast("double") /
        size(array_union(col("h1"), col("h2")))).as("j")).agg(count(col("j"))).count())
    spark.stop()
  }
}
