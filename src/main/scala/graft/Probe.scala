package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scratch profiling main (not part of the driver contract). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val d = args.headOption.getOrElse("/root/testdata/sf0.001")
    def time0(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s   rows=$n")
    }
    if (args.contains("clusters")) {
      time0("confirmedPairs")(operators.Dedup.confirmedPairs(spark, d).count())
      time0("dedup_clusters total")(operators.Dedup.dedupClusters.fn(spark, d).count())
      time0("dedup_clusters again")(operators.Dedup.dedupClusters.fn(spark, d).count())
    } else if (args.contains("fast")) {
      for (i <- 1 to 3) time0(s"ann_lsh run $i")(operators.Similarity.annLsh.fn(spark, d).count())
      for (i <- 1 to 2) time0(s"ann_lsh DIST run $i")(
        operators.Similarity.lshTopK(spark, d, distributed = true).count())
      locally {
        val a = operators.Similarity.lshTopK(spark, d, distributed = false)
        val b = operators.Similarity.lshTopK(spark, d, distributed = true)
        println("serving vs distributed diff rows: " +
          (a.exceptAll(b).count() + b.exceptAll(a).count()))
      }
      for (i <- 1 to 3) time0(s"ann_ivf run $i")(operators.Similarity.annIvf.fn(spark, d).count())
      // staged variants of the current annLsh pipeline
      locally {
        import operators.Similarity.{dot, Dim}
        val e = Tables.embeddings(spark, d)
        val nTables = 16
        val q8Rows = e.select(col("vec_id"), plans.VectorExpressions.quantize(col("embedding")).as("q8"))
          .as[(Long, Array[Byte])].collect()
        val corpusN = q8Rows.length.toLong
        val q8B = spark.sparkContext.broadcast(q8Rows.toMap)
        val nPlanes = math.max(6, math.min(8, math.ceil(math.log(corpusN / 8.0) / math.log(2)).toInt))
        def wgt(t: Int, p: Int, i: Int): Double =
          ((((t * 7919L + p * 131L + i * 31L + 7L) * 2654435761L) % 1000003L + 1000003L) % 1000003L)
            .toDouble / 1000003.0 - 0.5
        val zeroPlane = Array.fill(Dim)(0.0)
        val planes: Array[Array[Double]] =
          (for { t <- 0 until nTables; p <- 0 until 8 } yield
            if (p < nPlanes) Array.tabulate(Dim)(i => wgt(t, p, i)) else zeroPlane).toArray
        val sigs = e.select(col("vec_id"),
            plans.VectorExpressions.hyperplaneSig(col("embedding"), planes).as("sig"))
          .select(col("vec_id"), element_at(col("sig"), 1).as("w0"), element_at(col("sig"), 2).as("w1"))
          .repartition(col("vec_id"))
          .as[(Long, Long, Long)]
        def bucketOf(w0: Long, w1: Long, t: Int): Int =
          (((if (t < 8) w0 >>> (8 * t) else w1 >>> (8 * (t - 8)))) & 0xFF).toInt
        val postings = sigs.flatMap { case (id, w0, w1) =>
          (0 until nTables).map(t => (t, bucketOf(w0, w1, t), id))
        }.toDF("table_id", "bucket", "neighbor_id")
          .groupBy("table_id", "bucket")
          .agg(collect_list(col("neighbor_id")).as("ids"))
        val probeMasks: Seq[Int] = 0 +: (0 until nPlanes).map(1 << _)
        val probes = sigs.flatMap { case (id, w0, w1) =>
          for { t <- 0 until nTables; m <- probeMasks } yield
            (t, bucketOf(w0, w1, t) ^ m, id)
        }.toDF("table_id", "bucket", "query_id")
        time0("v0 sigs")(sigs.agg(count(lit(1))).as[Long].head())
        time0("v1 probes")(probes.agg(count(lit(1))).as[Long].head())
        time0("v1b postings")(postings.agg(count(lit(1))).as[Long].head())
        val joined = probes.join(postings, Seq("table_id", "bucket"))
        time0("v2 join")(joined.agg(count(lit(1))).as[Long].head())
        val partial = joined.select("query_id", "ids").as[(Long, Seq[Long])]
          .mapPartitions { it =>
            val q8m = q8B.value
            val perQuery = scala.collection.mutable.LongMap
              .empty[(scala.collection.mutable.HashSet[Long], scala.collection.mutable.ArrayBuffer[(Int, Long)])]
            it.foreach { case (q, ids) =>
              val (seen, buf) = perQuery.getOrElseUpdate(q,
                (scala.collection.mutable.HashSet.empty[Long], scala.collection.mutable.ArrayBuffer.empty[(Int, Long)]))
              val qa = q8m(q)
              ids.foreach { n =>
                if (n != q && seen.add(n)) {
                  val na = q8m(n)
                  var acc = 0; var i = 0
                  val len = math.min(qa.length, na.length)
                  while (i < len) { acc += qa(i) * na(i); i += 1 }
                  buf += ((acc, n))
                }
              }
            }
            perQuery.iterator.flatMap { case (q, (_, buf)) =>
              buf.sortBy { case (adot, n) => (-adot, n) }.take(16)
                .map { case (adot, n) => (q, n, adot) }
            }
          }.toDF("query_id", "neighbor_id", "adot")
        time0("v3 combiner")(partial.agg(count(lit(1))).as[Long].head())
        val wh = Window.partitionBy(col("query_id")).orderBy(col("adot").desc, col("neighbor_id"))
        val shortlist = partial.withColumn("hrn", dense_rank().over(wh))
          .filter(col("hrn") <= 16).dropDuplicates("query_id", "neighbor_id")
          .select("query_id", "neighbor_id")
        time0("v4 shortlist")(shortlist.agg(count(lit(1))).as[Long].head())
        val vecs = e.select(col("vec_id"), col("embedding"),
          sqrt(dot(col("embedding"), col("embedding"))).as("nrm"))
        val win2 = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id"))
        val fin = shortlist
          .join(vecs.select(col("vec_id").as("query_id"), col("embedding").as("qv"), col("nrm").as("qn")), "query_id")
          .join(vecs.select(col("vec_id").as("neighbor_id"), col("embedding").as("cv"), col("nrm").as("cn")), "neighbor_id")
          .withColumn("cos", round(dot(col("qv"), col("cv")) / (col("qn") * col("cn")), 6))
          .withColumn("rank", row_number().over(win2))
          .filter(col("rank") <= 3)
          .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos"))
          .orderBy("query_id", "rank")
        time0("v5 full tail")(fin.count())
        time0("v5 full tail 2nd")(fin.count())
      }
      spark.stop(); return
    }

    // --- ann_lsh stage-by-stage recall diagnosis ---
    val e = Tables.embeddings(spark, d)
    val a = e.select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val b = e.select(col("vec_id").as("neighbor_id"), col("embedding").as("cv"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id"))
    val exact = a.crossJoin(b).filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", operators.Similarity.cosine(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select("query_id", "neighbor_id", "cos")
      .localCheckpoint(true)
    println("exact top3 pairs: " + exact.count())
    exact.orderBy("query_id", "neighbor_id").show(12)
    // distribution of true-neighbor cosines
    exact.agg(min("cos"), avg("cos"), max("cos")).show()

    // label correlation of true neighbors
    val lab = e.select(col("vec_id"), col("label"))
    val sameLab = exact
      .join(lab.select(col("vec_id").as("query_id"), col("label").as("l1")), "query_id")
      .join(lab.select(col("vec_id").as("neighbor_id"), col("label").as("l2")), "neighbor_id")
    println("true pairs same-label: " + sameLab.filter(col("l1") === col("l2")).count() +
      " / " + sameLab.count())

    // replicate annLsh internals to measure capture vs selection
    {
      import operators.Similarity.{dot, Dim}
      val nTables = 16
      val corpusN = e.count()
      val nPlanes = math.max(6, math.min(8,
        math.ceil(math.log(corpusN / 8.0) / math.log(2)).toInt))
      println(s"nPlanes=$nPlanes N=$corpusN")
      def wgt(t: Int, p: Int, i: Int): Double =
        ((((t * 7919L + p * 131L + i * 31L + 7L) * 2654435761L) % 1000003L + 1000003L) % 1000003L)
          .toDouble / 1000003.0 - 0.5
      val zeroPlane = Array.fill(Dim)(0.0)
      val planes: Array[Array[Double]] =
        (for { t <- 0 until nTables; p <- 0 until 8 } yield
          if (p < nPlanes) Array.tabulate(Dim)(i => wgt(t, p, i)) else zeroPlane).toArray
      val sigs = e.select(col("vec_id"),
          plans.VectorExpressions.hyperplaneSig(col("embedding"), planes).as("sig"))
        .select(col("vec_id"),
          element_at(col("sig"), 1).as("w0"), element_at(col("sig"), 2).as("w1"))
        .as[(Long, Long, Long)]
      def bucketOf(w0: Long, w1: Long, t: Int): Int =
        (((if (t < 8) w0 >>> (8 * t) else w1 >>> (8 * (t - 8)))) & 0xFF).toInt
      val index = sigs.flatMap { case (id, w0, w1) =>
        (0 until nTables).map(t => (t, bucketOf(w0, w1, t), id))
      }.toDF("table_id", "bucket", "neighbor_id")
      val probeMasks: Seq[Int] = 0 +: (0 until nPlanes).map(1 << _)
      val probes = sigs.flatMap { case (id, w0, w1) =>
        for { t <- 0 until nTables; m <- probeMasks } yield
          (t, bucketOf(w0, w1, t) ^ m, id)
      }.toDF("table_id", "bucket", "query_id")
      val q8 = e.select(col("vec_id"), plans.VectorExpressions.quantize(col("embedding")).as("q8"))
      val cand = probes.join(index, Seq("table_id", "bucket"))
        .filter(col("query_id") =!= col("neighbor_id"))
        .dropDuplicates("query_id", "neighbor_id")
        .join(q8.select(col("vec_id").as("query_id"), col("q8").as("qq8")), "query_id")
        .join(q8.select(col("vec_id").as("neighbor_id"), col("q8").as("nq8")), "neighbor_id")
        .select(col("query_id"), col("neighbor_id"),
          plans.VectorExpressions.int8Dot(col("qq8"), col("nq8")).as("adot"))
        .localCheckpoint(true)
      println("candidates total: " + cand.count() + "  per query: " + cand.count() / corpusN)
      val exactKeys = exact.select("query_id", "neighbor_id")
      println("capture (true pairs in candidates): " +
        cand.select("query_id", "neighbor_id").intersect(exactKeys).count().toDouble / exactKeys.count())
      for (m <- Seq(8, 16, 32, 64)) {
        val wh = Window.partitionBy(col("query_id")).orderBy(col("adot").desc, col("neighbor_id"))
        val short = cand.withColumn("hrn", row_number().over(wh)).filter(col("hrn") <= m)
          .select("query_id", "neighbor_id")
        println(s"topM=$m shortlist recall: " +
          short.intersect(exactKeys).count().toDouble / exactKeys.count())
      }
      // stage timings for the real operator pipeline
      def time(name: String)(f: => Long): Unit = {
        val t0 = System.nanoTime(); val n = f
        println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s   rows=$n")
      }
      time("sigs only")(sigs.agg(count(lit(1))).as[Long].head())
      time("index flatmap")(index.agg(count(lit(1))).as[Long].head())
      time("probes flatmap")(probes.agg(count(lit(1))).as[Long].head())
      time("join only")(probes.join(index, Seq("table_id", "bucket"))
        .filter(col("query_id") =!= col("neighbor_id")).agg(count(lit(1))).as[Long].head())
      time("join+dedup")(probes.join(index, Seq("table_id", "bucket"))
        .filter(col("query_id") =!= col("neighbor_id"))
        .dropDuplicates("query_id", "neighbor_id").agg(count(lit(1))).as[Long].head())
      val rawJoin = probes.join(index, Seq("table_id", "bucket"))
        .filter(col("query_id") =!= col("neighbor_id"))
      val withDot = rawJoin
        .join(q8.select(col("vec_id").as("query_id"), col("q8").as("qq8")), "query_id")
        .join(q8.select(col("vec_id").as("neighbor_id"), col("q8").as("nq8")), "neighbor_id")
        .select(col("query_id"), col("neighbor_id"),
          plans.VectorExpressions.int8Dot(col("qq8"), col("nq8")).as("adot"))
      time("join+q8+adot")(withDot.agg(count(lit(1))).as[Long].head())
      locally {
        val wh = Window.partitionBy(col("query_id")).orderBy(col("adot").desc, col("neighbor_id"))
        time("join+adot+densewin")(withDot.withColumn("hrn", dense_rank().over(wh))
          .filter(col("hrn") <= 16).dropDuplicates("query_id", "neighbor_id")
          .agg(count(lit(1))).as[Long].head())
      }
      time("full ann_lsh")(operators.Similarity.annLsh.fn(spark, d).count())
      time("full ann_lsh 2nd")(operators.Similarity.annLsh.fn(spark, d).count())
      time("full ann_ivf")(operators.Similarity.annIvf.fn(spark, d).count())
      time("full ann_ivf 2nd")(operators.Similarity.annIvf.fn(spark, d).count())
    }
    spark.stop()
  }
}
