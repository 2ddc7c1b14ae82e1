package graft.operators

import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}

/** Training-data pipeline operators: deterministic corpus splitting,
  * per-label embedding centroids, and HLL approximate distincts — the
  * steps between "deduped corpus" and "training shards" at 100 TB.
  */
object TrainingOps {

  /** Deterministic train/eval split over the deduped, quality-filtered
    * corpus: exact dedup keeps the min doc_id per content hash, then each
    * survivor routes to a split by a doc_id-derived hash — stable under
    * reruns, retries, and repartitioning (nothing depends on row order or
    * RNG), which is what makes 100 TB shard builds reproducible. The split
    * hash is md5-based so the oracle computes the identical value. */
  val pipelineTrainSplit: QueryDef = QueryDef(
    "pipeline_train_split",
    (s, d) => {
      val keep = Tables.documents(s, d)
        .groupBy(md5(col("text")).as("content_hash"))
        .agg(min(col("doc_id")).as("doc_id"))
      Tables.documents(s, d)
        .join(keep.select(col("doc_id")), Seq("doc_id"), "left_semi")
        .filter(col("n_chars") >= 50)
        .withColumn("bucket",
          pmod(conv(substring(md5(col("doc_id").cast("string")), 1, 15), 16, 10).cast("long"), lit(100)))
        .withColumn("split", when(col("bucket") < 90, "train").otherwise("eval"))
        .groupBy(col("lang"), col("split"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
        .orderBy("lang", "split")
    },
    Some("""
      WITH keep AS (
        SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)
      ), survivors AS (
        SELECT d.* FROM documents d JOIN keep USING (doc_id) WHERE n_chars >= 50
      ), routed AS (
        SELECT lang, n_chars,
               CASE WHEN ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT % 100 < 90
                    THEN 'train' ELSE 'eval' END AS split
        FROM survivors
      )
      SELECT lang, split, count(*) AS n_docs, sum(n_chars)::BIGINT AS sum_chars
      FROM routed
      GROUP BY lang, split
      ORDER BY lang, split
    """.stripMargin.trim)
  )

  /** Per-label embedding centroids, one output row per (label, dim).
    * posexplode is safe here (the generator child is a plain column, not a
    * re-evaluated expression — the Generate pitfall) and partial
    * aggregation reduces the exploded stream map-side, so the shuffle is
    * labels × dims rows regardless of corpus size. The centroid table is
    * the IVF/clustering input and the class-prototype feature. */
  val embLabelCentroids: QueryDef = QueryDef(
    "emb_label_centroids",
    (s, d) =>
      Tables.embeddings(s, d)
        .select(col("label"), posexplode(col("embedding")).as(Seq("dim", "v")))
        .groupBy(col("label"), col("dim"))
        .agg(count(lit(1)).as("n_vecs"), round(avg(col("v")), 5).as("centroid"))
        .orderBy("label", "dim"),
    Some("""
      SELECT label, r.i - 1 AS dim, count(*) AS n_vecs,
             round(avg(embedding[r.i]), 5) AS centroid
      FROM embeddings CROSS JOIN range(1, 65) AS r(i)
      WHERE r.i <= len(embedding)
      GROUP BY label, dim
      ORDER BY label, dim
    """.stripMargin.trim)
  )

  /** HLL approximate distinct counting (Spark's approx_count_distinct)
    * next to the exact count — the other classic distinct sketch beside
    * the KMV aggregator. Rows-only: HLL register layouts are
    * engine-specific, so there is no cross-engine oracle; the spec bounds
    * relative error instead (HLL++ at default rsd=5%). The estimate itself
    * is deterministic — hash-based, merge is a commutative register max —
    * so results are stable across runs and partitionings. */
  val qApproxDistinct: QueryDef = QueryDef(
    "q_approx_distinct",
    (s, d) =>
      Tables.events(s, d)
        .groupBy(col("event_type"))
        .agg(
          countDistinct(col("user_id")).as("n_exact"),
          approx_count_distinct(col("user_id")).as("n_approx"))
        .orderBy("event_type"),
    None
  )

  /** KLL/GK-style approximate quantiles (Spark's approx_percentile
    * sketch) beside the exact per-group percentile — the scale path when
    * the exact two-phase ranking (`q_percentile_dist`) is still too much
    * and a rank-error bound suffices. accuracy=10000 bounds rank error at
    * n/10000; the spec asserts the VALUE error via the exact empirical
    * CDF. Rows-only: sketch layouts are engine-specific, no cross-engine
    * oracle (the exact twin queries are the oracle-checked ones). */
  val qApproxQuantile: QueryDef = QueryDef(
    "q_approx_quantile",
    (s, d) =>
      Tables.events(s, d)
        .groupBy(col("event_type"))
        .agg(
          percentile_approx(col("value"), lit(0.5), lit(10000)).as("p50_approx"),
          expr("percentile(value, 0.5)").as("p50_exact"),
          percentile_approx(col("value"), lit(0.9), lit(10000)).as("p90_approx"),
          expr("percentile(value, 0.9)").as("p90_exact"))
        .orderBy("event_type"),
    None
  )

  /** Distributed PCA, the scan-once form: the corpus contributes ONE
    * exchange-free pass through the mergeable
    * [[graft.functions.Sketches.MomentMatrix]] aggregator (map-side
    * partials, upper-triangle Σxxᵀ); the driver then builds the tiny
    * dim×dim covariance and power-iterates the top two principal
    * components (deflation for the second) — at 100 TB the eigen work is
    * O(dim²) on a 64×64 matrix no matter the corpus size, which is the
    * whole point. Reports eigenvalue, variance-explained per-mille, and
    * the dominant loading dimension per component.
    *
    * Float-sum covariance entries carry partitioning-order low bits →
    * rows-only (no SQL oracle); the spec asserts the eigen residual
    * ‖Cv − λv‖ ≤ 1e-8·λ, orthogonality of the two components, and
    * λ1 ≥ λ2 > 0. */
  val embTopComponent: QueryDef = QueryDef(
    "emb_top_component",
    (s, d) => {
      import s.implicits._
      val dim = 64
      val flat = Tables.embeddings(s, d)
        .select(graft.functions.Sketches.momentMatrix(dim)(col("embedding")).as("m"))
        .head.getSeq[Double](0).toArray
      val n = flat(0)
      val mean = Array.tabulate(dim)(i => flat(1 + i) / n)
      val cov = Array.ofDim[Double](dim, dim)
      var t = 1 + dim
      var i = 0
      while (i < dim) {
        var j = i
        while (j < dim) {
          val c = flat(t) / n - mean(i) * mean(j)
          cov(i)(j) = c; cov(j)(i) = c
          j += 1; t += 1
        }
        i += 1
      }
      def matVec(m: Array[Array[Double]], v: Array[Double]): Array[Double] =
        Array.tabulate(dim)(r => {
          var acc = 0.0; var c = 0
          while (c < dim) { acc += m(r)(c) * v(c); c += 1 }
          acc
        })
      def norm(v: Array[Double]): Double = math.sqrt(v.map(x => x * x).sum)
      def powerIterate(m: Array[Array[Double]]): (Double, Array[Double]) = {
        // deterministic all-ones start (never orthogonal to the dominant
        // direction of a covariance with positive diagonal mass)
        var v = Array.fill(dim)(1.0 / math.sqrt(dim.toDouble))
        var lambda = 0.0
        var it = 0
        while (it < 200) {
          val w = matVec(m, v)
          val nw = norm(w)
          v = w.map(_ / nw)
          lambda = nw
          it += 1
        }
        // sign convention: dominant loading positive (eigenvectors are
        // sign-ambiguous; fix it for determinism)
        val dom = v.indices.maxBy(k => math.abs(v(k)))
        (lambda, if (v(dom) < 0) v.map(-_) else v)
      }
      val (l1, v1) = powerIterate(cov)
      // deflate: C2 = C − λ1·v1v1ᵀ
      val cov2 = Array.tabulate(dim, dim)((r, c) => cov(r)(c) - l1 * v1(r) * v1(c))
      val (l2, v2) = powerIterate(cov2)
      val trace = (0 until dim).map(k => cov(k)(k)).sum
      val rows = Seq((1, l1, v1), (2, l2, v2)).map { case (comp, l, v) =>
        val dom = v.indices.maxBy(k => math.abs(v(k)))
        (comp, BigDecimal(l).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
          (1000.0 * l / trace).toLong, dom,
          BigDecimal(v(dom)).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
      rows.toDF("component", "eigenvalue", "evr_pm", "top_dim", "top_loading")
        .orderBy("component")
    },
    None // rows-only: float-sum moments carry partitioning-order low bits
  )

  /** LINEAR QUALITY-CLASSIFIER train + score — the model-based filtering
    * lane every large pretraining pipeline runs (GPT-3 appendix A /
    * CCNet / LLaMA: train a linear classifier on hashed bag-of-words to
    * recognize a reference class, score the whole crawl, keep docs that
    * clear the threshold). The machinery is the operator: distributed
    * feature hashing (`HashingTF`, 4096 buckets — collision-tolerant,
    * vocabulary-free, the fastText trick), logistic regression via
    * Spark ML's L-BFGS (each iteration one treeAggregate gradient pass —
    * at 100 TB this is N sequential corpus scans, the known cost of the
    * lane), then ONE scoring pass over the full corpus with the model as
    * a broadcast constant. The reference class is the corpus's own
    * learnable signal: the [[TextAnalysis.textQuality]] heuristic at its
    * 0.5 admit cut (lang/source are statistically identical word salad
    * by construction, so a lexical model can't see them; distilling a
    * hand-written heuristic into a trainable scorer is itself the
    * standard bootstrap for these filters) — in production the positive
    * set becomes "reference corpus" and ONLY the label column changes.
    * Train membership is the md5 doc_id-derived 70% (the
    * [[pipelineTrainSplit]] hash — stable under reruns and
    * repartitioning); the report aggregates per lang: docs, train rows,
    * positives, mean P(positive) in per-mille, flagged count, holdout
    * accuracy. Rows-only by design (an iteratively-fit float model has
    * no SQL oracle); the spec bounds holdout accuracy, asserts coverage
    * and retrain determinism. */
  val pipelineQualityClassifier: QueryDef = QueryDef(
    "pipeline_quality_classifier",
    (s, d) => {
      import org.apache.spark.ml.classification.LogisticRegression
      import org.apache.spark.ml.feature.HashingTF
      import org.apache.spark.ml.functions.vector_to_array
      val label = TextAnalysis.textQuality.fn(s, d)
        .select(col("doc_id"),
          (col("quality_score") >= 0.5).cast("double").as("label"))
      val docs = Tables.documents(s, d).select(
        col("doc_id"), col("lang"),
        split(lower(col("text")), " ").as("toks"),
        (pmod(conv(substring(md5(col("doc_id").cast("string")), 1, 15), 16, 10)
          .cast("long"), lit(100)) < 70).as("is_train"))
        .join(label, "doc_id")
      val feat = new HashingTF()
        .setInputCol("toks").setOutputCol("features").setNumFeatures(1 << 12)
        .transform(docs)
      val model = new LogisticRegression()
        .setMaxIter(20).setRegParam(0.01)
        .setFeaturesCol("features").setLabelCol("label")
        .fit(feat.filter(col("is_train")))
      model.transform(feat)
        .select(col("lang"), col("label"), col("is_train"),
          element_at(vector_to_array(col("probability")), 2).as("p"))
        .groupBy(col("lang"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("is_train").cast("long")).as("n_train"),
          sum(col("label")).cast("long").as("n_pos"),
          round(avg(col("p")) * 1000).cast("long").as("mean_p_pm"),
          sum((col("p") >= 0.5).cast("long")).as("n_flagged"),
          round(avg(when(!col("is_train"),
            ((col("p") >= 0.5) === (col("label") === 1.0)).cast("double"))) * 1000)
            .cast("long").as("holdout_acc_pm"))
        .orderBy("lang")
    },
    None // iteratively-fit float model: rows-only; spec bounds holdout
    //      accuracy and asserts coverage + retrain determinism
  )

  val all: Seq[QueryDef] = Seq(pipelineTrainSplit, embLabelCentroids, qApproxDistinct,
    qApproxQuantile, embTopComponent, pipelineQualityClassifier)
}
