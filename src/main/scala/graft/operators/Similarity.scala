package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}

/** Similarity search over the `embeddings` table (`Array[Float]`, dim 64).
  *
  * Vector math is expressed with higher-order collection expressions
  * (`zip_with` + `aggregate`): elements are cast to double BEFORE the
  * multiply and summed left-to-right, which is the same evaluation order
  * DuckDB's `list_sum(list_transform(...))` uses — so cosines are
  * bit-identical across engines and safe to rank on.
  *
  * Scale path: the brute-force variant broadcasts the (small) query set and
  * linearly scans the corpus — embarrassingly parallel, no shuffle on the
  * corpus side, exactly how you'd do 100 TB x 1k queries. For corpus x
  * corpus similarity the LSH variant buckets by random-hyperplane signs so
  * candidate generation is an equi-join, never a cross join.
  */
object Similarity {

  val Dim = 64

  /** Left-to-right double dot product of two float vectors. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v
    )

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  private def emb(s: SparkSession, d: String) = Tables.embeddings(s, d)

  /** Exact top-5 cosine neighbors for a fixed query set (vec_id < 8) over
    * the rest of the corpus. Queries are broadcast; the corpus is scanned
    * once. */
  val annBruteforce: QueryDef = QueryDef(
    "ann_bruteforce",
    (s, d) => {
      val q = emb(s, d).filter(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      val c = emb(s, d).filter(col("vec_id") >= 8)
        .select(col("vec_id").as("neighbor_id"), col("embedding").as("cv"))
      val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id"))
      c.crossJoin(broadcast(q))
        .withColumn("cos", round(cosine(col("qv"), col("cv")), 6))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 5)
        .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos"))
        .orderBy("query_id", "rank")
    },
    Some(s"""
      WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 8),
      c AS (SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings WHERE vec_id >= 8),
      scored AS (
        SELECT query_id, neighbor_id,
               round(
                 list_sum(list_transform(generate_series(1, $Dim), i -> qv[i]::DOUBLE * cv[i]::DOUBLE))
                 / (sqrt(list_sum(list_transform(generate_series(1, $Dim), i -> qv[i]::DOUBLE * qv[i]::DOUBLE)))
                  * sqrt(list_sum(list_transform(generate_series(1, $Dim), i -> cv[i]::DOUBLE * cv[i]::DOUBLE)))),
               6) AS cos
        FROM c CROSS JOIN q
      )
      SELECT query_id, rank, neighbor_id, cos
      FROM (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
            FROM scored)
      WHERE rank <= 5
      ORDER BY query_id, rank
    """.stripMargin.trim)
  )

  /** Embedding near-dup pairs: label-blocked top-3 most-cosine-similar
    * pairs per label (labels act as the coarse clustering / IVF cells). */
  val dedupEmbedding: QueryDef = QueryDef(
    "dedup_embedding",
    (s, d) => {
      val a = emb(s, d).select(col("label"), col("vec_id").as("id1"), col("embedding").as("v1"))
      val b = emb(s, d).select(col("label"), col("vec_id").as("id2"), col("embedding").as("v2"))
      val w = Window.partitionBy(col("label")).orderBy(col("cos").desc, col("id1"), col("id2"))
      a.join(b, Seq("label"))
        .filter(col("id1") < col("id2"))
        .withColumn("cos", round(cosine(col("v1"), col("v2")), 6))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("label"), col("rn"), col("id1"), col("id2"), col("cos"))
        .orderBy("label", "rn")
    },
    Some(s"""
      WITH e AS (SELECT label, vec_id, embedding FROM embeddings),
      pairs AS (
        SELECT a.label, a.vec_id AS id1, b.vec_id AS id2,
               round(
                 list_sum(list_transform(generate_series(1, $Dim), i -> a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE))
                 / (sqrt(list_sum(list_transform(generate_series(1, $Dim), i -> a.embedding[i]::DOUBLE * a.embedding[i]::DOUBLE)))
                  * sqrt(list_sum(list_transform(generate_series(1, $Dim), i -> b.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE)))),
               6) AS cos
        FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
      )
      SELECT label, rn, id1, id2, cos
      FROM (SELECT *, row_number() OVER (PARTITION BY label ORDER BY cos DESC, id1, id2) AS rn
            FROM pairs)
      WHERE rn <= 3
      ORDER BY label, rn
    """.stripMargin.trim)
  )

  /** Random-hyperplane LSH: 10 deterministic pseudo-random hyperplanes give
    * a 10-bit bucket signature; neighbor candidates share the bucket, top-3
    * within bucket. Candidate generation is an equi-join on the bucket key —
    * the scale path for corpus x corpus ANN. Approximate by construction, so
    * no SQL oracle; the spec asserts recall against [[annBruteforce]]. */
  val annLsh: QueryDef = QueryDef(
    "ann_lsh",
    (s, d) => {
      val nTables = 8 // L independent hash tables: union of candidates
      val nPlanes = 4 // bits per table -> 16 buckets/table
      // Deterministic hyperplane weights in [-0.5, 0.5): w(t,p,i) from a
      // fixed integer mix; same for every run and every executor.
      def w(t: Int, p: Int, i: Int): Double =
        ((((t * 7919L + p * 131L + i * 31L + 7L) * 2654435761L) % 1000003L + 1000003L) % 1000003L)
          .toDouble / 1000003.0 - 0.5
      def planeDot(t: Int, p: Int): Column =
        (0 until Dim).map(i => element_at(col("embedding"), i + 1).cast("double") * lit(w(t, p, i))).reduce(_ + _)
      def bucket(t: Int): Column =
        (0 until nPlanes)
          .map(p => when(planeDot(t, p) >= 0, lit(1 << p)).otherwise(lit(0)))
          .reduce(_ + _)

      val bucketed = emb(s, d).select(
        col("vec_id"),
        col("embedding"),
        posexplode(array((0 until nTables).map(bucket): _*)).as(Seq("table_id", "bucket"))
      )
      val a = bucketed.select(col("table_id"), col("bucket"), col("vec_id").as("query_id"), col("embedding").as("qv"))
      val b = bucketed.select(col("table_id"), col("bucket"), col("vec_id").as("neighbor_id"), col("embedding").as("cv"))
      val win = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id"))
      a.join(b, Seq("table_id", "bucket"))
        .filter(col("query_id") =!= col("neighbor_id"))
        .select("query_id", "neighbor_id", "qv", "cv")
        .dropDuplicates("query_id", "neighbor_id")
        .withColumn("cos", round(cosine(col("qv"), col("cv")), 6))
        .withColumn("rank", row_number().over(win))
        .filter(col("rank") <= 3)
        .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos"))
        .orderBy("query_id", "rank")
    },
    None // approximate: verified by recall spec against ann_bruteforce
  )

  val all: Seq[QueryDef] = Seq(annBruteforce, dedupEmbedding, annLsh)
}
