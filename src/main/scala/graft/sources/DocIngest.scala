package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Raw-crawl ingestion front door: JSONL dumps → the `documents` schema,
  * with a DEAD-LETTER lane instead of silent drops — the file-based
  * mirror of the streaming `rejectedEvents` contract (a 100 TB crawl
  * always contains malformed lines; losing them silently corrupts
  * corpus accounting, and failing the whole job on one bad line is
  * worse).
  *
  * Mechanics (all spec-asserted):
  *  - PERMISSIVE JSON parse with `columnNameOfCorruptRecord`: malformed
  *    lines land whole in the corrupt column, well-formed lines project
  *    into typed columns — one pass, no pre-validation scan;
  *  - a row is REJECTED if it is malformed JSON, misses a required field
  *    (`doc_id`, `text`), or duplicates an earlier `doc_id` in the batch
  *    (first file-order occurrence wins — deterministic, mirrors the
  *    dedup first-wins rule);
  *  - accepted rows are normalized: `lang` lower-cased and defaulted to
  *    'und' (BCP-47 undetermined) when absent, `source` defaulted to the
  *    ingest label, `n_chars` recomputed from the text (never trusted
  *    from the payload);
  *  - `ingest` returns (accepted, rejected-with-reason) so callers wire
  *    each lane to its own sink; both derive from ONE parsed frame.
  *
  * Scale: the parse is a narrow map over file splits; the only exchange
  * is the doc_id first-wins window — the same single-key shuffle
  * dedup_exact pays. Reject reasons are a tiny enum, cheap to aggregate
  * for ingest dashboards.
  */
object DocIngest {

  /** Payload schema of one crawl line; `_corrupt` catches malformed rows. */
  val lineSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("_corrupt", StringType)
  ))

  /** Parse a JSONL directory/file into (accepted, rejected) lanes.
    * `label`: default `source` for rows that don't carry one.
    *
    * Duplicate-`doc_id` contract: "first wins" means first in SPARK'S READ
    * ORDER — `monotonically_increasing_id()` encodes (partition index,
    * in-partition offset), and partitions follow Spark's path-sorted file
    * listing and split order. Within one file that is line order; ACROSS
    * files it is the lexicographic path order of the listing, not ingestion
    * or arrival order. Deterministic for a fixed file set. If cross-file
    * arrival order ever matters, derive an explicit order key (e.g.
    * `input_file_name()` + per-file offset) and order the window by that. */
  def ingest(s: SparkSession, path: String, label: String = "crawl")
      : (DataFrame, DataFrame) = {
    import org.apache.spark.sql.expressions.Window
    val parsed = s.read
      .schema(lineSchema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .json(path)
    // first-wins on doc_id among structurally-valid rows; invalid rows
    // get a NULL window key so they cannot occupy a rank
    val valid = col("_corrupt").isNull && col("doc_id").isNotNull &&
      col("text").isNotNull
    val w = Window
      .partitionBy(when(valid, col("doc_id")))
      .orderBy(monotonically_increasing_id())
    val flagged = parsed
      .withColumn("rn", when(valid, row_number().over(w)))
      .withColumn("reason",
        when(col("_corrupt").isNotNull, "malformed_json")
          .when(col("doc_id").isNull, "missing_doc_id")
          .when(col("text").isNull, "missing_text")
          .when(col("rn") > 1, "duplicate_doc_id"))
    val accepted = flagged
      .filter(col("reason").isNull)
      .select(
        col("doc_id"),
        col("text"),
        lower(coalesce(col("lang"), lit("und"))).as("lang"),
        coalesce(col("source"), lit(label)).as("source"),
        length(col("text")).cast("long").as("n_chars"))
    val rejected = flagged
      .filter(col("reason").isNotNull)
      .select(col("reason"), coalesce(col("_corrupt"), to_json(struct(
        col("doc_id"), col("text"), col("lang"), col("source")))).as("raw"))
    (accepted, rejected)
  }
}
