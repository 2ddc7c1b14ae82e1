package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Centralized access to the driver-generated parquet tables.
  *
  * Every operator takes `(spark, sfDir)` and reads only through here, so
  * column pruning / filter pushdown reach the parquet scans and a future
  * swap to a partitioned / bucketed layout is one-line.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** `props.k` extraction, single-sourced for every events-props lane
    * (cdc_parse, cdc_snapshot_composite, q_interval_overlap,
    * q_props_extract). Round 16 adjudication — get_json_object KEPT, on
    * query-level numbers: an isolated kernel probe at LOW parallelism
    * (8 threads, parse-dominated) favored from_json 3.6× (4.4 s vs
    * 15.6 s warm at sf10), but the four real lanes each measured 15-25%
    * SLOWER with from_json at 32 threads, twice-reproduced (e.g.
    * cdc_parse 12.1 → 14.6/15.4 s) — JsonToStructs is a non-codegen
    * expression, so it breaks the scan stage's whole-stage codegen and
    * the stage-level cost outweighs the parse-kernel saving once the
    * parse is no longer the bottleneck. get_json_object stays inside
    * WholeStageCodegen. Missing/malformed props → null on both engines. */
  def propsK: org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.get_json_object(
      org.apache.spark.sql.functions.col("props"), "$.k")

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  /** `events.ts` has shipped in two parquet layouts: nanosecond int64 (old —
    * Spark 4 refuses unless `spark.sql.legacy.parquet.nanosAsLong=true`, we
    * floor-convert ns→µs) and `timestamp[us]` without a timezone (current —
    * Spark 4 reads TIMESTAMP_NTZ, which `unix_micros`/`unix_millis` reject).
    * Sessions pin `spark.sql.session.timeZone=UTC`, so casting NTZ→TIMESTAMP
    * is an exact re-tag of the same µs instant, and DuckDB reads the same
    * naive column — oracle comparisons agree in both layouts. */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = table(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts",
          org.apache.spark.sql.functions.col("ts").cast(
            org.apache.spark.sql.types.TimestampType))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
