package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.{Advanced, AnalyticsExt, Cdc, Curation, Dedup, Multimodal, Olap, OrderedStats, Planning, ScalePatterns, Similarity, TextAnalysis, TpchMore, TpchThird, TrainingOps}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** All registered operators, in SURVEY §2 order. */
  def defs: Seq[QueryDef] =
    Cdc.all ++ Olap.all ++ AnalyticsExt.all ++ ScalePatterns.all ++ Advanced.all ++
      TpchMore.all ++ TpchThird.all ++ OrderedStats.all ++ TrainingOps.all ++ Curation.all ++ Dedup.all ++
      Similarity.all ++ TextAnalysis.all ++ Multimodal.all ++ Planning.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Olap.q1PricingSummary.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Registry.queryMap(defs)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Registry.oracleMap(defs)
}
