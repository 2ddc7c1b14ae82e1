package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named operator: a Spark implementation plus (optionally) the
  * equivalent ANSI SQL the driver runs in DuckDB as the correctness oracle.
  *
  * Conventions that keep the DuckDB hash-compare exact:
  *   - every floating-point output column is `round(expr, n)` on BOTH sides;
  *   - every query ends in a total deterministic ORDER BY;
  *   - timestamps are exported as epoch integers or formatted strings;
  *   - aliases match exactly between the Spark plan and the oracle SQL.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String]
)

object Registry {
  def queryMap(defs: Seq[QueryDef]): Map[String, (SparkSession, String) => DataFrame] =
    defs.map(d => d.name -> d.fn).toMap

  def oracleMap(defs: Seq[QueryDef]): Map[String, String] =
    defs.flatMap(d => d.oracle.map(d.name -> _)).toMap
}
