package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** MySQL to ANSI dialect translation, re-expressing the reference's
  * `translate_sql` + `add_schema_name` plpython functions
  * (`/root/reference/cdc_plpgsql_functions.sql:8-57`) as pure Catalyst
  * expression chains (fully codegen'd, no UDFs) so translation of a DDL
  * column distributes across executors for free.
  *
  * Semantics preserved from the reference:
  *   - the statement is upper-cased first;
  *   - `ENGINE=<x>` storage specs are stripped;
  *   - backticks are stripped;
  *   - `TINYINT(1)->SMALLINT`, `DOUBLE->FLOAT8`, `DATETIME->TIMESTAMP`,
  *     `LONGBLOB->BYTEA`, `LONGTEXT->TEXT`;
  *   - `(CREATE|DROP|ALTER) TABLE [IF EXISTS] <t>` is qualified with the
  *     originating database as schema.
  */
object Dialect {

  private val typeMap: Seq[(String, String)] = Seq(
    "TINYINT\\(1\\)" -> "SMALLINT",
    "DOUBLE" -> "FLOAT8",
    "DATETIME" -> "TIMESTAMP",
    "LONGBLOB" -> "BYTEA",
    "LONGTEXT" -> "TEXT"
  )

  /** `translate_sql` analog (cdc_plpgsql_functions.sql:21-57). */
  def translateSql(sql: Column): Column = {
    val upperd = upper(sql)
    val noEngine = regexp_replace(upperd, "\\bENGINE\\s*=\\s*\\S+", "")
    val noTicks = regexp_replace(noEngine, "`", "")
    typeMap.foldLeft(noTicks) { case (c, (from, to)) => regexp_replace(c, from, to) }
  }

  /** Type map targeting the SPARK SQL dialect instead of Greenplum —
    * same translation pipeline, different destination catalog. */
  private val sparkTypeMap: Seq[(String, String)] = Seq(
    "TINYINT\\(1\\)" -> "SMALLINT",
    "DATETIME" -> "TIMESTAMP",
    "LONGBLOB" -> "BINARY",
    "LONGTEXT" -> "STRING"
    // DOUBLE is already a Spark type
  )

  /** `translate_sql` analog with Spark SQL as the target dialect. */
  def translateSqlSpark(sql: Column): Column = {
    val upperd = upper(sql)
    val noEngine = regexp_replace(upperd, "\\bENGINE\\s*=\\s*\\S+", "")
    val noTicks = regexp_replace(noEngine, "`", "")
    sparkTypeMap.foldLeft(noTicks) { case (c, (from, to)) => regexp_replace(c, from, to) }
  }

  /** Full pipeline into the Spark dialect. DROP TABLE gains IF EXISTS —
    * the reference checks existence before dropping and skips quietly
    * (`cdc_plpgsql_functions.sql:212-222`); without the guard a replayed
    * DROP for a never-replicated table surfaces as an error instead of a
    * no-op. */
  def toSparkSql(schema: Column, sql: Column): Column =
    addSchemaName(schema,
      regexp_replace(translateSqlSpark(sql),
        "\\bDROP TABLE (?!IF EXISTS)", "DROP TABLE IF EXISTS "))

  private val ddlTarget = "((?:CREATE|DROP|ALTER)\\s+TABLE(?:\\s+IF EXISTS)?)\\s+(\\w+)"

  /** Escape a value for use inside a Java-regex REPLACEMENT string
    * (`Matcher.quoteReplacement` semantics): a database named `a$b` or
    * `a\b` must land literally, not as a group reference/escape. */
  private def quoteReplacement(c: Column): Column =
    regexp_replace(c, lit("([\\\\$])"), lit("\\\\$1"))

  /** `add_schema_name` analog (cdc_plpgsql_functions.sql:8-18). Expects the
    * already-upper-cased output of [[translateSql]]; `schema` is a column so
    * the originating database can vary per row, as in the reference. */
  def addSchemaName(schema: Column, sql: Column): Column =
    regexp_replace(sql, lit(ddlTarget),
      concat(lit("$1 "), quoteReplacement(upper(schema)), lit(".$2")))

  /** Full pipeline: translate the dialect, then schema-qualify. */
  def toAnsi(schema: Column, sql: Column): Column =
    addSchemaName(schema, translateSql(sql))
}
