package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured-Streaming CDC: the reference pipeline
  * (Maxwell JSON -> RabbitMQ -> `maxwell_event` archive -> `process_events()`
  * replica maintenance, `/root/reference/cdc_periodic_load.sql`) re-expressed
  * as one continuous streaming plan instead of a poll loop.
  *
  * Scale notes: parsing is a narrow map; the replica state store shuffles
  * once on the (database, table, pk) key and holds ONLY the latest row per
  * key in the state store (bounded by live-key cardinality, not stream
  * length); the archive sink partitions by event month exactly like the
  * reference's range-partitioned `maxwell_event` table so time-ranged scans
  * prune.
  */
object MaxwellStream {

  /** Maxwell envelope schema (maxwell_gpdb.sql:15-22 pulls out ts/database/
    * table/type and keeps the full JSON; `data`/`old` stay maps here).
    * Maxwell `ts` is epoch-seconds for DML but epoch-millis for DDL
    * (cdc_periodic_load.sql:5). */
  val eventSchema: StructType = StructType(Seq(
    StructField("ts", LongType),
    StructField("database", StringType),
    StructField("table", StringType),
    StructField("type", StringType),
    StructField("data", MapType(StringType, StringType)),
    StructField("old", MapType(StringType, StringType)),
    StructField("sql", StringType)
  ))

  /** Parse raw Maxwell JSON lines (batch or streaming DataFrame with a
    * `value` string column) into the typed event columns. Mirrors the
    * reference consumer's `[\t\r\n]+ -> space` scrub (rabbitmq.go:39,181)
    * and the sec/ms timestamp normalization. */
  def parse(lines: DataFrame): DataFrame = {
    val cleaned = regexp_replace(col("value"), "[\\t\\r\\n]+", " ")
    lines
      .select(from_json(cleaned, eventSchema).as("e"))
      .filter(col("e").isNotNull && col("e.ts").isNotNull)
      .select(
        timestamp_seconds(
          when(col("e.ts") >= 100000000000L, expr("e.ts div 1000")).otherwise(col("e.ts"))
        ).as("ts"),
        col("e.database").as("database_name"),
        col("e.table").as("table_name"),
        lower(col("e.type")).as("op"),
        col("e.data").as("data"),
        col("e.old").as("old"),
        col("e.sql").as("sql")
      )
  }

  /** Render a generic event table as Maxwell JSON lines — the inverse of
    * [[parse]], used to drive the streaming path from batch fixtures (the
    * role Maxwell's Daemon plays against the MySQL binlog). */
  def maxwellify(events: DataFrame): DataFrame =
    events.select(
      to_json(struct(
        lit("app").as("database"),
        lit("users").as("table"),
        when(col("event_type") === "signup", "insert")
          .when(col("event_type") === "error", "delete")
          .otherwise("update").as("type"),
        unix_timestamp(col("ts")).as("ts"),
        map(
          lit("id"), col("user_id").cast("string"),
          lit("value"), col("value").cast("string"),
          lit("event_id"), col("event_id").cast("string")
        ).as("data")
      )).as("value")
    )

  /** Kafka transport (the reference's alternate queue,
    * `scripts/start_maxwell.sh` + `scripts/kafka_to_greenplum.sh`): raw
    * Maxwell lines from a topic, ready for [[parse]]. Requires the
    * spark-sql-kafka connector on the deployment classpath (not bundled in
    * this container, so exercised only in deployments). */
  def fromKafka(spark: SparkSession, bootstrapServers: String, topic: String): DataFrame =
    spark.readStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("subscribe", topic)
      .option("startingOffsets", "earliest")
      .load()
      .selectExpr("CAST(value AS STRING) AS value")

  /** One parsed CDC record. */
  final case class CdcRecord(
      ts: java.sql.Timestamp,
      database_name: String,
      table_name: String,
      op: String,
      data: Map[String, String],
      old: Map[String, String])

  /** A replica state transition emitted by [[replicaChangelog]]. */
  final case class StateChange(
      database_name: String,
      table_name: String,
      pk: String,
      op: String, // upsert | tombstone
      state: Map[String, String],
      ts: java.sql.Timestamp)

  /** The `process_events()` replay as a streaming stateful operator:
    * per (database, table, pk) the store holds the current row; INSERTs
    * replace it, UPDATEs merge only the changed columns onto it (the
    * reference applies only the keys present in `old`,
    * cdc_plpgsql_functions.sql:128-144), DELETEs emit a tombstone and clear
    * state. Emits the post-image changelog. */
  def replicaChangelog(parsed: DataFrame, pkColumn: String = "id"): Dataset[StateChange] = {
    val spark = parsed.sparkSession
    import spark.implicits._
    parsed
      .select("ts", "database_name", "table_name", "op", "data", "old")
      .as[CdcRecord]
      .filter(r => r.data != null && r.data.contains(pkColumn) &&
        (r.op == "insert" || r.op == "update" || r.op == "delete"))
      .groupByKey(r => (r.database_name, r.table_name, r.data(pkColumn)))
      .flatMapGroupsWithState[Map[String, String], StateChange](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case ((db, table, pk), records, state) =>
          // Events within a micro-batch are applied in ts order (the
          // reference replays `ORDER BY ts ASC`).
          val ordered = records.toSeq.sortBy(r => (r.ts.getTime, r.op))
          val out = scala.collection.mutable.ArrayBuffer.empty[StateChange]
          var cur = state.getOption.getOrElse(Map.empty[String, String])
          ordered.foreach { r =>
            r.op match {
              case "insert" =>
                cur = r.data
                out += StateChange(db, table, pk, "upsert", cur, r.ts)
              case "update" =>
                val changedKeys: Set[String] =
                  if (r.old != null && r.old.nonEmpty) r.old.keySet else r.data.keySet
                cur = cur ++ r.data.view.filterKeys(changedKeys).toMap
                out += StateChange(db, table, pk, "upsert", cur, r.ts)
              case "delete" =>
                cur = Map.empty
                out += StateChange(db, table, pk, "tombstone", Map.empty[String, String], r.ts)
            }
          }
          if (cur.isEmpty) state.remove() else state.update(cur)
          out.iterator
      }
  }

  /** The event archive: append-mode parquet sink partitioned by event month,
    * the analog of the reference's month-range-partitioned `maxwell_event`
    * (maxwell_gpdb.sql:25-31). Returns the started query. */
  def startArchive(parsed: DataFrame, outDir: String, checkpointDir: String) =
    parsed
      .withColumn("event_month", date_format(col("ts"), "yyyy-MM"))
      .writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .partitionBy("event_month")
      .outputMode(OutputMode.Append())

  /** DDL lane: the TABLE-CREATE/ALTER/DROP and DATABASE-CREATE/DROP
    * branches of `process_events()` (cdc_plpgsql_functions.sql:196-222) as
    * a stream of translated, schema-qualified ANSI statements ready for a
    * catalog executor. DATABASE ops synthesize schema DDL exactly like the
    * reference. */
  def ddlStatements(parsed: DataFrame): DataFrame =
    parsed
      .filter(col("op").isin(
        "table-create", "table-alter", "table-drop", "database-create", "database-drop"))
      .select(
        col("ts"),
        col("database_name"),
        col("op"),
        when(col("op") === "database-create",
          concat(lit("CREATE SCHEMA "), upper(col("database_name"))))
          .when(col("op") === "database-drop",
            concat(lit("DROP SCHEMA "), upper(col("database_name")), lit(" CASCADE")))
          .otherwise(graft.functions.Dialect.toAnsi(col("database_name"), col("sql")))
          .as("ansi_sql")
      )

  /** Spark-dialect DDL lane: like [[ddlStatements]] but targeting the Spark
    * catalog's SQL dialect, ready for [[applyDdl]]. */
  def ddlStatementsSpark(parsed: DataFrame): DataFrame =
    parsed
      .filter(col("op").isin(
        "table-create", "table-alter", "table-drop", "database-create", "database-drop"))
      .select(
        col("ts"),
        col("database_name"),
        col("op"),
        when(col("op") === "database-create",
          concat(lit("CREATE DATABASE IF NOT EXISTS "), upper(col("database_name"))))
          .when(col("op") === "database-drop",
            concat(lit("DROP DATABASE IF EXISTS "), upper(col("database_name")), lit(" CASCADE")))
          .otherwise(graft.functions.Dialect.toSparkSql(col("database_name"), col("sql")))
          .as("spark_sql")
      )

  /** EXECUTE the translated DDL against the Spark catalog — the analog of
    * `process_events()`'s `EXECUTE sql` (cdc_plpgsql_functions.sql:226-231),
    * giving full schema replication: source databases become Spark
    * databases, CREATE/ALTER/DROP land on real catalog tables. DDL is
    * catalog (driver) work by nature and low-cardinality, so collecting the
    * ordered statements per micro-batch is the correct topology. Statements
    * that fail (e.g. DDL for a table outside the replicated set) are
    * logged and skipped, like the reference's per-statement RAISE INFO. */
  def applyDdl(ddlBatch: DataFrame): Seq[(String, Option[String])] = {
    val spark = ddlBatch.sparkSession
    ddlBatch
      .orderBy(col("ts"))
      .select(col("spark_sql"))
      .collect()
      .toSeq
      .map(_.getString(0))
      .map { stmt =>
        try { spark.sql(stmt); stmt -> None }
        catch { case e: Exception => stmt -> Some(e.getMessage.linesIterator.next()) }
      }
  }

  /** Watermarked tumbling-window op counts over the CDC stream — the
    * monitoring query the reference approximates with poll scripts. */
  def windowedOpCounts(parsed: DataFrame): DataFrame =
    parsed
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("database_name"), col("table_name"), col("op"))
      .agg(count(lit(1)).as("n_events"))
      .select(
        col("window.start").as("window_start"),
        col("database_name"), col("table_name"), col("op"), col("n_events")
      )

  /** Idempotent replica maintenance via foreachBatch: each micro-batch of
    * state changes is de-duplicated per key (latest wins) and merged into a
    * parquet replica directory. At scale the same foreachBatch body targets
    * a MERGE-capable table format; plain parquet is rewritten per batch
    * here. */
  def applyBatchToReplica(batch: Dataset[StateChange], replicaDir: String): Unit = {
    val spark = batch.sparkSession
    import spark.implicits._
    val latest = batch
      .groupByKey(c => (c.database_name, c.table_name, c.pk))
      .reduceGroups((a, b) => if (a.ts.compareTo(b.ts) >= 0) a else b)
      .map(_._2)
    val replicaPath = new org.apache.hadoop.fs.Path(replicaDir)
    val fs = replicaPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val existing =
      if (fs.exists(replicaPath)) spark.read.parquet(replicaDir).as[StateChange]
      else spark.emptyDataset[StateChange]
    val merged = existing
      .union(latest)
      .groupByKey(c => (c.database_name, c.table_name, c.pk))
      .reduceGroups((a, b) => if (a.ts.compareTo(b.ts) >= 0) a else b)
      .map(_._2)
      .filter(c => c.op != "tombstone")
      .cache()
    merged.count() // materialize before overwrite reads the old files
    merged.write.mode("overwrite").parquet(replicaDir + ".tmp")
    merged.unpersist()
    // atomic-ish swap: re-point by rewriting the target
    val tmp = spark.read.parquet(replicaDir + ".tmp")
    tmp.write.mode("overwrite").parquet(replicaDir)
  }
}
