package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.MaxwellStream

/** End-to-end streaming CDC drive: renders the `events` table as Maxwell
  * JSON lines on disk, streams them through parse -> stateful replica ->
  * archive exactly as a production deployment would (file source stands in
  * for the queue), and prints one JSON summary line.
  *
  * Usage: runMain graft.StreamDemo [sfDir]
  */
object StreamDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val work = Files.createTempDirectory("graft_stream_demo").toString

    // 1. Render the event table as Maxwell JSON lines (the queue payload),
    //    plus a few pk-less DML events a real binlog can contain — they
    //    must surface in the dead-letter lane, not vanish.
    val noPk = Seq(
      """{"database":"app","table":"nopk_t","type":"update","ts":1700000000,"data":{"name":"x"},"old":{"name":"y"}}""",
      """{"database":"app","table":"nopk_t","type":"delete","ts":1700000001}"""
    ).toDF("value")
    MaxwellStream.maxwellify(Tables.events(spark, sfDir))
      .union(noPk)
      .repartition(4)
      .write.mode("overwrite").text(s"$work/queue")

    // 2. Stream: parse -> stateful replica changelog -> parquet replica,
    //    plus the month-partitioned archive. AvailableNow drains the
    //    backlog then stops — same code path as a continuous run.
    val lines = spark.readStream
      .schema("value STRING")
      .text(s"$work/queue")
    val parsed = MaxwellStream.parse(lines)

    val replicaQ = MaxwellStream.replicaChangelog(parsed)
      .writeStream
      .option("checkpointLocation", s"$work/ckpt_replica")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[MaxwellStream.StateChange], _: Long) =>
        MaxwellStream.applyBatchToReplica(batch, s"$work/replica")
      }
      .start()

    val archiveQ = MaxwellStream
      .startArchive(parsed, s"$work/archive", s"$work/ckpt_archive")
      .trigger(Trigger.AvailableNow())
      .start()

    // Dead-letter lane: events the replica lane must reject (no PK / no
    // data — here the DDL rows of the synthetic feed) land in their own
    // sink instead of vanishing.
    val rejectQ = MaxwellStream.rejectedEvents(parsed)
      .drop("data", "old")
      .writeStream
      .format("parquet")
      .option("path", s"$work/rejects")
      .option("checkpointLocation", s"$work/ckpt_rejects")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()

    replicaQ.awaitTermination()
    archiveQ.awaitTermination()
    rejectQ.awaitTermination()

    val nArchive = spark.read.parquet(s"$work/archive").count()
    val replica = spark.read.parquet(s"$work/replica")
    val nReplica = replica.count()
    val nRejects =
      try spark.read.parquet(s"$work/rejects").count() catch { case _: Exception => 0L }
    val months = spark.read.parquet(s"$work/archive")
      .select(countDistinct(col("event_month"))).head().getLong(0)
    println(
      s"""{"metric":"stream_demo","archived":$nArchive,"replica_rows":$nReplica,"rejected":$nRejects,"archive_months":$months,"dir":"$work"}""")
    spark.stop()
  }
}
