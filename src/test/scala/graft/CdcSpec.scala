package graft

import org.apache.spark.sql.functions._

import graft.functions.Dialect
import graft.operators.Cdc

class CdcSpec extends SparkSpec {

  test("every CDC query runs and is non-empty at sf0.001") {
    Cdc.all.foreach { q =>
      assert(q.fn(spark, sfDir).count() > 0, s"${q.name} returned no rows")
    }
  }

  test("snapshot drops keys whose final op is a delete tombstone") {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts").desc, col("event_id").desc)
    val lastIsDelete = Tables.events(spark, sfDir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 && col("event_type") === "error")
      .select("user_id")
    val snap = Cdc.cdcSnapshot.fn(spark, sfDir)
    assert(snap.join(lastIsDelete, "user_id").count() == 0)
    val total = Tables.events(spark, sfDir).select("user_id").distinct().count()
    assert(snap.count() == total - lastIsDelete.count())
  }

  test("dialect translation reproduces the reference's mappings") {
    val in = Seq(
      "CREATE TABLE `album` (title LONGTEXT, price DOUBLE, created DATETIME, ok TINYINT(1), art LONGBLOB) ENGINE=InnoDB",
      "ALTER TABLE album ADD COLUMN price DECIMAL(15, 2)",
      "DROP TABLE IF EXISTS album"
    ).toDF("sql")
    val out = in.select(Dialect.toAnsi(lit("music"), col("sql")).as("t")).collect().map(_.getString(0))
    assert(out(0) ==
      "CREATE TABLE MUSIC.ALBUM (TITLE TEXT, PRICE FLOAT8, CREATED TIMESTAMP, OK SMALLINT, ART BYTEA) ")
    assert(out(1) == "ALTER TABLE MUSIC.ALBUM ADD COLUMN PRICE DECIMAL(15, 2)")
    assert(out(2) == "DROP TABLE IF EXISTS MUSIC.ALBUM")
  }

  test("scd2 intervals chain: valid_to equals next version's valid_from") {
    import org.apache.spark.sql.expressions.Window
    val scd = Cdc.cdcScd2.fn(spark, sfDir)
    val w = Window.partitionBy(col("user_id")).orderBy(col("valid_from_us"), col("event_id"))
    val bad = scd
      .withColumn("next_from", lead(col("valid_from_us"), 1).over(w))
      .filter(col("valid_to_us").isNotNull && col("valid_to_us") =!= col("next_from"))
    assert(bad.count() == 0)
  }

  implicit class SeqToDf[T <: Product](s: Seq[String]) {
    def toDF(name: String): org.apache.spark.sql.DataFrame = {
      import scala.jdk.CollectionConverters._
      spark.createDataFrame(
        s.map(org.apache.spark.sql.Row(_)).asJava,
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField(name, org.apache.spark.sql.types.StringType)))
      )
    }
  }
}
