package graft

import org.apache.spark.sql.SparkSession

/** Scratch probe main — current contents change per investigation. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      spark.conf.set("spark.executor.instances", "16")
      System.err.println("[probe] set ok -> " + spark.conf.get("spark.executor.instances"))
    } catch { case e: Exception => System.err.println("[probe] set FAILED: " + e) }
  }
}
