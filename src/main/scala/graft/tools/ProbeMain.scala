package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc probe main used by the verify workflow (not part of the driver
  * contract).
  */
object ProbeMain {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    def time(n: String)(f: => Any): Unit = {
      val t0 = System.nanoTime; val r = f
      println(f"STRESS $n ${(System.nanoTime - t0) / 1e9}%.1f s -> $r")
    }
    val ev = s.range(20000000L).select(
      col("id").as("offset"),
      pmod(col("id") * 2654435761L, lit(100000L)).as("pk"),
      lit("u").as("op"),
      (col("id") * 797 % 864000000L).as("ts_ms"),
      (col("id") % 9973).cast("double").as("val"),
      lit(null).cast("string").as("props"))
    // session windows over 20M events / 100k users
    time("session_windows_20M") {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("pk")).orderBy(col("ts_ms"), col("offset"))
      ev.withColumn("new_sess",
          when(col("ts_ms") - lag(col("ts_ms"), 1).over(w) > 1800000L, 1).otherwise(0))
        .withColumn("sess_id", sum(col("new_sess")).over(
          w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
        .groupBy(col("pk"), col("sess_id")).count().count()
    }
    s.stop()
  }
}
