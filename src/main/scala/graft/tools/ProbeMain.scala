package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc probe main used by the verify workflow (not part of the driver
  * contract).
  */
object ProbeMain {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val stream = graft.cdc.source.CdcSource.read(s)
      .option("scan.startup.mode", "specific-offset")
      .option("scan.startup.specific-offset.file", "mysql-bin.000002")
      .option("scan.startup.specific-offset.pos", 500L)
      .loadStream("/root/testdata/sf0.001")
    val q = stream.writeStream.format("memory").queryName("probe_sink")
      .outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val min = s.table("probe_sink").agg(org.apache.spark.sql.functions.min("offset"))
      .collect()(0).getLong(0)
    println(s"PROBE_STREAM_SPECIFIC min_offset=$min rows=" + s.table("probe_sink").count())
    s.stop()
  }
}
