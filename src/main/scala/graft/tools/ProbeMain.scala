package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc probe main used by the verify workflow (not part of the driver
  * contract).
  */
object ProbeMain {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    import graft.cdc.model.Changelog
    import graft.cdc.source.{CdcMicroBatch, CdcSource}
    println("GTIDSEQ " + graft.cdc.offsets.BinlogOffsets.gtidStartingSeq("s1:1-500,s1:601-700"))
    val dir = java.nio.file.Files.createTempDirectory("derby_probe").toString
    val url = s"jdbc:derby:$dir/logdb;create=true"
    val rows = Changelog.changelog(s, "/root/testdata/sf0.001")
      .select("offset", "pk", "op", "ts_ms", "val").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3), r.getDouble(4)))
      .sortBy(_._1)
    CdcMicroBatch.appendChangeTable(url, "GRAFT_CHANGELOG", rows.iterator)
    val q = CdcSource.read(s)
      .option("scan.startup.mode", "specific-offset")
      .option("scan.startup.specific-offset.gtid-set", "s1:1-500,s1:601-700")
      .loadMicroBatch(url)
      .writeStream.format("memory").queryName("p_gtid").outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    val got = s.table("p_gtid").select("offset").collect().map(_.getLong(0))
    println("GOT n=" + got.length + " min=" + got.min + " max=" + got.max)
    s.stop()
  }
}
