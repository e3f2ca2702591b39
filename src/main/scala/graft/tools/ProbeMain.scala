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
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    import graft.cdc.streaming.StreamingOps._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

    val stream = MemoryStream[ChangeRecord]
    val q = retractionStream(stream.toDS())
      .writeStream.format("memory").queryName("probe_retract")
      .outputMode("append").start()
    // batch 1: insert then delete key 7 — tombstone must persist in state
    stream.addData(ChangeRecord(1, 7, "c", 0, 1.0), ChangeRecord(2, 7, "d", 0, 0.0))
    q.processAllAvailable()
    // batch 2: re-insert after the tombstone + a stale lower-offset record
    stream.addData(ChangeRecord(5, 7, "u", 0, 9.0), ChangeRecord(3, 7, "u", 0, 3.0))
    q.processAllAvailable(); q.stop()
    s.table("probe_retract").orderBy("offset", "row_kind").collect()
      .foreach(r => println("ROW " + r.mkString(",")))
    s.stop()
  }
}
