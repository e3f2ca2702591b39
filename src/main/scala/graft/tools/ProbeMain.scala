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
    val docs = graft.ext.Multimodal.asBinary(
      s.read.parquet("/root/testdata/sf0.001/documents.parquet"))
    val a = graft.ext.Multimodal.decodeBatched(docs, 1).collect()
    val b = graft.ext.Multimodal.decodeBatched(docs, 100000).collect()
    println("PROBE_B1=" + a.length + " BHUGE=" + b.length + " IDS_EQUAL=" +
      (a.map(_.doc_id).sorted.toSeq == b.map(_.doc_id).sorted.toSeq))
    s.stop()
  }
}
