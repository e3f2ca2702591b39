package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc probe main used by the verify workflow (not part of the driver
  * contract).
  */
object ProbeMain {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    val df = graft.SparkEntry.queries("rowimage_stream_materialize")(s, dir)
    println("STREAM_ROWS " + df.count())
    df.orderBy("l_partkey", "l_suppkey").show(5, false)
    // second call: staged log + existing state must be reused idempotently
    val df2 = graft.SparkEntry.queries("rowimage_stream_materialize")(s, dir)
    println("STREAM_ROWS2 " + df2.count())
    s.stop()
  }
}
