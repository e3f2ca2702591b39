package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc probe main used by the verify workflow (not part of the driver
  * contract).
  */
object ProbeMain {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"TIME $name ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$n")
    }
    val ef = graft.SparkEntry.queries("rowimage_emit_filter")(s, dir)
    println("=== rowimage_emit_filter ===")
    println(ef.queryExecution.executedPlan.toString.take(8000))
    val um = graft.SparkEntry.queries("rowimage_upsert_materialize")(s, dir)
    println("=== rowimage_upsert_materialize ===")
    println(um.queryExecution.executedPlan.toString.take(8000))
    def mat(name: String): Unit = time(name) {
      val df = graft.SparkEntry.queries(name)(s, dir)
      df.write.mode("overwrite").format("noop").save()
      -1L
    }
    time("envelope_only") {
      graft.cdc.model.RowImageQueries.envelope(s, dir).count()
    }
    Seq("rowimage_decode", "rowimage_extract_rows", "rowimage_upsert_materialize",
      "rowimage_emit_filter").foreach(mat)
    // second pass: steady state
    Seq("rowimage_decode", "rowimage_extract_rows", "rowimage_upsert_materialize",
      "rowimage_emit_filter").foreach(mat)
    s.stop()
  }
}
