package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc probe main used by the verify workflow (not part of the driver
  * contract).
  */
object ProbeMain {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val q = graft.SparkEntry.queries("hybrid_pipeline_materialize")
    q(s, "/root/testdata/sf0.1").count() // warm
    val t0 = System.nanoTime
    val n = q(s, "/root/testdata/sf0.1").count()
    println(f"PROBE_HYBRID rows=$n time=${(System.nanoTime - t0) / 1e9}%.2f")
    // scan-level evidence: the chunk range filter must reach the events scan
    val plan = q(s, "/root/testdata/sf0.1").queryExecution.executedPlan.toString
    println("PROBE_PUSHED=" + plan.contains("LessThan(user_id,5)"))
    s.stop()
  }
}
