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
    time("hybrid_1")(graft.SparkEntry.queries("rowimage_hybrid_materialize")(s, dir).count())
    time("hybrid_2")(graft.SparkEntry.queries("rowimage_hybrid_materialize")(s, dir).count())
    time("upsert_1")(graft.SparkEntry.queries("rowimage_upsert_materialize")(s, dir).count())
    time("upsert_2")(graft.SparkEntry.queries("rowimage_upsert_materialize")(s, dir).count())
    s.stop()
  }
}
