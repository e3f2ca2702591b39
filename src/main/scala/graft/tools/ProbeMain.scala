package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc probe main used by the verify workflow (not part of the driver
  * contract). args: sfDir queryName [queryName...] — times each named
  * SparkEntry query twice (min-of-2, the bench's convention).
  */
object ProbeMain {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      // match Bench's data-proportional shuffle width (AQE coalesces)
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        sys.env.getOrElse("SPARK_GRAFT_INITIAL_PARTITIONS",
          graft.Bench.initialShufflePartitions(
            args.headOption.getOrElse("/root/testdata/sf0.1"), 32)))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("rowimage_hybrid_materialize", "rowimage_upsert_materialize")
    def once(name: String): Double = {
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(name)(s, dir).count()
      val t = (System.nanoTime() - t0) / 1e9
      println(f"TIME $name $t%.2f s rows=$n")
      t
    }
    names.foreach { n =>
      val t = math.min(once(n), once(n))
      println(f"BEST $n $t%.2f s")
    }
    s.stop()
  }
}
