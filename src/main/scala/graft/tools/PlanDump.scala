package graft.tools

import org.apache.spark.sql.SparkSession

/** Writes each named query's `explain("formatted")` output to
  * `<outDir>/<query>_<suffix>.txt` — the before/after plan evidence the
  * optimization rounds commit (plans/rNN/). Uses the SAME session
  * configuration as [[graft.Bench]] (data-proportional AQE starting width,
  * UTC, 32 threads) so the dumped plan is the benched plan. Run:
  *
  *   sbt "runMain graft.tools.PlanDump /root/testdata/sf0.1 plans/r13 before q1,q2"
  *
  * With query list "all", dumps every SparkEntry query.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val suffix = args(2)
    val names: Seq[String] =
      if (args.length < 4 || args(3) == "all") graft.SparkEntry.queries.keys.toSeq.sorted
      else args(3).split(',').map(_.trim).filter(_.nonEmpty).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        graft.Bench.initialShufflePartitions(sfDir, cpus.toInt))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Path.of(outDir))
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      val text =
        try fn(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        catch { case e: Throwable => s"EXPLAIN FAILED: $e" }
      java.nio.file.Files.writeString(
        java.nio.file.Path.of(outDir, s"${name}_$suffix.txt"), text)
      System.err.println(s"[plandump] $name -> $outDir/${name}_$suffix.txt")
    }
    spark.stop()
  }
}
