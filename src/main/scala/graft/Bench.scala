package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times every SparkEntry query at SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line. A warmup pass (count over lineitem + a tiny
  * changelog query) runs first so JVM/classloader/codegen startup cost does
  * not land in the first timed query.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // shuffle width decoupled from thread count: bench-SF shuffles hold a
    // few MB, where fewer/fatter partitions beat task-scheduling overhead
    // (AQE coalescing narrows most of the gap either way)
    val shuffle = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuffle)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // warmup: parquet read + shuffle + codegen paths
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    SparkEntry.queries("changelog_upsert_materialize")(spark, sfDir).count()

    // two timed passes per query, report the min: first execution of each
    // distinct plan pays 1-3s of codegen/JIT that says nothing about the
    // operator; min-of-2 measures steady-state throughput
    // a failed query reports -1, never a time-to-exception (which would
    // flatter the total when a slow query regresses into a fast failure)
    var failed = List.empty[String]
    def timeOnce(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count(); (System.nanoTime() - t0) / 1e9 }
      catch {
        case e: Throwable =>
          if (!failed.contains(name)) {
            failed ::= name
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          }
          -1.0
      }
    }
    val sorted = SparkEntry.queries.toSeq.sortBy(_._1)
    val pass1 = sorted.map { case (n, f) => n -> timeOnce(n, f) }.toMap
    val results = sorted.map { case (n, f) =>
      val t2 = timeOnce(n, f)
      val t1 = pass1(n)
      n -> (if (t1 < 0 || t2 < 0) -1.0 else math.min(t1, t2))
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val fq = failed.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$fq,"sf":"$sfDir"}""")
    spark.stop()
  }
}
