package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-13 optimization probes: stage-level timing of the bench's most
  * expensive queries, to locate where each one's wall actually goes before
  * touching anything (guide §1: measure first). Not part of the driver
  * contract. args: sfDir probeName [probeName...]
  */
object ProbeR13 {
  private def timed[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime(); val r = f
    println(f"STAGE $label ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        graft.Bench.initialShufflePartitions(dir, 32))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    args.drop(1).foreach {
      case "pq" => pqStages(s, dir)
      case "pqfit" => graft.ext.ProbeExt.pqFitSteps(s, dir)
      case "probefit" => graft.ext.ProbeExt.probeFitSteps(s, dir)
      case "kmfold" => graft.ext.ProbeExt.kmFoldAb(s, dir)
      case "ivm" => ivmStages(s, dir)
      case "q" => () // bare session warmup
      case n =>
        def once(): Double = {
          val t0 = System.nanoTime()
          val c = graft.SparkEntry.queries(n)(s, dir).count()
          val t = (System.nanoTime() - t0) / 1e9
          println(f"TIME $n $t%.2f s rows=$c"); t
        }
        val best = math.min(once(), once())
        println(f"BEST $n $best%.2f s")
    }
    s.stop()
  }

  /** Where do similarity_pq_search's seconds go: fit vs encode vs search? */
  private def pqStages(s: SparkSession, dir: String): Unit = {
    val emb = graft.cdc.model.Changelog.table(s, dir, "embeddings")
    println(s"emb rows=${emb.count()}")
    for (round <- 1 to 2) {
      val books = timed(s"r$round pqCodebooksExact(m=8,k=64,iters=2)") {
        val b = graft.ext.Similarity.pqCodebooksExact(emb, m = 8, k = 64, iters = 2)
        b.count(); b
      }
      timed(s"r$round pqSearchTopK(given books)") {
        graft.ext.Similarity.pqSearchTopK(emb, books, m = 8,
          nQueries = 10, k = 5, shortlist = 100).count()
      }
      timed(s"r$round full query") {
        graft.SparkEntry.queries("similarity_pq_search")(s, dir).count()
      }
      timed(s"r$round full ivfpq query") {
        graft.SparkEntry.queries("similarity_ivfpq_search")(s, dir).count()
      }
    }
  }

  /** Where do rowimage_incremental_join's seconds go: envelope synthesis vs
    * decode vs the interval join+fold?
    */
  private def ivmStages(s: SparkSession, dir: String): Unit = {
    import graft.cdc.model.{IvmQueries, RowImage}
    import graft.cdc.merge.IncrementalJoin
    for (round <- 1 to 2) {
      val envA = timed(s"r$round ordersEnvelope count") {
        val e = IvmQueries.ordersEnvelope(s, dir); e.count(); e
      }
      val envB = timed(s"r$round customerEnvelope count") {
        val e = IvmQueries.customerEnvelope(s, dir); e.count(); e
      }
      timed(s"r$round decode orders (noop)") {
        RowImage.decodeEnvelope(envA, IvmQueries.ordersJoinTable)
          .write.format("noop").mode("overwrite").save()
      }
      timed(s"r$round decode customer (noop)") {
        RowImage.decodeEnvelope(envB, IvmQueries.customerTable)
          .write.format("noop").mode("overwrite").save()
      }
      timed(s"r$round full incremental_join") {
        graft.SparkEntry.queries("rowimage_incremental_join")(s, dir).count()
      }
      timed(s"r$round full incremental_join_agg") {
        graft.SparkEntry.queries("rowimage_incremental_join_agg")(s, dir).count()
      }
    }
  }
}
