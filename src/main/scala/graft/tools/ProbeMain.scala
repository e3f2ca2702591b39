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
    val dir = "/root/testdata/sf0.001"
    val emb = graft.cdc.model.Changelog.table(s, dir, "embeddings")
    val nq = 5; val k = 10
    val exact = graft.ext.Similarity.bruteForceTopK(emb, nq, k).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    for ((m, kc, it, sl) <- Seq((8, 16, 2, 50), (8, 16, 2, 100), (8, 64, 2, 50), (8, 64, 2, 100), (16, 64, 2, 50))) {
      val books = graft.ext.Similarity.pqCodebooks(emb, m, kc, it)
      val adc = graft.ext.Similarity.pqAdcTopK(emb, books, m, nq, k).collect()
      val hits = adc.map(r => (r.getLong(0), r.getLong(1))).count(exact.contains)
      val rr = graft.ext.Similarity.pqSearchTopK(emb, books, m, nq, k, sl).collect()
      val rhits = rr.map(r => (r.getLong(0), r.getLong(1))).count(exact.contains)
      println(s"PQ m=$m k=$kc iters=$it sl=$sl adcRecall=$hits/${nq * k} rerankRecall=$rhits/${nq * k}")
    }
    s.stop()
  }
}
