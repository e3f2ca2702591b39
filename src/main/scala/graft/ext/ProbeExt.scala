package graft.ext

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-13 probe helpers that need private[ext] access. Not part of the
  * driver contract.
  */
object ProbeExt {
  private def timed[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime(); val r = f
    println(f"STAGE $label ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
  }

  /** Step-level timing of the PQ codebook fit: subs checkpoint, seed
    * collect, each iteration's aggregate+collect.
    */
  def pqFitSteps(s: SparkSession, dir: String): Unit = {
    import graft.ext.Similarity
    val emb = graft.cdc.model.Changelog.table(s, dir, "embeddings")
    for (round <- 1 to 2) {
      timed(s"r$round fit total") {
        val m = 8; val k = 64
        val subs = timed(s"r$round subs ckpt") {
          val x = Similarity.subVectors(Similarity.normed(emb), m).localCheckpoint()
          x
        }
        var books = timed(s"r$round seed collect") {
          Similarity.seedBooks(subs, k).select(col("sub"), col("code"), col("cv"))
            .collect().map(r => (r.getInt(0), r.getLong(1), r.getSeq[Double](2).toArray))
        }
        def booksDf() = {
          import scala.jdk.CollectionConverters._
          val rows: java.util.List[org.apache.spark.sql.Row] =
            books.toSeq.map { case (sub, code, cv) =>
              var acc = 0.0; var i = 0
              while (i < cv.length) { acc += cv(i) * cv(i); i += 1 }
              org.apache.spark.sql.Row(sub, code, cv.toSeq, acc)
            }.asJava
          s.createDataFrame(rows, org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("sub", org.apache.spark.sql.types.IntegerType, false),
            org.apache.spark.sql.types.StructField("code", org.apache.spark.sql.types.LongType, false),
            org.apache.spark.sql.types.StructField("cv",
              org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType, false), false),
            org.apache.spark.sql.types.StructField("cvv", org.apache.spark.sql.types.DoubleType, false))))
        }
        if (round == 2) {
          // sub-step breakdown inside one iteration, warm
          val asg = Similarity.assignCodes(subs, booksDf(), keepSv = true)
          timed(s"r$round sub assignCodes noop") {
            asg.write.format("noop").mode("overwrite").save()
          }
          val g1 = asg
            .select(col("sub"), col("code"), col("vec_id"), posexplode(col("sv")))
            .groupBy(col("sub"), col("code"), col("pos"))
            .agg(
              expr("aggregate(array_sort(collect_list(struct(vec_id, col))), 0D, (acc, x) -> acc + x.col)").as("s"),
              count(lit(1)).as("n"))
          timed(s"r$round sub g1 noop") {
            g1.write.format("noop").mode("overwrite").save()
          }
          timed(s"r$round sub full means collect") {
            g1.groupBy(col("sub"), col("code"))
              .agg(expr("transform(array_sort(collect_list(struct(pos, s / n))), x -> x.col2)").as("cv"))
              .collect()
          }
        }
        for (it <- 1 to 2) {
          val means = timed(s"r$round iter$it agg+collect") {
            Similarity.assignCodes(subs, booksDf(), keepSv = true)
              .select(col("sub"), col("code"), col("vec_id"), posexplode(col("sv")))
              .groupBy(col("sub"), col("code"), col("pos"))
              .agg(
                expr("aggregate(array_sort(collect_list(struct(vec_id, col))), 0D, (acc, x) -> acc + x.col)").as("s"),
                count(lit(1)).as("n"))
              .groupBy(col("sub"), col("code"))
              .agg(expr("transform(array_sort(collect_list(struct(pos, s / n))), x -> x.col2)").as("cv"))
              .collect().map(r => ((r.getInt(0), r.getLong(1)), r.getSeq[Double](2).toArray)).toMap
          }
          books = books.map { case (sub, code, cv) => (sub, code, means.getOrElse((sub, code), cv)) }
        }
      }
    }
  }

}
