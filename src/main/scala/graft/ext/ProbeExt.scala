package graft.ext

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Round-13 probe helpers that need private[ext] access. Not part of the
  * driver contract.
  */
object ProbeExt {
  private def timed[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime(); val r = f
    println(f"STAGE $label ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
  }

  /** Step-level timing of the linear-probe fit internals. */
  def probeFitSteps(s: SparkSession, dir: String): Unit = {
    import org.apache.spark.sql.functions._
    graft.cdc.types.GraftFunctions.register(s)
    val docs = graft.cdc.model.Changelog.table(s, dir, "documents")
    val dim = 256
    for (round <- 1 to 2) {
      val feats = timed(s"r$round feats ckpt") {
        docs.select(col("doc_id"),
            when(col("source") === lit("src0"), lit(1.0)).otherwise(lit(0.0)).as("y"),
            split(col("text"), " ").as("w"))
          .where(size(col("w")) >= 2)
          .select(col("doc_id"), col("y"), explode(expr(
            "transform(sequence(1, size(w) - 1), i -> concat(w[i-1], ' ', w[i]))")).as("g"))
          .select(col("doc_id"), col("y"),
            pmod(call_function("graft_fnv64", col("g")), lit(dim.toLong)).as("bucket"))
          .groupBy(col("doc_id"), col("y"), col("bucket"))
          .agg(count(lit(1)).as("c"))
          .localCheckpoint()
      }
      println(s"feats rows=${feats.count()}")
      timed(s"r$round nDocs") { feats.select(col("doc_id")).distinct().count() }
      import s.implicits._
      val w = Array.fill(dim)(0.0)
      val wDf = w.toIndexedSeq.zipWithIndex.map { case (wv, b) => (b.toLong, wv) }.toDF("bucket", "wv")
      def orderedFold(key: Column, term: Column) =
        aggregate(sort_array(collect_list(struct(key, term))), lit(0.0),
          (acc, x) => acc + x.getField("term"))
      val errs = feats.join(broadcast(wDf), Seq("bucket"))
        .select(col("doc_id"), col("y"), col("bucket"), (col("wv") * col("c")).as("term"))
        .groupBy(col("doc_id"), col("y"))
        .agg(orderedFold(col("bucket"), col("term")).as("pred"))
        .select(col("doc_id"), (col("pred") - col("y")).as("err"))
      timed(s"r$round errs noop") { errs.write.format("noop").mode("overwrite").save() }
      timed(s"r$round grads collect") {
        feats.join(errs, Seq("doc_id"))
          .select(col("bucket"), col("doc_id"), (col("err") * col("c")).as("term"))
          .groupBy(col("bucket"))
          .agg(orderedFold(col("doc_id"), col("term")).as("g"))
          .collect()
      }
      timed(s"r$round full query") {
        graft.ext.Curation.linearProbeFitExact(docs, "src0", 256, 2, 0.5).count()
      }
    }
  }

  /** A/B: the kmeans means aggregate with the HOF fold vs graft_sorted_fold. */
  def kmFoldAb(s: SparkSession, dir: String): Unit = {
    graft.cdc.types.GraftFunctions.register(s)
    val emb = graft.cdc.model.Changelog.table(s, dir, "embeddings")
    val base = Similarity.normed(emb).localCheckpoint()
    val cents = Similarity.seedCentroids(base, 8).localCheckpoint()
    val assigned = Similarity.assignCells(Similarity.cellSimilaritiesWith(base, cents))
      .select(col("cell"), col("vec_id"), posexplode(col("vd")))
      .localCheckpoint()
    println(s"assigned rows=${assigned.count()}")
    for (round <- 1 to 2) {
      timed(s"r$round HOF fold collect") {
        assigned.groupBy(col("cell"), col("pos"))
          .agg(expr("aggregate(array_sort(collect_list(struct(vec_id, col))), 0D, (acc, x) -> acc + x.col)").as("s"),
            count(lit(1)).as("n"))
          .groupBy(col("cell"))
          .agg(expr("transform(array_sort(collect_list(struct(pos, s / n))), x -> x.col2)").as("cv"))
          .collect()
      }
      timed(s"r$round sorted_fold collect") {
        assigned.groupBy(col("cell"), col("pos"))
          .agg(call_function("graft_sorted_fold",
              collect_list(struct(col("vec_id"), col("col")))).as("s"),
            count(lit(1)).as("n"))
          .groupBy(col("cell"))
          .agg(expr("transform(array_sort(collect_list(struct(pos, s / n))), x -> x.col2)").as("cv"))
          .collect()
      }
    }
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
