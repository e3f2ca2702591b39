package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`Array[Float]`).
  *
  * Scale design: the query set is small and broadcast, so brute force is a
  * BroadcastNestedLoopJoin — each executor scans its partition of the corpus
  * once (embarrassingly parallel, no shuffle of the corpus). The LSH variant
  * replaces the corpus scan with a bucket equi-join for corpus-sized query
  * sets.
  *
  * The cosine inner product is `graft_dot`, a native codegen'd expression
  * ([[graft.cdc.types.DotProduct]]) computing the same sequential double
  * fold as the `aggregate(zip_with(...))` HOF form (bit-identical, so the
  * DuckDB oracles are unchanged) at compiled-loop speed. Embeddings are
  * cast to double arrays once per row, below the join, never per pair.
  */
object Similarity {

  /** Cast a float embedding column to array<double> (exact widening). */
  private[ext] def toDouble(a: String): Column =
    expr(s"transform($a, x -> CAST(x AS DOUBLE))")

  private[ext] def dot(a: Column, b: Column): Column =
    call_function("graft_dot", a, b)

  private[ext] def norm(vd: Column): Column = sqrt(dot(vd, vd))

  /** vec_id + double embedding + its L2 norm — the per-row base every
    * variant builds its sides from.
    */
  private def normed(emb: DataFrame): DataFrame = {
    graft.cdc.types.GraftFunctions.register(emb.sparkSession)
    emb.select(col("vec_id"), toDouble("embedding").as("vd"))
      .withColumn("nrm", norm(col("vd")))
  }

  /** Brute-force cosine top-k: for each query vector (vec_id < nQueries),
    * the k nearest corpus vectors. Rank ties broken by neighbor id for
    * determinism.
    */
  def bruteForceTopK(emb: DataFrame, nQueries: Int, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = normed(emb)
    val q = base.where(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("vd").as("qv"), col("nrm").as("qnorm"))
    val n = base.select(col("vec_id").as("nid"), col("vd").as("nv"), col("nrm").as("nnorm"))
    val scored = n.crossJoin(broadcast(q))
      .where(col("qid") =!= col("nid"))
      .withColumn("sim", dot(col("qv"), col("nv")) / (col("qnorm") * col("nnorm")))
    scored
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("nid"))))
      .where(col("rank") <= k)
      .select(col("qid"), col("nid"), col("rank"), col("sim"))
  }

  /** IVF (inverted-file) ANN: corpus vectors are assigned to the nearest of
    * `nCells` centroids learned by KMeans (fixed seed); a query probes its
    * own cell plus the `nProbe`-nearest cells and re-ranks exactly inside
    * them. The cell assignment is the partition key — the search is an
    * equi-join on cell id, the classic IVF shape that scales to corpus-sized
    * query sets where the broadcast brute force cannot.
    */
  def ivfTopK(
      emb: DataFrame,
      nCells: Int,
      nProbe: Int,
      nQueries: Int,
      k: Int
  ): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.linalg.{Vector => MlVector, Vectors}
    import org.apache.spark.sql.expressions.Window

    val spark = emb.sparkSession
    import spark.implicits._
    graft.cdc.types.GraftFunctions.register(spark)

    val toVec = udf((a: Seq[Float]) => Vectors.dense(a.map(_.toDouble).toArray))
    val feat = emb.select(col("vec_id"), col("embedding"), toVec(col("embedding")).as("features"))
    // random init + few iterations: cell quality only affects recall (the
    // probe union below keeps correctness), and kmeans|| init costs more
    // scheduler round trips than the clustering itself at this scale
    val model = new KMeans().setK(nCells).setSeed(42L).setMaxIter(5)
      .setInitMode("random").fit(feat)
    val centroids = model.clusterCenters.zipWithIndex.map { case (c, i) => (i, c.toArray) }

    // nProbe nearest cells per centroid-assigned point, computed driver-side
    // over the tiny centroid set and broadcast as a lookup
    def nearestCells(v: Array[Double], n: Int): Seq[Int] =
      centroids.sortBy { case (_, c) =>
        -c.zip(v).map { case (x, y) => x * y }.sum /
          (math.sqrt(c.map(x => x * x).sum) * math.sqrt(v.map(x => x * x).sum) + 1e-12)
      }.take(n).map(_._1).toSeq

    val assigned = model.transform(feat)
      .select(col("vec_id"), col("embedding"), col("prediction").as("cell"))
      .withColumn("vd", toDouble("embedding"))
      .withColumn("nrm", norm(col("vd")))
    val probeCells = udf((a: Seq[Float]) =>
      nearestCells(a.map(_.toDouble).toArray, nProbe))
    // probe set = the query's OWN (Euclidean-)assigned cell plus the
    // nProbe cosine-nearest centroids — without the union the metric
    // mismatch could leave the query's home cell (and its co-residents)
    // unscanned
    val q = assigned.where(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("vd").as("qv"), col("nrm").as("qnorm"),
        explode(array_distinct(concat(
          array(col("cell")), probeCells(col("embedding"))))).as("cell"))
    val n = assigned.select(col("vec_id").as("nid"), col("vd").as("nv"),
      col("nrm").as("nnorm"), col("cell"))
    n.join(broadcast(q), Seq("cell"))
      .where(col("qid") =!= col("nid"))
      .withColumn("sim", dot(col("qv"), col("nv")) / (col("qnorm") * col("nnorm")))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("nid"))))
      .where(col("rank") <= k)
      .select(col("qid"), col("nid"), col("cell"), col("rank"), col("sim"))
  }

  /** Random-hyperplane LSH bucketing: `nPlanes` sign bits per vector
    * (hyperplane components are deterministic ±1 from graft_mix64 parity),
    * bucket = packed bits. Candidates are same-bucket pairs — a shuffle by
    * bucket key, never a cross join. Exact cosine re-ranks within buckets.
    */
  def lshTopK(emb: DataFrame, nPlanes: Int, nQueries: Int, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    graft.cdc.types.GraftFunctions.register(emb.sparkSession)
    // sequence is sized from the vector itself — a fixed length would null-
    // pad zip_with for other dimensions and collapse every vector into
    // bucket 0. Hyperplane component signs come from the engine-replicable
    // graft_mix64 parity (not Spark murmur) so the operator keeps a DuckDB
    // oracle. Stays a HOF (not graft_dot against a constant plane) because
    // the plane adapts to each vector's dimension.
    val bit = (j: Int) =>
      when(expr(
        s"""aggregate(zip_with(vd, sequence(0, size(vd) - 1),
           |  (x, i) -> x * CASE WHEN (graft_mix64(i, ${j}L) & 1L) = 0L THEN 1D ELSE -1D END),
           |  0D, (acc, z) -> acc + z)""".stripMargin) > 0, lit(1L << j)).otherwise(lit(0L))
    val bucketCol = (0 until nPlanes).map(bit).reduce((a, b) => a.bitwiseOR(b))
    val bucketed = normed(emb).select(col("vec_id"), col("vd"), col("nrm"))
      .withColumn("bucket", bucketCol)
    val q = bucketed.where(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("vd").as("qv"),
        col("bucket"), col("nrm").as("qnorm"))
    val n = bucketed.select(col("vec_id").as("nid"), col("vd").as("nv"),
      col("bucket"), col("nrm").as("nnorm"))
    n.join(broadcast(q), Seq("bucket"))
      .where(col("qid") =!= col("nid"))
      .withColumn("sim", dot(col("qv"), col("nv")) / (col("qnorm") * col("nnorm")))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("nid"))))
      .where(col("rank") <= k)
      .select(col("qid"), col("nid"), col("bucket"), col("rank"), col("sim"))
  }
}
