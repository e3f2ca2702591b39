package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout for file-level skipping at 100 TB.
  *
  * A table range-partitioned by ONE key keeps that key's per-file min/max
  * tight and every other key's full-range — predicates on the other keys
  * prune nothing. Interleaving the keys' bits (Morton / Z-order, the
  * `graft_zorder` codegen expression) and range-partitioning + sorting by
  * the interleaved value bounds EVERY key's per-file extent, so a scan
  * with a predicate on ANY clustered dimension skips most files. This is
  * layout-time work: one range-exchange over the data being (re)written,
  * zero cost at read time.
  */
object Layout {

  /** The Z-order clustering value of `keys` (long-castable columns), using
    * the low `bits` bits of each. Whole-stage-codegen'd.
    */
  def zOrderCol(keys: Seq[Column], bits: Int): Column = {
    require(keys.nonEmpty && keys.size * bits <= 63,
      s"need 1..n keys with n*bits <= 63, got n=${keys.size} bits=$bits")
    call_function("graft_zorder",
      array(keys.map(_.cast("long")): _*), lit(bits))
  }

  /** Cluster `df` for multi-dimensional skipping: range-partition into
    * `numPartitions` by the Z-value of `keyCols` and sort within each
    * partition by it — the exact shape a 100 TB rewrite job wants (one
    * range exchange computes balanced Z-ranges via Spark's sampled
    * RangePartitioner; each output file then covers a tight hyper-box of
    * the key space). The helper column is dropped before return.
    *
    * Keys are first NORMALIZED to the full `bits` width from their
    * min/max (one 1-row aggregate — a planner probe, like the chunk
    * planner's analyze): raw interleaving LSB-aligns unequal domains, so
    * a low-cardinality dimension contributes no high bits and the curve
    * degenerates to single-key range order. Rescaling is the same move
    * lakehouse Z-order writers make by range-ranking each column.
    */
  def clusterByZOrder(
      df: DataFrame,
      keyCols: Seq[String],
      bits: Int,
      numPartitions: Int
  ): DataFrame = {
    graft.cdc.types.GraftFunctions.register(df.sparkSession)
    val aggs = keyCols.flatMap(k =>
      Seq(min(col(k).cast("long")).as(s"mn_$k"), max(col(k).cast("long")).as(s"mx_$k")))
    val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    val top = (1L << bits) - 1
    val scaled = keyCols.zipWithIndex.map { case (k, i) =>
      val mn = row.getLong(2 * i)
      val mx = row.getLong(2 * i + 1)
      if (mx == mn) lit(0L)
      else expr(s"(CAST($k AS BIGINT) - ${mn}L) * ${top}L div ${mx - mn}L")
    }
    val z = "__graft_z"
    df.withColumn(z, zOrderCol(scaled, bits))
      .repartitionByRange(numPartitions, col(z))
      .sortWithinPartitions(col(z))
      .drop(z)
  }

  /** Stage `df` as a BUCKETED, bucket-sorted table (hash-partitioned into
    * `buckets` files by `key`, sorted by `key` within each) — the layout
    * that makes every later equi-join/aggregation on `key` between
    * co-bucketed tables SHUFFLE-FREE: both sides' bucket i hold the same
    * key hashes, so Spark joins bucket-to-bucket with no exchange. At
    * 100 TB this converts the recurring join's full network pass into a
    * one-time layout cost. Idempotent per session (keyed by the catalog
    * name); `saveAsTable` is required because bucketing lives in catalog
    * metadata, not the parquet files.
    */
  def stageBucketed(
      df: DataFrame,
      tableName: String,
      buckets: Int,
      key: String
  ): Unit = {
    val spark = df.sparkSession
    if (!spark.catalog.tableExists(tableName)) {
      // the in-memory catalog forgets tables across sessions but their
      // warehouse directories survive — clear our own stale staging dir
      // or the CREATE fails with LOCATION_ALREADY_EXISTS
      val wh = spark.conf.get("spark.sql.warehouse.dir")
      val path = new org.apache.hadoop.fs.Path(wh, tableName.toLowerCase)
      val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(path)) fs.delete(path, true)
      df.write
        .bucketBy(buckets, key)
        .sortBy(key)
        .mode("overwrite")
        .format("parquet")
        .saveAsTable(tableName)
    }
  }
}
