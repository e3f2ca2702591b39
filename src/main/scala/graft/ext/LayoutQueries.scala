package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.QueryPack
import graft.cdc.model.Changelog.table

/** Z-order layout queries: the clustering value itself and the per-bucket
  * bounding boxes it induces (the file-skipping statistics a lakehouse
  * writer would persist as min/max footer stats). Oracles replay the bit
  * interleave as an explicit 2x16-term shift/mask sum in DuckDB.
  */
object LayoutQueries extends QueryPack {

  private val Bits = 16
  /** 2^12 — collapses the Z-curve into coarse tiles so the bucket stats
    * stay bucket-count-sized at any SF.
    */
  private val Tile = 4096L

  /** The oracle's explicit interleave of (l_partkey, l_suppkey): bit i of
    * partkey -> bit 2i, bit i of suppkey -> bit 2i+1.
    */
  private def zSql: String =
    (0 until Bits).flatMap { i =>
      Seq(s"(((l_partkey >> $i) & 1) << ${2 * i})",
        s"(((l_suppkey >> $i) & 1) << ${2 * i + 1})")
    }.mkString(" + ")

  def queries: Map[String, (SparkSession, String) => DataFrame] = queriesBucketed ++ Map(
    "layout_zorder" -> ((s, dir) => {
      graft.cdc.types.GraftFunctions.register(s)
      table(s, dir, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"),
        Layout.zOrderCol(Seq(col("l_partkey"), col("l_suppkey")), Bits)
          .as("zval"))
    }),

    // per-Z-tile bounding boxes: the min/max footer stats a writer
    // clustered by this value would give every file — BOTH dimensions
    // stay tight, which is the entire point of the interleave
    "layout_zorder_ranges" -> ((s, dir) => {
      graft.cdc.types.GraftFunctions.register(s)
      table(s, dir, "lineitem")
        .groupBy((Layout.zOrderCol(
          Seq(col("l_partkey"), col("l_suppkey")), Bits) / Tile)
          .cast("long").as("tile"))
        .agg(count(lit(1)).as("cnt"),
          min(col("l_partkey")).as("min_pk"), max(col("l_partkey")).as("max_pk"),
          min(col("l_suppkey")).as("min_sk"), max(col("l_suppkey")).as("max_sk"))
    })
  )

  private def stageKey(dir: String): String =
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(dir.getBytes("UTF-8")).take(6).map("%02x".format(_)).mkString

  def queriesBucketed: Map[String, (SparkSession, String) => DataFrame] = Map(
    // co-located join on bucketed layout: both sides staged bucketed by the
    // join key, then the recurring join runs bucket-to-bucket (the
    // BucketedJoinSpec asserts the exchange-free plan; here the driver gate
    // checks the ANSWER matches the plain-join oracle)
    "layout_bucketed_join" -> ((s, dir) => {
      val k = stageKey(dir)
      val liT = s"graft_bk_li_$k"
      val ordT = s"graft_bk_ord_$k"
      // bucket count scales with the LARGER side (one metadata-cheap count
      // probe — parquet footers, no data read): planned bucketed writes
      // hash-repartition into exactly `buckets` sort tasks, so a fixed
      // count makes per-task sort volume grow linearly with the corpus
      // (the 100 TB scale-killer); ~1 M rows per bucket keeps each sorted
      // write in memory at any SF. Both sides share the count so the join
      // stays bucket-to-bucket with no exchange.
      val buckets = math.max(8L,
        table(s, dir, "lineitem").count() / 1000000L).toInt
      Layout.stageBucketed(
        table(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_extendedprice")),
        liT, buckets = buckets, key = "l_orderkey")
      Layout.stageBucketed(
        table(s, dir, "orders")
          .select(col("o_orderkey"), col("o_orderpriority")),
        ordT, buckets = buckets, key = "o_orderkey")
      s.table(liT)
        .join(s.table(ordT), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("cnt"),
          sum(col("l_extendedprice").cast("decimal(14,2)"))
            .cast("string").as("sum_price"))
    })
  )

  def oracles: Map[String, String] = Map(
    "layout_bucketed_join" ->
      """SELECT o_orderpriority, count(*) AS cnt,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(14,2))) AS VARCHAR)
        |         AS sum_price
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority""".stripMargin,
    "layout_zorder" ->
      s"SELECT l_orderkey, l_linenumber, ${zSql} AS zval FROM lineitem",

    "layout_zorder_ranges" ->
      s"""SELECT (${zSql}) // $Tile AS tile, count(*) AS cnt,
         |       min(l_partkey) AS min_pk, max(l_partkey) AS max_pk,
         |       min(l_suppkey) AS min_sk, max(l_suppkey) AS max_sk
         |FROM lineitem GROUP BY 1""".stripMargin
  )
}
