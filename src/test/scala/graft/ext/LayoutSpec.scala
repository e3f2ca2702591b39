package graft.ext

import graft.SparkTestBase
import graft.cdc.model.Changelog
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkTestBase {

  test("zorder interleaves bits LSB-first across dimensions") {
    graft.cdc.types.GraftFunctions.register(spark)
    val s = spark
    import s.implicits._
    // d0=5 (101), d1=3 (011), 3 bits: positions (0,2,4) from d0 bits
    // (1,0,1), positions (1,3,5) from d1 bits (1,1,0) -> 1+2+8+16 = 27
    val got = Seq((5L, 3L)).toDF("a", "b")
      .select(Layout.zOrderCol(Seq(col("a"), col("b")), 3)).collect()(0).getLong(0)
    assert(got == 27L)
    // single dimension degenerates to the identity on the low bits
    val one = Seq(Tuple1(41L)).toDF("a")
      .select(Layout.zOrderCol(Seq(col("a")), 6)).collect()(0).getLong(0)
    assert(one == 41L)
    // monotone in each dimension holding the other at zero
    val zs = Seq(1L, 2L, 3L, 4L).map(v =>
      Seq((v, 0L)).toDF("a", "b")
        .select(Layout.zOrderCol(Seq(col("a"), col("b")), 8))
        .collect()(0).getLong(0))
    assert(zs == zs.sorted && zs.distinct == zs)
  }

  test("zorder is a bijection: slow per-bit deinterleave recovers every key") {
    graft.cdc.types.GraftFunctions.register(spark)
    val s = spark
    import s.implicits._
    // independent slow reference: read bit i*n+d of z back into key d
    def deinterleave(z: Long, n: Int, bits: Int): Seq[Long] =
      (0 until n).map { d =>
        (0 until bits).foldLeft(0L) { (acc, i) =>
          acc | (((z >>> (i * n + d)) & 1L) << i)
        }
      }
    val rnd = new scala.util.Random(42)
    val triples = Seq.fill(200)((
      rnd.nextLong() & 0xFFFFFL, rnd.nextLong() & 0xFFFFFL, rnd.nextLong() & 0xFFFFFL))
    val zs = triples.toDF("a", "b", "c")
      .select(col("a"), col("b"), col("c"),
        Layout.zOrderCol(Seq(col("a"), col("b"), col("c")), 20).as("z"))
      .collect()
    zs.foreach { r =>
      assert(deinterleave(r.getLong(3), 3, 20) ==
        Seq(r.getLong(0), r.getLong(1), r.getLong(2)))
    }
  }

  test("co-bucketed tables join without a shuffle exchange") {
    val li = Changelog.table(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_extendedprice"))
    val ord = Changelog.table(spark, sfDir, "orders")
      .select(col("o_orderkey"), col("o_orderpriority"))
    Layout.stageBucketed(li, "bkt_li_spec", 8, "l_orderkey")
    Layout.stageBucketed(ord, "bkt_ord_spec", 8, "o_orderkey")
    // force the sort-merge path (broadcast would hide the bucketing)
    val thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("bkt_li_spec")
        .join(spark.table("bkt_ord_spec"), col("l_orderkey") === col("o_orderkey"))
      val exec = joined.queryExecution.executedPlan
      val exchanges = exec.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }
      assert(exchanges.isEmpty,
        s"bucket-to-bucket join must not exchange:\n$exec")
      // and the answer matches the plain (shuffled) join
      val plain = li.join(ord, col("l_orderkey") === col("o_orderkey")).count()
      assert(joined.count() == plain)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
  }

  test("z-clustering bounds EVERY dimension's per-partition extent") {
    val li = Changelog.table(spark, sfDir, "lineitem")
      .select(col("l_partkey"), col("l_suppkey"))
    val full = li.agg(
      (max("l_partkey") - min("l_partkey")).as("pk"),
      (max("l_suppkey") - min("l_suppkey")).as("sk")).collect()(0)
    val (fullPk, fullSk) = (full.getLong(0).toDouble, full.getLong(1).toDouble)

    val clustered = Layout.clusterByZOrder(
      li, Seq("l_partkey", "l_suppkey"), bits = 16, numPartitions = 8)
    assert(clustered.rdd.getNumPartitions == 8)
    assert(clustered.count() == li.count())
    // per-partition bounding boxes (what parquet footers would carry)
    val boxes = clustered
      .withColumn("part", spark_partition_id())
      .groupBy("part")
      .agg((max("l_partkey") - min("l_partkey")).cast("double").as("pk"),
        (max("l_suppkey") - min("l_suppkey")).cast("double").as("sk"))
      .collect()
    val avgPk = boxes.map(_.getDouble(1)).sum / boxes.length
    val avgSk = boxes.map(_.getDouble(2)).sum / boxes.length
    // range-partitioning by ONE key would leave the OTHER key's extent at
    // ~100% per partition; the interleave must shrink BOTH on average
    assert(avgPk < fullPk * 0.8, s"partkey extent $avgPk vs full $fullPk")
    assert(avgSk < fullSk * 0.8, s"suppkey extent $avgSk vs full $fullSk")
  }
}
