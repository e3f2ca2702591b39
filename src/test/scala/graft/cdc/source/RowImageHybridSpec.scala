package graft.cdc.source

import graft.SparkTestBase
import graft.cdc.model.{RowImage, RowImageQueries}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** The generic hybrid flow must reproduce the direct merge EXACTLY for any
  * chunk plan whose ranges partition the key space — across staggered
  * watermark interleavings, backfill-skip chunks, and watermarks placed
  * before/after all data (the scalar analog is HybridPipelineSpec).
  */
class RowImageHybridSpec extends SparkTestBase {

  private val t = RowImageQueries.lineitemTable

  private def k(p: Long, sk: Long): Column =
    struct(lit(p).as("l_partkey"), lit(sk).as("l_suppkey")).cast(t.keyType)

  // singleton offsets only: sf0.001 has one tied row identity whose winner
  // is nondeterministic on both sides
  private lazy val ir = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("offset"))
    RowImage.decodeEnvelope(
        RowImageQueries.envelope(spark, sfDir)
          .withColumn("_n", count(lit(1)).over(w)).where(col("_n") === 1).drop("_n"),
        t)
      .localCheckpoint()
  }

  private def norm(df: org.apache.spark.sql.DataFrame) =
    df.select(col("l_partkey"), col("l_suppkey"), col("last_offset"),
      col("l_quantity").cast(StringType), col("l_extendedprice").cast(StringType),
      col("l_shipdate").cast(StringType), col("l_shipts").cast(StringType),
      col("l_returnflag"), hex(col("l_flagbin"))).collect().toSet

  test("hybrid == direct merge across chunk plans and watermark interleavings") {
    val direct = norm(RowImage.upsertMaterialize(ir, t))
    val lo = 800L // orderkey 100 * 8 on the offset layout
    val plans: Seq[RowImageHybrid.ChunkPlan] = Seq(
      // staggered brackets per chunk
      Seq((None, Some(k(500, 50)), lo, 3 * lo),
        (Some(k(500, 50)), Some(k(1500, 25)), 5 * lo, 8 * lo),
        (Some(k(1500, 25)), None, 10 * lo, 12 * lo)),
      // middle chunk backfill-skip; outer watermarks at extremes
      Seq((None, Some(k(500, 50)), 0L, 0L),
        (Some(k(500, 50)), Some(k(1500, 25)), 6 * lo, 6 * lo),
        (Some(k(1500, 25)), None, Long.MaxValue / 2, Long.MaxValue / 2)),
      // one unbounded chunk (degenerate single-split plan)
      Seq((None, None, 7 * lo, 9 * lo)))
    plans.zipWithIndex.foreach { case (plan, i) =>
      assert(norm(RowImageHybrid.materialize(ir, t, plan)) == direct,
        s"plan $i diverged from the direct merge")
    }
  }

  test("planner-generated composite boundaries drive the hybrid (full loop)") {
    // the 100 TB path: sampled composite-key boundaries from the keyed
    // planner -> hybrid chunk plan -> result equals the direct merge
    val keys = ir.select(col("key.l_partkey").as("l_partkey"),
      col("key.l_suppkey").as("l_suppkey"))
    val ranges = graft.cdc.split.KeyedChunkPlanner.sampledChunkRanges(
      keys, Seq("l_partkey", "l_suppkey"), n = 4, fraction = 0.5)
    assert(ranges.length == 4)
    val lo = 800L
    val plan = RowImageHybrid.planFromBoundaries(t, ranges,
      i => (lo * (i + 1), lo * (i + 3))) // staggered brackets per chunk
    assert(norm(RowImageHybrid.materialize(ir, t, plan)) ==
      norm(RowImage.upsertMaterialize(ir, t)))
  }
}
