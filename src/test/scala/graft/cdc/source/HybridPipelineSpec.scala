package graft.cdc.source

import graft.SparkTestBase
import graft.cdc.model.Changelog
import org.apache.spark.sql.functions._

/** The hybrid pipeline (chunked snapshot + per-chunk watermarks + emit-
  * filtered log phase) must land in exactly the state a direct
  * materialization of the full changelog gives — the reference's
  * exactly-once guarantee (T2), under interleaved per-chunk watermarks.
  */
class HybridPipelineSpec extends SparkTestBase {

  private def direct() =
    Changelog.upsertMaterialize(
      Changelog.snapshot(spark, sfDir),
      Changelog.changelog(spark, sfDir)
    ).select(col("pk"), col("last_offset"), col("val"))

  private def collectSet(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("pipeline output equals direct materialization (default interleaving)") {
    val got = collectSet(HybridPipeline.materialize(spark, sfDir))
    val expect = collectSet(direct())
    assert(got == expect)
    assert(got.nonEmpty)
  }

  test("holds under other chunk geometries and watermark interleavings") {
    val plans: Seq[HybridPipeline.ChunkPlan] = Seq(
      // single unbounded chunk
      Seq((None, None, 100L, 300L)),
      // many small ranges, non-monotone watermarks (chunks finished out of order)
      Seq(
        (None, Some(3L), 500L, 600L),
        (Some(3L), Some(6L), 100L, 120L),
        (Some(6L), Some(9L), 800L, 900L),
        (Some(9L), None, 0L, 50L)
      ),
      // low == high on one chunk (backfill skip path)
      Seq((None, Some(8L), 400L, 400L), (Some(8L), None, 200L, 350L))
    )
    val expect = collectSet(direct())
    for (p <- plans)
      assert(collectSet(HybridPipeline.materialize(spark, sfDir, p)) == expect,
        s"plan $p diverged")
  }
}
