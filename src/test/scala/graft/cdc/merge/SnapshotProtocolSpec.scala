package graft.cdc.merge

import graft.SparkTestBase
import graft.cdc.model.Changelog
import org.apache.spark.sql.functions._

/** T1 equivalence proof (SURVEY.md §7.4 risk 1): chunked snapshot + backfill
  * bracketing must reproduce exactly the state a direct materialization at
  * the high watermark gives, for every chunk, including chunks read "at"
  * different snapshot times (interleaved inserts/updates/deletes simulated
  * by the events ordering).
  */
class SnapshotProtocolSpec extends SparkTestBase {

  private def changelogAt(wm: Long) =
    Changelog.changelog(spark, sfDir).where(col("offset") <= wm)

  /** State of the captured table at offset wm (keys only, op!='d'). */
  private def stateAt(wm: Long) =
    Changelog.upsertMaterialize(
      Changelog.snapshot(spark, sfDir),
      changelogAt(wm)
    )

  test("chunk normalize == direct state at high watermark, per key range") {
    val cl = Changelog.changelog(spark, sfDir)
    val lowWm = 200L
    val highWm = 700L
    // the chunk scan observes the table as of lowWm
    val scannedAll = stateAt(lowWm).select(
      col("pk"), col("last_offset").as("offset"), lit("r").as("op"),
      lit(0L).as("ts_ms"), col("val"),
      lit(null).cast("string").as("props"))

    for ((lo, hi) <- Seq((None, Some(40L)), (Some(40L), Some(90L)), (Some(90L), None))
           .asInstanceOf[Seq[(Option[Long], Option[Long])]]) {
      val got = SnapshotProtocol.normalizeChunk(scannedAll, cl, lowWm, highWm, lo, hi)
        .select("pk", "val").collect().map(r => (r.getLong(0), r.getDouble(1))).toSet

      val expect = stateAt(highWm)
        .where(lo.map(col("pk") >= _).getOrElse(lit(true)) &&
          hi.map(col("pk") < _).getOrElse(lit(true)))
        .select("pk", "val").collect().map(r => (r.getLong(0), r.getDouble(1))).toSet

      assert(got == expect, s"chunk [$lo, $hi) diverged")
    }
  }

  test("backfill skip when low == high watermark returns scan unchanged") {
    val scanned = stateAt(300L).select(
      col("pk"), col("last_offset").as("offset"), lit("r").as("op"),
      lit(0L).as("ts_ms"), col("val"), lit(null).cast("string").as("props"))
    val got = SnapshotProtocol.normalizeChunk(
      scanned, Changelog.changelog(spark, sfDir), 300L, 300L, None, None)
    assert(got.count() == scanned.count())
    assert(got.where(col("op") =!= "r").count() == 0)
  }
}
