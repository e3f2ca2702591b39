package graft.cdc.source

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.cdc.merge.SnapshotProtocol
import graft.cdc.model.Changelog
import graft.cdc.types.Assigner

/** T8 — the newly-added-tables flow (reference:
  * MySqlSourceITCase.java:156-453 newly-added-tables scenarios;
  * AssignerStatus.java:29-47) composed end-to-end from the engine's own
  * pieces:
  *
  *   1. initial capture list {users_0, users_1}: chunked snapshot observed
  *      at offset `w` (per-chunk watermark brackets via
  *      [[SnapshotProtocol.normalizeChunk]]), then that pair's log tail
  *   2. at offset `p` the capture list grows by users_2
  *      ([[Assigner.diffCaptureList]]); the assigner suspends, snapshots the
  *      new table as of `p`, and wakes up
  *   3. resumed log phase carries users_2 events past `p`
  *
  * The batch-deterministic form below drives the REAL assigner state
  * machine through the same transitions the reference enforces, and its
  * output must equal direct materialization of the full log — which is
  * exactly the oracled `newly_added_tables_materialize` check. The
  * streaming form (checkpoint restart with a widened table filter +
  * new-table snapshot injected through the exactly-once sink) is proven in
  * NewTablesSpec.
  */
object NewTablesFlow {

  /** users_2 membership on the synthetic shard routing (ChangelogOps
    * .tableNameCol): pk % 3.
    */
  private def inTables(tables: Seq[Long]): org.apache.spark.sql.Column =
    pmod(col("pk"), lit(3L)).isin(tables: _*)

  /** Chunk-normalized READ-row state of `part` of the log at watermark `wm`
    * (lowWm == highWm: the backfill-skip branch observes a consistent
    * snapshot), split at `keySplit` so the snapshot phase is genuinely
    * chunked.
    */
  private def snapshotAt(cl: DataFrame, wm: Long, keySplit: Long): DataFrame = {
    val observed = Changelog.upsertMaterialize(cl.limit(0), cl.where(col("offset") <= wm))
      .select(col("pk"), col("last_offset").as("offset"),
        lit(Changelog.OpRead).as("op"), lit(0L).as("ts_ms"), col("val"))
    Seq((None, Some(keySplit)), (Some(keySplit), None))
      .map { case (lo, hi) => SnapshotProtocol.normalizeChunk(observed, cl, wm, wm, lo, hi) }
      .reduce(_ unionByName _)
  }

  /** The two-phase composition: capture {users_0, users_1} snapshotted at
    * `w`, users_2 added and snapshotted at `p`, both log tails streamed in.
    * Returns (pk, last_offset, val) — the same shape as the hybrid flagship.
    */
  def materializeWithLateTable(
      spark: SparkSession,
      sfDir: String,
      w: Long,
      p: Long): DataFrame = {
    require(w <= p, s"initial snapshot offset $w must not exceed the addition offset $p")
    val cl = Changelog.changelog(spark, sfDir).select("offset", "pk", "op", "ts_ms", "val")

    // the reference's legal transition chain, driven for real: initial
    // assigning finishes, the new-table diff suspends the assigner, wakeup
    // starts the newly-added assigning phase, which finishes and suspends
    // back into streaming
    var status: Assigner.Status = Assigner.InitialAssigning
    status = status.onFinish()
    val (newTables, dropped) = Assigner.diffCaptureList(
      alreadyCaptured = Set("users_0", "users_1"),
      discovered = Set("users_0", "users_1", "users_2"))
    require(newTables == Set("users_2") && dropped.isEmpty)
    status = status.suspend().wakeup()
    require(status == Assigner.NewlyAddedAssigning)

    val t01 = cl.where(inTables(Seq(0L, 1L)))
    val t2 = cl.where(inTables(Seq(2L)))

    val initialSnapshot = snapshotAt(t01, w, keySplit = 8L)
    val initialTail = t01.where(col("offset") > w)
    val lateSnapshot = snapshotAt(t2, p, keySplit = 8L)
    status = status.onFinish()
    require(status == Assigner.NewlyAddedAssigningFinished)
    val lateTail = t2.where(col("offset") > p)

    Changelog.upsertMaterialize(
        initialSnapshot.unionByName(lateSnapshot),
        initialTail.unionByName(lateTail))
      .select(col("pk"), col("last_offset"), col("val"))
  }
}
