package graft.cdc.source

import graft.SparkTestBase
import graft.cdc.model.Changelog
import graft.cdc.streaming.JdbcUpsertSink
import graft.cdc.types.Assigner
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** T8 end-to-end, streaming form (reference MySqlSourceITCase.java:156-453):
  * a checkpointed micro-batch stream captures {users_0, users_1}; users_2 is
  * added mid-flight — the assigner suspends, the new table is snapshotted as
  * of the suspension offset and injected through the exactly-once sink, and
  * the SAME checkpoint resumes with the widened capture list. The final
  * sink state must equal a from-scratch run capturing all three tables.
  */
class NewTablesSpec extends SparkTestBase {

  private def freshDb(prefix: String): String =
    s"jdbc:derby:${java.nio.file.Files.createTempDirectory(prefix).toString}/db;create=true"

  test("add users_2 mid-stream, resume from checkpoint: state equals from-scratch run") {
    val logUrl = freshDb("nt_log")
    val tgtUrl = freshDb("nt_tgt")
    val ckpt = java.nio.file.Files.createTempDirectory("nt_ckpt").toString

    // the full event history, split at 60%: the head is "before users_2 was
    // added", the tail arrives after the capture-list change
    val all = Changelog.changelog(spark, sfDir)
      .select("offset", "pk", "op", "ts_ms", "val").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3), r.getDouble(4)))
      .sortBy(_._1)
    val (head, tail) = all.splitAt((all.length * 6) / 10)
    CdcMicroBatch.appendChangeTable(logUrl, "GRAFT_CHANGELOG", head.iterator)

    // the capture list is the SOURCE's table-name include regex — the late
    // table arrives through the stream itself (reader-side filter over the
    // one tagged log), not a plan-level splice
    def stream(tableRe: String) = CdcSource.read(spark)
      .option("max-events-per-trigger", 100)
      .option("table-name", tableRe)
      .loadMicroBatch(logUrl)

    var status: Assigner.Status = Assigner.InitialAssigning
    status = status.onFinish()

    // phase 1: capture {users_0, users_1}, drain the head
    JdbcUpsertSink.createTables(tgtUrl, "MATERIALIZED")
    val q1 = JdbcUpsertSink.start(stream("^users_[01]$"), ckpt, tgtUrl, "MATERIALIZED", "nt")
    q1.processAllAvailable(); q1.stop()

    // capture-list change: users_2 appears
    val (newTables, dropped) = Assigner.diffCaptureList(
      Set("users_0", "users_1"), Set("users_0", "users_1", "users_2"))
    assert(newTables == Set("users_2") && dropped.isEmpty)
    status = status.suspend()
    assert(status == Assigner.Suspended)
    status = status.wakeup()
    assert(status == Assigner.NewlyAddedAssigning)

    // new-table snapshot at the suspension offset (= the drained head's
    // end): users_2's state materialized from the log prefix, injected as
    // one idempotent sink epoch (a batch id disjoint from the stream's)
    val suspensionOffset = head.map(_._1).max
    val t2Snapshot = Changelog.upsertMaterialize(
        Changelog.changelog(spark, sfDir).limit(0),
        Changelog.changelog(spark, sfDir)
          .where(pmod(col("pk"), lit(3L)) === 2L && col("offset") <= suspensionOffset))
      .select(col("last_offset").as("offset"), col("pk"),
        col("last_op").as("op"), lit(0L).as("ts_ms"), col("val").as("value"))
    JdbcUpsertSink.upsertBatch(t2Snapshot, Long.MaxValue, tgtUrl, "MATERIALIZED", "nt-snap")
    status = status.onFinish()
    assert(status == Assigner.NewlyAddedAssigningFinished)

    // the world kept moving: post-addition events land in the log
    CdcMicroBatch.appendChangeTable(logUrl, "GRAFT_CHANGELOG", tail.iterator)

    // phase 2: SAME checkpoint, widened capture list {0, 1, 2}
    val q2 = JdbcUpsertSink.start(stream("^users_[012]$"), ckpt, tgtUrl, "MATERIALIZED", "nt")
    q2.processAllAvailable(); q2.stop()

    val got = JdbcUpsertSink.readState(spark, tgtUrl, "MATERIALIZED").collect()
      .map(r => (r.getLong(0), r.getDouble(3))).toSet

    // from-scratch run over the full log capturing all three tables
    val expect = Changelog.upsertMaterialize(
        Changelog.changelog(spark, sfDir).limit(0),
        Changelog.changelog(spark, sfDir))
      .select(col("pk"), col("val"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet

    assert(got == expect)
    assert(got.nonEmpty)
  }

  test("add tables TWICE (users_1 then users_2), resuming the same checkpoint each round") {
    // reference matrix: MySqlSourceITCase's testNewlyAddedTable* scenarios
    // add tables in multiple rounds against one running job; each round is
    // suspend -> snapshot-as-of -> wakeup with a widened capture list
    val logUrl = freshDb("nt2_log")
    val tgtUrl = freshDb("nt2_tgt")
    val ckpt = java.nio.file.Files.createTempDirectory("nt2_ckpt").toString

    val all = Changelog.changelog(spark, sfDir)
      .select("offset", "pk", "op", "ts_ms", "val").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3), r.getDouble(4)))
      .sortBy(_._1)
    val (head1, rest) = all.splitAt((all.length * 4) / 10)
    val (head2, tail) = rest.splitAt((all.length * 3) / 10)

    def stream(tableRe: String) = CdcSource.read(spark)
      .option("max-events-per-trigger", 100)
      .option("table-name", tableRe)
      .loadMicroBatch(logUrl)

    def snapshotInto(tableMod: Long, asOf: Long, sinkId: String): Unit = {
      val snap = Changelog.upsertMaterialize(
          Changelog.changelog(spark, sfDir).limit(0),
          Changelog.changelog(spark, sfDir)
            .where(pmod(col("pk"), lit(3L)) === tableMod && col("offset") <= asOf))
        .select(col("last_offset").as("offset"), col("pk"),
          col("last_op").as("op"), lit(0L).as("ts_ms"), col("val").as("value"))
      JdbcUpsertSink.upsertBatch(snap, Long.MaxValue, tgtUrl, "MATERIALIZED", sinkId)
    }

    // phase 1: {users_0} only
    CdcMicroBatch.appendChangeTable(logUrl, "GRAFT_CHANGELOG", head1.iterator)
    JdbcUpsertSink.createTables(tgtUrl, "MATERIALIZED")
    val q1 = JdbcUpsertSink.start(stream("^users_[0]$"), ckpt, tgtUrl, "MATERIALIZED", "nt2")
    q1.processAllAvailable(); q1.stop()

    // round A: users_1 appears — suspend, snapshot as of the drained head,
    // wake up with the widened list
    var status: Assigner.Status = Assigner.InitialAssigning
    status = status.onFinish().suspend().wakeup()
    assert(status == Assigner.NewlyAddedAssigning)
    snapshotInto(1L, head1.map(_._1).max, "nt2-snap1")
    status = status.onFinish()
    assert(status == Assigner.NewlyAddedAssigningFinished)
    CdcMicroBatch.appendChangeTable(logUrl, "GRAFT_CHANGELOG", head2.iterator)
    val q2 = JdbcUpsertSink.start(stream("^users_[01]$"), ckpt, tgtUrl, "MATERIALIZED", "nt2")
    q2.processAllAvailable(); q2.stop()

    // round B: users_2 appears — the SAME suspend/snapshot/wakeup cycle
    // again, from the streaming state round A left behind
    status = status.suspend().wakeup()
    assert(status == Assigner.NewlyAddedAssigning)
    snapshotInto(2L, (head1 ++ head2).map(_._1).max, "nt2-snap2")
    status = status.onFinish()
    assert(status == Assigner.NewlyAddedAssigningFinished)
    CdcMicroBatch.appendChangeTable(logUrl, "GRAFT_CHANGELOG", tail.iterator)
    val q3 = JdbcUpsertSink.start(stream("^users_[012]$"), ckpt, tgtUrl, "MATERIALIZED", "nt2")
    q3.processAllAvailable(); q3.stop()

    val got = JdbcUpsertSink.readState(spark, tgtUrl, "MATERIALIZED").collect()
      .map(r => (r.getLong(0), r.getDouble(3))).toSet
    val expect = Changelog.upsertMaterialize(
        Changelog.changelog(spark, sfDir).limit(0),
        Changelog.changelog(spark, sfDir))
      .select(col("pk"), col("val"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(got == expect)
    assert(got.nonEmpty)
  }

  test("new table snapshotted AHEAD of the stream position: replayed window is suppressed") {
    // reference scenario: the newly-added table's snapshot watermark can be
    // ahead of the binlog offset the stream resumes from — the resumed
    // stream then REDELIVERS the new table's events at offsets at or below
    // the snapshot watermark, and exactly-once requires the sink's offset
    // guard to make that whole window a no-op (the low-watermark emit
    // filter of the snapshot-backfill protocol, seen from the sink side)
    val logUrl = freshDb("nta_log")
    val tgtUrl = freshDb("nta_tgt")
    val ckpt = java.nio.file.Files.createTempDirectory("nta_ckpt").toString

    val all = Changelog.changelog(spark, sfDir)
      .select("offset", "pk", "op", "ts_ms", "val").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3), r.getDouble(4)))
      .sortBy(_._1)
    val (head, tail) = all.splitAt((all.length * 6) / 10)
    // the snapshot watermark sits at the 80% offset — STRICTLY AHEAD of the
    // drained head the stream will resume from
    val aheadWm = all((all.length * 8) / 10 - 1)._1
    assert(aheadWm > head.map(_._1).max)
    CdcMicroBatch.appendChangeTable(logUrl, "GRAFT_CHANGELOG", head.iterator)

    def stream(tableRe: String) = CdcSource.read(spark)
      .option("max-events-per-trigger", 100)
      .option("table-name", tableRe)
      .loadMicroBatch(logUrl)

    JdbcUpsertSink.createTables(tgtUrl, "MATERIALIZED")
    val q1 = JdbcUpsertSink.start(stream("^users_[01]$"), ckpt, tgtUrl, "MATERIALIZED", "nta")
    q1.processAllAvailable(); q1.stop()

    // users_2 snapshot as of aheadWm: the source table's live state already
    // contains events the stream has not seen yet
    val t2Snapshot = Changelog.upsertMaterialize(
        Changelog.changelog(spark, sfDir).limit(0),
        Changelog.changelog(spark, sfDir)
          .where(pmod(col("pk"), lit(3L)) === 2L && col("offset") <= aheadWm))
      .select(col("last_offset").as("offset"), col("pk"),
        col("last_op").as("op"), lit(0L).as("ts_ms"), col("val").as("value"))
    JdbcUpsertSink.upsertBatch(t2Snapshot, Long.MaxValue, tgtUrl, "MATERIALIZED", "nta-snap")

    // the log fills in; the resumed widened stream replays users_2 events in
    // (head_end, aheadWm] that the snapshot already folded — each lands on
    // the sink with LAST_OFFSET >= its offset and must change nothing
    CdcMicroBatch.appendChangeTable(logUrl, "GRAFT_CHANGELOG", tail.iterator)
    val q2 = JdbcUpsertSink.start(stream("^users_[012]$"), ckpt, tgtUrl, "MATERIALIZED", "nta")
    q2.processAllAvailable(); q2.stop()

    val got = JdbcUpsertSink.readState(spark, tgtUrl, "MATERIALIZED").collect()
      .map(r => (r.getLong(0), r.getDouble(3))).toSet
    val expect = Changelog.upsertMaterialize(
        Changelog.changelog(spark, sfDir).limit(0),
        Changelog.changelog(spark, sfDir))
      .select(col("pk"), col("val"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(got == expect)
    assert(got.nonEmpty)
  }

  test("batch form equals direct materialization at several (w, p) cut points") {
    for ((w, p) <- Seq((0L, 0L), (100L, 400L), (300L, 300L), (500L, 900L))) {
      val got = NewTablesFlow.materializeWithLateTable(spark, sfDir, w, p)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val expect = Changelog.upsertMaterialize(
          Changelog.changelog(spark, sfDir).limit(0),
          Changelog.changelog(spark, sfDir))
        .select(col("pk"), col("last_offset"), col("val"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got == expect, s"mismatch at (w=$w, p=$p)")
    }
  }

  test("illegal assigner transitions for the new-tables flow stay illegal") {
    intercept[IllegalStateException](Assigner.InitialAssigning.suspend())
    intercept[IllegalStateException](Assigner.Suspended.onFinish())
    intercept[IllegalStateException](Assigner.NewlyAddedAssigning.suspend())
  }
}
