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
