package graft.cdc.streaming

import java.util.concurrent.ConcurrentHashMap

import graft.SparkTestBase
import graft.cdc.model.Changelog
import graft.cdc.source.{CdcMicroBatch, CdcSource}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Failover matrix (reference MySqlSourceITCase.java:156-300: TM/JM kills
  * mid-snapshot and mid-binlog): the hybrid snapshot->log pipeline is killed
  * deterministically in each phase — after a batch's rows land but BEFORE
  * its epoch is marked (the worst window a process kill exposes) — then
  * resumed from the same checkpoint. The materialized state must equal the
  * direct batch merge every time: exactly-once, not at-least-once.
  */
class ChaosSpec extends SparkTestBase {

  private def freshDb(prefix: String): String =
    s"jdbc:derby:${java.nio.file.Files.createTempDirectory(prefix).toString}/db;create=true"

  private def stageLog(url: String): Unit = {
    val rows = Changelog.changelog(spark, sfDir)
      .select("offset", "pk", "op", "ts_ms", "val").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3), r.getDouble(4)))
      .sortBy(_._1)
    CdcMicroBatch.appendChangeTable(url, "GRAFT_CHANGELOG", rows.iterator)
  }

  /** Direct batch merge of snapshot ∪ full log — the invariant every chaos
    * run must land on.
    */
  private def expected(): Set[(Long, Double)] =
    Changelog.upsertMaterialize(
        Changelog.snapshot(spark, sfDir), Changelog.changelog(spark, sfDir))
      .select(col("pk"), col("val"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet

  private def sinkState(url: String): Set[(Long, Double)] =
    JdbcUpsertSink.readState(spark, url, "MATERIALIZED").collect()
      .map(r => (r.getLong(0), r.getDouble(3))).toSet

  /** Drive a query until the injected kill takes it down; the failure MUST
    * be the chaos kill, nothing else.
    */
  private def runUntilKilled(q: org.apache.spark.sql.streaming.StreamingQuery): Unit = {
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q.processAllAvailable()
      q.awaitTermination()
    }
    assert(e.getMessage.contains("chaos kill"), s"unexpected failure: ${e.getMessage}")
  }

  /** The snapshot phase as a sink epoch: customer rows at offset -1. */
  private def snapshotBatch(): DataFrame =
    Changelog.snapshot(spark, sfDir)
      .select(col("offset"), col("pk"), col("op"), col("ts_ms"), col("val").as("value"))

  test("kill mid-SNAPSHOT-phase: rows landed, epoch lost; redo converges exactly-once") {
    val logUrl = freshDb("chaos_log"); val tgtUrl = freshDb("chaos_tgt")
    stageLog(logUrl)
    JdbcUpsertSink.createTables(tgtUrl, "MATERIALIZED")

    // the kill: snapshot rows land but the process dies before the ledger
    // mark (simulated by applying rows without marking)
    JdbcUpsertSink.applyRows(snapshotBatch(), tgtUrl, "MATERIALIZED")
    // recovery re-runs the whole snapshot epoch
    JdbcUpsertSink.upsertBatch(snapshotBatch(), -1L, tgtUrl, "MATERIALIZED", "chaos-snap")
    // a second recovery (kill during the first recovery's ledger write) —
    // ledger skip makes it free
    JdbcUpsertSink.upsertBatch(snapshotBatch(), -1L, tgtUrl, "MATERIALIZED", "chaos-snap")

    // then the log phase, undisturbed
    val q = JdbcUpsertSink.start(
      CdcSource.read(spark).option("max-events-per-trigger", 200).loadMicroBatch(logUrl),
      java.nio.file.Files.createTempDirectory("chaos_ckpt").toString,
      tgtUrl, "MATERIALIZED", "chaos")
    q.processAllAvailable(); q.stop()
    assert(sinkState(tgtUrl) == expected())
  }

  test("kill mid-LOG-phase (after rows, before epoch), restart from checkpoint") {
    val logUrl = freshDb("chaos2_log"); val tgtUrl = freshDb("chaos2_tgt")
    stageLog(logUrl)
    val ckpt = java.nio.file.Files.createTempDirectory("chaos2_ckpt").toString
    JdbcUpsertSink.createTables(tgtUrl, "MATERIALIZED")
    JdbcUpsertSink.upsertBatch(snapshotBatch(), -1L, tgtUrl, "MATERIALIZED", "chaos2-snap")

    // chaos sink: on the chosen batch id, land the rows then die before the
    // ledger mark — once per kill id
    val killed = ConcurrentHashMap.newKeySet[Long]()
    def start(killAt: Set[Long]) = CdcSource.read(spark)
      .option("max-events-per-trigger", 150)
      .loadMicroBatch(logUrl)
      .writeStream
      .option("checkpointLocation", ckpt)
      .outputMode("update")
      .foreachBatch { (df: DataFrame, id: Long) =>
        if (killAt.contains(id) && killed.add(id)) {
          JdbcUpsertSink.applyRows(df, tgtUrl, "MATERIALIZED")
          throw new RuntimeException(s"chaos kill at batch $id")
        }
        JdbcUpsertSink.upsertBatch(df, id, tgtUrl, "MATERIALIZED", "chaos2")
      }
      .start()

    // run 1 dies mid-log at batch 1
    runUntilKilled(start(Set(1L)))

    // run 2 replays batch 1 (exactly-once via guards), then dies at batch 3
    runUntilKilled(start(Set(3L)))

    // run 3 drains clean
    val q3 = start(Set.empty)
    q3.processAllAvailable(); q3.stop()

    assert(killed.size == 2, s"chaos kills fired: $killed")
    assert(sinkState(tgtUrl) == expected())

    // the ledger holds each log epoch exactly once
    val conn = java.sql.DriverManager.getConnection(tgtUrl)
    try {
      val st = conn.createStatement()
      try {
        val rs = st.executeQuery(
          "SELECT BATCH_ID, COUNT(*) FROM GRAFT_SINK_EPOCH WHERE SINK_ID = 'chaos2' " +
            "GROUP BY BATCH_ID")
        while (rs.next()) assert(rs.getLong(2) == 1L)
        rs.close()
      } finally st.close()
    } finally conn.close()
  }

  test("kill while the log is still growing: appends between failures stay exactly-once") {
    val logUrl = freshDb("chaos3_log"); val tgtUrl = freshDb("chaos3_tgt")
    val all = Changelog.changelog(spark, sfDir)
      .select("offset", "pk", "op", "ts_ms", "val").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3), r.getDouble(4)))
      .sortBy(_._1)
    val (h1, rest) = all.splitAt(all.length / 3)
    val (h2, h3) = rest.splitAt(rest.length / 2)
    CdcMicroBatch.appendChangeTable(logUrl, "GRAFT_CHANGELOG", h1.iterator)
    val ckpt = java.nio.file.Files.createTempDirectory("chaos3_ckpt").toString
    JdbcUpsertSink.createTables(tgtUrl, "MATERIALIZED")
    JdbcUpsertSink.upsertBatch(snapshotBatch(), -1L, tgtUrl, "MATERIALIZED", "chaos3-snap")

    val killed = ConcurrentHashMap.newKeySet[Long]()
    def start(killAt: Set[Long]) = CdcSource.read(spark)
      .option("max-events-per-trigger", 100)
      .loadMicroBatch(logUrl)
      .writeStream
      .option("checkpointLocation", ckpt)
      .outputMode("update")
      .foreachBatch { (df: DataFrame, id: Long) =>
        if (killAt.contains(id) && killed.add(id)) {
          JdbcUpsertSink.applyRows(df, tgtUrl, "MATERIALIZED")
          throw new RuntimeException(s"chaos kill at batch $id")
        }
        JdbcUpsertSink.upsertBatch(df, id, tgtUrl, "MATERIALIZED", "chaos3")
      }
      .start()

    runUntilKilled(start(Set(0L))) // dies on the very first log batch
    CdcMicroBatch.appendChangeTable(logUrl, "GRAFT_CHANGELOG", h2.iterator)

    runUntilKilled(start(Set(2L)))
    CdcMicroBatch.appendChangeTable(logUrl, "GRAFT_CHANGELOG", h3.iterator)

    val q3 = start(Set.empty)
    q3.processAllAvailable(); q3.stop()
    assert(killed.size == 2)
    assert(sinkState(tgtUrl) == expected())
  }
}
