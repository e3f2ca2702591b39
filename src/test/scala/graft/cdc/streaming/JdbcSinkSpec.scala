package graft.cdc.streaming

import graft.SparkTestBase
import graft.cdc.model.Changelog
import graft.cdc.source.{CdcMicroBatch, CdcSource}
import org.apache.spark.sql.functions._

/** The exactly-once JDBC sink, end-to-end: Derby change log -> DataSourceV2
  * micro-batch stream -> offset-guarded upserts + epoch ledger -> Derby
  * state table, compared against the batch materialization. The replay and
  * crash-window cases are driven explicitly.
  */
class JdbcSinkSpec extends SparkTestBase {

  private def freshDb(prefix: String): String =
    s"jdbc:derby:${java.nio.file.Files.createTempDirectory(prefix).toString}/db;create=true"

  private def stageLog(url: String): Unit = {
    val rows = Changelog.changelog(spark, sfDir)
      .select("offset", "pk", "op", "ts_ms", "val").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3), r.getDouble(4)))
      .sortBy(_._1)
    CdcMicroBatch.appendChangeTable(url, "GRAFT_CHANGELOG", rows.iterator)
  }

  private def expectedState(): Set[(Long, Long, String, Double)] =
    Changelog.upsertMaterialize(
        Changelog.changelog(spark, sfDir).limit(0),
        Changelog.changelog(spark, sfDir))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3)))
      .toSet

  private def sinkState(url: String, table: String): Set[(Long, Long, String, Double)] =
    JdbcUpsertSink.readState(spark, url, table).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3)))
      .toSet

  test("stream -> sink materialization equals the batch merge (exactly-once e2e)") {
    val logUrl = freshDb("sink_log")
    val tgtUrl = freshDb("sink_tgt")
    stageLog(logUrl)
    val q = JdbcUpsertSink.start(
      CdcSource.read(spark).option("max-events-per-trigger", 150).loadMicroBatch(logUrl),
      java.nio.file.Files.createTempDirectory("sink_ckpt").toString,
      tgtUrl, "MATERIALIZED", "e2e")
    q.processAllAvailable()
    q.stop()
    assert(sinkState(tgtUrl, "MATERIALIZED") == expectedState())
  }

  test("duplicate-epoch replay and crash-window re-run are both no-ops") {
    val tgtUrl = freshDb("replay_tgt")
    JdbcUpsertSink.createTables(tgtUrl, "MATERIALIZED")
    val batch = Changelog.changelog(spark, sfDir)
      .select(col("offset"), col("pk"), col("op"), col("ts_ms"), col("val").as("value"))

    JdbcUpsertSink.upsertBatch(batch, 0L, tgtUrl, "MATERIALIZED", "replay")
    val after1 = sinkState(tgtUrl, "MATERIALIZED")
    assert(after1 == expectedState())

    // ledger skip: same batch id again
    JdbcUpsertSink.upsertBatch(batch, 0L, tgtUrl, "MATERIALIZED", "replay")
    assert(sinkState(tgtUrl, "MATERIALIZED") == after1)

    // crash window: rows landed but the ledger mark was lost -> the batch
    // re-runs fully and the offset guard makes every row a no-op
    val conn = java.sql.DriverManager.getConnection(tgtUrl)
    try {
      val st = conn.createStatement()
      try st.executeUpdate("DELETE FROM GRAFT_SINK_EPOCH WHERE SINK_ID = 'replay'")
      finally st.close()
    } finally conn.close()
    JdbcUpsertSink.upsertBatch(batch, 0L, tgtUrl, "MATERIALIZED", "replay")
    assert(sinkState(tgtUrl, "MATERIALIZED") == after1)

    // stale redelivery: an old prefix of the log arrives again as a later
    // epoch — offsets are behind the stored state, nothing may regress
    val stale = batch.where(col("offset") < 200)
      .withColumn("value", col("value") + 1000.0)
    JdbcUpsertSink.upsertBatch(stale, 1L, tgtUrl, "MATERIALIZED", "replay")
    assert(sinkState(tgtUrl, "MATERIALIZED") == after1)
  }

  test("checkpoint restart mid-stream leaves exactly the batch-merge state") {
    val logUrl = freshDb("restart_log")
    val tgtUrl = freshDb("restart_tgt")
    stageLog(logUrl)
    val ckpt = java.nio.file.Files.createTempDirectory("restart_sink_ckpt").toString

    def start() = JdbcUpsertSink.start(
      CdcSource.read(spark).option("max-events-per-trigger", 100).loadMicroBatch(logUrl),
      ckpt, tgtUrl, "MATERIALIZED", "restart")

    val q1 = start()
    // run until at least one epoch commits, then kill mid-stream
    val deadline = System.nanoTime + 60L * 1000000000L
    def epochs(): Long = {
      val conn = java.sql.DriverManager.getConnection(tgtUrl)
      try {
        val st = conn.createStatement()
        try {
          val rs = st.executeQuery(
            "SELECT COUNT(*) FROM GRAFT_SINK_EPOCH WHERE SINK_ID = 'restart'")
          rs.next(); val n = rs.getLong(1); rs.close(); n
        } finally st.close()
      } finally conn.close()
    }
    while (epochs() == 0 && System.nanoTime < deadline) Thread.sleep(20)
    q1.stop()

    val q2 = start()
    q2.processAllAvailable()
    q2.stop()
    assert(sinkState(tgtUrl, "MATERIALIZED") == expectedState())
  }
}
