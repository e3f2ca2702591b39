package graft.cdc.source

import graft.SparkTestBase
import graft.cdc.model.Changelog
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** The DataSourceV2 `MicroBatchStream` against a live (mutating) embedded
  * Derby change table: planned splits, admission control, startup-offset
  * algebra, checkpoint restart, availableNow drain — the source architecture
  * the reference exercises through MySqlSourceITCase, minus a real MySQL.
  */
class CdcMicroBatchSpec extends SparkTestBase {

  /** Fresh Derby database holding the sf0.001 changelog as a change table. */
  private def freshLog(): (String, Array[(Long, Long, String, Long, Double)]) = {
    val dir = java.nio.file.Files.createTempDirectory("derby_mb").toString
    val url = s"jdbc:derby:$dir/logdb;create=true"
    val rows = Changelog.changelog(spark, sfDir)
      .select("offset", "pk", "op", "ts_ms", "val")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3), r.getDouble(4)))
      .sortBy(_._1)
    CdcMicroBatch.appendChangeTable(url, "GRAFT_CHANGELOG", rows.iterator)
    (url, rows)
  }

  test("stream delivers the whole log exactly once across admission-controlled batches") {
    val (url, rows) = freshLog()
    val df = CdcSource.read(spark)
      .option("max-events-per-trigger", 100)
      .loadMicroBatch(url)
    assert(df.isStreaming)
    val q = df.writeStream.format("memory").queryName("mb_all")
      .outputMode("append").start()
    q.processAllAvailable()
    // admission control actually split the run into multiple micro-batches
    assert(q.recentProgress.count(_.numInputRows > 0) > 1,
      s"expected >1 non-empty micro-batch, got ${q.recentProgress.length}")
    q.stop()
    val got = spark.table("mb_all").select("offset").collect().map(_.getLong(0))
    assert(got.length == got.distinct.length, "duplicate offsets delivered")
    assert(got.toSet == rows.map(_._1).toSet)
    // values survive the trip
    val gotFull = spark.table("mb_all")
      .select("offset", "pk", "op", "ts_ms", "value").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3), r.getDouble(4)))
      .toSet
    assert(gotFull == rows.toSet)
  }

  test("checkpoint restart resumes mid-log and picks up rows appended while down") {
    val (url, rows) = freshLog()
    val sink = java.nio.file.Files.createTempDirectory("mb_sink").toString
    val ckpt = java.nio.file.Files.createTempDirectory("mb_ckpt").toString

    def start() = CdcSource.read(spark)
      .option("max-events-per-trigger", 100)
      .loadMicroBatch(url)
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        batch.write.mode("overwrite").parquet(s"$sink/batch_id=$id")
      }
      .start()

    val q1 = start()
    val deadline = System.nanoTime + 60L * 1000000000L
    def committed() = Option(new java.io.File(sink).listFiles)
      .exists(_.exists(_.getName.startsWith("batch_id=")))
    while (!committed() && System.nanoTime < deadline) Thread.sleep(20)
    q1.stop()

    // the log keeps growing while the stream is down (event time keeps
    // advancing too — the attach probe checks ts monotonicity along SEQ)
    val maxSeq = rows.map(_._1).max
    val maxTs = rows.map(_._4).max
    val extra = (1L to 57L).map(i => (maxSeq + i, i % 97, "u", maxTs + i, i * 1.5))
    CdcMicroBatch.appendChangeTable(url, "GRAFT_CHANGELOG", extra.iterator)

    val q2 = start()
    q2.processAllAvailable()
    q2.stop()

    val got = spark.read.parquet(sink).select("offset").collect().map(_.getLong(0))
    assert(got.length == got.distinct.length, "duplicated offsets after restart")
    assert(got.toSet == rows.map(_._1).toSet ++ extra.map(_._1))
  }

  test("startup algebra: specific-offset file/pos, timestamp probe, latest") {
    val (url, rows) = freshLog()

    // specific-offset: (file, pos) inverted through the synthetic binlog
    // layout — stream starts strictly after that position
    val seq = 400L
    val file = f"mysql-bin.${seq / graft.cdc.offsets.BinlogOffsets.EventsPerFile}%06d"
    val pos = (seq % graft.cdc.offsets.BinlogOffsets.EventsPerFile) * 4 + 4
    val q1 = CdcSource.read(spark)
      .option("scan.startup.mode", "specific-offset")
      .option("scan.startup.specific-offset.file", file)
      .option("scan.startup.specific-offset.pos", pos)
      .loadMicroBatch(url)
      .writeStream.format("memory").queryName("mb_spec").outputMode("append").start()
    q1.processAllAvailable(); q1.stop()
    val gotSpec = spark.table("mb_spec").select("offset").collect().map(_.getLong(0)).toSet
    assert(gotSpec == rows.map(_._1).filter(_ > seq).toSet)

    // timestamp: the in-database latch probe
    val tsCut = rows.map(_._4).sorted.apply(rows.length / 2)
    val q2 = CdcSource.read(spark)
      .option("scan.startup.mode", "timestamp")
      .option("scan.startup.timestamp-millis", tsCut)
      .loadMicroBatch(url)
      .writeStream.format("memory").queryName("mb_ts").outputMode("append").start()
    q2.processAllAvailable(); q2.stop()
    val expectTs = rows.filter(r => r._1 >= rows.filter(_._4 >= tsCut).map(_._1).min)
      .map(_._1).toSet
    val gotTs = spark.table("mb_ts").select("offset").collect().map(_.getLong(0)).toSet
    assert(gotTs == expectTs)

    // latest: nothing until the writer appends, then only the tail
    val q3 = CdcSource.read(spark)
      .option("scan.startup.mode", "latest-offset")
      .loadMicroBatch(url)
      .writeStream.format("memory").queryName("mb_latest").outputMode("append").start()
    q3.processAllAvailable()
    assert(spark.table("mb_latest").count() == 0)
    val maxSeq = rows.map(_._1).max
    CdcMicroBatch.appendChangeTable(url, "GRAFT_CHANGELOG",
      Iterator((maxSeq + 1, 7L, "u", 999L, 1.0), (maxSeq + 2, 8L, "d", 1000L, 2.0)))
    q3.processAllAvailable(); q3.stop()
    val gotLatest = spark.table("mb_latest").select("offset").collect().map(_.getLong(0)).toSet
    assert(gotLatest == Set(maxSeq + 1, maxSeq + 2))
  }

  test("startup algebra: gtid-set resolves the covered prefix to the stream start") {
    val (url, rows) = freshLog()
    // covered prefix 1..500 (the gap past 500 does not extend it): events
    // 0..499 are already in the set, the stream starts at offset 500 — the
    // same cut the batch facade's per-row containment filter produces
    val q = CdcSource.read(spark)
      .option("scan.startup.mode", "specific-offset")
      .option("scan.startup.specific-offset.gtid-set", "s1:1-500,s1:601-700")
      .loadMicroBatch(url)
      .writeStream.format("memory").queryName("mb_gtid").outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(60000))
    val got = spark.table("mb_gtid").select("offset").collect().map(_.getLong(0)).toSet
    assert(got == rows.map(_._1).filter(_ >= 500L).toSet)

    // resolution algebra edges: merged adjacency extends the prefix; a set
    // not covering txid 1 (or an unknown server) skips nothing
    import graft.cdc.offsets.BinlogOffsets.gtidStartingSeq
    assert(gtidStartingSeq("s1:1-300,s1:301-400") == Some(399L))
    assert(gtidStartingSeq("s1:10-20") == None)
    assert(gtidStartingSeq("other:1-500") == None)
  }

  test("availableNow drains the pinned log end and terminates") {
    val (url, rows) = freshLog()
    val q = CdcSource.read(spark)
      .option("max-events-per-trigger", 128)
      .loadMicroBatch(url)
      .writeStream.format("memory").queryName("mb_now").outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(60000), "availableNow query did not terminate")
    val got = spark.table("mb_now").select("offset").collect().map(_.getLong(0))
    assert(got.toSet == rows.map(_._1).toSet)
    assert(got.length == rows.length)
  }

  test("in-stream capture-list filter: one tagged log, reader-side include regex") {
    val (url, rows) = freshLog()
    val q = CdcSource.read(spark)
      .option("max-events-per-trigger", 200)
      .option("table-name", "^users_[01]$")
      .loadMicroBatch(url)
      .writeStream.format("memory").queryName("mb_tbl").outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(60000))
    val got = spark.table("mb_tbl")
      .select("offset", "pk", "table_name").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    // exactly the users_0/users_1 shard of the log, each tagged correctly,
    // delivered once — users_2 events were skipped IN the readers while the
    // offset range still advanced over them
    assert(got.map(_._1).toSet == rows.filter(_._2 % 3 != 2).map(_._1).toSet)
    assert(got.forall { case (_, pk, t) => t == s"users_${pk % 3}" && pk % 3 != 2 })
    assert(got.length == got.map(_._1).distinct.length)

    // a malformed capture regex fails validation up front
    intercept[CdcSource.ValidationException] {
      CdcSource.read(spark).option("table-name", "users_[").loadMicroBatch(url)
    }
  }

  test("split planning slices the offset range into chunk-sized ranges") {
    // dense log: seqs 0..250 -> pure-arithmetic tiling (probe-free fast path)
    val dir = java.nio.file.Files.createTempDirectory("derby_plan").toString
    val url = s"jdbc:derby:$dir/logdb;create=true"
    CdcMicroBatch.appendChangeTable(url, "GRAFT_CHANGELOG",
      (0L to 250L).iterator.map(i => (i, i % 7, "u", i, i * 1.0)))
    val stream = new CdcMicroBatchStream(new org.apache.spark.sql.util.CaseInsensitiveStringMap(
      java.util.Map.of("url", url, "scan.incremental.snapshot.chunk.size", "100")))
    val parts = stream.planInputPartitions(CdcStreamOffset(-1L), CdcStreamOffset(250L))
    assert(parts.toSeq == Seq(CdcChunk(-1L, 99L), CdcChunk(99L, 199L), CdcChunk(199L, 250L)))
    // ranges tile the interval: exclusive lo, inclusive hi, no gaps/overlap
    assert(stream.planInputPartitions(CdcStreamOffset(5L), CdcStreamOffset(5L)).isEmpty)
    stream.stop()
  }

  test("sparse SEQ: splits stay row-balanced and admission advances by rows") {
    // log positions with irregular holes (binlog-like): seq = i*1009 + jitter
    val dir = java.nio.file.Files.createTempDirectory("derby_sparse").toString
    val url = s"jdbc:derby:$dir/logdb;create=true"
    val seqs = (0L until 350L).map(i => i * 1009L + (i % 13) * 7L)
    CdcMicroBatch.appendChangeTable(url, "GRAFT_CHANGELOG",
      seqs.iterator.map(i => (i, i % 7, "u", i, i * 1.0)))

    val stream = new CdcMicroBatchStream(new org.apache.spark.sql.util.CaseInsensitiveStringMap(
      java.util.Map.of("url", url, "scan.incremental.snapshot.chunk.size", "100")))
    val parts = stream.planInputPartitions(
      CdcStreamOffset(-1L), CdcStreamOffset(seqs.max))
      .map(_.asInstanceOf[CdcChunk])
    // row-balanced: every split holds exactly chunkSize rows but the last
    val perSplit = parts.map(c => seqs.count(s => s > c.lo && s <= c.hi))
    assert(perSplit.init.forall(_ == 100), s"split row counts: ${perSplit.mkString(",")}")
    assert(perSplit.sum == seqs.length)
    // splits tile (lo, hi]
    assert(parts.head.lo == -1L && parts.last.hi == seqs.max)
    assert(parts.sliding(2).forall { case Array(a, b) => a.hi == b.lo; case _ => true })

    // admission: the 100-row limit advances to the seq of the 100th pending
    // row, not start+100 (which would admit ~0 rows here)
    val end1 = stream.latestOffset(CdcStreamOffset(-1L),
      org.apache.spark.sql.connector.read.streaming.ReadLimit.maxRows(100L))
      .asInstanceOf[CdcStreamOffset].seq
    assert(seqs.count(_ <= end1) == 100, s"end1=$end1 admitted ${seqs.count(_ <= end1)}")
    stream.stop()

    // end-to-end: the sparse log drains exactly-once through the stream
    val sink = "sparse_q_" + java.util.UUID.randomUUID.toString.replace("-", "")
    val q = CdcSource.read(spark)
      .option("max-events-per-trigger", 64)
      .loadMicroBatch(url)
      .writeStream.format("memory").queryName(sink).outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(120000), "sparse drain did not terminate")
    val got = spark.table(sink).select("offset").collect().map(_.getLong(0))
    assert(got.length == got.distinct.length, "duplicated rows from sparse log")
    assert(got.toSet == seqs.toSet)
  }

  test("facade validation guards the micro-batch path") {
    intercept[CdcSource.ValidationException] {
      CdcSource.read(spark)
        .option("scan.startup.mode", "initial")
        .loadMicroBatch("jdbc:derby:memory:unused2;create=true")
    }
    intercept[CdcSource.ValidationException] {
      CdcSource.read(spark)
        .option("scan.incremental.snapshot.chunk.size", 0)
        .loadMicroBatch("jdbc:derby:memory:unused2;create=true")
    }
  }

  test("heartbeats advance the checkpoint on an idle log without emitting rows") {
    val (url, rows) = freshLog()
    val ckpt = java.nio.file.Files.createTempDirectory("mb_hb_ckpt").toString
    val sink = java.nio.file.Files.createTempDirectory("mb_hb_sink").toString
    var batchId = 0L
    def drain(): Long = {
      val q = CdcSource.read(spark).loadMicroBatch(url)
        .writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
          batchId += 1
          batch.write.mode("overwrite").parquet(s"$sink/run=$batchId")
        }
        .trigger(Trigger.AvailableNow())
        .start()
      assert(q.awaitTermination(120000), "drain did not terminate")
      spark.read.option("basePath", sink).parquet(sink).count()
    }
    assert(drain() == rows.length)

    // captured tables idle; only heartbeats arrive. The stream must
    // checkpoint PAST them while emitting nothing
    val maxTs = rows.map(_._4).max
    for (i <- 1 to 5)
      CdcMicroBatch.appendHeartbeat(url, "GRAFT_CHANGELOG", maxTs + i)
    assert(drain() == rows.length, "heartbeats must not surface as rows")

    // the checkpoint really advanced: a new data row after the heartbeats
    // is picked up alone (a re-probe from the old offset would re-read and
    // duplicate, or re-deliver heartbeat seqs)
    val maxSeq = rows.map(_._1).max
    CdcMicroBatch.appendChangeTable(url, "GRAFT_CHANGELOG",
      Iterator((maxSeq + 10, 1L, "u", maxTs + 10, 9.5)))
    assert(drain() == rows.length + 1)
    val got = spark.read.option("basePath", sink).parquet(sink)
      .select("offset").collect().map(_.getLong(0))
    assert(got.length == got.distinct.length, "duplicates after heartbeat advance")
    assert(got.max == maxSeq + 10)
  }

  test("attach-time contract probe rejects broken change tables, passes sane ones") {
    // a missing table is an attach error with a clear message, not a raw
    // SQLException from deep inside the stream
    val noTable = intercept[CdcSource.ValidationException] {
      CdcSource.read(spark)
        .loadMicroBatch("jdbc:derby:memory:attachv;create=true", "NO_SUCH_TABLE")
    }
    assert(noTable.getMessage.contains("not attachable"))

    // op outside {c,u,d,r} -> the op-domain contract names the SEQ
    val dir = java.nio.file.Files.createTempDirectory("derby_attach").toString
    val url = s"jdbc:derby:$dir/logdb;create=true"
    CdcMicroBatch.appendChangeTable(url, "GRAFT_CHANGELOG",
      Iterator((1L, 1L, "c", 100L, 1.0), (2L, 2L, "X", 200L, 2.0)))
    val badOp = intercept[CdcSource.ValidationException] {
      CdcSource.read(spark).loadMicroBatch(url)
    }
    assert(badOp.getMessage.contains("op-domain") && badOp.getMessage.contains("SEQ=2"))

    // ts regression: ignored by default (event-time sources are unordered),
    // rejected under the opt-in log-clock contract
    val dir2 = java.nio.file.Files.createTempDirectory("derby_attach2").toString
    val url2 = s"jdbc:derby:$dir2/logdb;create=true"
    CdcMicroBatch.appendChangeTable(url2, "GRAFT_CHANGELOG",
      Iterator((1L, 1L, "c", 300L, 1.0), (2L, 2L, "u", 200L, 2.0)))
    CdcSource.read(spark).loadMicroBatch(url2) // default: attaches fine
    val tsDrop = intercept[CdcSource.ValidationException] {
      CdcSource.read(spark)
        .option("scan.attach.validate.ts-monotonic", "true")
        .loadMicroBatch(url2)
    }
    assert(tsDrop.getMessage.contains("monotonicity"))

    // loadJdbc: a chunk key with NULLs is rejected before any chunk probe
    val dir3 = java.nio.file.Files.createTempDirectory("derby_attach3").toString
    val url3 = s"jdbc:derby:$dir3/db;create=true"
    val c = java.sql.DriverManager.getConnection(url3)
    try {
      val st = c.createStatement()
      st.execute("CREATE TABLE SNAP (K BIGINT, V DOUBLE)")
      st.execute("INSERT INTO SNAP VALUES (1, 1.0), (NULL, 2.0)")
      st.close()
    } finally c.close()
    val nullKey = intercept[CdcSource.ValidationException] {
      CdcSource.read(spark).loadJdbc(url3, "SNAP", "K")
    }
    assert(nullKey.getMessage.contains("NULL"))
  }
}
