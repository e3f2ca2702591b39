package graft.cdc.streaming

import graft.SparkTestBase
import graft.cdc.model.Changelog
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** M4 — the streaming face must agree with the batch operators on the same
  * data: feeding the changelog through MemoryStream + mapGroupsWithState
  * must land in the same final state as the batch upsert materialization.
  */
class StreamingSpec extends SparkTestBase {
  import StreamingOps._

  test("streamed upsert state equals batch materialization over real events") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext

    val events = Changelog.changelog(spark, sfDir)
      .select(col("offset"), col("pk"), col("op"), col("ts_ms"), col("val").as("value"))
      .as[ChangeRecord]
      .collect()
      .sortBy(_.offset)

    val stream = MemoryStream[ChangeRecord]
    val q = upsertMaterializeStream(stream.toDS())
      .writeStream.format("memory").queryName("state_sink")
      .outputMode("update").start()

    // two micro-batches split mid-stream, like snapshot phase then log phase
    val (b1, b2) = events.splitAt(events.length / 2)
    stream.addData(b1.toIndexedSeq); q.processAllAvailable()
    stream.addData(b2.toIndexedSeq); q.processAllAvailable()

    // latest state per key from the update-mode sink
    val streamed = spark.table("state_sink")
      .groupBy($"pk")
      .agg(max_by(struct($"last_offset", $"last_op", $"value"), $"last_offset").as("s"))
      .select($"pk", $"s.last_offset", $"s.last_op", $"s.value")
      .where($"s.last_op" =!= "d")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3)))
      .toSet
    q.stop()

    val batch = Changelog.upsertMaterialize(
      // no snapshot side here: stream test covers pure log materialization
      Changelog.changelog(spark, sfDir).limit(0),
      Changelog.changelog(spark, sfDir)
    ).collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3))).toSet

    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("hybrid handover: snapshot-phase state + streamed log tail == direct state") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val W = 400L

    // snapshot phase: materialized state at offset W seeds the state store
    val init = Changelog.upsertMaterialize(
        Changelog.snapshot(spark, sfDir),
        Changelog.changelog(spark, sfDir).where(col("offset") <= W))
      .select(col("pk"), col("last_offset"), col("last_op"), col("val").as("value"))
      .as[KeyState]

    // log phase: only the tail past W flows through the stream
    val tail = Changelog.changelog(spark, sfDir)
      .where(col("offset") > W)
      .select(col("offset"), col("pk"), col("op"), col("ts_ms"), col("val").as("value"))
      .as[ChangeRecord].collect().sortBy(_.offset)

    val stream = MemoryStream[ChangeRecord]
    val q = upsertMaterializeStreamFrom(stream.toDS(), init)
      .writeStream.format("memory").queryName("hybrid_sink")
      .outputMode("update").start()
    stream.addData(tail.toIndexedSeq); q.processAllAvailable(); q.stop()

    // final state = initial snapshot keys overridden by streamed updates
    val streamedUpdates = spark.table("hybrid_sink")
      .groupBy($"pk")
      .agg(max_by(struct($"last_offset", $"last_op", $"value"), $"last_offset").as("s"))
      .select($"pk", $"s.last_offset", $"s.last_op", $"s.value")
    val finalState = init.toDF().unionByName(streamedUpdates)
      .groupBy($"pk")
      .agg(max_by(struct($"last_offset", $"last_op", $"value"), $"last_offset").as("s"))
      .where($"s.last_op" =!= "d")
      .select($"pk", $"s.value")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet

    val direct = Changelog.upsertMaterialize(
        Changelog.snapshot(spark, sfDir), Changelog.changelog(spark, sfDir))
      .select(col("pk"), col("val"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet

    assert(finalState == direct)
  }

  test("retraction stream emits +I/-U/+U/-D consistent with replayed state") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext

    val events = Changelog.changelog(spark, sfDir)
      .select(col("offset"), col("pk"), col("op"), col("ts_ms"), col("val").as("value"))
      .as[ChangeRecord].collect().sortBy(_.offset)

    val stream = MemoryStream[ChangeRecord]
    val q = retractionStream(stream.toDS())
      .writeStream.format("memory").queryName("retract_sink")
      .outputMode("append").start()
    val (b1, b2) = events.splitAt(events.length / 3)
    stream.addData(b1.toIndexedSeq); q.processAllAvailable()
    stream.addData(b2.toIndexedSeq); q.processAllAvailable()
    // cross-batch STALE records: offsets far below every key's stored state
    // must be skipped by the last-writer-wins guard and emit nothing
    val stale = b1.take(5).map(r => r.copy(value = r.value + 12345.0))
    val beforeStale = spark.table("retract_sink").count()
    stream.addData(stale.toIndexedSeq); q.processAllAvailable()
    assert(spark.table("retract_sink").count() == beforeStale,
      "stale lower-offset records must not emit retractions")
    q.stop()

    val emitted = spark.table("retract_sink")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getLong(3)))

    // reference semantics: replay the same events through a driver-side map
    val expect = Seq.newBuilder[(Long, String, Double, Long)]
    val st = scala.collection.mutable.Map.empty[Long, (String, Double)]
    events.foreach { r =>
      (st.get(r.pk).filter(_._1 != "d"), r.op) match {
        case (None, "d") => ()
        case (None, _) => expect += ((r.pk, "+I", r.value, r.offset))
        case (Some((_, pv)), "d") => expect += ((r.pk, "-D", pv, r.offset))
        case (Some((_, pv)), _) =>
          expect += ((r.pk, "-U", pv, r.offset))
          expect += ((r.pk, "+U", r.value, r.offset))
      }
      st(r.pk) = (r.op, r.value)
    }
    assert(emitted.toSet == expect.result().toSet)
    assert(emitted.length == expect.result().length)
    // retraction algebra: every -U has a matching +U at the same offset
    val byOffset = emitted.groupBy(_._4)
    byOffset.values.foreach { rows =>
      assert(rows.count(_._2 == "-U") == rows.count(_._2 == "+U"))
    }
  }

  test("T2/T5: checkpointed stream survives a mid-flight stop/restart exactly-once") {
    import java.nio.file.Files
    val src = Files.createTempDirectory("restart_src").toString
    val sink = Files.createTempDirectory("restart_sink").toString
    val ckpt = Files.createTempDirectory("restart_ckpt").toString

    // source: the changelog split across 8 files, drip-fed 2 per trigger
    val cl = Changelog.changelog(spark, sfDir)
      .select("offset", "pk", "op", "ts_ms", "val")
    cl.repartition(8).write.mode("overwrite").parquet(src)
    val expected = cl.select("offset").collect().map(_.getLong(0)).toSet

    def start() = spark.readStream
      .schema(spark.read.parquet(src).schema)
      .option("maxFilesPerTrigger", 2)
      .parquet(src)
      .writeStream
      .option("checkpointLocation", ckpt)
      // idempotent foreachBatch sink: one directory per batch id, overwritten
      // on replay — the standard exactly-once pattern for non-transactional
      // sinks
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        batch.write.mode("overwrite").parquet(s"$sink/batch_id=$id")
      }
      .start()

    // run until at least one batch commits, then kill mid-stream
    val q1 = start()
    val deadline = System.nanoTime + 60L * 1000000000L
    def committed() = Option(new java.io.File(sink).listFiles)
      .exists(_.exists(_.getName.startsWith("batch_id=")))
    while (!committed() && System.nanoTime < deadline) Thread.sleep(50)
    q1.stop()

    // restart from the checkpoint and drain the rest
    val q2 = start()
    q2.processAllAvailable()
    q2.stop()

    val got = spark.read.parquet(sink).select("offset")
      .collect().map(_.getLong(0))
    assert(got.length == got.distinct.length, "duplicated offsets after restart")
    assert(got.toSet == expected, "lost or extra offsets after restart")
  }

  test("T5: streaming dedup under watermark equals batch distinct on the dup keys") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext

    // at-least-once delivery: every event possibly redelivered across
    // micro-batches; dedup key = (offset) within the event-time watermark
    val events = Changelog.changelog(spark, sfDir)
      .select(col("offset"), col("pk"), col("op"), col("ts_ms"), col("val").as("value"))
      .as[ChangeRecord].collect().sortBy(_.offset).take(2000)

    val stream = MemoryStream[ChangeRecord]
    val deduped = stream.toDS()
      .withColumn("event_time", timestamp_millis(col("ts_ms")))
      .withWatermark("event_time", "1 hour")
      .dropDuplicatesWithinWatermark("offset")
    val q = deduped.writeStream.format("memory").queryName("dedup_sink")
      .outputMode("append").start()

    val (b1, b2) = events.splitAt(events.length / 2)
    stream.addData(b1.toIndexedSeq); q.processAllAvailable()
    // redeliver the tail of b1 (duplicates) together with b2
    stream.addData((b1.takeRight(200) ++ b2).toIndexedSeq); q.processAllAvailable()
    q.stop()

    val got = spark.table("dedup_sink").select("offset").collect().map(_.getLong(0))
    assert(got.length == got.distinct.length, "duplicates leaked through")
    assert(got.toSet == events.map(_.offset).toSet)
  }

  test("T4 beyond-parity: event-time tumbling window with watermark over the stream") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext

    val stream = MemoryStream[ChangeRecord]
    val windowed = stream.toDS()
      .withColumn("event_time", timestamp_millis($"ts_ms"))
      .withWatermark("event_time", "1 hour")
      .groupBy(window($"event_time", "1 day"), $"op")
      .agg(count(lit(1)).as("cnt"))
    val q = windowed.writeStream.format("memory").queryName("win_sink")
      .outputMode("append").start()

    val events = Changelog.changelog(spark, sfDir)
      .select(col("offset"), col("pk"), col("op"), col("ts_ms"), col("val").as("value"))
      .as[ChangeRecord].collect().sortBy(_.ts_ms)
    stream.addData(events.toIndexedSeq)
    q.processAllAvailable()
    // advance the watermark far past the data so all windows close
    stream.addData(ChangeRecord(Long.MaxValue, 0L, "u",
      events.last.ts_ms + 30L * 86400000L, 0.0))
    q.processAllAvailable(); q.stop()

    val got = spark.table("win_sink")
      .select(unix_millis($"window.start").as("ws"), $"op", $"cnt")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val expect = Changelog.changelog(spark, sfDir)
      .groupBy((floor($"ts_ms" / 86400000L) * 86400000L).as("ws"), $"op")
      .agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(got == expect)
    assert(got.nonEmpty)
  }
}
