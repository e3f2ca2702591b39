package graft.ext

import java.util.concurrent.ConcurrentHashMap

import graft.SparkTestBase
import graft.cdc.source.{CdcMicroBatch, CdcSource}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The fused CDC->training pipeline under the same failover matrix: kills
  * at EACH stage boundary of the composition (envelope stream -> offset-
  * guarded state, epoch cut -> streaming packer), each landing on the batch
  * truth. The generic-IR chaos matrix lives in
  * graft.cdc.streaming.ChaosSpec; the clean-split halves of this pipeline
  * are in TrainingPipelineSpec.
  */
class TrainingPipelineChaosSpec extends SparkTestBase {

  private def freshDb(prefix: String): String =
    s"jdbc:derby:${java.nio.file.Files.createTempDirectory(prefix).toString}/db;create=true"

  private def runUntilKilled(q: org.apache.spark.sql.streaming.StreamingQuery): Unit = {
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q.processAllAvailable()
      q.awaitTermination()
    }
    assert(e.getMessage.contains("chaos kill"), s"unexpected failure: ${e.getMessage}")
  }

  test("fused CDC->training pipeline: kills at both stage boundaries, manifest equals batch truth") {
    import graft.cdc.model.RowImage
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

    val docsTable = RowImage.DeclaredTable(
      "documents",
      StructType(Seq(
        StructField("doc_id", LongType, nullable = true),
        StructField("text", StringType, nullable = true))),
      Seq("doc_id"))

    // the same fixture TrainingPipelineSpec drives cleanly: the documents
    // changelog as envelope frames in delivery order
    val frames = ExtQueries.docsChangelog(spark, sfDir)
      .select(col("offset"), col("doc_id"), col("op"),
        to_json(struct(col("doc_id"), col("text"))).as("img"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3)))
      .sortBy(t => (t._1, t._2))
      .zipWithIndex
      .map { case ((_, _, op, img), i) =>
        val before = if (op == "d") img else null
        val after = if (op == "d") null else img
        (i.toLong, op, i.toLong, "documents", before, after)
      }
    def manifestSet(df: DataFrame): Set[(Long, Long, Long, Long, Long, Long)] =
      df.select(col("shard"), col("doc_id"), col("seq_id"),
          col("doc_tok_start"), col("seq_tok_start"), col("span_toks"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5))).toSet
    val want = manifestSet(TrainingPipeline.fromChangelog(
      ExtQueries.docsChangelog(spark, sfDir)))

    // ===== stage boundary 1: envelope stream -> offset-guarded state =====
    // the kill window is the worst one: the batch's rows LAND in the state
    // table, then the process dies before the checkpoint commit — replay
    // must be a per-key no-op (the offset guard), not a double-apply
    val url = freshDb("chaos_tp_log")
    CdcMicroBatch.appendEnvelopeTable(url, "TPC_LOG", frames.iterator)
    RowImage.createStateTable(url, docsTable, "TPC_STATE")
    val ckpt = java.nio.file.Files.createTempDirectory("chaos_tp_ckpt").toString
    val killed = ConcurrentHashMap.newKeySet[Long]()
    def start(killAt: Set[Long]) = CdcSource.read(spark)
      .option("envelope", "true")
      .option("max-events-per-trigger", 64)
      .loadMicroBatch(url, "TPC_LOG")
      .writeStream
      .option("checkpointLocation", ckpt)
      .outputMode("update")
      .foreachBatch { (b: DataFrame, id: Long) =>
        val decoded = RowImage.decodeEnvelope(b, docsTable)
        RowImage.applyRows(decoded, docsTable, url, "TPC_STATE")
        if (killAt.contains(id) && killed.add(id))
          throw new RuntimeException(s"chaos kill at batch $id")
      }
      .start()
    runUntilKilled(start(Set(1L)))
    runUntilKilled(start(Set(3L)))
    val q = start(Set.empty)
    q.processAllAvailable(); q.stop()
    assert(killed.size == 2, s"chaos kills fired: $killed")

    val live = RowImage.readState(spark, docsTable, url, "TPC_STATE")
      .select(col("doc_id"), col("text"))
    assert(manifestSet(TrainingPipeline.epochCut(live)) == want && want.nonEmpty)

    // ===== stage boundary 2: epoch-cut corpus -> streaming packer =====
    // kill AFTER a batch's spans reach the (ledgered) sink but before the
    // commit: on restart the state store rewinds to the pre-batch version,
    // the batch replays from the WAL'd offset range, and the ledger
    // overwrite by batch id makes the effect exactly-once — the packer's
    // shard cursors must not double-advance
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val gated = TrainingPipeline.dedupGate(
      TrainingPipeline.liveCorpus(ExtQueries.docsChangelog(spark, sfDir)),
      minWords = 3, repLimit = 2)
    val docs = gated.collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val packCkpt = java.nio.file.Files.createTempDirectory("chaos_pack_ckpt").toString
    val ledger = new ConcurrentHashMap[Long, Set[(Long, Long, Long, Long, Long, Long)]]()
    val killedPack = ConcurrentHashMap.newKeySet[Long]()
    def startPack(killAt: Set[Long]) =
      StreamingPack.packStream(stream.toDS().toDF("doc_id", "text"), 128L, 4)
        .writeStream
        .option("checkpointLocation", packCkpt)
        .outputMode("append")
        .foreachBatch { (b: org.apache.spark.sql.Dataset[StreamingPack.PackSpan], id: Long) =>
          val rows = b.collect().map(r => (r.shard, r.doc_id, r.seq_id,
            r.doc_tok_start, r.seq_tok_start, r.span_toks)).toSet
          ledger.put(id, rows)
          if (killAt.contains(id) && killedPack.add(id))
            throw new RuntimeException(s"chaos kill at batch $id")
          ()
        }
        .start()
    val splits = Seq(docs.take(docs.length / 3),
      docs.slice(docs.length / 3, docs.length / 2), docs.drop(docs.length / 2))
    // run 1: first split lands (batch 0), second split's batch 1 dies
    // post-ledger pre-commit
    val p1 = startPack(Set(1L))
    stream.addData(splits(0).toIndexedSeq); p1.processAllAvailable()
    stream.addData(splits(1).toIndexedSeq)
    runUntilKilled(p1)
    // run 2: same checkpoint — batch 1 replays (ledger overwrite), then the
    // third split drains clean
    val p2 = startPack(Set.empty)
    stream.addData(splits(2).toIndexedSeq)
    p2.processAllAvailable(); p2.stop()
    assert(killedPack.size == 1)

    val got = ledger.values().toArray.flatMap(_.asInstanceOf[Set[(Long, Long, Long, Long, Long, Long)]]).toSet
    assert(got == want, "packer spans after kill/replay diverge from the batch manifest")
  }
}
