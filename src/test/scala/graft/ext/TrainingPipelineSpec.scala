package graft.ext

import graft.SparkTestBase
import graft.cdc.model.RowImage
import graft.cdc.source.{CdcMicroBatch, CdcSource}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** The fused continuous pipeline, end-to-end: a CDC documents changelog
  * streamed through the exactly-once envelope sink, an epoch cut
  * ([[TrainingPipeline.epochCut]]) over the maintained state, and the
  * streaming packer — each leg equal to the one-shot batch composition
  * ([[TrainingPipeline.fromChangelog]]) across kill/restart and arbitrary
  * micro-batch splits. This is the production shape: CDC in, training
  * batches out, with a crash at the worst window absorbed by the offset
  * guard rather than double-applied.
  */
class TrainingPipelineSpec extends SparkTestBase {

  private val docsTable = RowImage.DeclaredTable(
    "documents",
    StructType(Seq(
      StructField("doc_id", LongType, nullable = true),
      StructField("text", StringType, nullable = true))),
    Seq("doc_id"))

  /** The docsChangelog fixture as envelope frames, renumbered to the dense
    * SEQ domain (delivery order). Sorting by the ORIGINAL offset before
    * renumbering preserves each doc's insert-then-update order, so the
    * last-writer-wins fold lands on the same winners either way.
    */
  private def frames(): Array[(Long, String, Long, String, String, String)] =
    ExtQueries.docsChangelog(spark, sfDir)
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

  private def manifestSet(df: DataFrame): Set[(Long, Long, Long, Long, Long, Long)] =
    df.select(col("shard"), col("doc_id"), col("seq_id"),
        col("doc_tok_start"), col("seq_tok_start"), col("span_toks"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet

  /** The batch truth the whole pipeline must land on. */
  private def batchTruth(): Set[(Long, Long, Long, Long, Long, Long)] =
    manifestSet(TrainingPipeline.fromChangelog(
      ExtQueries.docsChangelog(spark, sfDir)))

  test("CDC stream -> exactly-once state -> epoch cut == batch composition, across kill/restart") {
    val fs = frames()
    val dir = java.nio.file.Files.createTempDirectory("derby_tp").toString
    val url = s"jdbc:derby:$dir/logdb;create=true"
    CdcMicroBatch.appendEnvelopeTable(url, "TP_LOG", fs.iterator)
    val ckpt = java.nio.file.Files.createTempDirectory("tp_ckpt").toString

    def start() = RowImage.applyEnvelopeStream(
      CdcSource.read(spark)
        .option("envelope", "true")
        .option("max-events-per-trigger", 64)
        .loadMicroBatch(url, "TP_LOG"),
      docsTable, url, "TP_STATE", ckpt)

    // phase 1: let at least one micro-batch commit, then die mid-drain —
    // the crash window the offset-guarded sink must absorb on resume
    val q1 = start()
    val deadline = System.nanoTime + 60L * 1000000000L
    while (q1.recentProgress.length < 2 && System.nanoTime < deadline)
      Thread.sleep(20)
    q1.stop()

    // phase 2: same checkpoint, same state table — drain the rest
    val q2 = start()
    q2.processAllAvailable()
    q2.stop()

    val live = RowImage.readState(spark, docsTable, url, "TP_STATE")
      .select(col("doc_id"), col("text"))
    val cut = manifestSet(TrainingPipeline.epochCut(live))
    val want = batchTruth()
    assert(cut == want && cut.nonEmpty)

    // a full replay from a FRESH checkpoint redelivers every frame; the
    // state — and therefore the epoch cut — must not move (exactly-once
    // in effect, not just at-least-once delivery)
    val ckpt2 = java.nio.file.Files.createTempDirectory("tp_ckpt2").toString
    val q3 = RowImage.applyEnvelopeStream(
      CdcSource.read(spark).option("envelope", "true").loadMicroBatch(url, "TP_LOG"),
      docsTable, url, "TP_STATE", ckpt2, trigger = Some(Trigger.AvailableNow()))
    assert(q3.awaitTermination(120000), "replay drain did not terminate")
    val cut2 = manifestSet(TrainingPipeline.epochCut(
      RowImage.readState(spark, docsTable, url, "TP_STATE")
        .select(col("doc_id"), col("text"))))
    assert(cut2 == want)
  }

  test("streamed packer over the gated corpus == the batch manifest across batch splits") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext

    val gated = TrainingPipeline.dedupGate(
      TrainingPipeline.liveCorpus(ExtQueries.docsChangelog(spark, sfDir)),
      minWords = 3, repLimit = 2)
    val want = manifestSet(TrainingPipeline.packManifest(gated, 128L, 4))

    // the gated corpus arrives in doc_id order (the manifest's per-shard
    // packing order) over three uneven micro-batches
    val docs = gated.collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val spans = StreamingPack.packStream(
      stream.toDS().toDF("doc_id", "text"), 128L, 4)
    val q = spans.writeStream.format("memory").queryName("tp_spans")
      .outputMode("append").start()
    val splits = Seq(docs.take(docs.length / 3),
      docs.slice(docs.length / 3, docs.length / 2), docs.drop(docs.length / 2))
    for (b <- splits) { stream.addData(b.toIndexedSeq); q.processAllAvailable() }
    q.stop()

    val got = spark.table("tp_spans").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet
    assert(got == want && got.nonEmpty)
  }
}
