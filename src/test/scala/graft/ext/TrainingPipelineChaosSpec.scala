package graft.ext

import java.util.concurrent.ConcurrentHashMap

import graft.SparkTestBase
import graft.cdc.model.RowImage
import graft.cdc.source.{CdcMicroBatch, CdcSource}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** ChaosSpec treatment for the FUSED pipeline (CDC changelog in → LWW
  * state → dedup/curation gate → epoch cut → streaming packer → training
  * batches): deterministic kills at the worst window of each stage
  * boundary — after a micro-batch's effects land but BEFORE the engine
  * marks the batch committed — then restart from the same checkpoint.
  * TrainingPipelineSpec holds the clean-split half (stream == batch over
  * arbitrary micro-batch splits); this spec holds the crash half:
  *
  *   1. ingest stage: EVERY state-apply micro-batch killed once in the
  *      land-rows-then-die window; the offset-guarded upsert must absorb
  *      each replay (exactly-once effect, not at-least-once delivery)
  *   2. ingest→cut boundary: an epoch cut taken from the state table
  *      while the stream is DOWN mid-log must equal the batch composition
  *      of exactly the delivered prefix — a consistent snapshot, never a
  *      torn one
  *   3. pack stage: every packer micro-batch killed once after its spans
  *      land; on restart the state store reloads the pre-batch cursor
  *      version, so the replayed batch emits byte-identical spans and a
  *      keyed sink converges on exactly the batch manifest
  */
class TrainingPipelineChaosSpec extends SparkTestBase {

  private val docsTable = RowImage.DeclaredTable(
    "documents",
    StructType(Seq(
      StructField("doc_id", LongType, nullable = true),
      StructField("text", StringType, nullable = true))),
    Seq("doc_id"))

  /** Delivery-ordered changes, renumbered to the dense SEQ domain (same
    * renumbering as TrainingPipelineSpec so LWW winners are preserved).
    */
  private lazy val ordered: Array[(Long, Long, String, String)] =
    ExtQueries.docsChangelog(spark, sfDir)
      .select(col("offset"), col("doc_id"), col("op"), col("text"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        if (r.isNullAt(3)) null else r.getString(3)))
      .sortBy(t => (t._1, t._2))
      .zipWithIndex
      .map { case ((_, d, op, tx), i) => (i.toLong, d, op, tx) }

  private def changesDf(rows: Array[(Long, Long, String, String)]): DataFrame = {
    val s = spark; import s.implicits._
    rows.toSeq.toDF("offset", "doc_id", "op", "text")
  }

  /** Envelope frames for [[CdcMicroBatch.appendEnvelopeTable]]. */
  private def frames(rows: Array[(Long, Long, String, String)])
      : Array[(Long, String, Long, String, String, String)] = {
    val imgs = changesDf(rows)
      .select(col("offset"), to_json(struct(col("doc_id"), col("text"))).as("img"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    rows.map { case (i, _, op, _) =>
      val img = imgs(i)
      val before = if (op == "d") img else null
      val after = if (op == "d") null else img
      (i, op, i, "documents", before, after)
    }
  }

  private def manifestSet(df: DataFrame): Set[(Long, Long, Long, Long, Long, Long)] =
    df.select(col("shard"), col("doc_id"), col("seq_id"),
        col("doc_tok_start"), col("seq_tok_start"), col("span_toks"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet

  private def cutOfState(url: String): Set[(Long, Long, Long, Long, Long, Long)] =
    manifestSet(TrainingPipeline.epochCut(
      RowImage.readState(spark, docsTable, url, "TPC_STATE")
        .select(col("doc_id"), col("text"))))

  /** Drive a chaos-killed stream to a clean drain: each run dies at the
    * first not-yet-killed batch (its rows already landed), the next run
    * resumes from the checkpoint. Returns the number of chaos restarts.
    */
  private def drainWithKills(start: () => org.apache.spark.sql.streaming.StreamingQuery,
      maxRestarts: Int = 64): Int = {
    var restarts = 0
    var done = false
    while (!done) {
      val q = start()
      try {
        q.processAllAvailable()
        q.stop()
        done = true
      } catch {
        case e: org.apache.spark.sql.streaming.StreamingQueryException =>
          assert(e.getMessage.contains("chaos kill"),
            s"unexpected failure: ${e.getMessage}")
          restarts += 1
          assert(restarts <= maxRestarts, "chaos loop did not converge")
      }
    }
    restarts
  }

  test("ingest killed at EVERY batch + mid-log epoch cut == prefix truth; final cut == full truth") {
    val (h1, h2) = ordered.splitAt(ordered.length / 2)
    val dir = java.nio.file.Files.createTempDirectory("derby_tpc").toString
    val url = s"jdbc:derby:$dir/logdb;create=true"
    CdcMicroBatch.appendEnvelopeTable(url, "TPC_LOG", frames(h1).iterator)
    val ckpt = java.nio.file.Files.createTempDirectory("tpc_ckpt").toString
    RowImage.createStateTable(url, docsTable, "TPC_STATE")

    // the chaos sink: the production decode+apply, then die BEFORE the
    // engine marks the batch — once per batch id; the replay applies the
    // same rows and the offset guard makes it a per-key no-op
    val killed = ConcurrentHashMap.newKeySet[Long]()
    def start() = CdcSource.read(spark)
      .option("envelope", "true")
      .option("max-events-per-trigger", 48)
      .loadMicroBatch(url, "TPC_LOG")
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        RowImage.applyRows(
          RowImage.decodeEnvelope(batch, docsTable), docsTable, url, "TPC_STATE")
        if (killed.add(id)) throw new RuntimeException(s"chaos kill at batch $id")
      }
      .start()

    // phase 1: only h1 staged; every batch dies once in the worst window.
    // The stream is DOWN when drainWithKills returns a clean drain — the
    // epoch cut taken here is the ingest→cut stage boundary under chaos.
    val restarts1 = drainWithKills(() => start())
    assert(restarts1 >= 2, s"expected multiple ingest kills, got $restarts1")
    assert(cutOfState(url) ==
      manifestSet(TrainingPipeline.fromChangelog(changesDf(h1))),
      "mid-log epoch cut must equal the batch composition of the delivered prefix")

    // phase 2: the log grows; same checkpoint, kills keep firing per batch
    CdcMicroBatch.appendEnvelopeTable(url, "TPC_LOG", frames(h2).iterator)
    drainWithKills(() => start())
    val want = manifestSet(TrainingPipeline.fromChangelog(changesDf(ordered)))
    val got = cutOfState(url)
    assert(got == want && got.nonEmpty,
      "post-chaos epoch cut must equal the full batch composition")
  }

  test("packer killed at EVERY batch after spans land: keyed sink converges on the batch manifest") {
    val gated = TrainingPipeline.dedupGate(
      TrainingPipeline.liveCorpus(changesDf(ordered)), minWords = 3, repLimit = 2)
    val want = manifestSet(TrainingPipeline.packManifest(gated, 128L, 4))
    assert(want.nonEmpty)

    // a replayable multi-batch source: the gated corpus as 6 parquet files,
    // one file per micro-batch. Arrival order must be doc_id order (the
    // manifest's per-shard packing order, same contract as
    // TrainingPipelineSpec's splits), so each file is a contiguous doc_id
    // range and files carry strictly increasing modification times (the
    // file source's processing order).
    val srcDir = java.nio.file.Files.createTempDirectory("tpc_pack_src")
    val s = spark; import s.implicits._
    val docs = gated.collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    val chunks = docs.grouped(math.max(1, (docs.length + 5) / 6)).toSeq
    chunks.zipWithIndex.foreach { case (chunk, i) =>
      val tmp = java.nio.file.Files.createTempDirectory(s"tpc_chunk$i").toString
      chunk.toSeq.toDF("doc_id", "text").coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get.toPath
      val dst = srcDir.resolve(f"chunk-$i%02d.parquet")
      java.nio.file.Files.copy(part, dst)
      java.nio.file.Files.setLastModifiedTime(dst,
        java.nio.file.attribute.FileTime.fromMillis(1700000000000L + i * 60000L))
    }
    val ckpt = java.nio.file.Files.createTempDirectory("tpc_pack_ckpt").toString
    val docsStream = spark.readStream
      .schema(gated.schema)
      .option("maxFilesPerTrigger", 1)
      .option("latestFirst", "false")
      .parquet(srcDir.toString)

    // land every span into a keyed counter, then die — once per batch id.
    // Restart reloads the PRE-batch state-store cursor version, so the
    // replay must emit byte-identical spans (the counter never grows a key
    // outside the batch manifest, and no key lands more than twice).
    val landed = new ConcurrentHashMap[(Long, Long, Long, Long, Long, Long), Long]()
    val killed = ConcurrentHashMap.newKeySet[Long]()
    def start() = StreamingPack.packStream(docsStream, 128L, 4)
      .writeStream
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .foreachBatch { (ds: Dataset[StreamingPack.PackSpan], id: Long) =>
        ds.collect().foreach { s =>
          landed.merge((s.shard, s.doc_id, s.seq_id, s.doc_tok_start,
            s.seq_tok_start, s.span_toks), 1L, (a, b) => a + b)
        }
        if (killed.add(id)) throw new RuntimeException(s"chaos kill at batch $id")
      }
      .start()

    val restarts = drainWithKills(() => start())
    assert(restarts >= 2, s"expected multiple packer kills, got $restarts")

    import scala.jdk.CollectionConverters._
    val got = landed.keySet().asScala.toSet
    assert(got == want,
      "replayed packer batches drifted from the batch manifest")
    val over = landed.asScala.filter(_._2 > 2)
    assert(over.isEmpty, s"a span landed more than twice (non-idempotent replay): $over")
  }
}
