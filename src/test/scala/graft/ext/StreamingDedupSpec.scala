package graft.ext

import graft.SparkTestBase
import graft.cdc.model.Changelog.table
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The streaming near-dup filter must agree with the batch LSH pairing:
  * a document survives the stream iff it never appears as the LATER side
  * of a batch candidate pair, regardless of how the corpus is split into
  * micro-batches.
  */
class StreamingDedupSpec extends SparkTestBase {

  test("streaming band-claim dedup equals batch minhash candidate semantics") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext

    val docs = table(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .sortBy(_._1)

    val stream = MemoryStream[(Long, String)]
    val claims = StreamingDedup.bandClaims(stream.toDS().toDF("doc_id", "text"))
    val q = claims.writeStream.format("memory").queryName("dedup_claims")
      .outputMode("append").start()

    val (b1, b2) = docs.splitAt(docs.length / 2)
    stream.addData(b1.toIndexedSeq); q.processAllAvailable()
    stream.addData(b2.toIndexedSeq); q.processAllAvailable()
    q.stop()

    val kept = StreamingDedup.keptDocs(spark.table("dedup_claims"))
      .collect().map(_.getLong(0)).toSet

    // batch reference: a doc is dropped iff it is the later side of any
    // candidate pair (shares >= 1 band bucket with an earlier doc)
    val later = Dedup.minhashLsh(table(spark, sfDir, "documents"), 32, 4)
      .select("doc_b").collect().map(_.getLong(0)).toSet
    val expected = docs.map(_._1).toSet -- later

    assert(kept == expected)
    assert(later.nonEmpty, "fixture has no near-dups; test is vacuous")
    assert(kept.nonEmpty)
  }

  test("streaming novelty gate (foreachBatch vs static index) equals the batch gate") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext

    val docs = table(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"), col("source"))
    val indexed = docs.where(col("doc_id") % 10 < 8)
    val batchSide = docs.where(col("doc_id") % 10 >= 8)
    val (bands, digests) = Dedup.noveltyIndex(indexed, 32, 4)
    // the stored index is static across the stream: cache like a real
    // posting table read once per ingest
    val (bandsC, digestsC) = (bands.cache(), digests.cache())

    val expected = Dedup.noveltyGate(bandsC, digestsC, batchSide, 32, 4)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet

    val rows = batchSide.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).sortBy(_._1)
    val stream = MemoryStream[(Long, String, String)]
    val admitted = scala.collection.mutable.Set.empty[(Long, String, Long)]
    val q = stream.toDS().toDF("doc_id", "text", "source").writeStream
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        admitted ++= Dedup.noveltyGate(bandsC, digestsC, batch, 32, 4)
          .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
        ()
      }
      .start()
    // three uneven micro-batches: the gate is per-batch stateless against
    // the static index, so any split must produce the same admissions
    val (a, rest) = rows.splitAt(rows.length / 3)
    val (b, c) = rest.splitAt(1)
    stream.addData(a.toIndexedSeq); q.processAllAvailable()
    stream.addData(b.toIndexedSeq); q.processAllAvailable()
    stream.addData(c.toIndexedSeq); q.processAllAvailable()
    q.stop()

    assert(admitted.toSet == expected)
    assert(expected.nonEmpty && expected.size < rows.length) // both branches real
  }

  test("state TTL path: claims within the TTL window still dedup identically") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext

    val docs = table(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .sortBy(_._1)

    val stream = MemoryStream[(Long, String)]
    // a generous TTL: nothing ages out within the test, so the claims must
    // match the no-TTL run exactly — this exercises the
    // ProcessingTimeTimeout branch (setTimeoutDuration per update and the
    // hasTimedOut cleanup path) without making timing part of the assertion.
    // Trigger.Once per micro-batch (not processAllAvailable): with
    // processing-time timeouts every batch re-arms a future timeout, so the
    // engine always "requires another batch" and processAllAvailable
    // livelocks; one-shot triggers over a shared checkpoint pin exactly one
    // batch per run while state carries across restarts.
    val claims = StreamingDedup.bandClaims(
      stream.toDS().toDF("doc_id", "text"),
      stateTtl = Some(java.time.Duration.ofHours(1)))
    val ckpt = java.nio.file.Files.createTempDirectory("ttl_ckpt").toString
    val outDir = java.nio.file.Files.createTempDirectory("ttl_out").toString
    def runOnce(): Unit = {
      val q = claims.writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.Once())
        .start()
      q.awaitTermination()
    }

    val (b1, b2) = docs.splitAt(docs.length / 2)
    stream.addData(b1.toIndexedSeq); runOnce()
    stream.addData(b2.toIndexedSeq); runOnce()

    val kept = StreamingDedup.keptDocs(spark.read.parquet(outDir))
      .collect().map(_.getLong(0)).toSet
    val later = Dedup.minhashLsh(table(spark, sfDir, "documents"), 32, 4)
      .select("doc_b").collect().map(_.getLong(0)).toSet
    assert(kept == docs.map(_._1).toSet -- later)
  }
}
