package graft.ext

import graft.SparkTestBase
import graft.cdc.model.Changelog.table
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The streaming packer must agree with the closed-form span arithmetic
  * applied per shard in arrival order, regardless of micro-batch splits,
  * and its cursor state must carry sequences across batch boundaries.
  */
class StreamingPackSpec extends SparkTestBase {

  test("streamed spans == per-shard closed-form packing across batch splits") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext

    val seqLen = 64L
    val nShards = 4
    val docs = table(spark, sfDir, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)

    val stream = MemoryStream[(Long, String)]
    val spans = StreamingPack.packStream(
      stream.toDS().toDF("doc_id", "text"), seqLen, nShards)
    val q = spans.writeStream.format("memory").queryName("pack_spans")
      .outputMode("append").start()

    // three uneven batches; docs arrive in doc_id order overall so the
    // reference order per shard is doc_id order
    val splits = Seq(docs.take(100), docs.slice(100, 150), docs.drop(150))
    for (b <- splits) { stream.addData(b.toIndexedSeq); q.processAllAvailable() }
    q.stop()

    val got = spark.table("pack_spans").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet

    // reference: closed-form arithmetic per shard over arrival (=doc_id) order
    val expected = docs
      .map { case (id, text) =>
        (id, text.split(" ", -1).length.toLong,
          ((Hashing.mix64(id, 0L) % nShards) + nShards) % nShards)
      }
      .groupBy(_._3).toSeq
      .flatMap { case (shard, ds) =>
        var seq = 0L; var off = 0L
        ds.sortBy(_._1).flatMap { case (id, toks, _) =>
          var remaining = toks; var docOff = 0L
          val out = Seq.newBuilder[(Long, Long, Long, Long, Long, Long)]
          while (remaining > 0L) {
            val take = math.min(seqLen - off, remaining)
            out += ((shard, id, seq, docOff, off, take))
            docOff += take; remaining -= take
            if (off + take == seqLen) { seq += 1L; off = 0L } else off += take
          }
          out.result()
        }
      }.toSet

    assert(got == expected)
    // cursors really carried across batches: some shard's sequence count
    // exceeds what any single batch could fill alone
    assert(got.map(t => (t._1, t._3)).size > splits.length)
    // every span fits inside a sequence and every doc is fully tiled
    assert(got.forall(t => t._5 + t._6 <= seqLen))
    // toSeq before summing: equal span lengths of one doc would collapse
    // inside a Set
    val tiled = got.groupBy(_._2).map { case (id, ss) => id -> ss.toSeq.map(_._6).sum }
    val toks = docs.map { case (id, text) => id -> text.split(" ", -1).length.toLong }.toMap
    assert(tiled.forall { case (id, n) => n == toks(id) })
  }
}
