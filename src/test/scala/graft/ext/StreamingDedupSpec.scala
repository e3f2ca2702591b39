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
}
