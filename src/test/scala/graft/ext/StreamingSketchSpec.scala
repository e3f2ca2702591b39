package graft.ext

import graft.SparkTestBase
import graft.cdc.model.Changelog.table
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The HLL register table is a pure streaming aggregation (max per
  * (source, bucket)) — Structured Streaming's state store IS the sketch,
  * so a stream over any micro-batch split of the corpus must land on
  * exactly the batch registers. That's the 100 TB ingestion story:
  * distinct-content cardinality maintained incrementally while documents
  * arrive, no re-scan.
  */
class StreamingSketchSpec extends SparkTestBase {

  test("streaming HLL registers equal batch registers under micro-batching") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext

    val docs = table(spark, sfDir, "documents")
      .select(col("source"), col("text"))
      .collect().map(r => (r.getString(0), r.getString(1)))

    val stream = MemoryStream[(String, String)]
    val regs = Curation.hllRegisters(stream.toDS().toDF("source", "text"), p = 8)
    val q = regs.writeStream.format("memory").queryName("hll_stream")
      .outputMode("complete").start()
    val batches = docs.grouped(math.max(1, docs.length / 3)).toSeq
    batches.foreach { b => stream.addData(b.toIndexedSeq); q.processAllAvailable() }
    q.stop()

    val got = spark.table("hll_stream").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> (r.getInt(2), r.getLong(3))).toMap
    val want = Curation.hllRegisters(
        table(spark, sfDir, "documents"), p = 8).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> (r.getInt(2), r.getLong(3))).toMap
    assert(got == want)
    assert(want.nonEmpty)
  }
}
