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

  test("windowed user sketch streams to the same per-hour estimates as batch") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext

    val events = table(spark, sfDir, "events")
      .select(col("event_type"), col("ts"), col("user_id"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))

    // the REGISTER layer is the streaming state; the estimate is a
    // stateless sink-side fold (see windowedUserSketch scaladoc)
    val stream = MemoryStream[(String, Long, Long)]
    val regs = Curation.windowedUserRegisters(
      stream.toDS().toDF("event_type", "ts", "user_id"), p = 8)
    val q = regs.writeStream.format("memory").queryName("user_regs")
      .outputMode("complete").start()
    events.grouped(math.max(1, events.length / 4))
      .foreach { b => stream.addData(b.toIndexedSeq); q.processAllAvailable() }
    q.stop()

    def key(r: org.apache.spark.sql.Row) = (r.getString(0), r.getLong(1))
    val got = Curation.hllEstimate(spark.table("user_regs"),
        Seq("event_type", "hour_bucket"), p = 8)
      .collect().map(r => key(r) -> (r.getAs[String]("sum_scaled"),
        r.getAs[Double]("est_raw"))).toMap
    val want = Curation.windowedUserSketch(table(spark, sfDir, "events"), p = 8)
      .collect().map(r => key(r) -> (r.getAs[String]("sum_scaled"),
        r.getAs[Double]("est_raw"))).toMap
    assert(got == want)
    assert(want.size > 1)
  }

  test("streaming CMS counters equal batch counters under micro-batching") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext

    val docs = table(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1)))

    // shingling is stateless, the counter groupBy is the ONE stateful op —
    // the sketch accrues cell-wise exactly like the batch plan
    val stream = MemoryStream[(Long, String)]
    val counters = Curation.cmsCounters(
      Curation.shingleOccurrences(
        stream.toDS().toDF("doc_id", "text"), n = 3), wBits = 12, d = 4)
    val q = counters.writeStream.format("memory").queryName("cms_stream")
      .outputMode("complete").start()
    docs.grouped(math.max(1, docs.length / 3))
      .foreach { b => stream.addData(b.toIndexedSeq); q.processAllAvailable() }
    q.stop()

    val got = spark.table("cms_stream").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val want = Curation.cmsCounters(
        Curation.shingleOccurrences(table(spark, sfDir, "documents"), n = 3),
        wBits = 12, d = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == want)
    assert(want.nonEmpty)
  }
}
