package graft.cdc.source

import graft.SparkTestBase
import graft.cdc.model.RowImage
import graft.cdc.types.DialectWire
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The PostgreSQL test_decoding face under Structured Streaming: the slot
  * drains as micro-batches (the live tail loop), each batch decodes with
  * [[DialectWire.decodeTestDecoding]] and folds into the offset-keyed LWW
  * state. Stream must equal batch:
  *
  *   - MATERIALIZED STATE under ARBITRARY batch splits — images are
  *     per-record, offsets total-order the folds, so where a batch boundary
  *     falls cannot matter;
  *   - the FULL IR (commit timestamps included) under transaction-boundary
  *     splits — ts_ms rides the txn's COMMIT marker, so a batch that slices
  *     a transaction in half can't know its commit time yet (the same
  *     boundary every consumer of the plugin has; the reference likewise
  *     checkpoints at transaction boundaries for its sources).
  */
class PgStreamSpec extends SparkTestBase {

  private val t = RowImage.DeclaredTable(
    "st",
    StructType(Seq(
      StructField("id", LongType),
      StructField("name", StringType),
      StructField("amt", DecimalType(10, 2)))),
    pkCols = Seq("id"))

  /** (lsn, xid, data) change stream: three transactions covering quoted
    * values embedding the grammar's own marker, bare nulls, a TOASTed
    * column untouched by an update, a delete + key reuse, and a
    * key-changing update.
    */
  private val lines: Seq[(String, Long, String)] = Seq(
    ("0/100", 100L, "BEGIN 100"),
    ("0/101", 100L, "table public.st: INSERT: id[bigint]:1 name[text]:'o''brien new-tuple: id[bigint]:9' amt[numeric]:10.50"),
    ("0/102", 100L, "table public.st: INSERT: id[bigint]:2 name[text]:null amt[numeric]:0.01"),
    ("0/103", 100L, "table public.st: INSERT: id[bigint]:3 name[text]:'toasty payload' amt[numeric]:3.00"),
    ("0/104", 100L, "COMMIT 100 (at 2024-01-01 00:00:10.000001+00)"),
    ("0/200", 101L, "BEGIN 101"),
    ("0/201", 101L, "table public.st: UPDATE: old-key: id[bigint]:3 name[text]:'toasty payload' amt[numeric]:3.00 new-tuple: id[bigint]:3 name[text]:unchanged-toast-datum amt[numeric]:33.33"),
    ("0/202", 101L, "table public.st: DELETE: id[bigint]:2 name[text]:null amt[numeric]:0.01"),
    ("0/203", 101L, "COMMIT 101 (at 2024-01-01 00:00:20.000002+00)"),
    ("0/300", 102L, "BEGIN 102"),
    ("0/301", 102L, "table public.st: UPDATE: old-key: id[bigint]:1 name[text]:'o''brien new-tuple: id[bigint]:9' amt[numeric]:10.50 new-tuple: id[bigint]:10 name[text]:'moved' amt[numeric]:10.50"),
    ("0/302", 102L, "table public.st: INSERT: id[bigint]:2 name[text]:'reborn' amt[numeric]:2.22"),
    ("0/303", 102L, "COMMIT 102 (at 2024-01-01 00:00:30.000003+00)"))

  private def decode(df: DataFrame): DataFrame =
    DialectWire.decodeTestDecoding(df, t)

  private def stateOf(ir: DataFrame) =
    RowImage.upsertMaterialize(ir, t)
      .select(col("id"), col("name"), col("amt").cast(StringType),
        col("last_offset"))
      .collect().map(_.toSeq).toSet

  private def irOf(ir: DataFrame) =
    ir.select(col("offset"), col("op"), col("ts_ms"), col("schema_name"),
        col("key.id"), col("before.name"), col("after.name"),
        col("after.amt").cast(StringType))
      .collect().map(_.toSeq).toSet

  private def drain(splits: Seq[Seq[(String, Long, String)]]): Seq[DataFrame] = {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val stream = MemoryStream[(String, Long, String)]
    val batches = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    val q = stream.toDS().toDF("lsn", "xid", "data").writeStream
      .foreachBatch { (b: DataFrame, _: Long) =>
        batches += decode(b).localCheckpoint()
        ()
      }.start()
    for (sp <- splits) { stream.addData(sp.toIndexedSeq); q.processAllAvailable() }
    q.stop()
    batches.toSeq
  }

  test("materialized state equals batch under arbitrary micro-batch splits") {
    val arbitrary = lines.grouped(2).toSeq // txns sliced mid-flight
    val perBatch = drain(arbitrary)
    val streamed = perBatch.reduce(_ unionByName _)
    assert(stateOf(streamed) == stateOf(decode({
      val s = spark; import s.implicits._
      lines.toDF("lsn", "xid", "data")
    })))
    // and the state is the expected five-key story: 1 moved to 10, 2
    // deleted then reborn, 3 kept its TOASTed name through the update
    val st = RowImage.upsertMaterialize(streamed, t)
    assert(st.count() == 3)
    assert(st.where(col("id") === 3).select(col("name")).head.getString(0)
      == "toasty payload")
    assert(st.where(col("id") === 1).count() == 0)
  }

  test("full IR (commit timestamps included) equals batch under txn-boundary splits") {
    val byTxn = Seq(lines.take(5), lines.slice(5, 9), lines.drop(9))
    val perBatch = drain(byTxn)
    val streamed = perBatch.reduce(_ unionByName _)
    val batch = decode({
      val s = spark; import s.implicits._
      lines.toDF("lsn", "xid", "data")
    })
    assert(irOf(streamed) == irOf(batch))
    // every IR row carries its txn's commit time under txn-boundary drains
    assert(streamed.where(col("ts_ms").isNull).count() == 0)
  }
}
