package graft.cdc.streaming

import graft.SparkTestBase
import graft.cdc.model.{Changelog, RowImage, TableChangeCodec}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** T9 composed end-to-end — the mid-stream schema-change drill (reference:
  * MySqlRecordEmitter.java:109-121 records in-band DDL into schema history;
  * the restarted job rebuilds every table's schema from that state):
  *
  *   1. a checkpointed stream materializes the (pk, val) changelog into a
  *      Derby state table through the GENERIC composite-key sink
  *   2. a DDL event (op='s', payload = a TableChangeCodec document for
  *      `ALTER ... ADD k INT`) arrives IN the stream; the handler appends
  *      it to a schema-history table and the query stops
  *   3. the restart path DECODES the history payload, renders/applies the
  *      ALTER to the state table, and resumes from the SAME checkpoint
  *      with the widened (pk, val, k) schema — post-DDL events carry k in
  *      their props payload
  *   4. the final state must equal a from-scratch batch computation over
  *      the full log where k exists only from the DDL point on — state
  *      written before the DDL stays intact (val preserved, k null unless
  *      a post-DDL event rewrote the key)
  */
class SchemaEvolutionSpec extends SparkTestBase {
  import graft.cdc.model.ChangeEvent

  private val v1 = RowImage.DeclaredTable("users",
    StructType(Seq(StructField("pk", LongType), StructField("val", DoubleType))),
    pkCols = Seq("pk"))
  private val v2 = RowImage.DeclaredTable("users",
    StructType(Seq(StructField("pk", LongType), StructField("val", DoubleType),
      StructField("k", IntegerType))),
    pkCols = Seq("pk"))

  /** Batch rows -> the generic decoded-IR shape the RowImage sink consumes. */
  private def shape(batch: DataFrame, t: RowImage.DeclaredTable, withK: Boolean): DataFrame = {
    val img =
      if (withK) struct(col("pk"), col("val"),
        from_json(col("props"), StructType(Seq(StructField("k", IntegerType)))).getField("k").as("k")).cast(t.schema)
      else struct(col("pk"), col("val")).cast(t.schema)
    batch.where(col("op") =!= "s").select(
      col("offset"), col("op"),
      struct(col("pk")).cast(t.keyType).as("key"),
      when(col("op") === Changelog.OpDelete, lit(null).cast(t.schema))
        .otherwise(img).as("after"))
  }

  test("DDL mid-stream: stop, decode history, ALTER, resume checkpoint; state intact") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val url = s"jdbc:derby:${java.nio.file.Files.createTempDirectory("evo")}/db;create=true"
    val ckpt = java.nio.file.Files.createTempDirectory("evo_ckpt").toString

    val all = Changelog.changelog(spark, sfDir)
      .select("offset", "pk", "op", "ts_ms", "val", "props")
      .as[ChangeEvent].collect().sortBy(_.offset)
    val (head, tail) = all.splitAt((all.length * 6) / 10)
    val ddlPoint = head.last.offset

    // the in-band DDL event: op='s', payload = the ALTER TableChange doc
    val changeJson = spark.range(1)
      .select(TableChangeCodec.encode(
        TableChangeCodec.usersChange(lit("ALTER"), lit("users_0"))).as("j"))
      .collect().head.getString(0)
    val ddlEvent = ChangeEvent(ddlPoint + 1000000L, -1L, "s", 0L, 0.0, changeJson)

    RowImage.createStateTable(url, v1, "EVO_STATE")
    def jdbc[A](f: java.sql.Connection => A): A = {
      val c = java.sql.DriverManager.getConnection(url)
      try f(c) finally c.close()
    }
    jdbc(_.createStatement().executeUpdate(
      "CREATE TABLE SCHEMA_HIST (SEQ BIGINT PRIMARY KEY, CHANGE_JSON LONG VARCHAR)"))

    val sawDdl = new java.util.concurrent.atomic.AtomicBoolean(false)
    val stream = MemoryStream[ChangeEvent]

    // phase 1: v1 schema; the handler routes DDL frames into schema history
    def handler(withK: Boolean)(batch: DataFrame, id: Long): Unit = {
      val ddl = batch.where(col("op") === "s")
        .select("offset", "props").collect()
      if (ddl.nonEmpty) {
        jdbc { c =>
          val ps = c.prepareStatement(
            "INSERT INTO SCHEMA_HIST VALUES (?, ?)")
          try ddl.foreach { r =>
            ps.setLong(1, r.getLong(0)); ps.setString(2, r.getString(1))
            ps.executeUpdate()
          } catch { case _: java.sql.SQLIntegrityConstraintViolationException => ()
          } finally ps.close()
        }
        sawDdl.set(true)
      }
      RowImage.applyRows(shape(batch, if (withK) v2 else v1, withK), // generic sink
        if (withK) v2 else v1, url, "EVO_STATE")
    }

    val q1 = stream.toDF().writeStream
      .option("checkpointLocation", ckpt).outputMode("update")
      .foreachBatch(handler(withK = false) _).start()
    stream.addData(head.toIndexedSeq)
    q1.processAllAvailable()
    stream.addData(ddlEvent)
    q1.processAllAvailable()
    assert(sawDdl.get, "DDL event did not reach the schema-history handler")
    q1.stop() // the reference stops emitting and defers to schema recovery

    // restart path: decode the recorded history, apply the rendered change
    val hist = spark.read.jdbc(url, "SCHEMA_HIST", new java.util.Properties())
    val decoded = hist.select(
      TableChangeCodec.decode(col("CHANGE_JSON")).as("c"))
    val cols = decoded.select(explode(col("c.table.columns")).as("col"))
      .select("col.name", "col.typeName", "col.optional").collect()
      .map(r => (r.getString(0), r.getString(1), r.getBoolean(2)))
    assert(cols.contains(("k", "INT", true)), s"decoded columns: ${cols.mkString(",")}")
    assert(decoded.select(TableChangeCodec.ddl(col("c"))).collect()
      .head.getString(0).startsWith("ALTER TABLE inventory.users_0"))
    // the decoded spec drives the widening DDL on the state table
    jdbc(_.createStatement().executeUpdate("ALTER TABLE EVO_STATE ADD COLUMN K INTEGER"))

    // phase 2: SAME checkpoint, widened schema; the tail (with k payloads)
    // arrives through the stream
    val q2 = stream.toDF().writeStream
      .option("checkpointLocation", ckpt).outputMode("update")
      .foreachBatch(handler(withK = true) _).start()
    stream.addData(tail.toIndexedSeq)
    q2.processAllAvailable(); q2.stop()

    val got = RowImage.readState(spark, v2, url, "EVO_STATE").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        if (r.isNullAt(3)) None else Some(r.getInt(3)))).toSet

    // from-scratch: full-log merge where k exists only past the DDL point
    val expect = Changelog.changelog(spark, sfDir)
      .groupBy(col("pk"))
      .agg(max_by(struct(col("offset"), col("op"), col("val"), col("props")),
        col("offset")).as("last"))
      .where(col("last.op") =!= Changelog.OpDelete)
      .select(col("pk"), col("last.offset").as("last_offset"), col("last.val"),
        when(col("last.offset") > ddlPoint,
          from_json(col("last.props"), StructType(Seq(StructField("k", IntegerType)))).getField("k")).as("k"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        if (r.isNullAt(3)) None else Some(r.getInt(3)))).toSet

    assert(got == expect)
    assert(got.nonEmpty && got.exists(_._4.isDefined),
      "no post-DDL key carries the widened column")
  }
}
