package graft.cdc.streaming

import graft.SparkTestBase
import graft.cdc.model.Changelog
import graft.cdc.source.CdcSource
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The Debezium-topic adapter must be a faithful transport: encode->decode
  * round-trips the changelog IR exactly, and the facade's startup algebra +
  * stateful materialization produce the same results through a Kafka-shaped
  * stream as through the file-backed path.
  */
/** A Kafka source record, as a MemoryStream-able case class with exactly
  * the kafka source column names (top-level: Spark cannot derive encoders
  * for suite-inner classes).
  */
case class KafkaRecord(
    key: Array[Byte], value: Array[Byte], topic: String, partition: Int, offset: Long)

class KafkaEnvelopeSpec extends SparkTestBase {
  import StreamingOps._

  private def kafkaShaped = KafkaEnvelope.encode(
    Changelog.changelog(spark, sfDir), topic = "inventory.users", nPartitions = 4)

  test("encode -> decode round-trips the changelog IR bit-exactly") {
    val decoded = KafkaEnvelope.decode(kafkaShaped)
      .select("offset", "pk", "op", "ts_ms", "val", "table_name")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
        r.getDouble(4), r.getString(5)))
      .toSet
    val original = Changelog.changelog(spark, sfDir)
      .select(col("offset"), col("pk"), col("op"), col("ts_ms"), col("val"),
        graft.cdc.merge.ChangelogOps.tableNameCol.as("t"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
        r.getDouble(4), r.getString(5)))
      .toSet
    assert(decoded == original)
    assert(decoded.nonEmpty)
  }

  test("decode orders by the envelope's source.pos, not the transport offset") {
    // real Kafka offsets are per-partition monotone only: simulate the
    // collision by replacing the transport offset with a per-partition
    // sequence (0,1,2,... within each partition) — the IR offset must still
    // be the envelope's global source.pos, bit-exact
    import org.apache.spark.sql.expressions.Window
    val perPartition = kafkaShaped.withColumn("offset",
      row_number().over(Window.partitionBy(col("partition")).orderBy(col("offset"))).cast("long") - 1)
    // transport offsets now collide across partitions
    assert(perPartition.groupBy("offset").count().where(col("count") > 1).count() > 0)
    val decoded = KafkaEnvelope.decode(perPartition).select("offset").collect()
      .map(_.getLong(0)).toSet
    val original = Changelog.changelog(spark, sfDir).select("offset").collect()
      .map(_.getLong(0)).toSet
    assert(decoded == original)
  }

  test("deletes carry the image in before, upserts in after (Debezium contract)") {
    val env = kafkaShaped.select(col("value").cast("string").as("v"))
    val parsed = env.select(from_json(col("v"), KafkaEnvelope.envelopeSchema).as("e"))
    val bad = parsed.where(
      (col("e.op") === "d" && (col("e.before").isNull || col("e.after").isNotNull)) ||
        (col("e.op") =!= "d" && (col("e.after").isNull || col("e.before").isNotNull)))
    assert(bad.count() == 0)
  }

  test("streamed upsert state through the Kafka adapter equals batch materialization") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext

    val records = kafkaShaped.collect()
      .map(r => KafkaRecord(r.getAs[Array[Byte]](0), r.getAs[Array[Byte]](1),
        r.getString(2), r.getInt(3), r.getLong(4)))
      .sortBy(_.offset)

    val stream = MemoryStream[KafkaRecord]
    val cl = CdcSource.read(spark)
      .option("scan.startup.mode", "earliest-offset")
      .loadStreamFrom(stream.toDS().toDF())
      .select(col("offset"), col("pk"), col("op"), col("ts_ms"), col("val").as("value"))
      .as[ChangeRecord]
    val q = upsertMaterializeStream(cl)
      .writeStream.format("memory").queryName("kafka_state_sink")
      .outputMode("update").start()

    val (b1, b2) = records.splitAt(records.length / 2)
    stream.addData(b1.toIndexedSeq); q.processAllAvailable()
    stream.addData(b2.toIndexedSeq); q.processAllAvailable()

    val streamed = spark.table("kafka_state_sink")
      .groupBy($"pk")
      .agg(max_by(struct($"last_offset", $"last_op", $"value"), $"last_offset").as("s"))
      .select($"pk", $"s.last_offset", $"s.last_op", $"s.value")
      .where($"s.last_op" =!= "d")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3)))
      .toSet
    q.stop()

    val batch = Changelog.upsertMaterialize(
      Changelog.changelog(spark, sfDir).limit(0),
      Changelog.changelog(spark, sfDir)
    ).collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3))).toSet

    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("startup algebra and capture-list filter apply through the adapter") {
    val ts = 1704844800000L
    // timestamp startup mode prunes the decoded stream exactly like the
    // file path (P6/P10)
    val viaAdapter = CdcSource.read(spark)
      .option("scan.startup.mode", "timestamp")
      .option("scan.startup.timestamp-millis", ts)
      .loadStreamFrom(kafkaShaped)
      .count()
    val direct = Changelog.changelog(spark, sfDir).where(col("ts_ms") >= ts).count()
    assert(viaAdapter == direct && direct > 0)

    // P7: the table filter keys off the envelope's source.table
    val oneTable = CdcSource.read(spark)
      .option("table-name", "users_[01]")
      .option("scan.startup.mode", "earliest-offset")
      .loadStreamFrom(kafkaShaped)
    val expected = Changelog.changelog(spark, sfDir)
      .where(pmod(col("pk"), lit(3)) < 2).count()
    assert(oneTable.count() == expected)
    assert(!oneTable.columns.contains("table_name"))
  }
}
