package graft.cdc.source

import graft.SparkTestBase
import graft.cdc.model.Changelog
import org.apache.spark.sql.functions._
import CdcSource.ValidationException

/** M5 — facade option validation (mirrors MySqlTableSourceFactoryTest
  * scenarios) and startup-mode semantics.
  */
class CdcSourceSpec extends SparkTestBase {

  private def reader = CdcSource.read(spark)

  test("initial mode = snapshot + log (no snapshot reads from the log)") {
    val df = reader.load(sfDir)
    assert(df.where(col("offset") === -1L).count() == 150) // snapshot rows
    assert(df.where(col("op") === "r" && col("offset") >= 0).count() == 0)
  }

  test("earliest mode = full changelog; latest = empty bounded view") {
    assert(reader.option("scan.startup.mode", "earliest-offset").load(sfDir).count() ==
      Changelog.changelog(spark, sfDir).count())
    assert(reader.option("scan.startup.mode", "latest-offset").load(sfDir).count() == 0)
  }

  test("timestamp mode filters by ts and requires the option") {
    val t = 1704844800000L
    val df = CdcSource.read(spark)
      .option("scan.startup.mode", "timestamp")
      .option("scan.startup.timestamp-millis", t)
      .load(sfDir)
    assert(df.agg(min(col("ts_ms"))).collect()(0).getLong(0) >= t)
    intercept[ValidationException] {
      CdcSource.read(spark).option("scan.startup.mode", "timestamp").load(sfDir)
    }
  }

  test("specific-offset requires gtid or file+pos; file+pos filters correctly") {
    intercept[ValidationException] {
      CdcSource.read(spark).option("scan.startup.mode", "specific-offset").load(sfDir)
    }
    intercept[ValidationException] {
      CdcSource.read(spark).option("scan.startup.mode", "specific-offset")
        .option("scan.startup.specific-offset.file", "mysql-bin.000001").load(sfDir)
    }
    val df = CdcSource.read(spark)
      .option("scan.startup.mode", "specific-offset")
      .option("scan.startup.specific-offset.file", "mysql-bin.000002")
      .option("scan.startup.specific-offset.pos", 500L)
      .load(sfDir)
    // (file,pos) > (000002, 500) <=> offset >= 250*2 + 125  (pos = 4m+4 > 500 => m > 124)
    assert(df.agg(min(col("offset"))).collect()(0).getLong(0) == 625L)
  }

  test("gtid-set start excludes contained prefix") {
    val df = CdcSource.read(spark)
      .option("scan.startup.mode", "specific-offset")
      .option("scan.startup.specific-offset.gtid-set", "s1:1-100")
      .load(sfDir)
    assert(df.agg(min(col("offset"))).collect()(0).getLong(0) == 100L)
  }

  test("invalid options raise reference-style validation errors") {
    intercept[ValidationException] {
      CdcSource.read(spark).option("scan.startup.mode", "bogus").load(sfDir)
    }
    intercept[ValidationException] {
      CdcSource.read(spark).option("table-name", "users_[").load(sfDir)
    }
    intercept[ValidationException] {
      CdcSource.read(spark).option("scan.incremental.snapshot.chunk.size", 0L).load(sfDir)
    }
    intercept[ValidationException] {
      CdcSource.read(spark)
        .option("chunk-key.even-distribution.factor.upper-bound", "0.5").load(sfDir)
    }
    intercept[ValidationException] {
      CdcSource.read(spark)
        .option("chunk-key.even-distribution.factor.lower-bound", "1.5").load(sfDir)
    }
  }

  test("initial mode applies the table filter to the snapshot side too") {
    val df = CdcSource.read(spark)
      .option("table-name", "users_1")
      .load(sfDir)
    // snapshot rows (offset -1) must respect the same capture list
    assert(df.where(col("offset") === -1L && pmod(col("pk"), lit(3)) =!= 1).count() == 0)
    assert(df.where(col("offset") === -1L).count() > 0)
  }

  test("streaming face: timestamp startup over readStream equals the batch filter") {
    val t = 1704844800000L
    val stream = CdcSource.read(spark)
      .option("scan.startup.mode", "timestamp")
      .option("scan.startup.timestamp-millis", t)
      .loadStream(sfDir)
    assert(stream.isStreaming)
    val q = stream.writeStream.format("memory").queryName("cdc_stream_sink")
      .outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("cdc_stream_sink")
    val batch = CdcSource.read(spark)
      .option("scan.startup.mode", "timestamp")
      .option("scan.startup.timestamp-millis", t)
      .load(sfDir)
    assert(streamed.count() == batch.count())
    assert(streamed.agg(min(col("ts_ms"))).collect()(0).getLong(0) >= t)
  }

  test("streaming face rejects initial mode with a guiding error") {
    val e = intercept[ValidationException] {
      CdcSource.read(spark).option("scan.startup.mode", "initial").loadStream(sfDir)
    }
    assert(e.getMessage.contains("upsertMaterializeStreamFrom"))
  }

  test("spark.read.format(graft-cdc) matches the builder facade incl. validation") {
    val viaFormat = spark.read.format("graft-cdc")
      .option("scan.startup.mode", "initial").load(sfDir)
    val viaBuilder = CdcSource.read(spark)
      .option("scan.startup.mode", "initial").load(sfDir)
    assert(viaFormat.schema == viaBuilder.schema)
    assert(viaFormat.count() == viaBuilder.count())
    // pruning + pushdown path: a filtered projection through the relation
    // returns the same rows as the builder form
    val f = viaFormat.where(col("pk") < 5).select("pk", "op")
    val b = viaBuilder.where(col("pk") < 5).select("pk", "op")
    assert(f.collect().map(_.toSeq).sortBy(_.toString).toSeq ==
      b.collect().map(_.toSeq).sortBy(_.toString).toSeq)
    // the format face validates like the builder
    val e = intercept[Exception] {
      spark.read.format("graft-cdc")
        .option("scan.startup.mode", "nope").load(sfDir).collect()
    }
    assert(e.getMessage.contains("scan.startup.mode"))
  }

  test("table-name regex filters shards") {
    val df = CdcSource.read(spark)
      .option("scan.startup.mode", "earliest-offset")
      .option("table-name", "users_[01]")
      .load(sfDir)
    assert(df.where(pmod(col("pk"), lit(3)) === 2).count() == 0)
    assert(df.count() > 0)
  }
}
