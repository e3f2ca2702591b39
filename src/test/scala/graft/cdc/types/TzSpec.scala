package graft.cdc.types

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** The Column form of the server-time-zone conversion must agree with the
  * scalar form — including on DST gap/overlap wall times.
  */
class TzSpec extends SparkTestBase {

  test("ntzWithServerTz agrees with datetimeToEpochMillis incl. DST edges") {
    val s = spark
    import s.implicits._
    val walls = Seq(
      "2024-01-15T12:00:00", // plain winter time
      "2024-07-01T00:30:00", // summer time
      "2024-03-31T02:30:00", // DST gap in Berlin
      "2024-10-27T02:30:00"  // DST overlap in Berlin
    )
    val zone = "Europe/Berlin"
    val got = walls.toDF("w")
      .select(unix_millis(
        Conversions.ntzWithServerTz(col("w").cast("timestamp_ntz"), zone)
          .cast("timestamp")).as("ms"))
      .collect().map(_.getLong(0))
    val expect = walls.map(w =>
      Conversions.datetimeToEpochMillis(
        java.time.LocalDateTime.parse(w), java.time.ZoneId.of(zone)))
    got.zip(expect).zip(walls).foreach { case ((g, e), w) =>
      assert(g == e, s"wall time $w: column=$g scalar=$e")
    }
  }
}
