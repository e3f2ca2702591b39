package graft.cdc.offsets

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import MongoOffsets._

/** Resume-token decode + ChangeStreamOffset order laws (reference
  * ChangeStreamOffset.java:98-104, ResumeTokenUtils.java:40-75).
  */
class MongoOffsetsSpec extends SparkTestBase {

  test("hex token round-trips through encode column and driver-side parse") {
    val s = spark
    import s.implicits._
    val cases = Seq((0L, 0L), (1L, 2L), (1704844800L, 123L),
      (Int.MaxValue.toLong, Int.MaxValue.toLong))
    val rows = cases.toDF("t", "i")
      .select(col("t"), col("i"), tokenCol(col("t"), col("i")).as("token"))
      .withColumn("decoded", decodeTsValue(col("token")))
      .collect()
    rows.foreach { r =>
      val (t, i, token, decoded) = (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3))
      assert(decoded == ((t << 32) | i))
      val parsed = parseHex(token)
      assert(parsed.tsValue == decoded)
      assert(parsed.seconds == t && parsed.increment == i)
    }
  }

  test("offsets order by timestamp value only; NO_STOPPING is maximal") {
    val a = ChangeStreamOffset((10L << 32) | 5L, Some("{\"_data\":\"aaaa\"}"))
    val b = ChangeStreamOffset((10L << 32) | 5L, Some("{\"_data\":\"bbbb\"}"))
    val c = ChangeStreamOffset((10L << 32) | 6L, None)
    val d = ChangeStreamOffset((11L << 32) | 0L, None)
    assert(compare(a, b) == 0, "resume token must not participate in the order")
    assert(compare(a, c) < 0 && compare(c, d) < 0)
    for (o <- Seq(a, b, c, d)) assert(compare(o, NoStopping) < 0)
    assert(compare(NoStopping, NoStopping) == 0)
    assert(NoStopping.seconds == Int.MaxValue.toLong && NoStopping.increment == Int.MaxValue.toLong)
  }

  test("out-of-uint32-range encode inputs yield null, never a truncated token") {
    val s = spark
    import s.implicits._
    // 2^32 (seconds overflow — the year-2106 case), unbounded increment,
    // and negatives: all unrepresentable in the 8-hex-digit KeyString slots
    val cases = Seq((4294967296L, 0L), (0L, 4294967296L), (-1L, 0L), (0L, -1L),
      (Long.MaxValue, Long.MaxValue))
    val rows = cases.toDF("t", "i")
      .select(tokenCol(col("t"), col("i")).as("token")).collect()
    rows.foreach(r => assert(r.isNullAt(0), s"expected null token, got ${r.get(0)}"))
    // boundary values still encode
    val ok = Seq((4294967295L, 4294967295L)).toDF("t", "i")
      .select(tokenCol(col("t"), col("i")).as("token")).collect()(0).getString(0)
    assert(ok == "82ffffffffffffffff")
  }

  test("undersized tokens decode to null, not a partial-substring offset") {
    val s = spark
    import s.implicits._
    val rows = Seq("82", "8200000001", "82000000010000000", "").toDF("token")
      .select(decodeTsValue(col("token")).as("v")).collect()
    rows.foreach(r => assert(r.isNullAt(0)))
  }

  test("non-timestamp kType: column decode nulls, driver parse throws") {
    val s = spark
    import s.implicits._
    val bad = Seq("7f0000000100000002").toDF("token")
      .select(decodeTsValue(col("token")).as("v")).collect()(0)
    assert(bad.isNullAt(0))
    intercept[IllegalArgumentException](parseHex("7f0000000100000002"))
  }
}
