package graft.cdc.types

import org.scalatest.funsuite.AnyFunSuite
import java.math.BigDecimal

/** F11/F16 value conversions and the T8 assigner state machine — pure-logic
  * operators with no DuckDB oracle.
  */
class ConversionsSpec extends AnyFunSuite {

  test("Debezium precise decimal round-trips incl. negative and zero") {
    for (s <- Seq("123.45", "-0.0001", "0", "99999999999999999999.99", "-42")) {
      val v = new BigDecimal(s)
      val (bytes, scale) = Conversions.encodeDebeziumDecimal(v)
      assert(Conversions.decodeDebeziumDecimal(bytes, scale) == v)
    }
    assert(Conversions.decodeDebeziumDecimal(null, 2) == null)
  }

  test("known Debezium encoding decodes: unscaled 12345, scale 2 -> 123.45") {
    val bytes = java.math.BigInteger.valueOf(12345).toByteArray
    assert(Conversions.decodeDebeziumDecimal(bytes, 2) == new BigDecimal("123.45"))
  }

  test("Decimal128 edges: NaN null, infinities clamp to double max") {
    assert(Conversions.decimal128ToBigDecimal("NaN") == null)
    assert(Conversions.decimal128ToBigDecimal(null) == null)
    assert(Conversions.decimal128ToBigDecimal("Infinity") ==
      BigDecimal.valueOf(Double.MaxValue))
    assert(Conversions.decimal128ToBigDecimal("-Infinity") ==
      BigDecimal.valueOf(Double.MinValue))
    assert(Conversions.decimal128ToBigDecimal("3.14") == new BigDecimal("3.14"))
  }

  test("server-time-zone DATETIME interpretation incl. DST gap and overlap") {
    import java.time.{LocalDateTime, ZoneId}
    val berlin = ZoneId.of("Europe/Berlin")
    // plain wall time: 2024-01-15 12:00 Berlin = 11:00 UTC
    assert(Conversions.datetimeToEpochMillis(
      LocalDateTime.of(2024, 1, 15, 12, 0), berlin) == 1705316400000L)
    // UTC zone is identity
    assert(Conversions.datetimeToEpochMillis(
      LocalDateTime.of(2024, 1, 15, 12, 0), ZoneId.of("UTC")) == 1705320000000L)
    // DST gap (2024-03-31 02:30 doesn't exist in Berlin) shifts forward
    val gap = Conversions.datetimeToEpochMillis(
      LocalDateTime.of(2024, 3, 31, 2, 30), berlin)
    assert(gap == Conversions.datetimeToEpochMillis(
      LocalDateTime.of(2024, 3, 31, 3, 30), berlin))
    // DST overlap (2024-10-27 02:30 occurs twice) takes the earlier offset
    val overlap = Conversions.datetimeToEpochMillis(
      LocalDateTime.of(2024, 10, 27, 2, 30), berlin)
    assert(overlap == 1729989000000L) // 00:30 UTC, the +02:00 reading
  }

  test("assigner state machine walks the reference diagram") {
    import Assigner._
    val s1 = InitialAssigning.onFinish()
    assert(s1 == InitialAssigningFinished)
    val s2 = s1.suspend()
    assert(s2 == Suspended)
    val s3 = s2.wakeup()
    assert(s3 == NewlyAddedAssigning)
    val s4 = s3.onFinish()
    assert(s4 == NewlyAddedAssigningFinished)
    assert(s4.suspend() == Suspended)
    // status codes round-trip
    (0 to 4).foreach(c => assert(fromStatusCode(c).code == c))
  }

  test("illegal transitions throw like the reference") {
    import Assigner._
    intercept[IllegalStateException](InitialAssigning.suspend())
    intercept[IllegalStateException](InitialAssigning.wakeup())
    intercept[IllegalStateException](Suspended.onFinish())
    intercept[IllegalStateException](NewlyAddedAssigning.wakeup())
    intercept[IllegalArgumentException](fromStatusCode(9))
  }

  test("capture-list diff finds new and removed tables") {
    val (added, removed) =
      Assigner.diffCaptureList(Set("a", "b"), Set("b", "c", "d"))
    assert(added == Set("c", "d") && removed == Set("a"))
  }
}
