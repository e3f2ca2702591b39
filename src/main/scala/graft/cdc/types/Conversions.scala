package graft.cdc.types

import java.math.{BigInteger, MathContext}

/** Pure value-level conversions with no SQL equivalent, mirrored from the
  * reference's deserializer edge rules.
  */
object Conversions {

  /** F11 — Debezium "precise" decimal decode: the wire value is the
    * two's-complement big-endian bytes of the unscaled BigInteger plus a
    * scale from the schema (public Kafka-Connect `Decimal` encoding;
    * reference consumes it at RowDataDebeziumDeserializeSchema.java:555-587).
    */
  def decodeDebeziumDecimal(unscaled: Array[Byte], scale: Int): java.math.BigDecimal =
    if (unscaled == null) null
    else new java.math.BigDecimal(new BigInteger(unscaled), scale)

  /** Inverse, for round-trip tests. */
  def encodeDebeziumDecimal(value: java.math.BigDecimal): (Array[Byte], Int) =
    (value.unscaledValue.toByteArray, value.scale)

  /** F7 — server-time-zone DATETIME interpretation: MySQL DATETIME is a
    * wall-clock value; the reference converts it to an instant relative to
    * the configured `server-time-zone`
    * (RowDataDebeziumDeserializeSchema.java:469-495, TemporalConversions).
    * DST gaps shift forward and overlaps take the earlier offset, the
    * java.time/ZonedDateTime rules the reference inherits.
    */
  def datetimeToEpochMillis(wall: java.time.LocalDateTime, serverZone: java.time.ZoneId): Long =
    wall.atZone(serverZone).toInstant.toEpochMilli

  /** Column form of the same conversion for TIMESTAMP_NTZ columns:
    * interpret the wall time in `serverZone`, yielding a UTC instant.
    */
  def ntzWithServerTz(ntz: org.apache.spark.sql.Column, serverZone: String): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.to_utc_timestamp(ntz, serverZone)

  /** F16 — BSON Decimal128 edge handling
    * (MongoDBConnectorDeserializationSchema.java:657-688, 772-792):
    * NaN -> null; +Infinity -> Double.MAX_VALUE; -Infinity -> -MAX_VALUE;
    * else the decimal value.
    */
  def decimal128ToBigDecimal(repr: String): java.math.BigDecimal = repr match {
    case null => null
    case "NaN" => null
    case "Infinity" => java.math.BigDecimal.valueOf(Double.MaxValue)
    case "-Infinity" => java.math.BigDecimal.valueOf(Double.MinValue)
    case s => new java.math.BigDecimal(s, MathContext.DECIMAL128)
  }
}

/** T8 — the enumerator's newly-added-tables finite state machine, mirrored
  * exactly from AssignerStatus.java:25-110 (same states, same legal
  * transitions, same IllegalStateException on misuse). In the Spark build
  * this drives the restart-with-new-table-list operational pattern: a
  * suspended assigner means "stop the stream, chunk the new tables as batch
  * snapshots (NewTablesPlanner), then resume".
  */
object Assigner {

  sealed abstract class Status(val code: Int) {
    def onFinish(): Status =
      throw new IllegalStateException(
        s"Invalid call, assigner under $this state can not call onFinish()")
    def suspend(): Status =
      throw new IllegalStateException(
        s"Invalid call, assigner under $this state can not call suspend()")
    def wakeup(): Status =
      throw new IllegalStateException(
        s"Invalid call, assigner under $this state can not call wakeup()")
  }

  case object InitialAssigning extends Status(0) {
    override def onFinish(): Status = InitialAssigningFinished
  }
  case object InitialAssigningFinished extends Status(1) {
    override def suspend(): Status = Suspended
  }
  case object Suspended extends Status(2) {
    override def wakeup(): Status = NewlyAddedAssigning
  }
  case object NewlyAddedAssigning extends Status(3) {
    override def onFinish(): Status = NewlyAddedAssigningFinished
  }
  case object NewlyAddedAssigningFinished extends Status(4) {
    override def suspend(): Status = Suspended
  }

  def fromStatusCode(code: Int): Status = code match {
    case 0 => InitialAssigning
    case 1 => InitialAssigningFinished
    case 2 => Suspended
    case 3 => NewlyAddedAssigning
    case 4 => NewlyAddedAssigningFinished
    case c => throw new IllegalArgumentException(s"unknown status code $c")
  }

  /** Table-list diff driving the SUSPENDED transition: which tables need a
    * fresh snapshot phase, which were dropped from capture
    * (MySqlSnapshotSplitAssigner.java:220-231).
    */
  def diffCaptureList(alreadyCaptured: Set[String], discovered: Set[String])
      : (Set[String], Set[String]) =
    (discovered -- alreadyCaptured, alreadyCaptured -- discovered)
}
