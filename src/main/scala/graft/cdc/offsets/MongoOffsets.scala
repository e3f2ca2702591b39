package graft.cdc.offsets

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Mongo change-stream offset algebra — resume tokens and their total order
  * (reference: flink-connector-mongodb-cdc/.../offset/ChangeStreamOffset
  * .java:37-105, ResumeTokenUtils.java:40-75).
  *
  * A resume token's `_data` is a KeyString whose first byte is kType 130
  * (0x82) followed by a big-endian int32 seconds + int32 increment; the
  * offset's position is the BsonTimestamp value `(t << 32) | i` and offsets
  * compare by that value alone (resumeToken JSON is carried opaquely,
  * ChangeStreamOffset.compareTo:98-104). NO_STOPPING is the maximum
  * BsonTimestamp.
  *
  * Column forms are exact integer/hex arithmetic (engine-replicable for the
  * oracle); the driver-side case class backs planner state like
  * [[BinlogOffsets.Offset]] does for MySQL.
  */
object MongoOffsets {

  /** KeyString type tag for a timestamp. */
  val KTimestamp = 130

  /** Planner-side offset: BsonTimestamp value + opaque resume-token JSON. */
  final case class ChangeStreamOffset(tsValue: Long, resumeToken: Option[String]) {
    def seconds: Long = tsValue >>> 32
    def increment: Long = tsValue & 0xffffffffL
  }

  /** The reference's NO_STOPPING sentinel: maximum BsonTimestamp. */
  val NoStopping: ChangeStreamOffset =
    ChangeStreamOffset((Int.MaxValue.toLong << 32) | (Int.MaxValue.toLong & 0xffffffffL), None)

  /** Total order: by timestamp value only, unsigned like
    * BsonTimestamp.compareTo — the resume token does not participate.
    */
  def compare(a: ChangeStreamOffset, b: ChangeStreamOffset): Int =
    java.lang.Long.compareUnsigned(a.tsValue, b.tsValue)

  /** Driver-side decode of a hex `_data` KeyString (v0/v1 token format). */
  def parseHex(dataHex: String): ChangeStreamOffset = {
    require(dataHex.length >= 18, s"resume token too short: $dataHex")
    val kType = java.lang.Integer.parseInt(dataHex.substring(0, 2), 16)
    require(kType == KTimestamp, s"Unknown keyType of timestamp: $kType")
    val t = java.lang.Long.parseLong(dataHex.substring(2, 10), 16)
    val i = java.lang.Long.parseLong(dataHex.substring(10, 18), 16)
    ChangeStreamOffset((t << 32) | i, Some(dataHex))
  }

  /** Encode (seconds, increment) as the hex `_data` KeyString: "82" +
    * 8-hex-digit t + 8-hex-digit i (lowercase, like Mongo renders v1
    * tokens). Both fields are uint32 in the KeyString layout — values
    * outside [0, 2^32) cannot be represented (hex() would emit more than 8
    * digits and lpad would silently truncate to a CORRUPT token), so they
    * yield null instead, surfacing at the P9 validator hook.
    */
  def tokenCol(seconds: Column, increment: Column): Column = {
    val s = seconds.cast("long")
    val i = increment.cast("long")
    val inRange = (c: Column) => c >= 0L && c <= 0xffffffffL
    when(inRange(s) && inRange(i),
      concat(lit("82"),
        lpad(lower(hex(s)), 8, "0"),
        lpad(lower(hex(i)), 8, "0")))
  }

  /** Decode a hex `_data` KeyString column to the BsonTimestamp value
    * `(t << 32) | i`; null when the kType tag is not a timestamp OR the
    * token is shorter than the 18 hex digits the v0/v1 layout requires
    * (a truncated token would otherwise decode partial substrings into a
    * silently wrong offset). Pair with the P9 validator hook where the
    * reference would throw.
    */
  def decodeTsValue(token: Column): Column = {
    val kType = conv(substring(token, 1, 2), 16, 10).cast("int")
    val t = conv(substring(token, 3, 8), 16, 10).cast("long")
    val i = conv(substring(token, 11, 8), 16, 10).cast("long")
    when(length(token) >= 18 && kType === KTimestamp, shiftleft(t, 32).bitwiseOR(i))
  }
}
