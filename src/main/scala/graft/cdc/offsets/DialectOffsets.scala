package graft.cdc.offsets

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Per-dialect log-position encodings — the LSN/SCN family the reference's
  * remaining connectors checkpoint on (the mysql file/pos+GTID, Mongo
  * resume-token, and TiDB resolvedTs algebras live in their own modules):
  *
  *   - Postgres WAL LSN: textual `X/Y`, two upper-hex halves of an unsigned
  *     64-bit position (pg renders `%X/%X`; the reference's postgres
  *     connector checkpoints it through the Debezium offset map,
  *     flink-connector-postgres-cdc/.../PostgreSQLTableSource.java).
  *   - SQL Server LSN: 10 bytes rendered `vvvvvvvv:bbbbbbbb:ssss` (4-byte
  *     VLF sequence, 4-byte log block, 2-byte slot), compared
  *     byte-lexicographically — so the CANONICAL zero-padded lowercase text
  *     orders identically to the (vlf, block, slot) tuple. The db2
  *     connector's 16-hex LSN shares the same canonical-text lemma.
  *   - Oracle SCN: an arbitrary-precision unsigned numeric string with
  *     empty-string and NO_STOPPING sentinel branches in the total order
  *     (reference: flink-connector-oracle-cdc/.../RedoLogOffset.java:69-97 —
  *     sentinel checked before any numeric compare, empty sorts below
  *     non-empty).
  *
  * Driver-side case classes back planner state (split assignment, startup
  * resolution) exactly like [[BinlogOffsets.Offset]] / [[MongoOffsets
  * .ChangeStreamOffset]]; Column forms are exact hex/integer arithmetic so
  * DuckDB can replicate them for the oracle. All render columns null out
  * unrepresentable inputs instead of emitting truncated text (the
  * [[MongoOffsets.tokenCol]] rule), and all decode columns null out
  * malformed text instead of silently conv-ing garbage to 0 — pair with the
  * P9 validator hook where the reference would throw.
  *
  * Scale: every form here is a narrow per-row projection or a
  * scan-pushable filter; nothing shuffles.
  */
object DialectOffsets {

  private val Dec20 = DecimalType(20, 0)

  // -------------------------------------------------------------------
  // Postgres LSN
  // -------------------------------------------------------------------

  /** Planner-side Postgres WAL position: unsigned 64-bit. */
  final case class PgLsn(value: BigInt) {
    require(value >= 0 && value <= PgLsn.MaxValue, s"LSN out of uint64: $value")
    def hi: Long = (value >> 32).toLong
    def lo: Long = (value & 0xffffffffL).toLong
    /** pg's `%X/%X` rendering (upper hex, no padding). */
    def render: String = f"${hi.toHexString.toUpperCase}/${lo.toHexString.toUpperCase}"
  }

  object PgLsn {
    val MaxValue: BigInt = (BigInt(1) << 64) - 1

    private val Pat = "^([0-9A-Fa-f]{1,8})/([0-9A-Fa-f]{1,8})$".r

    /** Parse `X/Y`; throws on malformed text (driver side — the column form
      * nulls instead).
      */
    def parse(s: String): PgLsn = s match {
      case Pat(h, l) => PgLsn((BigInt(h, 16) << 32) | BigInt(l, 16))
      case _ => throw new IllegalArgumentException(s"malformed pg LSN: $s")
    }

    /** Unsigned total order (Debezium compares the 64-bit position
      * unsigned; BigInt on the non-negative domain is exactly that).
      */
    def compare(a: PgLsn, b: PgLsn): Int = a.value.compare(b.value)
  }

  private val pgLsnPattern = "^[0-9A-Fa-f]{1,8}/[0-9A-Fa-f]{1,8}$"

  /** Render (hi, lo) halves as pg LSN text. Nulls when either half is
    * outside uint32 — hex() of a wider value would silently produce a
    * misparsing token.
    */
  def pgLsnText(hi: Column, lo: Column): Column = {
    val h = hi.cast("long")
    val l = lo.cast("long")
    val inRange = (c: Column) => c >= 0L && c <= 0xffffffffL
    when(inRange(h) && inRange(l), concat(hex(h), lit("/"), hex(l)))
  }

  /** Decode pg LSN text to its unsigned 64-bit value as DECIMAL(20,0)
    * (the full uint64 domain — a signed long would wrap the top half).
    * Malformed text decodes to null, never to conv()'s silent 0.
    */
  def pgLsnValue(lsn: Column): Column = {
    val hi = conv(split(lsn, "/").getItem(0), 16, 10).cast(Dec20)
    val lo = conv(split(lsn, "/").getItem(1), 16, 10).cast(Dec20)
    when(lsn.rlike(pgLsnPattern), (hi * lit(4294967296L) + lo).cast(Dec20))
  }

  // -------------------------------------------------------------------
  // SQL Server LSN (and the db2 16-hex variant)
  // -------------------------------------------------------------------

  /** Planner-side SQL Server log sequence number. All-zero is the NIL LSN
    * (unavailable — Debezium's Lsn.NULL), below every real position.
    */
  final case class SqlServerLsn(vlf: Long, block: Long, slot: Long) {
    require(vlf >= 0 && vlf <= 0xffffffffL && block >= 0 && block <= 0xffffffffL
      && slot >= 0 && slot <= 0xffffL, s"LSN component out of range: $this")
    def isAvailable: Boolean = vlf != 0 || block != 0 || slot != 0
    /** Canonical fixed-width lowercase text — lexicographic order on this
      * rendering equals the (vlf, block, slot) tuple order (the byte-compare
      * the wire format defines).
      */
    def render: String = f"$vlf%08x:$block%08x:$slot%04x"
  }

  object SqlServerLsn {
    val Nil_ : SqlServerLsn = SqlServerLsn(0, 0, 0)

    private val Pat = "^([0-9a-fA-F]{8}):([0-9a-fA-F]{8}):([0-9a-fA-F]{4})$".r

    def parse(s: String): SqlServerLsn = s match {
      case Pat(v, b, sl) =>
        SqlServerLsn(java.lang.Long.parseLong(v, 16),
          java.lang.Long.parseLong(b, 16), java.lang.Long.parseLong(sl, 16))
      case _ => throw new IllegalArgumentException(s"malformed sqlserver LSN: $s")
    }

    /** Component-wise order == byte order of the 10-byte wire form. */
    def compare(a: SqlServerLsn, b: SqlServerLsn): Int = {
      val c1 = java.lang.Long.compare(a.vlf, b.vlf)
      if (c1 != 0) c1
      else {
        val c2 = java.lang.Long.compare(a.block, b.block)
        if (c2 != 0) c2 else java.lang.Long.compare(a.slot, b.slot)
      }
    }
  }

  private val mssqlLsnPattern = "^[0-9a-fA-F]{8}:[0-9a-fA-F]{8}:[0-9a-fA-F]{4}$"

  /** Render (vlf, block, slot) as the canonical padded-lowercase LSN text.
    * Because the padding is fixed-width, plain string `>` on two rendered
    * LSNs is the wire byte order — the startup filter needs no decode at
    * all. Out-of-range components null the whole LSN.
    */
  def mssqlLsnText(vlf: Column, block: Column, slot: Column): Column = {
    val v = vlf.cast("long"); val b = block.cast("long"); val s = slot.cast("long")
    val u32 = (c: Column) => c >= 0L && c <= 0xffffffffL
    when(u32(v) && u32(b) && s >= 0L && s <= 0xffffL,
      concat(
        lpad(lower(hex(v)), 8, "0"), lit(":"),
        lpad(lower(hex(b)), 8, "0"), lit(":"),
        lpad(lower(hex(s)), 4, "0")))
  }

  /** Decode one component (1-based hex substring positions 1/10/19) from
    * canonical LSN text; malformed text decodes to null.
    */
  private def mssqlPart(lsn: Column, pos: Int, len: Int): Column =
    when(lsn.rlike(mssqlLsnPattern),
      conv(substring(lsn, pos, len), 16, 10).cast("long"))

  def mssqlVlf(lsn: Column): Column = mssqlPart(lsn, 1, 8)
  def mssqlBlock(lsn: Column): Column = mssqlPart(lsn, 10, 8)
  def mssqlSlot(lsn: Column): Column = mssqlPart(lsn, 19, 4)

  /** Planner-side db2 LSN: unsigned, canonically 16 lower-hex digits —
    * same canonical-text order lemma as SQL Server.
    */
  final case class Db2Lsn(value: BigInt) {
    require(value >= 0 && value <= PgLsn.MaxValue, s"LSN out of uint64: $value")
    def render: String = {
      val hexStr = value.toString(16)
      ("0" * (16 - hexStr.length)) + hexStr
    }
  }

  object Db2Lsn {
    private val Pat = "^[0-9a-fA-F]{16}$".r
    def parse(s: String): Db2Lsn =
      if (Pat.matches(s)) Db2Lsn(BigInt(s, 16))
      else throw new IllegalArgumentException(s"malformed db2 LSN: $s")
    def compare(a: Db2Lsn, b: Db2Lsn): Int = a.value.compare(b.value)
  }

  // -------------------------------------------------------------------
  // Oracle SCN (RedoLogOffset.java:69-97)
  // -------------------------------------------------------------------

  /** Planner-side redo-log position. `scn` None models the reference's
    * empty/absent SCN string branches; the NO_STOPPING sentinel is the
    * reserved Long.MIN_VALUE value the reference constructs it with
    * (RedoLogOffset.NO_STOPPING_OFFSET) — identified by equality BEFORE any
    * numeric compare, so its "value" never participates in arithmetic.
    */
  final case class ScnOffset(scn: Option[BigInt]) {
    def isNoStopping: Boolean = scn.contains(ScnOffset.NoStoppingMark)
  }

  object ScnOffset {
    private[offsets] val NoStoppingMark = BigInt(Long.MinValue)
    val Initial: ScnOffset = ScnOffset(Some(BigInt(0)))
    val NoStopping: ScnOffset = ScnOffset(Some(NoStoppingMark))

    /** The reference's compareTo, branch for branch: sentinel first, then
      * the empty-vs-nonempty cases (empty sorts low), then numeric.
      */
    def compare(a: ScnOffset, b: ScnOffset): Int =
      if (a.isNoStopping && b.isNoStopping) 0
      else if (a.isNoStopping) 1
      else if (b.isNoStopping) -1
      else (a.scn, b.scn) match {
        case (Some(x), Some(y)) => x.compare(y)
        case (None, Some(_)) => -1
        case (Some(_), None) => 1
        case (None, None) => 0
      }
  }

  /** Column form of the same-branch comparison against a fixed non-empty
    * target SCN: -1/0/1. Empty or null SCN text sorts below the target
    * (the reference's StringUtils.isNotEmpty branches); numeric compare is
    * DECIMAL(38,0) — SCNs are unbounded-precision, a double would round.
    */
  def scnCompare(scn: Column, target: BigInt): Column = {
    require(target != ScnOffset.NoStoppingMark, "target must be a real SCN")
    val t = lit(target.toString).cast(DecimalType(38, 0))
    when(scn.isNull || scn === "", lit(-1))
      .otherwise(signum(scn.cast(DecimalType(38, 0)) - t).cast("int"))
  }
}
