package graft.cdc.source

import java.sql.DriverManager
import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxRows, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** The real streaming source architecture (S1/S3 as a Spark DataSourceV2
  * `MicroBatchStream`), mirroring the reference's split between a
  * driver-side enumerator that plans splits and checkpointed offsets, and
  * parallel readers that each pull one split over its own DB connection:
  *
  *   - reference `MySqlSource` builds the source and wires enumerator +
  *     readers (MySqlSource.java:94-273); here [[CdcStreamProvider]] /
  *     [[CdcStreamTable]] are the `readStream.format("graft-cdc-stream")`
  *     face registered via DataSourceRegister.
  *   - reference `MySqlSourceEnumerator` hands splits to readers
  *     (MySqlSourceEnumerator.java:129-146); here
  *     [[CdcMicroBatchStream.planInputPartitions]] slices the (start, end]
  *     log-offset range into chunk-sized [[CdcChunk]] splits on the driver.
  *   - reference `MySqlSourceReader` pulls its split records and reports
  *     finished offsets (MySqlSourceReader.java:240-247); here
  *     [[CdcPartitionReader]] runs one pushed-down range `SELECT` per split
  *     on an executor-local JDBC connection with the validated fetchsize.
  *   - reference offsets are checkpointed through Flink state
  *     (MySqlSplitSerializer); here [[CdcStreamOffset]] round-trips through
  *     Spark's offset log as JSON, so `checkpointLocation` restart resumes
  *     exactly where the last committed micro-batch ended.
  *
  * The change log being tailed is any JDBC table with a unique monotone
  * `SEQ` column plus the changelog IR columns — in tests an embedded Derby
  * table (the live-DB stand-in proven by JdbcScanSpec) that an external
  * writer appends to while the stream runs. SEQ may be SPARSE (real log
  * positions are: binlog offsets jump, purged segments leave holes):
  * admission control and split planning work in the ROW domain via indexed
  * probes, with a probe-free arithmetic fast path when a range is dense. This is the piece the file-glob
  * `readStream` seam could not do: tail a mutating database table with
  * planned splits and exactly-once offset accounting.
  *
  * Scale notes: the driver does O(1) work per micro-batch (one MAX(SEQ)
  * probe + range arithmetic — the enumerator cost of the reference); all row
  * movement happens in parallel range scans that the database serves off the
  * SEQ primary-key index. Admission control (`max-events-per-trigger`) bounds
  * micro-batch size the way the reference's fetch batching does, so a burst
  * in the log never produces an unboundedly large batch.
  */
object CdcMicroBatch {

  /** Changelog IR schema as delivered by the stream — identical to
    * [[graft.cdc.streaming.StreamingOps.ChangeRecord]] so every downstream
    * operator (stateful materialize, retraction, dedup) applies unchanged.
    */
  val schema: StructType = StructType(Seq(
    StructField("offset", LongType, nullable = false),
    StructField("pk", LongType, nullable = false),
    StructField("op", StringType, nullable = false),
    StructField("ts_ms", LongType, nullable = false),
    StructField("value", DoubleType, nullable = false),
    StructField("table_name", StringType, nullable = false)
  ))

  /** Fixed physical column layout of the change table. The single log
    * carries ALL captured tables' events tagged by table name — the
    * reference's one-binlog-many-tables model (BinlogSplitReader tails one
    * binlog; the capture list filters in the reader, :104-105).
    */
  val columnsSql = "SEQ, PK, OP, TS_MS, VAL, TBL"

  /** DDL for a change table an external writer appends to (tests + docs). */
  def createTableSql(table: String): String =
    s"CREATE TABLE $table (SEQ BIGINT PRIMARY KEY, PK BIGINT, OP VARCHAR(1), " +
      "TS_MS BIGINT, VAL DOUBLE, TBL VARCHAR(128))"

  /** Append rows (seq, pk, op, ts_ms, val) to a change table, creating it
    * if absent — the stand-in for the external database writer whose log
    * the stream tails (fixture plumbing, not a data path). The table tag
    * follows the synthetic shard routing (users_{pk % 3},
    * [[graft.cdc.merge.ChangelogOps.tableNameCol]]) so batch and stream
    * agree on every event's table identity.
    */
  def appendChangeTable(
      url: String,
      table: String,
      rows: Iterator[(Long, Long, String, Long, Double)]): Unit =
    appendChangeTableTagged(url, table,
      rows.map { case (seq, pk, op, ts, v) => (seq, pk, op, ts, v, s"users_${pk % 3}") })

  /** Generic-envelope wire layout (`envelope=true`): the log carries whole
    * row images as JSON wire strings — the shape a Debezium topic delivers
    * (Envelope.before/after, the reference's
    * RowDataDebeziumDeserializeSchema.java:118-158 input) — and the declared
    * schema is applied DOWNSTREAM by [[graft.cdc.model.RowImage.decodeEnvelope]].
    * The source stays schema-agnostic: one stream implementation serves
    * every captured table shape.
    */
  val envelopeSchema: StructType = StructType(Seq(
    StructField("offset", LongType, nullable = false),
    StructField("op", StringType, nullable = false),
    StructField("ts_ms", LongType, nullable = false),
    StructField("table_name", StringType, nullable = false),
    StructField("before", StringType, nullable = true),
    StructField("after", StringType, nullable = true)
  ))

  val envelopeColumnsSql = "SEQ, OP, TS_MS, TBL, BEFORE_IMG, AFTER_IMG"

  /** DDL for an envelope change table (images as CLOBs — wide rows). */
  def createEnvelopeTableSql(table: String): String =
    s"CREATE TABLE $table (SEQ BIGINT PRIMARY KEY, OP VARCHAR(1), TS_MS BIGINT, " +
      "TBL VARCHAR(128), BEFORE_IMG CLOB, AFTER_IMG CLOB)"

  /** Append envelope frames (seq, op, ts_ms, table, before, after) to an
    * envelope change table, creating it if absent (fixture plumbing).
    */
  def appendEnvelopeTable(
      url: String,
      table: String,
      rows: Iterator[(Long, String, Long, String, String, String)]): Unit = {
    CdcSource.validIdentifier(table)
    val conn = DriverManager.getConnection(url)
    try {
      val meta = conn.getMetaData.getTables(null, null, table.toUpperCase, null)
      val exists = try meta.next() finally meta.close()
      if (!exists) {
        val st = conn.createStatement()
        try st.executeUpdate(createEnvelopeTableSql(table)) finally st.close()
      }
      val ins = conn.prepareStatement(s"INSERT INTO $table VALUES (?, ?, ?, ?, ?, ?)")
      try {
        var n = 0
        rows.foreach { case (seq, op, ts, tbl, before, after) =>
          ins.setLong(1, seq); ins.setString(2, op); ins.setLong(3, ts)
          ins.setString(4, tbl); ins.setString(5, before); ins.setString(6, after)
          ins.addBatch()
          n += 1
          if (n % 1000 == 0) ins.executeBatch()
        }
        ins.executeBatch()
      } finally ins.close()
    } finally conn.close()
  }

  /** Append rows with an explicit table tag per event. */
  def appendChangeTableTagged(
      url: String,
      table: String,
      rows: Iterator[(Long, Long, String, Long, Double, String)]): Unit = {
    CdcSource.validIdentifier(table)
    val conn = DriverManager.getConnection(url)
    try {
      val meta = conn.getMetaData.getTables(null, null, table.toUpperCase, null)
      val exists = try meta.next() finally meta.close()
      if (!exists) {
        val st = conn.createStatement()
        try st.executeUpdate(createTableSql(table)) finally st.close()
      }
      val ins = conn.prepareStatement(s"INSERT INTO $table VALUES (?, ?, ?, ?, ?, ?)")
      try {
        var n = 0
        rows.foreach { case (seq, pk, op, ts, v, tbl) =>
          ins.setLong(1, seq); ins.setLong(2, pk); ins.setString(3, op)
          ins.setLong(4, ts); ins.setDouble(5, v); ins.setString(6, tbl)
          ins.addBatch()
          n += 1
          if (n % 1000 == 0) ins.executeBatch()
        }
        ins.executeBatch()
      } finally ins.close()
    } finally conn.close()
  }

  /** The reserved table tag of heartbeat rows. The reference emits periodic
    * heartbeat events to a dedicated topic so the source's offset advances
    * even when every captured table is idle (MySqlSourceOptions.java:
    * 188-191 heartbeat.interval; RecordUtils.java:226-230 isHeartbeatEvent)
    * — here heartbeats are ordinary log rows under this tag: they move
    * MAX(SEQ) (so the stream checkpoints past them) and every reader drops
    * them before the capture-list filter (so no downstream operator ever
    * sees one).
    */
  val HeartbeatTable = "__heartbeat__"

  /** Emit one heartbeat row (seq = MAX(SEQ)+1) into a change table — the
    * source-side writer's periodic progress tick. Works for both layouts
    * (`envelope` selects the image-bearing DDL with null images).
    */
  def appendHeartbeat(
      url: String, table: String, tsMs: Long, envelope: Boolean = false): Unit = {
    CdcSource.validIdentifier(table)
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      val next = try {
        val rs = st.executeQuery(s"SELECT MAX(SEQ) FROM $table")
        rs.next()
        val m = rs.getLong(1)
        (if (rs.wasNull()) -1L else m) + 1L
      } finally st.close()
      if (envelope)
        appendEnvelopeTable(url, table,
          Iterator((next, "r", tsMs, HeartbeatTable, null, null)))
      else
        appendChangeTableTagged(url, table,
          Iterator((next, 0L, "r", tsMs, 0.0, HeartbeatTable)))
    } finally conn.close()
  }
}

/** Checkpointable stream position: the last log sequence number (exclusive)
  * already delivered — the Spark analog of the reference's BinlogOffset in
  * the enumerator checkpoint (BinlogOffset.java:60-100). JSON so Spark's
  * offset log persists/replays it across restarts.
  */
case class CdcStreamOffset(seq: Long) extends Offset {
  override def json(): String = s"""{"seq":$seq}"""
}

object CdcStreamOffset {
  private val Re = """\s*\{\s*"seq"\s*:\s*(-?\d+)\s*\}\s*""".r
  def fromJson(json: String): CdcStreamOffset = json match {
    case Re(n) => CdcStreamOffset(n.toLong)
    case other =>
      throw new IllegalArgumentException(s"malformed graft-cdc-stream offset: $other")
  }
}

/** `readStream.format("graft-cdc-stream")` provider. Options:
  *
  *   - `url`     (required) JDBC url of the database holding the change table
  *   - `dbtable` change table name (default GRAFT_CHANGELOG)
  *   - `scan.incremental.snapshot.chunk.size` rows per planned split
  *   - `scan.snapshot.fetch.size` JDBC fetchsize for readers
  *   - `max-events-per-trigger` admission-control cap per micro-batch
  *   - `starting-seq` exclusive start position (specific-offset startup);
  *     default: everything in the log (earliest)
  *   - `table-name` capture-list include regex applied in the readers —
  *     the one log carries every captured table's events (TBL column)
  *   - `envelope` = true to tail a generic-envelope change table
  *     ([[CdcMicroBatch.envelopeSchema]]: whole JSON row images instead of
  *     the scalar fixture columns); decode with RowImage.decodeEnvelope
  */
class CdcStreamProvider extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = "graft-cdc-stream"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    if (options.getBoolean("envelope", false)) CdcMicroBatch.envelopeSchema
    else CdcMicroBatch.schema

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new CdcStreamTable(new CaseInsensitiveStringMap(properties))
}

class CdcStreamTable(options: CaseInsensitiveStringMap) extends Table with SupportsRead {
  private def envelope(opts: CaseInsensitiveStringMap): Boolean =
    opts.getBoolean("envelope", false)
  override def name(): String =
    s"graft-cdc-stream(${options.getOrDefault("dbtable", "GRAFT_CHANGELOG")})"
  override def schema(): StructType =
    if (envelope(options)) CdcMicroBatch.envelopeSchema else CdcMicroBatch.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder = {
    // readStream options arrive here merged over the table properties
    val merged = new util.HashMap[String, String](options)
    merged.putAll(opts)
    val all = new CaseInsensitiveStringMap(merged)
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType =
          if (envelope(all)) CdcMicroBatch.envelopeSchema else CdcMicroBatch.schema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new CdcMicroBatchStream(all)
      }
    }
  }
}

/** Driver-side enumerator: offsets + split planning. One MAX(SEQ) probe per
  * micro-batch; range slicing is pure arithmetic (the log's SEQ is dense, so
  * equal ranges are balanced splits — the degenerate-but-exact case of the
  * reference's chunk splitter over an AUTO_INCREMENT key).
  */
class CdcMicroBatchStream(options: CaseInsensitiveStringMap)
    extends MicroBatchStream with SupportsAdmissionControl with SupportsTriggerAvailableNow {

  private val url = Option(options.get("url")).getOrElse(
    throw new CdcSource.ValidationException(
      "option 'url' is required: the JDBC url of the change-table database"))
  private val table =
    CdcSource.validIdentifier(options.getOrDefault("dbtable", "GRAFT_CHANGELOG"))
  private val chunkSize = options.getLong("scan.incremental.snapshot.chunk.size", 8096L)
  private val fetchSize = options.getLong("scan.snapshot.fetch.size", 1024L).toInt
  private val maxPerTrigger: Option[Long] =
    Option(options.get("max-events-per-trigger")).map(_.toLong)
  /** Capture-list include filter, applied IN the readers (the reference
    * filters the one-binlog-many-tables stream client-side,
    * BinlogSplitReader.java:104-105) — whole-identifier match, the same
    * anchored semantics as the batch facade's table-name option and
    * Discovery.captured.
    */
  private val tableRegex: Option[String] = Option(options.get("table-name")).map { re =>
    try { java.util.regex.Pattern.compile(re); re }
    catch {
      case e: Exception => throw new CdcSource.ValidationException(
        s"The table-name '$re' is not a valid regular expression", e)
    }
  }
  private val startingSeq = options.getLong("starting-seq", Long.MinValue)
  private val envelopeMode = options.getBoolean("envelope", false)
  require(chunkSize > 0, s"chunk.size must be positive, got $chunkSize")

  /** AvailableNow support: pin the end offset once so a drain run terminates
    * even while the writer keeps appending.
    */
  @volatile private var pinnedEnd: Option[Long] = None

  /** One cached driver-side connection for offset probes — the enumerator
    * runs a MAX(SEQ) probe every micro-batch, and opening a fresh connection
    * each time is per-trigger churn the reference avoids with its pooled
    * JDBC connections (JdbcConnectionPools, pool size 20). A dead cached
    * connection is dropped and reopened once.
    */
  private var probeConn: java.sql.Connection = _

  private def probeConnection(): java.sql.Connection = synchronized {
    if (probeConn == null || probeConn.isClosed) probeConn = DriverManager.getConnection(url)
    probeConn
  }

  private def probe(sql: String): Option[Long] = synchronized {
    def runOn(conn: java.sql.Connection): Option[Long] = {
      val st = conn.createStatement()
      try {
        val rs = st.executeQuery(sql)
        // aggregates yield one (possibly NULL) row; row-domain probes
        // (nthSeqAfter) yield zero rows when fewer rows exist
        if (!rs.next()) None
        else {
          val m = rs.getLong(1)
          if (rs.wasNull()) None else Some(m)
        }
      } finally st.close()
    }
    try runOn(probeConnection())
    catch {
      case _: java.sql.SQLException =>
        // stale cached connection (server restart, idle timeout): reopen once
        try { if (probeConn != null) probeConn.close() } catch { case _: Throwable => () }
        probeConn = null
        runOn(probeConnection())
    }
  }

  /** Resolved start position: an explicit `starting-seq`, else "earliest" =
    * one before the lowest retained sequence (probed ONCE, then checkpointed
    * by Spark's offset log). A raw Long.MinValue sentinel must never reach
    * the offset log: admission control advances `start + maxRows`, which
    * from -2^63 would take ~2^63/maxRows empty micro-batches to reach data.
    * An empty log starts at -1 (sequences are assumed non-negative there —
    * pass starting-seq to tail a log that begins lower).
    */
  private lazy val resolvedStart: Long =
    if (startingSeq != Long.MinValue) startingSeq
    else probe(s"SELECT MIN(SEQ) - 1 FROM $table").getOrElse(-1L)

  private def maxSeq(): Long =
    probe(s"SELECT MAX(SEQ) FROM $table").getOrElse(resolvedStart)

  /** The SEQ of the n-th row after `after` (bounded by `cap`), if that many
    * rows exist — the row-domain probe that keeps admission control and
    * split planning correct when SEQ is SPARSE (real log positions are:
    * binlog file offsets jump, purged segments leave holes, sharded writers
    * interleave). One indexed range probe; the reference's splitter runs
    * the same shape per chunk (StatementUtils.java:132-188). Syntax is
    * standard OFFSET/FETCH (Derby, Postgres, MSSQL; MySQL would use LIMIT).
    */
  private def nthSeqAfter(after: Long, n: Long, cap: Long): Option[Long] =
    probe(s"SELECT SEQ FROM $table WHERE SEQ > $after AND SEQ <= $cap " +
      s"ORDER BY SEQ OFFSET ${n - 1} ROWS FETCH NEXT 1 ROWS ONLY")

  private def countRange(lo: Long, hi: Long): Long =
    probe(s"SELECT COUNT(*) FROM $table WHERE SEQ > $lo AND SEQ <= $hi").getOrElse(0L)

  override def initialOffset(): Offset = CdcStreamOffset(resolvedStart)

  override def deserializeOffset(json: String): Offset = CdcStreamOffset.fromJson(json)

  override def getDefaultReadLimit: ReadLimit =
    maxPerTrigger.map(n => ReadLimit.maxRows(n)).getOrElse(ReadLimit.allAvailable())

  override def prepareForTriggerAvailableNow(): Unit = { pinnedEnd = Some(maxSeq()) }

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) is used via SupportsAdmissionControl")

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[CdcStreamOffset].seq
    val available = pinnedEnd.getOrElse(maxSeq())
    val capped = limit match {
      case r: ReadMaxRows if available > s =>
        // admit by ROWS, not seq arithmetic: the seq of the maxRows-th
        // pending row (sparse-safe; on a dense log this is s + maxRows);
        // fewer rows pending -> take everything available
        nthSeqAfter(s, r.maxRows(), available).getOrElse(available)
      case _ => available
    }
    CdcStreamOffset(math.max(capped, s))
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val lo = start.asInstanceOf[CdcStreamOffset].seq
    val hi = end.asInstanceOf[CdcStreamOffset].seq
    if (hi <= lo) return Array.empty
    // the enumerator's split plan over (lo, hi]. One COUNT probe decides the
    // domain: a DENSE range (count == width) slices by pure arithmetic — no
    // further probes; a SPARSE range probes the seq at every chunkSize-th
    // row so splits stay ROW-balanced whatever the gaps look like (the
    // uneven-key chunk planning the reference's splitter does with the same
    // per-chunk probe shape)
    val n = countRange(lo, hi)
    if (n == 0) return Array.empty
    if (n == hi - lo)
      Iterator.iterate(lo)(b => math.min(b + chunkSize, hi))
        .takeWhile(_ < hi)
        .map(b => CdcChunk(b, math.min(b + chunkSize, hi)): InputPartition)
        .toArray
    else {
      val buf = scala.collection.mutable.ArrayBuffer.empty[InputPartition]
      var b = lo
      var done = false
      while (!done) {
        nthSeqAfter(b, chunkSize, hi) match {
          case Some(nb) if nb < hi => buf += CdcChunk(b, nb); b = nb
          case _ => buf += CdcChunk(b, hi); done = true
        }
      }
      buf.toArray
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new CdcReaderFactory(url, table, fetchSize, tableRegex, envelopeMode)

  /** Log retention is the external writer's concern (like binlog purge);
    * nothing to release on commit.
    */
  override def commit(end: Offset): Unit = ()

  override def stop(): Unit = synchronized {
    try { if (probeConn != null) probeConn.close() } catch { case _: Throwable => () }
    probeConn = null
  }
}

/** One planned split: change-log rows with lo < SEQ <= hi. */
case class CdcChunk(lo: Long, hi: Long) extends InputPartition

class CdcReaderFactory(
    url: String, table: String, fetchSize: Int,
    tableRegex: Option[String], envelope: Boolean = false)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new CdcPartitionReader(url, table, fetchSize, tableRegex, envelope,
      partition.asInstanceOf[CdcChunk])
}

/** Executor-side split reader: one pushed-down range scan per split on its
  * own connection, served off the SEQ primary-key index — the per-split
  * `SELECT` the reference's readers run (StatementUtils.java:132-188). The
  * capture-list filter is applied HERE, row by row as the log is consumed
  * (BinlogSplitReader.java:104-105) — offsets still advance over skipped
  * rows, so an include-filtered stream checkpoints exactly like a full one.
  */
class CdcPartitionReader(
    url: String, table: String, fetchSize: Int,
    tableRegex: Option[String], envelope: Boolean, chunk: CdcChunk)
    extends PartitionReader[InternalRow] {

  // opened on first next(), not lazily from close(): a reader cancelled (or
  // limit-truncated) before any next() must not open a connection and run
  // the range SELECT just to tear it down
  private var conn: java.sql.Connection = _
  private var stmt: java.sql.PreparedStatement = _
  private var rs: java.sql.ResultSet = _
  // whole-identifier match — same anchored semantics as the batch facade
  // and Discovery.captured (the reference's RelationalTableFilters)
  private val pattern = tableRegex.map(java.util.regex.Pattern.compile)
  // position of the table tag in each layout's SELECT list
  private val tblIndex = if (envelope) 4 else 6

  private def open(): Unit = {
    conn = DriverManager.getConnection(url)
    val cols = if (envelope) CdcMicroBatch.envelopeColumnsSql else CdcMicroBatch.columnsSql
    val st = conn.prepareStatement(
      s"SELECT $cols FROM $table WHERE SEQ > ? AND SEQ <= ? ORDER BY SEQ")
    st.setFetchSize(fetchSize)
    st.setLong(1, chunk.lo)
    st.setLong(2, chunk.hi)
    stmt = st
    rs = st.executeQuery()
  }

  override def next(): Boolean = {
    if (rs == null) open()
    // heartbeat rows advance the offset but are never emitted (the
    // reference's isHeartbeatEvent drop, RecordUtils.java:226-230); the
    // capture-list filter applies after that
    def keep(tbl: String): Boolean =
      tbl != CdcMicroBatch.HeartbeatTable &&
        pattern.forall(_.matcher(tbl).matches())
    var has = rs.next()
    while (has && !keep(rs.getString(tblIndex)))
      has = rs.next()
    has
  }

  override def get(): InternalRow =
    if (envelope)
      InternalRow(
        rs.getLong(1),
        UTF8String.fromString(rs.getString(2)),
        rs.getLong(3),
        UTF8String.fromString(rs.getString(4)),
        UTF8String.fromString(rs.getString(5)), // fromString(null) -> null
        UTF8String.fromString(rs.getString(6)))
    else
      InternalRow(
        rs.getLong(1),
        rs.getLong(2),
        UTF8String.fromString(rs.getString(3)),
        rs.getLong(4),
        rs.getDouble(5),
        UTF8String.fromString(rs.getString(6)))

  override def close(): Unit = {
    try { if (rs != null) rs.close() } finally {
      try { if (stmt != null) stmt.close() } finally {
        if (conn != null) conn.close()
      }
    }
  }
}
