package graft.cdc.types

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.cdc.model.RowImage
import graft.cdc.model.RowImage.DeclaredTable

/** True F19/F20 — the two wire dialects whose DECODE shape differs from the
  * JSON envelope family: TiKV delivers raw KV byte pairs, OceanBase's
  * logproxy delivers textual field maps. Both decode through the same
  * [[DeclaredTable]] contract as the generic envelope path, so every
  * downstream operator (merge, IVM, sinks) is dialect-agnostic.
  *
  * Spark-first: each decode is ONE narrow codegen'd projection (binary
  * slicing + `conv`, `from_json`, string casts) — no row-at-a-time
  * closures, nothing shuffles.
  */
object DialectWire {

  // ------------------------------------------------------------------
  // TiKV KV-pair face (F19). The reference decodes each TiKV KV event's
  // key bytes into the row handle and its value bytes into the row
  // (RowDataTiKVEventDeserializationSchemaBase.java:46-180); the TiDB
  // record-key layout is the public `t{table_id:int64-BE}_r{handle:
  // int64-BE}` memcomparable form. Values here ride as UTF-8 JSON images
  // (the declared wire form of this engine), so the value decode reuses
  // the whole RowImage converter ladder unchanged.
  // ------------------------------------------------------------------

  /** Big-endian int64 -> 8 raw bytes (builtin-only: hex text -> unhex). */
  def be8(v: Column): Column = unhex(lpad(hex(v), 16, "0"))

  /** TiKV record key bytes for (tableId, handle). */
  def tikvKey(tableId: Column, handle: Column): Column =
    concat(lit("t").cast(BinaryType), be8(tableId),
      lit("_r").cast(BinaryType), be8(handle))

  /** 8 bytes at 1-based `pos` -> int64 (positive range; handles and table
    * ids are). `conv` parses the hex digits as base-16.
    */
  private def beLong(bin: Column, pos: Int): Column =
    conv(hex(substring(bin, pos, 8)), 16, 10).cast(LongType)

  /** Decode a TiKV-shaped KV stream
    * `(key: binary, value: binary, op, commit_ts: long)` into the generic
    * IR `(offset, op, ts_ms, table_id, key, before, after)`:
    *
    *   - key bytes -> (table_id, handle); handle becomes the single-column
    *     record key (TiDB clustered handle = the pk)
    *   - value bytes -> UTF-8 JSON -> the declared-type image through
    *     [[RowImage.decodeEnvelope]]'s ladder (deletes carry no value,
    *     exactly the KV delete form)
    *   - offset/ts_ms from the commit version (TSO: physical millis in the
    *     high 18 bits shifted out)
    *
    * Malformed keys (wrong tag bytes) decode to null table_id/handle
    * rather than failing the stream — the caller can route them to a
    * dead-letter side like the validator hook.
    */
  def decodeTikvKv(kv: DataFrame, table: DeclaredTable): DataFrame = {
    require(table.pkCols.length == 1, "TiKV clustered handle is a single pk")
    val ws = RowImage.wireSchema(table.schema)
    val keyOk = length(col("key")) === 19 &&
      substring(col("key"), 1, 1) === lit("t").cast(BinaryType) &&
      substring(col("key"), 10, 2) === lit("_r").cast(BinaryType)
    val handle = when(keyOk, beLong(col("key"), 12))
    val tableId = when(keyOk, beLong(col("key"), 2))
    val json = when(col("value").isNotNull && length(col("value")) > 0,
      col("value").cast(StringType))
    val parsed = when(json.isNotNull, from_json(json, ws))
    val after = when(col("op") =!= "d",
      RowImage.decodeField(StructField("img", table.schema))(parsed))
    val pkName = table.pkCols.head
    kv.select(
      // TSO: physical milliseconds ride in the upper bits (public TiDB
      // timestamp-oracle layout: ts = physical << 18 | logical)
      col("commit_ts").as("offset"),
      col("op"),
      shiftrightunsigned(col("commit_ts"), 18).as("ts_ms"),
      tableId.as("table_id"),
      struct(handle.as(pkName)).as("key"),
      lit(null).cast(table.schema).as("before"),
      after.as("after"))
  }

  // ------------------------------------------------------------------
  // OceanBase logproxy face (F20). The reference decodes LogMessage
  // records whose old/new field values arrive as TEXT maps
  // (RowDataOceanBaseDeserializationSchema.java:56-231 routes
  // DataMessage.Record.Field lists through per-type textual converters).
  // Spark-first: the textual ladder is a per-field string cast column.
  // ------------------------------------------------------------------

  /** Textual converter ladder: logproxy field TEXT -> declared type.
    * Dates/timestamps/decimals/ints parse from their SQL textual forms
    * (session tz is UTC, matching logproxy's rendering contract here);
    * binary arrives hex-encoded.
    */
  def textualDecodeField(f: StructField): Column => Column = f.dataType match {
    case BinaryType => c => unhex(c)
    case other      => c => c.cast(other)
  }

  /** Decode an OceanBase-logproxy-shaped record stream
    * `(rtype, ts_s: long, tenant, db, tbl, olds: map<string,string>,
    * news: map<string,string>)` into the generic IR
    * `(offset, op, ts_ms, tenant_name, key, before, after)`.
    *
    * rtype maps INSERT -> c, UPDATE -> u, DELETE -> d (HEARTBEAT and DDL
    * records are dropped here — P5's record-class filter handles them);
    * ts_ms = ts_s * 1000 (logproxy timestamps are seconds); offsets are
    * the records' (ts_s, seq) fold since logproxy has no global offset —
    * callers pass a unique `seq` column.
    */
  def decodeLogProxy(records: DataFrame, table: DeclaredTable): DataFrame = {
    def image(m: Column): Column = {
      val fields = table.schema.fields.map { f =>
        textualDecodeField(f)(element_at(m, f.name)).as(f.name)
      }
      when(m.isNull, lit(null).cast(table.schema))
        .otherwise(struct(fields.toIndexedSeq: _*))
    }
    val op = when(col("rtype") === "INSERT", "c")
      .when(col("rtype") === "UPDATE", "u")
      .when(col("rtype") === "DELETE", "d")
    val before = image(col("olds"))
    val after  = image(col("news"))
    val key = struct(table.pkCols.map(c =>
      coalesce(col("after").getField(c), col("before").getField(c)).as(c)): _*)
      .cast(table.keyType)
    records
      .where(col("rtype").isin("INSERT", "UPDATE", "DELETE"))
      .select(
        (col("ts_s") * 1000000 + col("seq")).as("offset"),
        op.as("op"),
        (col("ts_s") * 1000).as("ts_ms"),
        col("tenant").as("tenant_name"),
        col("olds"), col("news"))
      .withColumn("before", before)
      .withColumn("after", after)
      .withColumn("key", key)
      .select(col("offset"), col("op"), col("ts_ms"), col("tenant_name"),
        col("key"), col("before"), col("after"))
  }
}
