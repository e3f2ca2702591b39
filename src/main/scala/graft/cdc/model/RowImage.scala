package graft.cdc.model

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** P1 (full generality) — schema-driven changelog envelopes over ARBITRARY
  * declared table shapes: multi-column row images, composite primary keys,
  * per-field wire converters.
  *
  * The reference projects a declared physical `RowType` through a registry
  * of per-field runtime converters built once from the field types
  * (RowDataDebeziumDeserializeSchema.java:589-630 `createRowConverter`
  * composes `createConverter` per field; user-defined factories override at
  * :259-268), then keys records by the primary-key struct. Here the same
  * contract is Spark-first: the converter registry builds COLUMNS, not
  * row-at-a-time closures, so the whole decode is one narrow codegen'd
  * projection — `from_json` into the wire schema, then one cast/convert
  * expression per declared field. Nothing shuffles; null-propagation gives
  * `wrapIntoNullableConverter` for free.
  *
  * Wire format (the JSON shapes Debezium puts on the wire):
  *   - DATE          -> epoch days (io.debezium.time.Date)
  *   - TIMESTAMP     -> epoch micros (io.debezium.time.MicroTimestamp)
  *   - DECIMAL(p,s)  -> unscaled integer as a string (precise handling mode;
  *                      Kafka-Connect `Decimal`, consumed by the reference at
  *                      RowDataDebeziumDeserializeSchema.java:555-587)
  *   - BINARY        -> base64 string (Kafka-Connect bytes in JSON)
  *   - everything else rides natively in JSON.
  */
object RowImage {

  /** A captured table's declared shape: physical schema + primary-key
    * columns (the reference's `RowType` + `primaryKey` pair that seeds the
    * converter registry and the record key).
    */
  case class DeclaredTable(name: String, schema: StructType, pkCols: Seq[String]) {
    require(pkCols.nonEmpty, s"table $name needs at least one pk column")
    private val fields = schema.fieldNames.toSet
    require(pkCols.forall(fields.contains),
      s"pk columns ${pkCols.filterNot(fields.contains).mkString(",")} not in schema of $name")
    def valueCols: Seq[String] = schema.fieldNames.toSeq.filterNot(pkCols.contains)
    def keyType: StructType = StructType(pkCols.map(c => schema(c)))
  }

  /** A user-supplied converter override, resolved BEFORE the default ladder
    * — the reference's `DeserializationRuntimeConverterFactory` priority
    * (RowDataDebeziumDeserializeSchema.java:264 "user defined converter has
    * a higher resolve order").
    */
  type ConverterOverrides = PartialFunction[StructField, Column => Column]
  val NoOverrides: ConverterOverrides = PartialFunction.empty

  /** JSON wire type carrying a declared field. */
  def wireType(dt: DataType): DataType = dt match {
    case DateType       => IntegerType
    case TimestampType  => LongType
    case _: DecimalType => StringType
    case BinaryType     => StringType
    case other          => other
  }

  def wireSchema(schema: StructType): StructType =
    StructType(schema.fields.map(f =>
      StructField(f.name, wireType(f.dataType), nullable = true)))

  /** Default decode ladder: wire column -> declared-type column. The
    * reference's `createNotNullConverter` switch, as expressions.
    */
  def decodeField(f: StructField): Column => Column = f.dataType match {
    case DateType      => c => date_from_unix_date(c)
    case TimestampType => c => timestamp_micros(c)
    case d: DecimalType =>
      // unscaled integer string -> exact decimal: parse the unscaled value
      // at scale 0, then multiply by the exact literal 10^-s (decimal
      // multiplication never rounds; the final cast only narrows precision)
      c => (c.cast(DecimalType(d.precision, 0)) *
        lit(java.math.BigDecimal.valueOf(1L, d.scale))).cast(d)
    case BinaryType => c => unbase64(c)
    case other      => c => c.cast(other)
  }

  /** Inverse ladder, used by sources that put images ON the wire (fixture
    * synthesis, the Kafka envelope face) and by round-trip specs.
    */
  def encodeField(f: StructField): Column => Column = f.dataType match {
    case DateType      => c => unix_date(c)
    case TimestampType => c => unix_micros(c)
    case d: DecimalType =>
      c => (c * lit(java.math.BigDecimal.valueOf(1L, -d.scale).toBigInteger))
        .cast(DecimalType(d.precision, 0)).cast(StringType)
    case BinaryType => c => base64(c)
    case other      => c => c.cast(wireType(other))
  }

  /** Declared-typed image struct -> wire JSON string (null image -> null). */
  def encodeImage(image: Column, table: DeclaredTable): Column = {
    val wired = table.schema.fields.map(f =>
      encodeField(f)(image.getField(f.name)).as(f.name))
    when(image.isNull, lit(null).cast(StringType))
      .otherwise(to_json(struct(wired.toIndexedSeq: _*)))
  }

  /** One side's converter composition: wire JSON -> declared-typed struct.
    * Field resolution is BY NAME against the declared schema — a field
    * absent from the wire record decodes to null, exactly the reference's
    * `schema.field(fieldName) == null -> row.setField(i, null)` rule
    * (RowDataDebeziumDeserializeSchema.java:612-615), which is what makes
    * the decode tolerant of schema drift in old log segments.
    */
  private def decodeImage(
      parsed: Column,
      json: Column,
      table: DeclaredTable,
      overrides: ConverterOverrides): Column = {
    val fields = table.schema.fields.map { f =>
      val conv = overrides.applyOrElse(f, (ff: StructField) => decodeField(ff))
      conv(parsed.getField(f.name)).as(f.name)
    }
    when(json.isNull, lit(null).cast(table.schema))
      .otherwise(struct(fields.toIndexedSeq: _*))
  }

  /** Decode a raw envelope frame
    * `(offset, op, ts_ms, before: json, after: json)` into the generic
    * changelog IR:
    *
    * `(offset, op, ts_ms, key: struct, before: struct, after: struct)`
    *
    * `key` is the record key the reference attaches to every change event
    * (the Kafka message key = PK struct): taken from the after image, falling
    * back to before for deletes, per pk column. One narrow projection.
    */
  def decodeEnvelope(
      envelope: DataFrame,
      table: DeclaredTable,
      overrides: ConverterOverrides = NoOverrides): DataFrame = {
    val ws = wireSchema(table.schema)
    val parsed = envelope
      .withColumn("_before_w", from_json(col("before"), ws))
      .withColumn("_after_w", from_json(col("after"), ws))
    val before = decodeImage(col("_before_w"), col("before"), table, overrides)
    val after  = decodeImage(col("_after_w"), col("after"), table, overrides)
    val withImages = parsed
      .withColumn("before", before)
      .withColumn("after", after)
      .drop("_before_w", "_after_w")
    val key = struct(table.pkCols.map(c =>
      coalesce(col("after").getField(c), col("before").getField(c)).as(c)): _*)
    withImages.withColumn("key", key)
      .select(col("offset"), col("op"), col("ts_ms"),
        col("key"), col("before"), col("after"))
  }

  /** J1/W1 on the generic IR — last-writer-wins per COMPOSITE key, trailing
    * deletes dropped, exactly [[Changelog.upsertMaterialize]]'s single hash
    * aggregation (map-side partial `max_by`, one shuffle of partial maxima)
    * with the scalar (pk, val) replaced by (key struct, after struct).
    * Output: pk columns flattened, last_offset, value columns flattened.
    */
  def upsertMaterialize(rows: DataFrame, table: DeclaredTable): DataFrame = {
    val merged = rows
      .groupBy(col("key"))
      .agg(max_by(struct(col("offset"), col("op"), col("after")), col("offset")).as("last"))
      .where(col("last.op") =!= Changelog.OpDelete)
    val pkOut = table.pkCols.map(c => col("key").getField(c).as(c))
    val valOut = table.valueCols.map(c => col("last.after").getField(c).as(c))
    merged.select(pkOut ++ (col("last.offset").as("last_offset") +: valOut): _*)
  }

  /** J2 on the generic IR — per-split emit filter with COMPOSITE split
    * ranges. `splits` carries (lo: struct|null, hi: struct|null, hwm: long)
    * with lo/hi typed as [[DeclaredTable.keyType]]; struct comparison in
    * Spark is lexicographic over the fields, which is exactly the composite
    * chunk-boundary order the splitters plan (KeyedChunkPlanner). Planner
    * metadata is tiny — broadcast, never shuffle.
    */
  def emitFilter(rows: DataFrame, splits: DataFrame): DataFrame = {
    val cond =
      (splits("lo").isNull || col("key") >= splits("lo")) &&
        (splits("hi").isNull || col("key") < splits("hi")) &&
        col("offset") > splits("hwm")
    rows.where(col("op") =!= Changelog.OpRead)
      .join(broadcast(splits), cond, "left_semi")
  }
}
