package graft.cdc.model

import org.apache.spark.sql.{DataFrame, Dataset, Encoder}

/** One canonical changelog record, the unit a decoder consumes (the
  * [[Changelog.changelog]] row shape as a typed value).
  */
case class ChangeEvent(
    offset: Long,
    pk: Long,
    op: String,
    ts_ms: Long,
    `val`: Double,
    props: String)

/** The engine's deserializer extension point — the Spark-first equivalent of
  * the reference's `DebeziumDeserializationSchema<T>` (reference:
  * flink-connector-debezium/.../DebeziumDeserializationSchema.java, applied
  * at MySqlRecordEmitter.java:147-152): a user-supplied flatMap from one
  * change event to 0..n typed outputs, via a collector callback so
  * multi-row expansion (e.g. update -> retract+upsert) and row dropping
  * (heartbeats) share one shape.
  *
  * Runs identically under batch and Structured Streaming — `flatMap` on a
  * streaming Dataset is a stateless narrow transformation, so it neither
  * blocks watermarks nor adds state.
  */
trait ChangeEventDecoder[T] extends Serializable {
  def decode(event: ChangeEvent, out: T => Unit): Unit
}

object ChangeEventDecoder {

  /** Apply a decoder over a changelog-shaped DataFrame. The decode runs
    * inside a single `flatMap` (one deserialization pass, no driver-side
    * collection); the output encoder keeps the result a typed Dataset.
    */
  def decoded[T: Encoder](changelog: DataFrame, dec: ChangeEventDecoder[T]): Dataset[T] = {
    import changelog.sparkSession.implicits._
    changelog.as[ChangeEvent].flatMap { e =>
      val buf = scala.collection.mutable.ArrayBuffer.empty[T]
      dec.decode(e, buf += _)
      buf.toSeq
    }
  }
}
