package graft.cdc.model

import graft.SparkTestBase
import graft.cdc.model.Changelog.changelog

/** The flatMap deserializer extension point: 0..n outputs per event,
  * identical semantics to composing the equivalent column expressions.
  */
class ChangeEventDecoderSpec extends SparkTestBase {

  import spark.implicits._

  /** Drops snapshot reads below a value threshold (0 outputs) and expands
    * updates into retract+upsert (2 outputs) — both reference shapes
    * (heartbeat dropping, before/after emission) in one decoder.
    */
  private object RetractDecoder extends ChangeEventDecoder[(Long, Long, String)] {
    def decode(e: ChangeEvent, out: ((Long, Long, String)) => Unit): Unit =
      e.op match {
        case "r" if e.`val` < 50 => // heartbeat-like: drop
        case "u" =>
          out((e.offset, e.pk, "-U"))
          out((e.offset, e.pk, "+U"))
        case other => out((e.offset, e.pk, "+" + other.toUpperCase))
      }
  }

  test("decoder emits 0, 1, or 2 rows per event matching the column-expression form") {
    val cl = changelog(spark, sfDir)
    val got = ChangeEventDecoder.decoded(cl, RetractDecoder)
      .toDF("offset", "pk", "kind").orderBy("offset", "kind").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))

    import org.apache.spark.sql.functions._
    val expected = cl
      .where(!(col("op") === "r" && col("val") < 50))
      .select(col("offset"), col("pk"),
        when(col("op") === "u", array(lit("-U"), lit("+U")))
          .otherwise(array(concat(lit("+"), upper(col("op")))))
          .as("kinds"))
      .select(col("offset"), col("pk"), explode(col("kinds")).as("kind"))
      .orderBy("offset", "kind").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))

    assert(got.nonEmpty && got.sameElements(expected))
  }

  test("decoder output is a typed Dataset usable as further relational input") {
    val cl = changelog(spark, sfDir)
    val n = ChangeEventDecoder.decoded(cl, RetractDecoder)
      .toDF("offset", "pk", "kind")
      .groupBy("kind").count().collect()
    assert(n.map(_.getString(0)).toSet.subsetOf(Set("+C", "+D", "+R", "-U", "+U")))
  }
}
