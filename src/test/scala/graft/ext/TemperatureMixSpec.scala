package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Temperature mixing at tau=1/2: corpus-derived rates must up-weight
  * small sources, hit the target fraction in expectation, and replay the
  * exact sqrt/floor chain.
  */
class TemperatureMixSpec extends SparkTestBase {
  import spark.implicits._

  // 400 head docs vs 100 tail docs
  private def docs = (0L until 500L).map { i =>
    (i, if (i < 400) "head" else "tail")
  }.toDF("doc_id", "source")

  private def replayPpm(counts: Map[String, Long], tf: Double): Map[String, Long] = {
    val n = counts.values.sum
    val ws = counts.view.mapValues(c => math.sqrt(c.toDouble)).toMap
    var z = 0.0
    ws.toSeq.sortBy(_._1).foreach(z += _._2) // source-sorted fold
    counts.map { case (s, c) =>
      s -> math.min(1000000L,
        math.floor(ws(s) / z * tf * n / c * 1000000.0).toLong)
    }
  }

  test("rates replay exactly and the tail is up-weighted vs proportional") {
    val got = Curation.temperatureMix(docs, seed = 7L, targetFraction = 0.2)
      .select("source", "keep_ppm").distinct()
      .as[(String, Long)].collect().toMap
    val want = replayPpm(Map("head" -> 400L, "tail" -> 100L), 0.2)
    // only sources with kept docs appear; compare on those
    got.foreach { case (s, ppm) => assert(ppm == want(s), s"source $s") }
    // tau=1/2 gives the tail 1/3 of the budget (sqrt(100)/(sqrt(400)+sqrt(100)))
    // vs 1/5 proportionally: its keep rate must exceed the head's
    assert(want("tail") > want("head"))
    // and the head keeps less than the flat rate while the tail keeps more
    assert(want("head") < 200000L && want("tail") > 200000L)
  }

  test("kept set is deterministic and matches the explicit-rate sampler") {
    val a = Curation.temperatureMix(docs, seed = 7L, targetFraction = 0.2)
      .select("doc_id").as[Long].collect().toSet
    val b = Curation.temperatureMix(docs, seed = 7L, targetFraction = 0.2)
      .select("doc_id").as[Long].collect().toSet
    assert(a == b)
    val want = replayPpm(Map("head" -> 400L, "tail" -> 100L), 0.2)
    val rates = want.toSeq.toDF("source", "keep_ppm")
    val viaExplicit = Curation.stratifiedSample(docs, rates, seed = 7L)
      .select("doc_id").as[Long].collect().toSet
    assert(a == viaExplicit)
  }
}
