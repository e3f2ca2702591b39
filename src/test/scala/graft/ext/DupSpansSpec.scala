package graft.ext

import graft.SparkTestBase

/** Sliding n-gram duplicated-span detection: planted boilerplate must come
  * back as merged maximal spans, in both docs that share it.
  */
class DupSpansSpec extends SparkTestBase {
  import spark.implicits._

  private val boiler = "one two three four five six seven eight nine ten"

  test("shared boilerplate flags as one merged span per doc") {
    val docs = Seq(
      (1L, s"$boiler alpha beta gamma delta epsilon zeta eta theta"),
      (2L, s"iota kappa lambda mu nu xi omicron pi $boiler"),
      (3L, "rho sigma tau upsilon phi chi psi omega aleph bet")
    ).toDF("doc_id", "text")
    val got = Dedup.dupSpans(docs, n = 8)
      .as[(Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._2))
    // boilerplate = 10 words -> 3 duplicated 8-grams, merging to one
    // 10-word span; doc 1 has it at words 1-10, doc 2 at words 9-18
    assert(got.toSeq == Seq((1L, 1L, 10L, 3L), (2L, 9L, 18L, 3L)))
  }

  test("within-doc repetition counts; distant repeats stay separate spans") {
    val filler = "a1 b2 c3 d4 e5 f6 g7 h8 i9 j0 k1 l2"
    val docs = Seq((1L, s"$boiler $filler $boiler")).toDF("doc_id", "text")
    val got = Dedup.dupSpans(docs, n = 8)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._2)
    // the 10-word block repeats at words 1 and 23; gap (12 words) > n so
    // the two occurrences stay separate maximal spans
    assert(got.toSeq == Seq((1L, 1L, 10L, 3L), (1L, 23L, 32L, 3L)))
  }

  test("docs shorter than n produce nothing") {
    val docs = Seq((1L, "too short"), (2L, "too short")).toDF("doc_id", "text")
    assert(Dedup.dupSpans(docs, n = 8).count() == 0)
  }
}
