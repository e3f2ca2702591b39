package graft.ext

import graft.SparkTestBase

/** Corpus-conditional add-one bigram LM score vs an exact driver replay. */
class NgramLmSpec extends SparkTestBase {
  import spark.implicits._

  private val docs = Seq(
    (1L, "a b a b c"),
    (2L, "a b"),
    (3L, "z"), // single token: no bigrams, must drop out
    (4L, "c c c a")
  ).toDF("doc_id", "text")

  /** Plain-Scala replay: same counts, same fixed-point integer quotient
    * per term ((cb+1)·10^15 div (cu+V)) and exact integer sum — the
    * order-free arithmetic the engine uses, so the match is bit-exact
    * without pinning any addition order.
    */
  private def replay(texts: Map[Long, String]): Map[Long, (Long, Double, Double)] = {
    val toks = texts.view.mapValues(_.split(" ", -1).toSeq).toMap
    val uni = toks.values.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val bi = toks.values.flatMap(w => w.zip(w.tail))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val v = uni.size.toLong
    val scale = BigInt(10).pow(15)
    toks.collect { case (id, w) if w.length >= 2 =>
      val terms = w.zip(w.tail).map { p =>
        (BigInt(bi(p) + 1L) * scale) / BigInt(uni(p._1) + v)
      }
      val sumQ = terms.sum
      val sumProb = sumQ.toDouble / 1e15
      id -> (terms.length.toLong, sumProb, sumProb / terms.length)
    }
  }

  test("score equals the driver replay bit-for-bit; short docs drop") {
    val got = Curation.ngramLmScore(docs)
      .as[(Long, Long, Double, Double)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    val want = replay(Map(
      1L -> "a b a b c", 2L -> "a b", 3L -> "z", 4L -> "c c c a"))
    assert(got.keySet == Set(1L, 2L, 4L)) // doc 3 has no bigrams
    for ((id, (n, sum, avg)) <- want) {
      assert(got(id)._1 == n, s"doc $id n_bigrams")
      assert(got(id)._2 == sum, s"doc $id sum_prob (bit-exact)")
      assert(got(id)._3 == avg, s"doc $id avg_prob (bit-exact)")
    }
  }

  test("unseen-transition-heavy docs score lower than in-distribution docs") {
    val corpus = (0L to 9L).map(i => (i, "the quick fox jumps over the dog"))
      .toDF("doc_id", "text")
      .union(Seq((10L, "zebra quark the entropy xylophone")).toDF("doc_id", "text"))
    val scores = Curation.ngramLmScore(corpus)
      .select("doc_id", "avg_prob").as[(Long, Double)].collect().toMap
    assert(scores(10L) < scores(0L))
  }
}
