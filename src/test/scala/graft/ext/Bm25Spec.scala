package graft.ext

import graft.SparkTestBase

/** BM25 top-k vs an exact driver-side replay (same log-free idf). */
class Bm25Spec extends SparkTestBase {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "spark streams merge fast"),
    (2L, "merge sort merge join"),
    (3L, "the quick brown fox"),
    (4L, "spark merge")
  )
  private val query = Seq((1L, 1, "spark"), (1L, 2, "merge"))

  private def replay(k1: Double = 1.2, b: Double = 0.75): Map[Long, Double] = {
    val toks = corpus.map { case (id, t) => id -> t.split(" ").toSeq }.toMap
    val n = toks.size.toLong
    val avgdl = toks.values.map(_.size.toLong).sum.toDouble / n
    val df = query.map(_._3).distinct.map { t =>
      t -> toks.values.count(_.contains(t)).toLong
    }.toMap
    toks.flatMap { case (id, ws) =>
      val terms = query.flatMap { case (_, _, t) =>
        val tf = ws.count(_ == t).toLong
        if (tf == 0 || df(t) == 0) None
        else Some(((n - df(t) + 0.5) / (df(t) + 0.5)) * (tf * (k1 + 1.0)) /
          (tf + k1 * ((1.0 - b) + b * ws.size.toLong / avgdl)))
      }
      if (terms.isEmpty) None
      else { var acc = 0.0; terms.foreach(acc += _); Some(id -> acc) }
    }
  }

  test("scores equal the replay bit-for-bit and rank by relevance") {
    val got = TextAnalysis.bm25TopK(
        corpus.toDF("doc_id", "text"), query.toDF("qid", "pos", "term"), k = 10)
      .select("doc_id", "score").as[(Long, Double)].collect().toMap
    val want = replay()
    assert(got.keySet == Set(1L, 2L, 4L)) // doc 3 matches nothing
    want.foreach { case (id, s) => assert(got(id) == s, s"doc $id bit-exact") }
    // doc 4 is short and contains both terms: highest score
    assert(got(4L) > got(1L) && got(4L) > got(2L))
  }
}
