package graft.ext

import graft.SparkTestBase
import graft.cdc.model.Changelog.table
import org.apache.spark.sql.functions._

/** [[Bpe]] behavioral coverage: the greedy merge-pass edges, a
  * hand-computed learn, and a full driver-side replay of learning +
  * tokenization on real documents.
  */
class BpeSpec extends SparkTestBase {

  /** Driver-side reference implementations (code-unit symbols, same
    * greedy left-to-right pass, same tie-breaks).
    */
  private def refMerge(syms: List[String], l: String, r: String): List[String] = {
    val out = scala.collection.mutable.ListBuffer[String]()
    var prev: String = null
    for (x <- syms) {
      if (prev == l && x == r) { prev = l + r }
      else { if (prev != null) out += prev; prev = x }
    }
    if (prev != null) out += prev
    out.toList
  }

  private def refLearn(
      words: Map[String, Long],
      nMerges: Int
  ): (List[(String, String, Long)], Map[List[String], Long]) = {
    var vocab: Map[List[String], Long] =
      words.groupBy(_._1.map(_.toString).toList).map { case (k, v) => k -> v.values.sum }
    val merges = scala.collection.mutable.ListBuffer[(String, String, Long)]()
    var done = false
    while (merges.size < nMerges && !done) {
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      for ((syms, cnt) <- vocab; Seq(a, b) <- syms.sliding(2) if syms.size >= 2)
        counts((a, b)) = counts.getOrElse((a, b), 0L) + cnt
      // UTF-8 byte order on symbols — the collation the engine fold and
      // the DuckDB oracle's ORDER BY apply (Java String order would
      // diverge on non-BMP tie cases)
      def u8(x: String): org.apache.spark.unsafe.types.UTF8String =
        org.apache.spark.unsafe.types.UTF8String.fromString(x)
      val best = counts.toSeq.sortWith { case (((al, ar), af), ((bl, br), bf)) =>
        if (af != bf) af > bf
        else {
          val cl = u8(al).compareTo(u8(bl))
          if (cl != 0) cl < 0 else u8(ar).compareTo(u8(br)) < 0
        }
      }.headOption
      best match {
        case Some(((l, r), f)) if f >= 2L =>
          merges += ((l, r, f))
          vocab = vocab.groupBy { case (syms, _) => refMerge(syms, l, r) }
            .map { case (k, v) => k -> v.values.sum }
        case _ => done = true
      }
    }
    (merges.toList, vocab)
  }

  test("greedy merge pass: overlaps, chains, and the merged-symbol identity") {
    val s = spark
    import s.implicits._
    val df = Seq("aaaa", "aaa", "abab", "ba").toDF("word")
      .withColumn("syms", expr("filter(split(word, ''), x -> x <> '')"))
    val out = df.select(col("word"), Bpe.mergeSyms(col("syms"), "a", "a").as("m"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
    assert(out("aaaa") == List("aa", "aa")) // non-overlapping left-to-right
    assert(out("aaa") == List("aa", "a"))   // merged "aa" does not chain-match (a,a)
    assert(out("abab") == List("a", "b", "a", "b"))
    assert(out("ba") == List("b", "a"))
  }

  test("learnMerges on a hand corpus produces the known merge sequence") {
    val s = spark
    import s.implicits._
    // "low low low lower lowest": classic BPE toy. Pair counts round 1:
    // (l,o)=5, (o,w)=5 -> tie broken to (l,o); then (lo,w)=5; then
    // (low,e)=2 ... exercises both freq ordering and lexicographic ties
    val docs = Seq((0L, "low low low lower lowest")).toDF("doc_id", "text")
    val merges = Bpe.learnMerges(docs, nMerges = 4).orderBy("step").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toList
    // hand-checked: (l,o) x5 ties (o,w) x5 -> lexicographic; then the
    // merged symbols re-pair
    assert(merges.take(2) == List((0, "l", "o", 5L), (1, "lo", "w", 5L)))
    val (ref, _) = refLearn(Map("low" -> 3L, "lower" -> 1L, "lowest" -> 1L), 4)
    assert(merges.map(m => (m._2, m._3, m._4)) == ref)
    assert(merges.map(_._1) == merges.indices.toList)
  }

  test("merge pass properties: concatenation preserved, only shortens, pass complete") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val symsGen: Gen[Array[String]] = for {
      n <- Gen.choose(0, 20)
      syms <- Gen.listOfN(n, Gen.oneOf("a", "b", "c", "ab", "'", "é"))
    } yield syms.toArray
    val p = Prop.forAll(symsGen, Gen.oneOf("a", "b", "ab"), Gen.oneOf("a", "b", "c")) {
      (syms, l, r) =>
        val out = Bpe.mergeOnce(syms, l, r)
        out.mkString == syms.mkString &&
          out.length <= syms.length &&
          // no unmerged (l, r) adjacency survives a pass UNLESS the left
          // symbol is itself the product of a merge this pass (greedy
          // left-to-right consumed its components)
          out.indices.drop(1).forall(i =>
            !(out(i - 1) == l && out(i) == r) || out(i - 1) == l + r || l == l + r)
    } && Prop.forAll(symsGen) { syms =>
      Bpe.mergeOnce(syms, "x", "y").toSeq == syms.toSeq // pair-free = identity
    }
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), p)
    assert(r.passed, r.status.toString)
  }

  test("graft_bpe one-pass expression == the composed per-merge HOF chain") {
    val s = spark
    import s.implicits._
    graft.cdc.types.GraftFunctions.register(s)
    val merges = Seq(("l", "o"), ("lo", "w"), ("e", "r"))
    val df = Seq("low", "lower", "lowest", "l", "", "owl").toDF("word")
      .withColumn("syms", expr("filter(split(word, ''), x -> x <> '')"))
    val viaHofs = merges.foldLeft(col("syms")) { case (c, (l, r)) => Bpe.mergeSyms(c, l, r) }
    val both = df.select(
      col("word"),
      call_function("graft_bpe", col("syms"),
        typedLit(merges.map(m => Seq(m._1, m._2)))).as("native"),
      viaHofs.as("hof")).collect()
    for (r <- both)
      assert(r.getSeq[String](1) == r.getSeq[String](2), s"word '${r.getString(0)}'")
    // empty merge list is the identity
    val id = df.select(col("syms"),
      call_function("graft_bpe", col("syms"),
        typedLit(Seq.empty[Seq[String]])).as("out")).collect()
    for (r <- id) assert(r.getSeq[String](0) == r.getSeq[String](1))
  }

  test("learn + tokenize == full driver replay on real documents") {
    val docs = table(spark, sfDir, "documents")
    val nMerges = 10
    val got = Bpe.learnMerges(docs, nMerges).orderBy("step").collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(3))).toList

    val wordCounts = docs.select(explode(split(col("text"), " ")).as("w"))
      .where(length(col("w")) > 0)
      .groupBy("w").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val (ref, _) = refLearn(wordCounts, nMerges)
    assert(got == ref, s"merge sequences diverge:\n got=$got\n ref=$ref")

    // tokenization: per-doc counts equal a driver replay with the same
    // merges; every merge strictly reduces (or keeps) total token count
    val tok = Bpe.tokenizeWith(docs, Bpe.learnMerges(docs, nMerges))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    val docWords = docs.select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").filter(_.nonEmpty))
    def applyAll(w: String): Int =
      ref.foldLeft(w.map(_.toString).toList) { case (s2, (l, r, _)) => refMerge(s2, l, r) }.size
    for ((id, ws) <- docWords) {
      val (nw, bt) = tok(id)
      assert(nw == ws.length)
      assert(bt == ws.map(applyAll).sum, s"doc $id")
      assert(bt <= ws.map(_.length).sum)
    }
  }
}
