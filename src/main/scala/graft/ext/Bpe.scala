package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BPE tokenizer TRAINING — the vocabulary-learning step a training
  * pipeline runs before any corpus is tokenized (Sennrich et al. 2016
  * word-internal byte-pair encoding). Learning is iterative: count every
  * adjacent symbol pair (weighted by word frequency), merge the most
  * frequent pair everywhere, repeat.
  *
  * Scale shape: the corpus is touched ONCE — a word-count hash aggregate
  * (map-side combined, only distinct words survive). Every merge iteration
  * then runs over the VOCABULARY table (distinct words x their symbol
  * arrays — ~1M rows for a 100 TB web corpus, i.e. planner-metadata scale,
  * not data scale): pair extraction is an in-row transform, the pair count
  * is a map-side-combinable weighted sum over a pair-vocabulary-sized
  * shuffle, the argmax is a 1-row TakeOrdered, and the merge rewrite is an
  * in-row fold. `localCheckpoint` truncates the iterative lineage
  * (reliable `checkpoint` on a cluster — same trade as
  * [[Dedup.clusterAssign]]).
  *
  * All counts are integers and every tie-break is total (freq desc, then
  * (left, right) lexicographic), so the learned merge sequence is exactly
  * deterministic — verified by full driver-side replay in BpeSpec. The
  * merge LOOP is not expressible as one SQL statement, so the queries ship
  * rows-only (house model-fit policy).
  */
object Bpe {

  /** (word, cnt, syms): the corpus' distinct words, occurrence-weighted,
    * split into single-character symbols. The only corpus-sized pass.
    */
  private[ext] def wordTable(docs: DataFrame): DataFrame =
    docs
      .select(explode(split(col("text"), " ")).as("word"))
      .where(length(col("word")) > 0)
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
      .withColumn("syms", expr("filter(split(word, ''), x -> x <> '')"))

  /** Greedy left-to-right single-pass merge of adjacent (l, r) symbol
    * pairs: the fold holds the previous symbol back; on a match it emits
    * nothing and carries the merged symbol as the new previous (so "a a a
    * a" under (a,a) becomes "aa aa", and the merged symbol — a different
    * string — never chain-matches the same pair). Literals go through
    * `lit` (never SQL text), so any characters in the learned pair are
    * safe.
    */
  private[ext] def mergeSyms(syms: Column, l: String, r: String): Column = {
    val merged = l + r
    def emit(acc: Column): Column =
      when(acc.getField("prev").isNull, acc.getField("out"))
        .otherwise(concat(acc.getField("out"), array(acc.getField("prev"))))
    aggregate(
      syms,
      struct(slice(syms, 1, 0).as("out"), lit(null).cast("string").as("prev")),
      (acc, x) =>
        when(acc.getField("prev") === lit(l) && x === lit(r),
          struct(acc.getField("out").as("out"), lit(merged).as("prev")))
          .otherwise(struct(emit(acc).as("out"), x.as("prev"))),
      acc => emit(acc))
  }

  /** Learn `nMerges` merges. Returns the merge table
    * (step, left, right, freq) — the model, as data. Stops early when no
    * pair occurs at least `minFreq` times.
    */
  def learnMerges(docs: DataFrame, nMerges: Int, minFreq: Long = 2L): DataFrame = {
    val spark = docs.sparkSession
    var words = wordTable(docs).localCheckpoint()
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    var step = 0
    var done = false
    while (step < nMerges && !done) {
      // guard the 1-symbol words: sequence(0, -1) DESCENDS, it is not empty
      val top = words
        .where(size(col("syms")) >= 2)
        .select(col("cnt"), explode(expr(
          """transform(sequence(0, size(syms) - 2),
            |          i -> struct(syms[i] AS l, syms[i + 1] AS r))""".stripMargin)).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("cnt")).as("freq"))
        .orderBy(col("freq").desc, col("l"), col("r"))
        .limit(1).collect()
      if (top.isEmpty || top(0).getLong(2) < minFreq) done = true
      else {
        val (l, r, f) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += ((step, l, r, f))
        words = words.withColumn("syms", mergeSyms(col("syms"), l, r))
          .localCheckpoint()
        step += 1
      }
    }
    import spark.implicits._
    merges.result().toDF("step", "left", "right", "freq")
  }

  /** One greedy merge pass on a plain symbol array (the JVM form of
    * [[mergeSyms]] — same semantics, used by the compiled tokenizer and
    * the specs).
    */
  private[ext] def mergeOnce(syms: Array[String], l: String, r: String): Array[String] = {
    val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
    var prev: String = null
    var i = 0
    while (i < syms.length) {
      val x = syms(i)
      if (prev == l && x == r) prev = l + r
      else { if (prev != null) out += prev; prev = x }
      i += 1
    }
    if (prev != null) out += prev
    out.toArray
  }

  /** Compiled entry point of the `graft_bpe` expression: all merges in
    * learning order, one call per row (the merge array is an executor-side
    * reference object, decoded once).
    */
  def applyMergesData(
      syms: org.apache.spark.sql.catalyst.util.ArrayData,
      merges: Array[Array[String]]
  ): org.apache.spark.sql.catalyst.util.ArrayData = {
    var cur = Array.tabulate(syms.numElements())(i => syms.getUTF8String(i).toString)
    var i = 0
    while (i < merges.length) {
      cur = mergeOnce(cur, merges(i)(0), merges(i)(1))
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      cur.map(org.apache.spark.unsafe.types.UTF8String.fromString))
  }

  /** Tokenize with a learned merge table: every merge applied in learning
    * order via the native `graft_bpe` expression — ONE compiled pass per
    * word (an equivalent chain of nMerges nested `aggregate()` HOFs
    * multiplies the expression tree per merge and exhausts the analyzer
    * heap around 20). The chain runs once per DISTINCT word (the
    * vocabulary table again, never the corpus), then a hash equi-join
    * carries each word's token count back to its occurrences; the per-doc
    * sum is map-side combined. Returns (doc_id, n_words, bpe_tokens).
    */
  def tokenize(docs: DataFrame, merges: Seq[(String, String)]): DataFrame = {
    graft.cdc.types.GraftFunctions.register(docs.sparkSession)
    val mergeLit = typedLit(merges.map(m => Seq(m._1, m._2)))
    val wordToks = wordTable(docs)
      .select(col("word"),
        size(call_function("graft_bpe", col("syms"), mergeLit)).as("word_toks"))
    docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      .where(length(col("word")) > 0)
      .join(wordToks, Seq("word"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"), sum(col("word_toks")).as("bpe_tokens"))
  }

  /** [[tokenize]] against a merge DataFrame from [[learnMerges]]. The
    * model is tiny by construction (nMerges rows), so collecting it to
    * drive expression building is model-load, not a data path.
    */
  def tokenizeWith(docs: DataFrame, merges: DataFrame): DataFrame = {
    val ordered = merges.orderBy(col("step")).collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    tokenize(docs, ordered)
  }
}
