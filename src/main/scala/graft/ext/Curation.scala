package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-curation operators for training-data pipelines: within-document
  * repetition statistics (the Gopher-style "top n-gram fraction" family),
  * PII scrubbing, and the composed quality gate that chains language ID,
  * length/repetition filters, and exact-dedup keeper selection into the
  * one pass a 100 TB curation job actually runs.
  *
  * Repetition stats are per-document array folds — the whole computation
  * stays inside the row (no explode, no shuffle), in contrast to
  * [[TextAnalysis.bigramFreq]]'s corpus-level aggregation. The pipeline's
  * only shuffles are the exact-dedup digest groupBy (32-byte digests, never
  * texts, cross the wire) and the final small group-by.
  */
object Curation {

  /** Per-document word/bigram repetition. All outputs are exact integers
    * or deterministic strings (argmax ties broken by count desc, then
    * lexicographically smallest), so the DuckDB oracle matches hash-exact.
    *
    * The argmax is a SINGLE linear fold over the sorted array counting
    * runs — O(n log n) per document, one pass, no per-step array
    * allocation. (A naive `size(filter(ws, y -> y = x))` per distinct
    * value is O(distinct x n) in interpreted HOF lambdas and measured
    * ~100x slower at the 200k-doc stress scale.) Equal elements are
    * adjacent after the sort and the sort visits words ascending, so
    * keeping the FIRST strictly-longest run implements the count-desc,
    * word-asc tie-break for free. Nothing leaves the row.
    */
  def repetitionStats(docs: DataFrame): DataFrame = {
    // fold state: best (cnt, v) so far + current run (run, prev); finish
    // projects the best pair out
    def argmaxFold(over: String): String =
      s"""aggregate(
         |  array_sort($over),
         |  named_struct('cnt', 0, 'v', cast(null as string),
         |               'run', 0, 'prev', cast(null as string)),
         |  (acc, x) -> named_struct(
         |    'cnt', if(if(x <=> acc.prev, acc.run + 1, 1) > acc.cnt,
         |              if(x <=> acc.prev, acc.run + 1, 1), acc.cnt),
         |    'v',   if(if(x <=> acc.prev, acc.run + 1, 1) > acc.cnt, x, acc.v),
         |    'run', if(x <=> acc.prev, acc.run + 1, 1),
         |    'prev', x),
         |  acc -> named_struct('cnt', acc.cnt, 'v', acc.v))""".stripMargin
    docs
      .withColumn("ws", split(col("text"), " "))
      // slice(ws, 1, 0) = a typed empty array<string>; a bare array() would
      // be array<null> and break the fold's branch typing
      .withColumn("bg", expr(
        """case when size(ws) >= 2
          |     then transform(sequence(0, size(ws) - 2),
          |                    i -> concat_ws(' ', slice(ws, i + 1, 2)))
          |     else slice(ws, 1, 0) end""".stripMargin))
      .withColumn("topw", expr(argmaxFold("ws")))
      .withColumn("topb", expr(argmaxFold("bg")))
      .select(
        col("doc_id"),
        size(col("ws")).as("n_words"),
        size(array_distinct(col("ws"))).as("n_distinct"),
        col("topw.v").as("top_word"),
        col("topw.cnt").as("top_word_cnt"),
        (col("topw.cnt") * length(col("topw.v"))).as("top_word_chars"),
        col("topb.v").as("top_bigram"),
        col("topb.cnt").as("top_bigram_cnt"))
  }

  /** RE2/Java-portable patterns (no lookahead, no \p classes) so the same
    * text runs identically under Spark and the DuckDB oracle.
    */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val UrlPattern = "https?://[A-Za-z0-9./_-]+"

  /** Mask emails and URLs, keeping the match counts a pipeline audits.
    * Emails scrub first — a URL never contains '@', so the order only
    * matters for not re-matching inside the '<EMAIL>' token. Column-arg
    * regex form keeps the patterns out of SQL-literal escaping.
    */
  def scrubPii(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      regexp_count(col("text"), lit(EmailPattern)).as("n_emails"),
      regexp_count(col("text"), lit(UrlPattern)).as("n_urls"),
      regexp_replace(
        regexp_replace(col("text"), lit(EmailPattern), lit("<EMAIL>")),
        lit(UrlPattern), lit("<URL>")).as("scrubbed"))

  /** Benchmark decontamination — flag corpus documents sharing word
    * n-grams with a benchmark/eval set, the standard hygiene pass before
    * training. Returns (doc_id, shared_grams) for every corpus doc with at
    * least one distinct n-gram in common.
    *
    * Shape at 100 TB: n-grams are deduped per document BEFORE exploding
    * (array_distinct in the row), only 32-byte digests leave the scan, and
    * the benchmark side — small by nature (an eval suite, not a corpus) —
    * is broadcast so the corpus never shuffles. If a benchmark ever
    * outgrew the broadcast threshold, drop the hint and the same plan
    * becomes a digest-keyed shuffle join.
    */
  def decontaminate(corpus: DataFrame, benchmark: DataFrame, n: Int = 5): DataFrame = {
    def gramRows(df: DataFrame): DataFrame = df
      .withColumn("ws", split(col("text"), " "))
      .select(col("doc_id"), explode(expr(
        s"""case when size(ws) >= $n
           |     then array_distinct(transform(sequence(0, size(ws) - $n),
           |                                   i -> concat_ws(' ', slice(ws, i + 1, $n))))
           |     else slice(ws, 1, 0) end""".stripMargin)).as("g"))
      .select(col("doc_id"), sha2(col("g"), 256).as("gsha"))
    val bench = gramRows(benchmark).select("gsha").distinct()
    gramRows(corpus)
      .join(broadcast(bench), "gsha")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("shared_grams"))
  }

  /** The composed curation gate, one declarative plan:
    *
    *   1. per-doc stats (words, top-word count, trigram language guess) —
    *      narrow, map-side;
    *   2. exact-dedup keeper per sha2-256 digest — the only data-sized
    *      shuffle, carrying digests, never documents;
    *   3. keep docs that are their group's keeper, have >= minWords words,
    *      and whose top word is under 1/repLimit of all words;
    *   4. corpus report grouped by (source, lang_guess).
    *
    * Catalyst plans 2+3 as one hash aggregate + equi-join on the digest;
    * AQE broadcasts the keeper side when it is small.
    */
  def pipeline(docs: DataFrame, minWords: Int = 30, repLimit: Int = 10): DataFrame = {
    val stats = docs.select(
      col("doc_id"),
      col("source"),
      sha2(col("text"), 256).as("sha"),
      size(split(col("text"), " ")).as("n_words"),
      // same sorted-runs fold as repetitionStats, counts only
      expr(
        """aggregate(array_sort(split(text, ' ')),
          |  named_struct('cnt', 0, 'run', 0, 'prev', cast(null as string)),
          |  (acc, x) -> named_struct(
          |    'cnt', greatest(acc.cnt, if(x <=> acc.prev, acc.run + 1, 1)),
          |    'run', if(x <=> acc.prev, acc.run + 1, 1),
          |    'prev', x),
          |  acc -> acc.cnt)""".stripMargin).as("top_cnt"),
      TextAnalysis.langGuess.as("lang_guess"))
    val keepers = docs
      .groupBy(sha2(col("text"), 256).as("sha"))
      .agg(min(col("doc_id")).as("keep_id"))
    stats.join(keepers, "sha")
      .where(col("doc_id") === col("keep_id")
        && col("n_words") >= minWords
        && col("top_cnt") * repLimit <= col("n_words"))
      .groupBy(col("source"), col("lang_guess"))
      .agg(
        count(lit(1)).as("docs_kept"),
        sum(col("n_words")).as("total_ws_tokens"))
  }
}
