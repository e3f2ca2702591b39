package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data curation: token counting,
  * quality scoring, language ID, fingerprinting. All narrow projections
  * (no shuffle) built from codegen'd SQL functions; the only Scala UDF is
  * the FNV fingerprint, which has no SQL equivalent.
  */
object TextAnalysis {

  /** Whitespace + regex ("BPE-ish" [a-z]+ runs) token counts. */
  def tokenCounts(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      size(split(col("text"), " ")).as("ws_tokens"),
      size(expr("regexp_extract_all(text, '[a-z]+', 0)")).as("re_tokens")
    )

  /** GPT-2-style pre-tokenizer regex (contractions | space-prefixed word |
    * space-prefixed number | space-prefixed punctuation run | whitespace
    * run) — the "BPE-ish" token accounting a training pipeline budgets by.
    * Lookahead-free so the same pattern runs under Java regex and RE2
    * (the corpus is ASCII, so the ASCII classes equal the \p{L}/\p{N}
    * originals).
    */
  val BpePattern = "'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^\\sA-Za-z0-9]+|\\s+"

  /** Per-doc BPE-ish pre-token count + the byte length those tokens cover
    * (the pattern tiles the whole string, so covered == length — asserted
    * in the oracle as a cross-engine regex-semantics check).
    */
  def bpeTokenCounts(docs: DataFrame): DataFrame =
    docs
      // Column-arg form: the pattern's quote and backslashes never pass
      // through SQL-literal escape processing
      .withColumn("toks",
        regexp_extract_all(col("text"), lit(BpePattern), lit(0)))
      .select(
        col("doc_id"),
        size(col("toks")).as("bpe_tokens"),
        aggregate(col("toks"), lit(0), (acc, t) => acc + length(t)).as("covered_chars"),
        length(col("text")).as("n_chars2")
      )

  /** Per-source tokenizer fertility — the budgeting statistic a tokenizer
    * change is judged by at corpus scale: BPE-ish tokens per whitespace
    * word (fertility) and bytes per token (compression), aggregated over
    * each source. Map-side-combinable long sums through one small groupBy
    * shuffle keyed by source (source cardinality, not corpus cardinality),
    * then one exact int/int double division per ratio — oracle-exact.
    */
  def tokenizerFertility(docs: DataFrame): DataFrame =
    docs
      .withColumn("toks",
        regexp_extract_all(col("text"), lit(BpePattern), lit(0)))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(size(col("toks")).cast("long")).as("n_tokens"),
        sum(size(split(col("text"), " ")).cast("long")).as("n_words"),
        // octet_length: true UTF-8 bytes (length() counts characters, which
        // diverges on any non-ASCII corpus — bytes_per_token is a BYTE ratio)
        sum(octet_length(col("text")).cast("long")).as("n_bytes"))
      .select(col("source"), col("n_docs"), col("n_tokens"), col("n_words"),
        col("n_bytes"),
        (col("n_tokens").cast("double") / col("n_words")).as("fertility"),
        (col("n_bytes").cast("double") / col("n_tokens")).as("bytes_per_token"))

  /** Quality signals. Every ratio is a single int/int division so the value
    * is the correctly-rounded IEEE quotient in any engine (oracle-exact).
    */
  def qualityScore(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      col("n_chars"),
      size(split(col("text"), " ")).as("word_cnt"),
      (length(col("text")) - length(regexp_replace(col("text"), "[.,!?;:]", "")))
        .cast("double").divide(length(col("text"))).as("punct_ratio"),
      expr("size(filter(split(text, ' '), w -> w IN ('the', 'a', 'of', 'and', 'is')))")
        .cast("double").divide(size(split(col("text"), " "))).as("stop_ratio"),
      expr("aggregate(transform(split(text, ' '), w -> length(w)), 0, (acc, x) -> acc + x)")
        .cast("double").divide(size(split(col("text"), " "))).as("avg_word_len")
    )

  /** Marker-word language heuristic (n-gram language ID reduced to its
    * deterministic core so the oracle can replicate it).
    */
  def langId(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      col("lang"),
      when(col("text").contains(" the "), "en")
        .when(col("text").contains(" der "), "de")
        .when(col("text").contains(" la "), "fr")
        .otherwise("unk").as("lang_guess")
    )

  /** Per-language character-trigram profiles (the highest-frequency trigrams
    * of each language's function words) for the n-gram heuristic.
    */
  val LangTrigrams: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "ing", "ion", "ent"),
    "de" -> Seq("der", "ein", "sch", "und", "ich"),
    "fr" -> Seq("les", "ent", "eur", "que", "ais")
  )

  /** N-gram-profile language ID: count each profile trigram's
    * (non-overlapping) occurrences in the text, score per language = total
    * hits, guess = argmax with ties broken by profile order, 'unk' when
    * nothing hits. Occurrence counting is
    * `(len(text) - len(replace(text, g, ''))) div 3` — exact integer
    * arithmetic both engines replicate; the whole scorer is one narrow
    * projection, no UDFs.
    */
  /** Per-language trigram-hit scores over the `text` column. */
  def langScores: Seq[(String, Column)] = {
    def hits(g: String): Column =
      expr(s"(length(text) - length(replace(text, '$g', ''))) div 3")
    LangTrigrams.map { case (lang, gs) => lang -> gs.map(hits).reduce(_ + _) }
  }

  /** The argmax guess column alone (ties broken by profile order, 'unk'
    * when nothing hits) — reusable inside composed pipelines.
    */
  def langGuess: Column = {
    val scores = langScores
    val best = scores.tail.foldLeft(
      struct(scores.head._2.as("score"), lit(scores.head._1).as("lang"))) {
      case (acc, (lang, sc)) =>
        when(sc > acc.getField("score"),
          struct(sc.as("score"), lit(lang).as("lang"))).otherwise(acc)
    }
    when(best.getField("score") > 0, best.getField("lang")).otherwise(lit("unk"))
  }

  def langIdNgram(docs: DataFrame): DataFrame =
    docs.select(
      (col("doc_id") +: col("lang") +:
        langScores.map { case (l, sc) => sc.as(s"score_$l") } :+
        langGuess.as("lang_guess")): _*)

  /** Winnowing fingerprints (the Schleimer/Wilkerson/Aiken rolling-hash
    * scheme): hash every k-char gram, slide a w-hash window, keep each
    * window's minimum, dedupe — the standard selective fingerprint for
    * near-dup detection at corpus scale (output is ~1/w of the k-gram
    * hashes per document, emitted as (doc_id, fp) rows). The k-gram hash is
    * the native graft_fnv64; window minima are order-independent so the
    * DuckDB oracle replicates them exactly.
    */
  def winnowFingerprints(docs: DataFrame, k: Int = 8, w: Int = 4): DataFrame = {
    graft.cdc.types.GraftFunctions.register(docs.sparkSession)
    // the whole hash->window-min->dedup chain is one compiled pass
    // (graft_winnow); the HOF formulation (transform + array_min(slice))
    // computes identical values but interprets every gram
    docs.select(col("doc_id"),
      explode(call_function("graft_winnow", col("text"), lit(k), lit(w))).as("fp"))
  }

  /** Corpus-level bigram frequencies — the n-gram statistics a data-quality
    * pipeline tracks. Explode + hash aggregation, partial-aggregated map-side.
    */
  def bigramFreq(docs: DataFrame, minCount: Long): DataFrame = {
    graft.cdc.types.GraftFunctions.register(docs.sparkSession)
    docs
      // one native pass emits every bigram as a zero-copy byte span of the
      // text ([[bigramSpans]]; <2 words -> empty array ≡ the old size
      // filter); the explode feeds the partial hash agg in-stage
      .select(explode(call_function("graft_bigrams", col("text"))).as("bigram"))
      .groupBy(col("bigram"))
      .agg(count(lit(1)).as("cnt"))
      .where(col("cnt") >= minCount)
  }

  /** Runtime of the `graft_bigrams` codegen expression: all word bigrams
    * of `text` under single-space splitting, as ZERO-COPY byte spans of the
    * input. Observationally equal to
    * `split(text,' ')` -> size>=2 filter -> `transform(sequence, i ->
    * concat_ws(' ', slice(ws, i+1, 2)))` (the HOF formulation this
    * replaces): because the separator is exactly one space byte, bigram k
    * IS the input's byte range from the start of word k to the end of word
    * k+1 — empty words from leading/trailing/doubled spaces included —
    * so no per-bigram string building happens at all. A text with fewer
    * than two words returns an empty array (explode ≡ the size filter).
    */
  /** Runtime of `graft_sorted_fold` ([[graft.cdc.types.SortedFold]]): sum
    * the `v` field of (k, v) structs in (k asc, v asc) order — k compared
    * by its natural primitive/binary order, v (and double keys) by Spark's
    * SQL double ordering — seed 0.0, left-to-right. Returns null when any
    * element or any `v` is null, the same poisoning the HOF fold applies.
    */
  def sortedFoldKV(arr: org.apache.spark.sql.catalyst.util.ArrayData,
      kKind: Int): java.lang.Double = {
    import org.apache.spark.sql.catalyst.util.SQLOrderingUtil
    val n = arr.numElements()
    if (n == 0) return java.lang.Double.valueOf(0.0)
    val rows = new Array[org.apache.spark.sql.catalyst.InternalRow](n)
    val vs = new Array[Double](n)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      val r = arr.getStruct(i, 2)
      if (r.isNullAt(1)) return null
      rows(i) = r
      vs(i) = r.getDouble(1)
      i += 1
    }
    val idx = new Array[Integer](n)
    i = 0
    while (i < n) { idx(i) = Integer.valueOf(i); i += 1 }
    java.util.Arrays.sort(idx, new java.util.Comparator[Integer] {
      override def compare(a: Integer, b: Integer): Int = {
        val ra = rows(a.intValue()); val rb = rows(b.intValue())
        val c = kKind match {
          case 0 => java.lang.Integer.compare(ra.getInt(0), rb.getInt(0))
          case 1 => java.lang.Long.compare(ra.getLong(0), rb.getLong(0))
          case 2 => ra.getUTF8String(0).compareTo(rb.getUTF8String(0))
          case _ => SQLOrderingUtil.compareDoubles(ra.getDouble(0), rb.getDouble(0))
        }
        if (c != 0) c
        else SQLOrderingUtil.compareDoubles(vs(a.intValue()), vs(b.intValue()))
      }
    })
    var acc = 0.0
    i = 0
    while (i < n) { acc += vs(idx(i).intValue()); i += 1 }
    java.lang.Double.valueOf(acc)
  }

  def bigramSpans(text: org.apache.spark.unsafe.types.UTF8String)
      : org.apache.spark.sql.catalyst.util.ArrayData = ngramSpans(text, 2)

  /** Runtime of `graft_ngrams` — [[bigramSpans]] generalized to any n >= 1:
    * all word n-grams of `text` under single-space splitting, as ZERO-COPY
    * byte spans (n-gram k IS the input's byte range from the start of word
    * k to the end of word k+n-1, separators included — byte-identical to
    * `concat_ws(' ', slice(split(text, ' '), k+1, n))`, empty words from
    * doubled/leading/trailing spaces included). Fewer than n words returns
    * an empty array (explode ≡ the old `size(split(...)) >= n` filter).
    */
  def ngramSpans(text: org.apache.spark.unsafe.types.UTF8String, n: Int)
      : org.apache.spark.sql.catalyst.util.ArrayData = {
    import org.apache.spark.unsafe.types.UTF8String
    val bytes = text.getBytes
    val nb = bytes.length
    var spaces = 0
    var i = 0
    while (i < nb) { if (bytes(i) == ' ') spaces += 1; i += 1 }
    val count = spaces + 1 - n + 1 // words - n + 1
    if (count <= 0)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array.empty[Any])
    val sp = new Array[Int](spaces)
    var j = 0
    i = 0
    while (i < nb) { if (bytes(i) == ' ') { sp(j) = i; j += 1 }; i += 1 }
    val out = new Array[Any](count)
    var k = 0
    while (k < count) {
      val s = if (k == 0) 0 else sp(k - 1) + 1
      val e = if (k + n - 1 < spaces) sp(k + n - 1) else nb
      out(k) = UTF8String.fromBytes(bytes, s, e - s)
      k += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** FNV-1a 64-bit over UTF-8 bytes — stable document fingerprint. The
    * byte-array form is the codegen entry point: UTF8String already holds
    * UTF-8 bytes, so hashing them directly skips a String decode + re-encode
    * per value in the hot path.
    */
  def fnv1a64Bytes(bytes: Array[Byte]): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  def fnv1a64(s: String): Long =
    if (s == null) 0L else fnv1a64Bytes(s.getBytes("UTF-8"))

  /** Unicode NFC normalization + cleanup — the canonicalization pass a
    * curation pipeline runs before any hash-based dedup, so that the
    * composed ("é" U+00E9) and decomposed ("e"+U+0301) spellings of the
    * same text land in the same dedup bucket. One pass over the raw
    * string: ASCII whitespace runs (space, \t, \n, \r, \f, \u000B)
    * collapse to a single space, remaining C0/DEL control characters are
    * stripped, the result is trimmed, and NFC runs LAST — stripping a
    * control can join a combining mark to a new base character (e.g.
    * "e" + BEL + U+0301), so normalizing first would leave decomposed
    * residue and break idempotence (caught by the ExtOpsSpec property
    * laws). NFC neither creates nor destroys ASCII controls/whitespace,
    * so classifying before normalization is sound. The policy is
    * ASCII-whitespace-only by design (U+00A0 etc. are content, not
    * separators) so the oracle's regex classes state the same contract.
    */
  def nfcClean(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var pendingSpace = false
    var started = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f' || c == '\u000B') {
        pendingSpace = true
      } else if (c < ' ' || c == '\u007F') {
        // non-whitespace control: stripped, never separates words
      } else {
        if (pendingSpace && started) sb.append(' ')
        pendingSpace = false
        started = true
        sb.append(c)
      }
      i += 1
    }
    java.text.Normalizer.normalize(sb, java.text.Normalizer.Form.NFC)
  }

  /** UTF8String face of [[nfcClean]] — the codegen entry point. */
  def nfcCleanU(s: org.apache.spark.unsafe.types.UTF8String)
      : org.apache.spark.unsafe.types.UTF8String =
    if (s == null) null
    else org.apache.spark.unsafe.types.UTF8String.fromString(nfcClean(s.toString))

  /** Uses the native codegen'd expression (graft_fnv64), not a UDF, so the
    * projection stays inside whole-stage codegen.
    */
  def fingerprint(docs: DataFrame): DataFrame = {
    graft.cdc.types.GraftFunctions.register(docs.sparkSession)
    docs.select(col("doc_id"), call_function("graft_fnv64", col("text")).as("fp"))
  }

  /** BM25 keyword retrieval: top-k documents per query, with the
    * Robertson idf kept LOG-FREE — `(N - df + 0.5) / (df + 0.5)` — so every
    * score term is a chain of IEEE additions/multiplications/divisions both
    * engines execute identically (ln is the one op with no cross-engine
    * bit guarantee; the ranking it induces is the same monotone order).
    *
    * Shape at scale: postings `(term, doc_id, tf)` are ONE
    * map-side-combined aggregation of the exploded corpus; df and the
    * avgdl/N scalars fold off the postings; the query set is SMALL by
    * nature, so query terms broadcast onto the postings (an equi-join on
    * term — only documents containing a query term ever materialize a
    * score row). The per-(query, doc) fold orders terms by query position
    * inside the row, and the final top-k is a window partitioned BY QUERY
    * (cardinality = matched docs per query, never the corpus).
    *
    * @param queries (qid, pos, term) rows, pos 1-based within each query
    */
  def bm25TopK(
      docs: DataFrame, queries: DataFrame, k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val words = docs.select(col("doc_id"),
      explode(split(col("text"), " ")).as("term"))
    val postings = words.groupBy(col("term"), col("doc_id"))
      .agg(count(lit(1)).as("tf"))
    val dl = docs.select(col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("dl"))
    // N and avgdl: integer folds, one exact double division at the end
    val stats = dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
      .select(col("n_docs"), (col("sum_dl") / col("n_docs")).as("avgdl"))
    val df = postings.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val terms = broadcast(queries)
      .join(postings, Seq("term"))
      .join(df, Seq("term"))
      .join(dl, Seq("doc_id"))
      .crossJoin(broadcast(stats))
      .select(col("qid"), col("doc_id"), col("pos"),
        (((col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))) *
          (col("tf") * lit(k1 + 1.0)) /
          (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))))
          .as("term_score"))
    val scored = terms.groupBy(col("qid"), col("doc_id"))
      // compiled sort+fold, same values as the sort_array HOF (spec-pinned)
      .agg(call_function("graft_sorted_fold",
        collect_list(struct(col("pos"), col("term_score")))).as("score"))
    scored
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("qid"))
          .orderBy(col("score").desc, col("doc_id").asc)))
      .where(col("rank") <= k)
      .select(col("qid"), col("rank").cast("long").as("rank"),
        col("doc_id"), col("score"))
  }
}
