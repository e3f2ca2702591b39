package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.QueryPack
import graft.cdc.model.Changelog.table

/** Oracled queries for [[Curation]]: within-doc repetition stats, PII
  * scrubbing, and the composed corpus-curation gate.
  *
  * The scrub fixture plants deterministic PII (emails/URLs derived from
  * doc_id, skipped on every 5th doc so the zero-match branch runs) with the
  * SAME derivation on both sides — the house fixture-synthesis pattern.
  */
object CurationQueries extends QueryPack {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_repetition" -> ((s, dir) =>
      Curation.repetitionStats(table(s, dir, "documents"))),

    "text_scrub_pii" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
      val aug = when(col("doc_id") % 5 === 0, col("text")).otherwise(
        concat(col("text"), lit(" contact user"), col("doc_id"),
          lit("@example.com or http://h"), col("doc_id") % 7, lit(".example/p")))
      Curation.scrubPii(docs.select(col("doc_id"), aug.as("text")))
    }),

    "corpus_curation_pipeline" -> ((s, dir) =>
      Curation.pipeline(table(s, dir, "documents"))),

    // benchmark set = every 29th doc (fixture stand-in for an eval suite);
    // the planted near-duplicates of benchmark members get flagged with
    // high overlap, plus the occasional single-gram chance collision
    "corpus_decontaminate" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
      Curation.decontaminate(
        docs.where(col("doc_id") % 29 =!= 0),
        docs.where(col("doc_id") % 29 === 0))
    }),

    // every 4th doc gets the 10-word boilerplate prefix (the cookie-banner
    // stand-in): its aligned segment repeats across 125 docs, keep-first
    // keeps only doc 0's copy and the rewrite drops the other 124
    "corpus_segment_dedup" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
      val planted = when(col("doc_id") % 4 === 0,
        concat(lit(Boilerplate + " "), col("text"))).otherwise(col("text"))
      Curation.segmentDedup(docs.select(col("doc_id"), planted.as("text")), span = 10)
    }),

    // mixing config derived from the source index (golden-ratio ppm spread;
    // src0 lands on 0 ppm, exercising the all-dropped stratum)
    "corpus_stratified_sample" -> ((s, dir) => {
      val rates = s.range(20).select(
        concat(lit("src"), col("id")).as("source"),
        pmod(col("id") * 61803L, lit(1000000L)).as("keep_ppm"))
      Curation.stratifiedSample(table(s, dir, "documents"), rates, seed = 42L)
    }),

    // stand-in model: 1024 integer weights in [-1000, 1000] derived from
    // graft_mix64(bucket, 7) — a trained model would load the same
    // (bucket, w) shape from storage
    "corpus_quality_classifier" -> ((s, dir) => {
      graft.cdc.types.GraftFunctions.register(s) // weights analyze eagerly
      val weights = s.range(1024).select(
        col("id").as("bucket"),
        (pmod(call_function("graft_mix64", col("id"), lit(7L)), lit(2001L)) - 1000L)
          .as("w"))
      Curation.hashedLinearScore(table(s, dir, "documents"), weights, dim = 1024)
    }),

    // 2048-token training sequences; the manifest is pure integer
    // arithmetic off a distributed prefix sum, so it hash-matches DuckDB's
    // single-node window formulation exactly
    "corpus_pack_sequences" -> ((s, dir) =>
      Curation.packSequences(table(s, dir, "documents"), seqLen = 2048L)),

    "corpus_vocab_coverage" -> ((s, dir) =>
      Curation.vocabCoverage(table(s, dir, "documents"), vocabSize = 100)),

    // temperature mixing at tau=1/2: rates derived from the corpus via
    // sqrt (the one correctly-rounded IEEE power), gate = the same mix64
    // ppm bucket as the stratified sampler
    "corpus_temperature_mix" -> ((s, dir) =>
      Curation.temperatureMix(table(s, dir, "documents"), seed = 42L,
        targetFraction = 0.25)),

    // KenLM-style corpus-conditional quality score, kept in the exact
    // division domain (no log) so the per-position probability fold is a
    // deterministic IEEE sequence both engines replay bit-for-bit
    "corpus_ngram_lm_score" -> ((s, dir) =>
      Curation.ngramLmScore(table(s, dir, "documents"))),

    // DSIR importance resampling: hashed-bigram distributions fit on the
    // src0 slice vs the rest, raw docs ranked by target-likeness
    "corpus_dsir_select" -> ((s, dir) =>
      Curation.dsirSelect(table(s, dir, "documents"),
        targetSource = "src0", dim = 1024, k = 64)),

    // content-digest-keyed train/holdout split: exact duplicates can never
    // straddle the split (id-keyed splits leak them into the holdout)
    "corpus_holdout_split" -> ((s, dir) =>
      Curation.holdoutSplit(table(s, dir, "documents"), seedTag = "_s7")),

    // token-budget mixture fill: per-source budgets derived from the
    // source name (deterministic fixture both engines build), quality
    // proxy = character length; budgets sit below most sources' totals so
    // the prefix cut is exercised, not vacuous
    "corpus_token_budget_mix" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
      val budgets = docs.select(col("source")).distinct()
        .withColumn("budget_tokens",
          lit(200L) + lit(61L) * expr("CAST(substring(source, 4) AS BIGINT)"))
      Curation.tokenBudgetMix(docs, budgets, length(col("text")))
    }),

    "corpus_shuffle" -> ((s, dir) =>
      Curation.globalShuffle(table(s, dir, "documents"), seed = 7L, nShards = 16)),

    // the composed corpus -> training-batches flow in ONE declarative
    // plan: quality gate + exact-dedup keeper, then the survivors packed
    // into 2048-token sequences — all-integer, hash-oracled end to end
    "corpus_training_pipeline" -> ((s, dir) =>
      Curation.packSequences(
        Curation.gated(table(s, dir, "documents")).select(col("doc_id"), col("text")),
        seqLen = 2048L))
  )

  /** 10 words exactly — one aligned `span = 10` segment when prefixed. */
  private[ext] val Boilerplate =
    "terms of service apply to all content on this site"

  def oracles: Map[String, String] = {
    // the trigram scorer + profile-order argmax, exactly as the
    // text_lang_id_ngram oracle renders it
    def hitSql(g: String) = s"(length(text) - length(replace(text, '$g', ''))) // 3"
    val scores = TextAnalysis.LangTrigrams.map { case (lang, gs) =>
      lang -> gs.map(hitSql).mkString("(", " + ", ")")
    }.toMap
    val guessSql =
      s"""CASE WHEN greatest(${scores("en")}, ${scores("de")}, ${scores("fr")}) = 0 THEN 'unk'
         |     WHEN ${scores("fr")} > greatest(${scores("en")}, ${scores("de")}) THEN 'fr'
         |     WHEN ${scores("de")} > ${scores("en")} THEN 'de'
         |     ELSE 'en' END""".stripMargin

    Map(
      "text_repetition" ->
        """WITH t AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
          |wc AS (SELECT doc_id, w, count(*) AS c
          |       FROM (SELECT doc_id, unnest(ws) AS w FROM t) GROUP BY 1, 2),
          |topw AS (SELECT doc_id, w, c FROM (
          |           SELECT doc_id, w, c,
          |                  row_number() OVER (PARTITION BY doc_id
          |                                     ORDER BY c DESC, w ASC) AS rn
          |           FROM wc) WHERE rn = 1),
          |bc AS (SELECT doc_id, b, count(*) AS c
          |       FROM (SELECT doc_id,
          |                    unnest(list_transform(generate_series(1, len(ws) - 1),
          |                                          i -> ws[i] || ' ' || ws[i + 1])) AS b
          |             FROM t WHERE len(ws) >= 2) GROUP BY 1, 2),
          |topb AS (SELECT doc_id, b, c FROM (
          |           SELECT doc_id, b, c,
          |                  row_number() OVER (PARTITION BY doc_id
          |                                     ORDER BY c DESC, b ASC) AS rn
          |           FROM bc) WHERE rn = 1)
          |SELECT t.doc_id, len(t.ws) AS n_words,
          |       len(list_distinct(t.ws)) AS n_distinct,
          |       topw.w AS top_word, topw.c AS top_word_cnt,
          |       topw.c * length(topw.w) AS top_word_chars,
          |       topb.b AS top_bigram, coalesce(topb.c, 0) AS top_bigram_cnt
          |FROM t JOIN topw USING (doc_id) LEFT JOIN topb USING (doc_id)""".stripMargin,

      "text_scrub_pii" ->
        s"""WITH aug AS (
           |  SELECT doc_id,
           |         CASE WHEN doc_id % 5 = 0 THEN text
           |              ELSE text || ' contact user' || doc_id ||
           |                   '@example.com or http://h' || (doc_id % 7) ||
           |                   '.example/p' END AS text
           |  FROM documents)
           |SELECT doc_id,
           |       len(regexp_extract_all(text, '${Curation.EmailPattern}')) AS n_emails,
           |       len(regexp_extract_all(text, '${Curation.UrlPattern}')) AS n_urls,
           |       regexp_replace(regexp_replace(text,
           |         '${Curation.EmailPattern}', '<EMAIL>', 'g'),
           |         '${Curation.UrlPattern}', '<URL>', 'g') AS scrubbed
           |FROM aug""".stripMargin,

      "corpus_decontaminate" ->
        """WITH t AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
          |grams AS (
          |  SELECT DISTINCT doc_id,
          |         unnest(list_transform(generate_series(1, len(ws) - 4),
          |                               i -> array_to_string(ws[i:i+4], ' '))) AS g
          |  FROM t WHERE len(ws) >= 5),
          |bench AS (SELECT DISTINCT g FROM grams WHERE doc_id % 29 = 0)
          |SELECT doc_id, count(*) AS shared_grams
          |FROM grams JOIN bench USING (g)
          |WHERE doc_id % 29 <> 0
          |GROUP BY doc_id""".stripMargin,

      "corpus_segment_dedup" ->
        s"""WITH aug AS (
           |  SELECT doc_id,
           |         CASE WHEN doc_id % 4 = 0 THEN '$Boilerplate ' || text
           |              ELSE text END AS text
           |  FROM documents),
           |t AS (SELECT doc_id, string_split(text, ' ') AS ws FROM aug),
           |e AS (SELECT doc_id, ws, unnest(range(0, (len(ws) + 9) // 10)) AS idx
           |      FROM t),
           |seg AS (SELECT doc_id, idx,
           |               array_to_string(
           |                 list_slice(ws, idx * 10 + 1, idx * 10 + 10), ' ') AS seg
           |        FROM e),
           |r AS (SELECT doc_id, idx, seg,
           |             row_number() OVER (PARTITION BY seg
           |                                ORDER BY doc_id, idx) AS rn
           |      FROM seg),
           |k AS (SELECT doc_id, count(*) AS n_kept,
           |             string_agg(seg, ' ' ORDER BY idx) AS text_kept
           |      FROM r WHERE rn = 1 GROUP BY doc_id),
           |tot AS (SELECT doc_id, CAST((len(ws) + 9) // 10 AS BIGINT) AS n_segments
           |        FROM t)
           |SELECT tot.doc_id, n_segments,
           |       coalesce(n_kept, 0) AS n_kept,
           |       coalesce(text_kept, '') AS text_kept
           |FROM tot LEFT JOIN k USING (doc_id)""".stripMargin,

      // pmod on the SIGNED mix64 value: ((x % M) + M) % M — 1e6 does not
      // divide 2^64, so unsigned % would diverge from Spark's pmod
      "corpus_stratified_sample" -> {
        val signedZf = ExtQueries.toSignedSql("zf")
        s"""WITH src0 AS (SELECT doc_id, source, doc_id::UBIGINT AS hu,
           |                     42::UBIGINT AS iu
           |              FROM documents),
           |mx AS (SELECT * FROM ${ExtQueries.mixChainSql("src0", "doc_id, source")}),
           |b AS (SELECT doc_id, source,
           |             CAST((($signedZf % 1000000) + 1000000) % 1000000 AS BIGINT)
           |               AS bucket_ppm
           |      FROM mx)
           |SELECT doc_id, source, bucket_ppm FROM b
           |WHERE bucket_ppm < (CAST(source[4:] AS BIGINT) * 61803) % 1000000"""
          .stripMargin
      },

      // weight derivation replicated through the same mix chain; the token
      // bucket is fnv64's low 10 bits (dim = 1024 is a power of two, so
      // unsigned % == Spark's signed pmod)
      "corpus_quality_classifier" -> {
        val signedZf = ExtQueries.toSignedSql("zf")
        s"""WITH w1 AS (SELECT unnest(range(0, 1024)) AS bucket),
           |w2 AS (SELECT bucket, bucket::UBIGINT AS hu, 7::UBIGINT AS iu FROM w1),
           |wm AS (SELECT * FROM ${ExtQueries.mixChainSql("w2", "bucket")}),
           |wt AS (SELECT bucket,
           |              (($signedZf % 2001) + 2001) % 2001 - 1000 AS w
           |       FROM wm),
           |tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
           |        FROM documents),
           |tb AS (SELECT doc_id,
           |              CAST(${ExtQueries.fnvUSql("tok")} % 1024 AS BIGINT) AS bucket
           |       FROM tok)
           |SELECT doc_id, count(*) AS n_tokens, CAST(sum(w) AS BIGINT) AS score
           |FROM tb JOIN wt USING (bucket)
           |GROUP BY doc_id""".stripMargin
      },

      // DuckDB states the same packing as a single-node window prefix sum;
      // the Spark side distributes it — hash equality proves the
      // decomposition (partition prefix sums + broadcast bases) exact
      "corpus_pack_sequences" ->
        """WITH t AS (SELECT doc_id,
          |                  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks
          |           FROM documents),
          |c AS (SELECT doc_id, n_toks,
          |             CAST(sum(n_toks) OVER (ORDER BY doc_id
          |                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
          |                  AS BIGINT) AS cum_end
          |      FROM t),
          |d AS (SELECT doc_id, n_toks, cum_end,
          |             cum_end - n_toks AS cum_start
          |      FROM c),
          |e AS (SELECT doc_id, n_toks, cum_start, cum_end,
          |             unnest(generate_series(cum_start // 2048,
          |                                    (cum_end - 1) // 2048)) AS seq_id
          |      FROM d)
          |SELECT doc_id, n_toks, seq_id,
          |       greatest(cum_start, seq_id * 2048) - cum_start AS doc_tok_start,
          |       greatest(cum_start, seq_id * 2048) - seq_id * 2048 AS seq_tok_start,
          |       least(cum_end, (seq_id + 1) * 2048)
          |         - greatest(cum_start, seq_id * 2048) AS span_toks
          |FROM e""".stripMargin,

      // the shuffle rank is replicated through the DuckDB mix chain; the
      // single-node row_number here is the oracle-side statement of what
      // the Spark side computes with the distributed rank decomposition
      "corpus_shuffle" -> {
        val signedZf = ExtQueries.toSignedSql("zf")
        s"""WITH src AS (SELECT doc_id, doc_id::UBIGINT AS hu, 7::UBIGINT AS iu
           |             FROM documents),
           |mx AS (SELECT * FROM ${ExtQueries.mixChainSql("src", "doc_id")}),
           |r AS (SELECT doc_id, $signedZf AS mix FROM mx),
           |p AS (SELECT doc_id,
           |             row_number() OVER (ORDER BY mix, doc_id) AS pos
           |      FROM r)
           |SELECT doc_id, pos, (pos - 1) % 16 AS shard FROM p""".stripMargin
      },

      "corpus_vocab_coverage" ->
        """WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word
          |           FROM documents),
          |dfq AS (SELECT word, count(*) AS df
          |        FROM (SELECT DISTINCT doc_id, word FROM w)
          |        GROUP BY word),
          |v AS (SELECT word FROM dfq ORDER BY df DESC, word ASC LIMIT 100)
          |SELECT doc_id, count(*) AS n_toks,
          |       CAST(sum(CASE WHEN word IN (SELECT word FROM v)
          |                     THEN 1 ELSE 0 END) AS BIGINT) AS in_vocab,
          |       CAST(sum(CASE WHEN word IN (SELECT word FROM v)
          |                     THEN 0 ELSE 1 END) AS BIGINT) AS oov
          |FROM w
          |GROUP BY doc_id""".stripMargin,

      "corpus_temperature_mix" -> {
        val signedZf = ExtQueries.toSignedSql("zf")
        s"""WITH c AS (SELECT source, count(*) AS n_s FROM documents
           |           GROUP BY source),
           |wt AS (SELECT source, n_s, sqrt(CAST(n_s AS DOUBLE)) AS w FROM c),
           |z AS (SELECT list_reduce(list_prepend(0.0::DOUBLE,
           |                                      list(w ORDER BY source)),
           |                         (acc, x) -> acc + x) AS z,
           |             CAST(sum(n_s) AS BIGINT) AS n_total
           |      FROM wt),
           |r AS (SELECT source,
           |             LEAST(1000000::BIGINT,
           |                   CAST(floor(w / z.z * 0.25::DOUBLE * z.n_total
           |                              / n_s * 1000000.0::DOUBLE) AS BIGINT))
           |               AS keep_ppm
           |      FROM wt CROSS JOIN z),
           |src0 AS (SELECT doc_id, source, doc_id::UBIGINT AS hu,
           |                42::UBIGINT AS iu
           |         FROM documents),
           |mx AS (SELECT * FROM ${ExtQueries.mixChainSql("src0", "doc_id, source")}),
           |b AS (SELECT doc_id, source,
           |             CAST((($signedZf % 1000000) + 1000000) % 1000000 AS BIGINT)
           |               AS bucket_ppm
           |      FROM mx)
           |SELECT b.doc_id, b.source, b.bucket_ppm, r.keep_ppm
           |FROM b JOIN r ON b.source = r.source
           |WHERE b.bucket_ppm < r.keep_ppm""".stripMargin
      },

      // the add-one bigram LM: counts and V from the corpus itself; the
      // per-doc sum replays Spark's position-ordered in-row fold via
      // list_reduce (same IEEE sequence => hash-exact doubles)
      // DuckDB states the budget fill as a plain per-source window; hash
      // equality proves the distributed global-prefix-sum + broadcast-base
      // decomposition exact (same pattern as corpus_shuffle's oracle)
      "corpus_token_budget_mix" ->
        """WITH t AS (SELECT doc_id, source, length(text) AS score,
          |                  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks
          |           FROM documents),
          |b AS (SELECT DISTINCT source,
          |             200 + 61 * CAST(substr(source, 4) AS BIGINT) AS budget_tokens
          |      FROM documents),
          |c AS (SELECT doc_id, source, n_toks,
          |             CAST(sum(n_toks) OVER (PARTITION BY source
          |                               ORDER BY score DESC, doc_id
          |                               ROWS BETWEEN UNBOUNDED PRECEDING
          |                                        AND CURRENT ROW) AS BIGINT) AS cum_toks
          |      FROM t)
          |SELECT c.doc_id, c.source, c.n_toks, c.cum_toks
          |FROM c JOIN b USING (source)
          |WHERE cum_toks <= budget_tokens""".stripMargin,

      // digest-keyed split replay: DuckDB's sha256 emits the same
      // lowercase hex as Spark's sha2(_, 256); 128 is a power of two, so
      // unsigned % 128 == Spark's signed pmod
      "corpus_holdout_split" ->
        s"""WITH b AS (
           |  SELECT doc_id, source,
           |         CAST(${ExtQueries.fnvUSql("(sha256(text) || '_s7')")} % 128
           |              AS BIGINT) AS bucket
           |  FROM documents)
           |SELECT doc_id, source, bucket,
           |       CASE WHEN bucket < 13 THEN 'holdout' ELSE 'train' END AS split
           |FROM b""".stripMargin,

      // DSIR replay: same gram -> fnv64 -> low-10-bits bucketing as the
      // Spark plan (1024 is a power of two, so unsigned % == signed pmod),
      // same add-one-smoothed (p_b - q_b) weights, and the same
      // bucket-ordered IEEE fold per document
      "corpus_dsir_select" ->
        s"""WITH toks AS (SELECT doc_id, source, string_split(text, ' ') AS w
           |              FROM documents),
           |pos AS (SELECT doc_id, source, w, unnest(range(1, len(w))) AS pos
           |        FROM toks WHERE len(w) >= 2),
           |gr AS (SELECT doc_id, source, w[pos] || ' ' || w[pos + 1] AS g FROM pos),
           |b AS (SELECT doc_id, source,
           |             CAST(${ExtQueries.fnvUSql("g")} % 1024 AS BIGINT) AS bucket
           |      FROM gr),
           |feat AS (SELECT doc_id, source, bucket, count(*) AS c
           |         FROM b GROUP BY 1, 2, 3),
           |dist AS (SELECT bucket,
           |                sum(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS cp,
           |                sum(CASE WHEN source <> 'src0' THEN 1 ELSE 0 END) AS cq
           |         FROM b GROUP BY 1),
           |tot AS (SELECT sum(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS np,
           |               sum(CASE WHEN source <> 'src0' THEN 1 ELSE 0 END) AS nq
           |        FROM b),
           |terms AS (SELECT f.doc_id, f.source, f.bucket,
           |                 f.c * ((d.cp + 1.0) / (t.np + 1024.0)
           |                        - (d.cq + 1.0) / (t.nq + 1024.0)) AS term
           |          FROM feat f JOIN dist d USING (bucket) CROSS JOIN tot t
           |          WHERE f.source <> 'src0')
           |SELECT doc_id, source, count(*) AS n_feats,
           |       list_reduce(list_prepend(0.0::DOUBLE, list(term ORDER BY bucket)),
           |                   (acc, z) -> acc + z) AS score
           |FROM terms GROUP BY doc_id, source
           |ORDER BY score DESC, doc_id LIMIT 64""".stripMargin,

      "corpus_ngram_lm_score" ->
        """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w
          |              FROM documents),
          |pos AS (SELECT doc_id, w, unnest(range(1, len(w))) AS pos FROM toks),
          |bi AS (SELECT doc_id, pos, w[pos] AS w1, w[pos + 1] AS w2 FROM pos),
          |uni AS (SELECT unnest(w) AS w1 FROM toks),
          |cb AS (SELECT w1, w2, count(*) AS cb FROM bi GROUP BY w1, w2),
          |cu AS (SELECT w1, count(*) AS cu FROM uni GROUP BY w1),
          |v AS (SELECT count(DISTINCT w1) AS v FROM uni),
          |terms AS (
          |  SELECT bi.doc_id, bi.pos,
          |         (cb.cb + 1.0) / (cu.cu + v.v) AS term
          |  FROM bi JOIN cb ON bi.w1 = cb.w1 AND bi.w2 = cb.w2
          |          JOIN cu ON bi.w1 = cu.w1
          |          CROSS JOIN v)
          |SELECT doc_id, count(*) AS n_bigrams,
          |       list_reduce(list_prepend(0.0::DOUBLE,
          |                                list(term ORDER BY pos)),
          |                   (acc, z) -> acc + z) AS sum_prob,
          |       list_reduce(list_prepend(0.0::DOUBLE,
          |                                list(term ORDER BY pos)),
          |                   (acc, z) -> acc + z) / count(*) AS avg_prob
          |FROM terms
          |GROUP BY doc_id""".stripMargin,

      // pipeline gate + packing fused: the surv CTE replicates the gate,
      // then the same window-prefix-sum packing arithmetic runs over it
      "corpus_training_pipeline" ->
        """WITH wc AS (
          |  SELECT doc_id, w, count(*) AS c
          |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
          |  GROUP BY 1, 2),
          |m AS (SELECT doc_id, max(c) AS top_cnt FROM wc GROUP BY 1),
          |keep AS (SELECT min(doc_id) AS keep_id FROM documents GROUP BY text),
          |surv AS (
          |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks
          |  FROM documents JOIN m USING (doc_id)
          |  WHERE doc_id IN (SELECT keep_id FROM keep)
          |    AND len(string_split(text, ' ')) >= 30
          |    AND top_cnt * 10 <= len(string_split(text, ' '))),
          |c AS (SELECT doc_id, n_toks,
          |             CAST(sum(n_toks) OVER (ORDER BY doc_id
          |                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
          |                  AS BIGINT) AS cum_end
          |      FROM surv),
          |d AS (SELECT doc_id, n_toks, cum_end,
          |             cum_end - n_toks AS cum_start
          |      FROM c),
          |e AS (SELECT doc_id, n_toks, cum_start, cum_end,
          |             unnest(generate_series(cum_start // 2048,
          |                                    (cum_end - 1) // 2048)) AS seq_id
          |      FROM d)
          |SELECT doc_id, n_toks, seq_id,
          |       greatest(cum_start, seq_id * 2048) - cum_start AS doc_tok_start,
          |       greatest(cum_start, seq_id * 2048) - seq_id * 2048 AS seq_tok_start,
          |       least(cum_end, (seq_id + 1) * 2048)
          |         - greatest(cum_start, seq_id * 2048) AS span_toks
          |FROM e""".stripMargin,

      "corpus_curation_pipeline" ->
        s"""WITH wc AS (
           |  SELECT doc_id, w, count(*) AS c
           |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
           |  GROUP BY 1, 2),
           |m AS (SELECT doc_id, max(c) AS top_cnt FROM wc GROUP BY 1),
           |keep AS (SELECT min(doc_id) AS keep_id FROM documents GROUP BY text),
           |s AS (SELECT doc_id, source,
           |             len(string_split(text, ' ')) AS n_words,
           |             $guessSql AS lang_guess
           |      FROM documents)
           |SELECT source, lang_guess, count(*) AS docs_kept,
           |       CAST(sum(n_words) AS BIGINT) AS total_ws_tokens
           |FROM s JOIN m USING (doc_id)
           |WHERE doc_id IN (SELECT keep_id FROM keep)
           |  AND n_words >= 30 AND top_cnt * 10 <= n_words
           |GROUP BY source, lang_guess""".stripMargin
    )
  }
}
