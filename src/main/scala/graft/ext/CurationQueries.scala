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
    })
  )

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
