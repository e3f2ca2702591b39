package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.QueryPack
import graft.cdc.model.Changelog.table

/** Beyond-reference operators for training-data pipelines (SURVEY.md §7.2
  * M6): dedup, similarity search, text analysis, multimodal columns.
  */
object ExtQueries extends QueryPack {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_exact" -> ((s, dir) =>
      Dedup.exact(table(s, dir, "documents"))),

    "dedup_ngram_jaccard" -> ((s, dir) =>
      Dedup.ngramJaccard(table(s, dir, "documents"), 0.5)),

    // the 100 TB path of exact dedup: group by a 32-byte digest instead of
    // shuffling full document texts
    "dedup_exact_hash" -> ((s, dir) =>
      table(s, dir, "documents")
        .groupBy(org.apache.spark.sql.functions.sha2(
          org.apache.spark.sql.functions.col("text"), 256).as("text_sha"))
        .agg(org.apache.spark.sql.functions.min("doc_id").as("keep_id"),
          org.apache.spark.sql.functions.count(
            org.apache.spark.sql.functions.lit(1)).as("dup_cnt"))),

    "dedup_minhash_lsh" -> ((s, dir) =>
      Dedup.minhashLsh(table(s, dir, "documents"), numHashes = 32, rowsPerBand = 4)),

    "dedup_simhash" -> ((s, dir) =>
      Dedup.simhashPairs(table(s, dir, "documents"), maxHamming = 8)),

    "similarity_topk_bruteforce" -> ((s, dir) =>
      Similarity.bruteForceTopK(table(s, dir, "embeddings"), nQueries = 10, k = 5)),

    "similarity_topk_lsh" -> ((s, dir) =>
      Similarity.lshTopK(table(s, dir, "embeddings"), nPlanes = 8, nQueries = 10, k = 5)),

    "similarity_topk_ivf" -> ((s, dir) =>
      Similarity.ivfTopK(table(s, dir, "embeddings"), nCells = 8, nProbe = 3,
        nQueries = 10, k = 5)),

    "text_token_count" -> ((s, dir) =>
      TextAnalysis.tokenCounts(table(s, dir, "documents"))),

    "text_quality_score" -> ((s, dir) =>
      TextAnalysis.qualityScore(table(s, dir, "documents"))),

    "text_lang_id" -> ((s, dir) =>
      TextAnalysis.langId(table(s, dir, "documents"))),

    "text_fingerprint" -> ((s, dir) =>
      TextAnalysis.fingerprint(table(s, dir, "documents"))),

    "text_bigram_freq" -> ((s, dir) =>
      TextAnalysis.bigramFreq(table(s, dir, "documents"), minCount = 5)),

    "multimodal_frames" -> ((s, dir) =>
      Multimodal.frames(Multimodal.asBinary(table(s, dir, "documents")), frameSize = 256))
  )

  def oracles: Map[String, String] = Map(
    "dedup_exact" ->
      """SELECT text, min(doc_id) AS keep_id, count(*) AS dup_cnt
        |FROM documents GROUP BY text""".stripMargin,

    "dedup_ngram_jaccard" ->
      """WITH w AS (
        |  SELECT doc_id, lang, n_chars,
        |         unnest(list_distinct(string_split(text, ' '))) AS word
        |  FROM documents),
        |s AS (SELECT doc_id, count(*) AS sz FROM w GROUP BY 1),
        |p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
        |      FROM w a JOIN w b
        |        ON a.lang = b.lang AND a.n_chars = b.n_chars
        |       AND a.word = b.word AND a.doc_id < b.doc_id
        |      GROUP BY 1, 2)
        |SELECT doc_a, doc_b, inter, sa.sz AS size_a, sb.sz AS size_b,
        |       CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter) AS jaccard
        |FROM p JOIN s sa ON p.doc_a = sa.doc_id
        |       JOIN s sb ON p.doc_b = sb.doc_id
        |WHERE CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter) >= 0.5""".stripMargin,

    "dedup_exact_hash" ->
      """SELECT sha256(text) AS text_sha, min(doc_id) AS keep_id,
        |       count(*) AS dup_cnt
        |FROM documents GROUP BY sha256(text)""".stripMargin,

    "text_bigram_freq" ->
      """WITH w AS (SELECT string_split(text, ' ') AS ws FROM documents),
        |b AS (SELECT unnest(list_transform(range(len(ws) - 1),
        |              i -> ws[i + 1] || ' ' || ws[i + 2])) AS bigram
        |      FROM w WHERE len(ws) >= 2)
        |SELECT bigram, count(*) AS cnt FROM b
        |GROUP BY bigram HAVING count(*) >= 5""".stripMargin,

    "text_token_count" ->
      """SELECT doc_id,
        |       len(string_split(text, ' ')) AS ws_tokens,
        |       len(regexp_extract_all(text, '[a-z]+')) AS re_tokens
        |FROM documents""".stripMargin,

    "text_quality_score" ->
      """SELECT doc_id, n_chars,
        |       len(string_split(text, ' ')) AS word_cnt,
        |       CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g'))
        |            AS DOUBLE) / length(text) AS punct_ratio,
        |       CAST(len(list_filter(string_split(text, ' '),
        |                 w -> w IN ('the', 'a', 'of', 'and', 'is')))
        |            AS DOUBLE) / len(string_split(text, ' ')) AS stop_ratio,
        |       CAST(list_sum(list_transform(string_split(text, ' '),
        |                 w -> length(w)))
        |            AS DOUBLE) / len(string_split(text, ' ')) AS avg_word_len
        |FROM documents""".stripMargin,

    "text_lang_id" ->
      """SELECT doc_id, lang,
        |       CASE WHEN text LIKE '% the %' THEN 'en'
        |            WHEN text LIKE '% der %' THEN 'de'
        |            WHEN text LIKE '% la %' THEN 'fr'
        |            ELSE 'unk' END AS lang_guess
        |FROM documents""".stripMargin
  )
}
