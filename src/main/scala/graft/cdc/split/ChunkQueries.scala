package graft.cdc.split

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.QueryPack
import graft.cdc.model.Changelog.table

/** SURVEY.md §2.10 chunk-planner inventory: A1-A5, O1, S2/P4, W2. */
object ChunkQueries extends QueryPack {

  private val ChunkSize = 256
  private val NextMaxLo = 100L
  private val NextMaxN  = 2048

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "chunk_min_max" -> ((s, dir) =>
      ChunkPlanner.analyze(table(s, dir, "customer"), "c_custkey")
        .select(col("min_k"), col("max_k"))),

    "chunk_row_count" -> ((s, dir) =>
      table(s, dir, "customer").agg(count(lit(1)).as("cnt"))),

    "chunk_next_max" -> ((s, dir) =>
      ChunkPlanner.nextChunkMax(table(s, dir, "customer"), "c_custkey", NextMaxLo, NextMaxN)),

    "chunk_ranges_even" -> ((s, dir) =>
      ChunkPlanner.evenChunkStats(table(s, dir, "customer"), "c_custkey", ChunkSize)),

    "chunk_ranges_uneven" -> ((s, dir) =>
      ChunkPlanner.unevenChunkRanges(table(s, dir, "customer"), "c_custkey", ChunkSize)),

    "chunk_distribution_factor" -> ((s, dir) =>
      ChunkPlanner.distributionFactor(table(s, dir, "customer"), "c_custkey")),

    // S2/P4 — snapshot range scans incl. unbounded ends. Plain pushed-down
    // range filters over the parquet scan.
    "split_scan_first" -> ((s, dir) =>
      table(s, dir, "customer").where(col("c_custkey") < 512)),

    "split_scan_mid" -> ((s, dir) =>
      table(s, dir, "customer").where(col("c_custkey") >= 512 && col("c_custkey") < 1024)),

    "split_scan_last" -> ((s, dir) =>
      table(s, dir, "customer").where(col("c_custkey") >= 1024)),

    // P4 composite containment, middle-split algebra on (l_orderkey, l_linenumber)
    "split_key_contains" -> ((s, dir) => {
      val li = table(s, dir, "lineitem")
      li.select(
        col("l_orderkey"),
        col("l_linenumber"),
        ChunkPlanner.splitKeyRangeContains(
          Seq(col("l_orderkey"), col("l_linenumber").cast("long")),
          Some(Seq(1000L, 3L)),
          Some(Seq(4000L, 2L))
        ).as("in_range")
      )
    }),

    "sample_buckets" -> ((s, dir) =>
      ChunkPlanner.sampleBuckets(table(s, dir, "customer"), "c_custkey", 8)),

    // W2 — the reference's sample-RATE decision policy over documents:
    // numChunks from size/chunkBytes, sample count from the 5%-above-
    // threshold rule, systematic sample, ntile-arithmetic buckets, and the
    // min/max-capped split chain (SampleBucketSplitStrategy.java:67-168).
    // threshold=300 < |documents| at every SF, so the gate exercises the
    // RATE branch (the reference constant 102400 would always full-sample
    // at test scale); n_chars stands in for the uncompressed byte size.
    "sample_buckets_rate" -> ((s, dir) =>
      ChunkPlanner.sampleRateBuckets(
        table(s, dir, "documents"), "doc_id", col("n_chars"),
        chunkSizeBytes = 16384L, samplingThreshold = 300L)),

    // string split key (reference splits on any comparable column,
    // MySqlChunkSplitter.java:63-510): uneven boundaries over c_name
    "chunk_ranges_string" -> ((s, dir) =>
      KeyedChunkPlanner.unevenChunkRanges(table(s, dir, "customer"), Seq("c_name"), ChunkSize)
        .select(col("split_id"),
          col("split_start.c_name").as("split_start"),
          col("split_end.c_name").as("split_end"))),

    // the collation contract on a CASE-MIXED string key: binary
    // (codepoint) boundaries — 'B' sorts before 'a' — must hash-match an
    // engine whose default collation is codepoint order (DuckDB), exactly
    // the ordering the SqlCollation.Binary JDBC contract pushes to a DB
    "chunk_ranges_cased" -> ((s, dir) =>
      KeyedChunkPlanner.unevenChunkRanges(
          table(s, dir, "customer").withColumn("ck",
            when(col("c_custkey") % 2 === 0, upper(col("c_name")))
              .otherwise(col("c_name"))),
          Seq("ck"), ChunkSize)
        .select(col("split_id"),
          col("split_start.ck").as("split_start"),
          col("split_end.ck").as("split_end"))),

    // composite split key (l_orderkey, l_linenumber), lexicographic
    // boundaries flattened to scalar columns for the compare
    "chunk_ranges_composite" -> ((s, dir) =>
      KeyedChunkPlanner.unevenChunkRanges(
          table(s, dir, "lineitem"), Seq("l_orderkey", "l_linenumber"), 2048)
        .select(col("split_id"),
          col("split_start.l_orderkey").as("start_okey"),
          col("split_start.l_linenumber").as("start_lnum"),
          col("split_end.l_orderkey").as("end_okey"),
          col("split_end.l_linenumber").as("end_lnum")))
  )

  def oracles: Map[String, String] = Map(
    "chunk_min_max" ->
      "SELECT min(c_custkey) AS min_k, max(c_custkey) AS max_k FROM customer",

    "chunk_row_count" ->
      "SELECT count(*) AS cnt FROM customer",

    "chunk_next_max" ->
      s"""SELECT max(k) AS next_max FROM (
         |  SELECT c_custkey AS k FROM customer WHERE c_custkey >= $NextMaxLo
         |  ORDER BY c_custkey LIMIT $NextMaxN) t""".stripMargin,

    "chunk_ranges_even" ->
      s"""WITH m AS (SELECT min(c_custkey) AS mn FROM customer)
         |SELECT (c_custkey - mn) // $ChunkSize AS chunk_id,
         |       count(*) AS cnt, min(c_custkey) AS lo, max(c_custkey) AS hi
         |FROM customer CROSS JOIN m GROUP BY 1""".stripMargin,

    "chunk_ranges_uneven" ->
      s"""WITH d AS (SELECT DISTINCT c_custkey AS k FROM customer),
         |b AS (SELECT k AS boundary, row_number() OVER (ORDER BY k) AS rn FROM d
         |      QUALIFY rn % $ChunkSize = 0)
         |SELECT (rn // $ChunkSize) - 1 AS split_id,
         |       lag(boundary) OVER (ORDER BY rn) AS split_start,
         |       boundary AS split_end
         |FROM b
         |UNION ALL
         |SELECT count(*) AS split_id, max(boundary) AS split_start,
         |       CAST(NULL AS BIGINT) AS split_end
         |FROM b""".stripMargin,

    "chunk_distribution_factor" ->
      """SELECT min(c_custkey) AS min_k, max(c_custkey) AS max_k,
        |       count(*) AS cnt,
        |       ((max(c_custkey) - min(c_custkey) + 1) * 10000 + count(*) - 1)
        |         // count(*) AS factor_x10000
        |FROM customer""".stripMargin,

    "split_scan_first" ->
      "SELECT * FROM customer WHERE c_custkey < 512",

    "split_scan_mid" ->
      "SELECT * FROM customer WHERE c_custkey >= 512 AND c_custkey < 1024",

    "split_scan_last" ->
      "SELECT * FROM customer WHERE c_custkey >= 1024",

    "split_key_contains" ->
      """SELECT l_orderkey, l_linenumber,
        |       ((l_orderkey >= 1000 OR l_linenumber >= 3)
        |        AND (l_orderkey < 4000 OR l_linenumber < 2)
        |        AND (l_orderkey <= 4000 AND l_linenumber <= 2)) AS in_range
        |FROM lineitem""".stripMargin,

    "sample_buckets" ->
      """WITH t AS (SELECT c_custkey AS k,
        |                  ntile(8) OVER (ORDER BY c_custkey) AS bucket
        |           FROM customer)
        |SELECT bucket, count(*) AS cnt, min(k) AS lo, max(k) AS hi
        |FROM t GROUP BY bucket""".stripMargin,

    // replays samplePlan + the systematic sample + ntile fill arithmetic
    "sample_buckets_rate" ->
      """WITH s AS (SELECT count(*) AS c, CAST(sum(n_chars) AS BIGINT) AS bytes
        |           FROM documents),
        |p AS (SELECT c, bytes // 16384 + 1 AS nchunks,
        |        CASE WHEN c < 300 THEN c
        |             ELSE CAST(floor(c * 0.05) AS BIGINT) END AS nsamp
        |      FROM s),
        |st AS (SELECT c, nchunks, nsamp, greatest(c // nsamp, 1) AS step FROM p),
        |rk AS (SELECT doc_id AS k, row_number() OVER (ORDER BY doc_id) AS rn
        |       FROM (SELECT DISTINCT doc_id FROM documents)),
        |d1 AS (SELECT (SELECT max(rn) FROM rk) // step AS m, nchunks, step FROM st),
        |d2 AS (SELECT m, least(nchunks, m) AS n, step FROM d1),
        |d3 AS (SELECT m, n, step, m // n AS q, m % n AS r FROM d2),
        |samp AS (SELECT k, rn // (SELECT step FROM d3) AS sr FROM rk
        |         WHERE rn % (SELECT step FROM d3) = 0),
        |b AS (SELECT k, CASE WHEN sr <= (q + 1) * r
        |                     THEN (sr - 1) // (q + 1) + 1
        |                     ELSE r + (sr - (q + 1) * r - 1) // greatest(q, 1) + 1
        |                END AS bucket
        |      FROM samp CROSS JOIN d3),
        |g AS (SELECT bucket, count(*) AS cnt, min(k) AS lo, max(k) AS hi
        |      FROM b GROUP BY bucket)
        |SELECT CAST(0 AS BIGINT) AS split_id, CAST(NULL AS BIGINT) AS cnt,
        |       CAST(NULL AS BIGINT) AS split_start, lo AS split_end
        |FROM g WHERE bucket = 1
        |UNION ALL
        |SELECT bucket AS split_id, cnt, lo AS split_start, hi AS split_end FROM g
        |UNION ALL
        |SELECT n + 1 AS split_id, CAST(NULL AS BIGINT) AS cnt,
        |       hi AS split_start, CAST(NULL AS BIGINT) AS split_end
        |FROM g CROSS JOIN d3 WHERE bucket = n""".stripMargin,

    // DuckDB default collation is binary and c_name is ASCII, so ORDER BY
    // matches Spark's UTF8 string order exactly
    "chunk_ranges_cased" ->
      s"""WITH d AS (SELECT DISTINCT CASE WHEN c_custkey % 2 = 0
         |             THEN upper(c_name) ELSE c_name END AS k
         |           FROM customer),
         |b AS (SELECT k AS boundary, row_number() OVER (ORDER BY k) AS rn FROM d
         |      QUALIFY rn % $ChunkSize = 0)
         |SELECT (rn // $ChunkSize) - 1 AS split_id,
         |       lag(boundary) OVER (ORDER BY rn) AS split_start,
         |       boundary AS split_end
         |FROM b
         |UNION ALL
         |SELECT count(*) AS split_id, max(boundary) AS split_start,
         |       CAST(NULL AS VARCHAR) AS split_end
         |FROM b""".stripMargin,

    "chunk_ranges_string" ->
      s"""WITH d AS (SELECT DISTINCT c_name AS k FROM customer),
         |b AS (SELECT k AS boundary, row_number() OVER (ORDER BY k) AS rn FROM d
         |      QUALIFY rn % $ChunkSize = 0)
         |SELECT (rn // $ChunkSize) - 1 AS split_id,
         |       lag(boundary) OVER (ORDER BY rn) AS split_start,
         |       boundary AS split_end
         |FROM b
         |UNION ALL
         |SELECT count(*) AS split_id, max(boundary) AS split_start,
         |       CAST(NULL AS VARCHAR) AS split_end
         |FROM b""".stripMargin,

    "chunk_ranges_composite" ->
      s"""WITH d AS (SELECT DISTINCT l_orderkey, l_linenumber FROM lineitem),
         |b AS (SELECT l_orderkey AS bk1, l_linenumber AS bk2,
         |        row_number() OVER (ORDER BY l_orderkey, l_linenumber) AS rn
         |      FROM d QUALIFY rn % 2048 = 0)
         |SELECT (rn // 2048) - 1 AS split_id,
         |       lag(bk1) OVER (ORDER BY rn) AS start_okey,
         |       lag(bk2) OVER (ORDER BY rn) AS start_lnum,
         |       bk1 AS end_okey, bk2 AS end_lnum
         |FROM b
         |UNION ALL
         |SELECT count(*) AS split_id, arg_max(bk1, rn) AS start_okey,
         |       arg_max(bk2, rn) AS start_lnum,
         |       CAST(NULL AS BIGINT) AS end_okey, CAST(NULL AS INTEGER) AS end_lnum
         |FROM b""".stripMargin
  )
}
