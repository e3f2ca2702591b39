package graft.cdc.offsets

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.QueryPack
import graft.cdc.model.Changelog
import DialectOffsets._

/** Oracled queries for the per-dialect offset encodings ([[DialectOffsets]]).
  *
  * Like [[BinlogOffsets.withFilePos]], each query derives the dialect's
  * log position deterministically from the synthetic changelog's monotone
  * `offset`, with BOTH sides interpolating the same Scala constants so the
  * derivations cannot drift. The Spark side always takes the wire-text
  * round trip (render → text → parse/compare-on-text); the DuckDB side
  * computes directly in the integer domain — a hash match therefore proves
  * parse∘render = id AND that the text-domain order equals the numeric
  * order the wire format defines.
  *
  * Every query is a narrow projection + scan-pushable filter: no shuffle,
  * sf-linear scan cost, safe at any scale.
  */
object OffsetQueries extends QueryPack {

  /** Shared threshold event: inside the sf0.001 offset range so the startup
    * filters split the data at every SF.
    */
  private val K = 613L

  // pg derivation: WAL segment of SegSize events, 8 bytes per record + a
  // 40-byte page header stand-in
  private val SegSize = 250L

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Postgres LSN startup filter: render `X/Y` text, then filter on the
    // value PARSED BACK from the text (unsigned 64-bit as DECIMAL(20,0))
    "pg_lsn_startup" -> ((s, dir) => {
      val thr = (BigInt(K / SegSize) << 32) + (K % SegSize) * 8 + 40
      Changelog.changelog(s, dir)
        .select(col("offset"),
          pgLsnText(
            expr(s"offset div $SegSize"),
            expr(s"(offset % $SegSize) * 8 + 40")).as("lsn"))
        .where(pgLsnValue(col("lsn")) > lit(thr.toString).cast(DecimalType(20, 0)))
    }),

    // SQL Server LSN order: filter by PLAIN STRING compare on the canonical
    // padded text (the wire byte order), then decode the components back
    // out of the text
    "sqlserver_lsn_order" -> ((s, dir) => {
      val thrText = SqlServerLsn(K / 1000 + 40, (K % 1000) * 16, K % 16).render
      Changelog.changelog(s, dir)
        .select(col("offset"),
          mssqlLsnText(
            expr("offset div 1000 + 40"),
            expr("(offset % 1000) * 16"),
            expr("offset % 16")).as("lsn"))
        .where(col("lsn") > thrText)
        .select(col("offset"), col("lsn"),
          mssqlVlf(col("lsn")).as("vlf"),
          mssqlBlock(col("lsn")).as("block"),
          mssqlSlot(col("lsn")).as("slot"))
    }),

    // Oracle SCN total order vs a fixed target, branch for branch with
    // RedoLogOffset.compareTo: empty SCN strings (every 97th event) sort
    // below any real SCN; the rest compare numerically on DECIMAL(38,0)
    "oracle_scn_order" -> ((s, dir) => {
      val target = BigInt(K * 16 + 3)
      Changelog.changelog(s, dir)
        .select(col("offset"),
          when(col("offset") % 97 === 0, lit(""))
            .otherwise((col("offset") * 16 + 3).cast("string")).as("scn"))
        .withColumn("cmp", scnCompare(col("scn"), target))
    })
  )

  def oracles: Map[String, String] = {
    val pgThr = (BigInt(K / SegSize) << 32) + (K % SegSize) * 8 + 40
    val (tv, tb, ts) = (K / 1000 + 40, (K % 1000) * 16, K % 16)
    val scnTarget = K * 16 + 3
    Map(
      "pg_lsn_startup" ->
        s"""${Changelog.changelogSql}
           |SELECT "offset",
           |       to_hex("offset" // $SegSize) || '/' ||
           |         to_hex(("offset" % $SegSize) * 8 + 40) AS lsn
           |FROM changelog
           |WHERE ("offset" // $SegSize) * 4294967296 +
           |      ("offset" % $SegSize) * 8 + 40 > $pgThr""".stripMargin,

      "sqlserver_lsn_order" ->
        s"""${Changelog.changelogSql},
           |lsns AS (
           |  SELECT "offset", "offset" // 1000 + 40 AS v,
           |         ("offset" % 1000) * 16 AS b, "offset" % 16 AS sl
           |  FROM changelog)
           |SELECT "offset",
           |       lpad(lower(to_hex(v)), 8, '0') || ':' ||
           |       lpad(lower(to_hex(b)), 8, '0') || ':' ||
           |       lpad(lower(to_hex(sl)), 4, '0') AS lsn,
           |       v AS vlf, b AS block, sl AS slot
           |FROM lsns
           |WHERE v > $tv OR (v = $tv AND b > $tb)
           |   OR (v = $tv AND b = $tb AND sl > $ts)""".stripMargin,

      "oracle_scn_order" ->
        s"""${Changelog.changelogSql}
           |SELECT "offset",
           |       CASE WHEN "offset" % 97 = 0 THEN ''
           |            ELSE CAST("offset" * 16 + 3 AS VARCHAR) END AS scn,
           |       CASE WHEN "offset" % 97 = 0 THEN -1
           |            WHEN "offset" * 16 + 3 > $scnTarget THEN 1
           |            WHEN "offset" * 16 + 3 = $scnTarget THEN 0
           |            ELSE -1 END AS cmp
           |FROM changelog""".stripMargin
    )
  }
}
