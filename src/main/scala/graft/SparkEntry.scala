package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.cdc.model.Changelog

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each entry in [[queries]] is a named batch formulation of one operator
  * from SURVEY.md §2, over the driver's parquet tables; [[oracleSql]] holds
  * the DuckDB-equivalent SQL for the correctness gate.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The hybrid-source materialization: snapshot ∪ changelog → current state
    * (reference J1/W1, RecordUtils.java:77-114).
    */
  def entry(spark: SparkSession): DataFrame =
    queries("changelog_upsert_materialize")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "changelog_upsert_materialize" -> ((s, dir) =>
      Changelog.upsertMaterialize(
        Changelog.snapshot(s, dir),
        Changelog.changelog(s, dir).select("offset", "pk", "op", "ts_ms", "val", "props")
      ))
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = Map(
    "changelog_upsert_materialize" ->
      s"""${Changelog.changelogSql},
         |allrows AS (
         |  SELECT "offset", pk, op, val FROM changelog
         |  UNION ALL
         |  SELECT -1 AS "offset", c_custkey AS pk, 'r' AS op, c_acctbal AS val FROM customer
         |)
         |SELECT pk, max("offset") AS last_offset,
         |       arg_max(op, "offset") AS last_op,
         |       arg_max(val, "offset") AS val
         |FROM allrows GROUP BY pk
         |HAVING arg_max(op, "offset") <> 'd'""".stripMargin
  )
}
