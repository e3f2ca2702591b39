package graft.cdc.model

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.QueryPack
import Changelog._

/** Core changelog-model queries (J1/W1). */
object ModelQueries extends QueryPack {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "changelog_upsert_materialize" -> ((s, dir) =>
      upsertMaterialize(
        snapshot(s, dir),
        changelog(s, dir)
      ))
  )

  def oracles: Map[String, String] = Map(
    "changelog_upsert_materialize" ->
      s"""$allRowsSql
         |SELECT pk, max("offset") AS last_offset,
         |       arg_max(op, "offset") AS last_op,
         |       arg_max(val, "offset") AS val
         |FROM allrows GROUP BY pk
         |HAVING arg_max(op, "offset") <> 'd'""".stripMargin
  )
}
