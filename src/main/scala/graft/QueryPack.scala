package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named batch query + optional DuckDB oracle, contributed by a module.
  * SparkEntry concatenates all packs into the driver contract maps.
  */
trait QueryPack {
  def queries: Map[String, (SparkSession, String) => DataFrame]

  /** DuckDB-runnable SQL per query name; queries absent here get the
    * driver's weaker rows-only check.
    */
  def oracles: Map[String, String]
}
