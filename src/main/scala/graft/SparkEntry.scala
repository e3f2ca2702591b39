package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Queries/oracles are contributed by per-module [[QueryPack]]s; each entry
  * is a named batch formulation of one operator from SURVEY.md §2 over the
  * driver's parquet tables.
  */
object SparkEntry {

  private val packs: Seq[QueryPack] = Seq(
    cdc.model.ModelQueries,
    cdc.model.RowImageQueries,
    cdc.model.IvmQueries,
    cdc.offsets.OffsetQueries,
    cdc.split.ChunkQueries,
    cdc.merge.MergeQueries,
    cdc.types.TypeQueries,
    cdc.source.SourceQueries,
    relational.RelationalQueries,
    ext.ExtQueries,
    ext.CurationQueries,
    ext.LayoutQueries
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The full hybrid-source flow: chunked snapshot with per-chunk watermark
    * brackets → emit-filtered log phase → current state (reference S1/T1/T2;
    * MySqlHybridSplitAssigner.java:103-232, BinlogSplitReader.java:228-279).
    */
  def entry(spark: SparkSession): DataFrame =
    queries("hybrid_pipeline_materialize")(spark, "/root/testdata/sf0.001")

  private def mergedUnique[V](parts: Seq[Seq[(String, V)]], what: String): Map[String, V] = {
    val all = parts.flatten
    val dups = all.groupBy(_._1).filter(_._2.length > 1).keys
    // toMap would silently shadow an operator behind a same-named one in a
    // later pack — the gate would then verify the wrong implementation
    require(dups.isEmpty, s"duplicate $what across QueryPacks: ${dups.mkString(", ")}")
    all.toMap
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    mergedUnique(packs.map(_.queries.toSeq), "query names")

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = {
    val m = mergedUnique(packs.map(_.oracles.toSeq), "oracle names")
    val orphans = m.keySet -- queries.keySet
    require(orphans.isEmpty, s"oracles without a query: ${orphans.mkString(", ")}")
    m
  }
}
