package graft.cdc.source

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row, SQLContext}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.StructType

/** M5 — the `spark.read.format("graft-cdc")` face of [[CdcSource]]: the
  * same options surface (validated identically — the reference's
  * MySqlTableSourceFactory.java:270-345 rules), registered as a Spark data
  * source so SQL users reach the connector without touching the Scala
  * builder:
  *
  *   spark.read.format("graft-cdc")
  *     .option("scan.startup.mode", "initial").load(sfDir)
  *
  * Column pruning and filter pushdown pass through the relation boundary
  * ([[PrunedFilteredScan]]) onto the inner DataFrame, so range/startup
  * predicates still reach the parquet scans. Spark re-applies every filter
  * above the scan, so partially translated predicates stay correct.
  */
class DefaultSource extends RelationProvider with DataSourceRegister {
  override def shortName(): String = "graft-cdc"

  override def createRelation(
      sqlContext: SQLContext,
      parameters: Map[String, String]): BaseRelation = {
    val path = parameters.getOrElse("path",
      throw new CdcSource.ValidationException(
        "option 'path' is required: the table directory (sf dir) to read"))
    val builder = CdcSource.read(sqlContext.sparkSession)
    (parameters - "path").foreach { case (k, v) => builder.option(k, v) }
    new CdcRelation(sqlContext, builder.load(path))
  }
}

private[source] class CdcRelation(
    override val sqlContext: SQLContext,
    df: DataFrame
) extends BaseRelation with PrunedFilteredScan {

  override def schema: StructType = df.schema

  override def buildScan(requiredColumns: Array[String], filters: Array[Filter]): RDD[Row] = {
    val pruned =
      if (requiredColumns.isEmpty) df.select()
      else df.select(requiredColumns.map(col).toSeq: _*)
    val filtered = filters.flatMap(translate).foldLeft(pruned)(_ where _)
    filtered.rdd
  }

  /** Best-effort source-side translation; untranslated filters are simply
    * not pushed (Spark evaluates them again above this scan).
    */
  private def translate(f: Filter): Option[org.apache.spark.sql.Column] = f match {
    case EqualTo(a, v) => Some(col(a) === v)
    case GreaterThan(a, v) => Some(col(a) > v)
    case GreaterThanOrEqual(a, v) => Some(col(a) >= v)
    case LessThan(a, v) => Some(col(a) < v)
    case LessThanOrEqual(a, v) => Some(col(a) <= v)
    case In(a, vs) => Some(col(a).isin(vs.toIndexedSeq: _*))
    case IsNull(a) => Some(col(a).isNull)
    case IsNotNull(a) => Some(col(a).isNotNull)
    case StringStartsWith(a, p) => Some(col(a).startsWith(p))
    case StringEndsWith(a, p) => Some(col(a).endsWith(p))
    case StringContains(a, p) => Some(col(a).contains(p))
    case And(l, r) => for (lc <- translate(l); rc <- translate(r)) yield lc && rc
    case Or(l, r) => for (lc <- translate(l); rc <- translate(r)) yield lc || rc
    case Not(c) => translate(c).map(!_)
    case _ => None
  }
}
