package graft.cdc.split

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Distributed global row numbering — the scalable form of
  * `row_number() OVER (ORDER BY ...)` that never drains the data through a
  * single partition, in ONE full-data shuffle:
  *
  *  1. range-partition on the sort key (equal keys co-locate),
  *  2. sort within partitions and rank locally in a single pass
  *     (mapPartitions — no extra exchange, unlike a pid-keyed Window which
  *     would hash-shuffle the data a second time),
  *  3. add each partition's cumulative row-count base, computed window-free
  *     from the tiny per-partition counts (<= spark.sql.shuffle.partitions
  *     rows of planner metadata, broadcast back).
  *
  * `orderCols` must form a total order for a deterministic result — pass
  * tie-breaker columns exactly as you would to row_number.
  */
object DistributedRank {

  /** Append `rnCol` = 1-based global rank by `orderCols`.
    *
    * With `dedupSorted = true`, consecutive fully-equal rows inside each
    * sorted partition are collapsed before ranking — a distinct() fused into
    * the same single shuffle (valid because range partitioning co-locates
    * equal keys). Only meaningful when `orderCols` covers every column of
    * `df`.
    */
  def withGlobalRowNumber(
      df: DataFrame,
      rnCol: String,
      orderCols: Seq[Column],
      dedupSorted: Boolean = false
  ): DataFrame = {
    val parted = df.repartitionByRange(orderCols: _*).sortWithinPartitions(orderCols: _*)
    val outSchema = parted.schema.add("__pid", IntegerType).add("__lrn", LongType)
    val local = parted.mapPartitions { it =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      var i = 0L
      val base = if (dedupSorted) {
        var prev: Option[Seq[Any]] = None
        it.flatMap { r =>
          val vs = r.toSeq
          if (prev.contains(vs)) None
          else { prev = Some(vs); Some(r) }
        }
      } else it
      base.map { r => i += 1; Row.fromSeq(r.toSeq :+ pid :+ i) }
    }(Encoders.row(outSchema))
    // per-partition bases: base(p) = sum of ranked counts of partitions
    // before p — a map-side-combined 32-row aggregate + triangular join, so
    // no partition-less Window node appears anywhere in the plan
    val counts = local.groupBy(col("__pid")).agg(count(lit(1)).as("__cnt"))
    val bases = counts.as("a")
      .join(broadcast(counts.as("b")), col("b.__pid") < col("a.__pid"), "left")
      .groupBy(col("a.__pid").as("__pid"))
      .agg(coalesce(sum(col("b.__cnt")), lit(0L)).as("__base"))
    local.join(broadcast(bases), Seq("__pid"))
      .withColumn(rnCol, col("__base") + col("__lrn"))
      .drop("__pid", "__lrn", "__base")
  }
}
