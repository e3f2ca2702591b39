package graft.cdc.split

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed global row numbering — the scalable form of
  * `row_number() OVER (ORDER BY ...)` that never drains the data through a
  * single partition and stays fully columnar (no object codec, no Window):
  *
  *  1. range-partition on the sort key and sort within partitions,
  *  2. read (partition id, local 1-based index) out of
  *     `monotonically_increasing_id()` — Spark encodes exactly those two
  *     fields (pid in the upper 31 bits, per-partition record number in the
  *     lower 33) and, being nondeterministic, the expression is pinned
  *     above the sort by the optimizer,
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
    * With `dedup = true`, rows are deduplicated first (hash-aggregate
    * distinct — map-side combined, columnar) so the rank runs over distinct
    * rows; only meaningful when `orderCols` covers every column of `df`.
    */
  def withGlobalRowNumber(
      df: DataFrame,
      rnCol: String,
      orderCols: Seq[Column],
      dedup: Boolean = false
  ): DataFrame = {
    val in = if (dedup) df.dropDuplicates() else df
    val parted = in.repartitionByRange(orderCols: _*)
      .sortWithinPartitions(orderCols: _*)
      .withColumn("__mid", monotonically_increasing_id())
      .withColumn("__pid", shiftrightunsigned(col("__mid"), 33).cast("int"))
      .withColumn("__lrn", col("__mid").bitwiseAND(lit((1L << 33) - 1)) + lit(1L))
      .drop("__mid")
    // per-partition bases: base(p) = sum of counts of partitions before p —
    // a map-side-combined <=32-row aggregate + triangular join, so no
    // partition-less Window node appears anywhere in the plan
    val counts = parted.groupBy(col("__pid")).agg(count(lit(1)).as("__cnt"))
    val bases = counts.as("a")
      .join(broadcast(counts.as("b")), col("b.__pid") < col("a.__pid"), "left")
      .groupBy(col("a.__pid").as("__pid"))
      .agg(coalesce(sum(col("b.__cnt")), lit(0L)).as("__base"))
    local(parted, bases, rnCol)
  }

  private def local(parted: DataFrame, bases: DataFrame, rnCol: String): DataFrame =
    parted.join(broadcast(bases), Seq("__pid"))
      .withColumn(rnCol, col("__base") + col("__lrn"))
      .drop("__pid", "__lrn", "__base")
}
