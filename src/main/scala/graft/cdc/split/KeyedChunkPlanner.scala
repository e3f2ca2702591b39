package graft.cdc.split

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Chunk planning over GENERAL split keys — string, numeric, or composite
  * (multi-column) — the part of the reference's splitter that
  * [[ChunkPlanner]]'s single-`Long` fast path does not cover.
  *
  * The reference splits on any comparable column including composite PKs
  * (MySqlChunkSplitter.java:63-510 works on `Object[]` split keys;
  * RecordUtils.java:302-337 compares them component-wise), so the planner
  * here models a boundary as one value per key column under LEXICOGRAPHIC
  * order — exactly Spark's own struct ordering, which lets every aggregate
  * (min/max/TakeOrdered) run natively on a `struct(keys*)` column with no
  * UDFs.
  *
  * Range convention: (start, end] — start exclusive, end inclusive, `None` =
  * unbounded — matching [[ChunkPlanner.unevenChunkRangesIterative]] and its
  * disjoint-cover property.
  *
  * Scale notes: stats and probes are the same distributed one-row
  * aggregations as the Long path; the window variant orders DISTINCT key
  * tuples only (planning metadata, like [[ChunkPlanner.unevenChunkRanges]]);
  * the probe loop is the reference's own serial planning pattern
  * (MySqlChunkSplitter.java:188-221), never in the data path.
  */
object KeyedChunkPlanner {

  /** A chunk boundary: one value per key column, compared lexicographically. */
  type Boundary = Seq[Any]

  /** Lexicographic `key tuple > b` as a Column (null-free keys). */
  def tupleGreater(keys: Seq[Column], b: Boundary): Column = {
    require(keys.length == b.length, s"${keys.length} key cols vs ${b.length} boundary values")
    def go(parts: List[(Column, Any)]): Column = parts match {
      case (k, v) :: Nil => k > lit(v)
      case (k, v) :: rest => (k > lit(v)) || (k === lit(v) && go(rest))
      case Nil => lit(false)
    }
    go(keys.zip(b).toList)
  }

  /** Lexicographic `key tuple <= b`. */
  def tupleLessEq(keys: Seq[Column], b: Boundary): Column = !tupleGreater(keys, b)

  /** Row-in-range under the (start, end] convention — the membership test a
    * chunk scan pushes down.
    */
  def inRange(keys: Seq[Column], lo: Option[Boundary], hi: Option[Boundary]): Column =
    lo.map(tupleGreater(keys, _)).getOrElse(lit(true)) &&
      hi.map(tupleLessEq(keys, _)).getOrElse(lit(true))

  /** A1/A2 generalized — one-row stats: lexicographic min/max key tuple +
    * count, a single distributed partial aggregation.
    */
  def analyze(df: DataFrame, keys: Seq[String]): DataFrame = {
    val kt = struct(keys.map(col): _*)
    df.agg(min(kt).as("min_k"), max(kt).as("max_k"), count(lit(1)).as("cnt"))
  }

  /** A4/O1 generalized — max of the next `chunkSize` rows strictly past
    * `lowerExclusive` (None = from the start): TakeOrdered over the struct
    * column, per-partition top-k, no full sort.
    */
  def nextChunkMax(
      df: DataFrame,
      keys: Seq[String],
      lowerExclusive: Option[Boundary],
      chunkSize: Int
  ): DataFrame = {
    val keyCols = keys.map(col)
    df.where(lowerExclusive.map(tupleGreater(keyCols, _)).getOrElse(lit(true)))
      .select(struct(keyCols: _*).as("kt"))
      .orderBy(col("kt"))
      .limit(chunkSize)
      .agg(max(col("kt")).as("next_max"))
  }

  /** Uneven ranges, window form (the oracle-checkable shape of
    * [[ChunkPlanner.unevenChunkRanges]] over general keys): every
    * `chunkSize`-th DISTINCT key tuple is a boundary; emits split_id +
    * struct-typed split_start/split_end (null = unbounded). Planning
    * metadata only — ~cnt/chunkSize output rows.
    */
  def unevenChunkRanges(df: DataFrame, keys: Seq[String], chunkSize: Int): DataFrame = {
    val keyTuples = df.select(struct(keys.map(col): _*).as("kt"))
    val ktType = keyTuples.schema("kt").dataType
    // distinct + distributed global rank fused into ONE shuffle
    // (DistributedRank dedup) — no single-partition window over the
    // key set; only the ~cnt/chunkSize boundary rows below flow through the
    // tiny lag window
    // ~cnt/chunkSize boundary rows, materialized once: both consumers below
    // (the lag chain and the last-split aggregate) would otherwise each
    // re-run the full-key-set rank join + filter — the sf0.1 composite plan
    // carried the whole subtree twice (20 Exchanges)
    val boundaries = DistributedRank
      .withGlobalRowNumber(keyTuples, "rn", Seq(col("kt")), dedup = true)
      .where(col("rn") % chunkSize === 0)
      .select(col("kt").as("boundary"), expr(s"rn div $chunkSize").as("bid"))
      .localCheckpoint()
    // predecessor chain via a broadcast self-join on the DENSE bid (bid =
    // rn div chunkSize over rn = 1..cnt covers every integer 1..k, so
    // bid-1 IS lag(1) in bid order) — the lag form planned a partition-less
    // Window (a single-partition exchange and the one warning class the
    // scale audit hunts), for no benefit on checkpointed planner metadata
    val bounded = boundaries.as("cur")
      .join(broadcast(boundaries.as("prev")),
        col("prev.bid") === col("cur.bid") - 1, "left")
      .select(
        (col("cur.bid") - 1).as("split_id"),
        col("prev.boundary").as("split_start"),
        col("cur.boundary").as("split_end")
      )
    val last = boundaries.agg(
      count(lit(1)).as("split_id"),
      max_by(col("boundary"), col("bid")).as("split_start")
    ).select(col("split_id"), col("split_start"),
      lit(null).cast(ktType).as("split_end"))
    bounded.unionByName(last)
  }

  /** The reference's probe-driven splitter over general keys
    * (MySqlChunkSplitter.java:188-221 with `Object[]` boundaries): each probe
    * is a distributed TakeOrdered job; the loop itself is driver-side
    * planning, bounded by `maxChunks`. Returns (start, end] ranges exactly
    * covering the key space.
    */
  def unevenChunkRangesIterative(
      df: DataFrame,
      keys: Seq[String],
      chunkSize: Int,
      maxChunks: Int = 10000
  ): Seq[(Option[Boundary], Option[Boundary])] = {
    val stats = analyze(df, keys).collect()(0)
    if (stats.isNullAt(0) || stats.getLong(2) == 0L) return Seq((None, None))
    val maxK: Boundary = stats.getStruct(1).toSeq
    val ranges = Seq.newBuilder[(Option[Boundary], Option[Boundary])]
    var start: Option[Boundary] = None
    var done = false
    var n = 0
    while (!done) {
      if (n >= maxChunks)
        throw new IllegalStateException(
          s"keyed uneven splitter exceeded maxChunks=$maxChunks before covering the key space; " +
            "raise maxChunks or use a sampled strategy for this table")
      val nm = nextChunkMax(df, keys, start, chunkSize).collect()(0)
      val boundary: Boundary = if (nm.isNullAt(0)) maxK else nm.getStruct(0).toSeq
      if (compareBoundaries(boundary, maxK) >= 0) {
        ranges += ((start, None))
        done = true
      } else {
        ranges += ((start, Some(boundary)))
        start = Some(boundary)
      }
      n += 1
    }
    ranges.result()
  }

  /** The 100 TB path for general keys — sampling-based boundaries, the
    * analog of [[ChunkPlanner.quantileRanges]] for key types approxQuantile
    * cannot sketch (strings, composites): sample the key tuples
    * (reference: SampleBucketSplitStrategy's `$sample`), rank the distinct
    * sampled tuples with [[DistributedRank]], and take `n - 1` equi-spaced
    * tuples as boundaries. One sampled pass + a boundary collect of at most
    * `n - 1` rows — no full-table rank, no serial probe loop. Boundary
    * precision degrades gracefully with `fraction` exactly like the
    * reference's sample rate; the returned (start, end] chain covers the
    * key space for ANY boundary set, so correctness never depends on the
    * sample.
    */
  def sampledChunkRanges(
      df: DataFrame,
      keys: Seq[String],
      n: Int,
      fraction: Double,
      seed: Long = 42L
  ): Seq[(Option[Boundary], Option[Boundary])] = {
    require(n >= 1, s"need at least one bucket, got $n")
    if (n == 1) return Seq((None, None))
    val sampled = df.select(struct(keys.map(col): _*).as("kt")).sample(fraction, seed)
    val ranked = DistributedRank
      .withGlobalRowNumber(sampled, "rn", Seq(col("kt")), dedup = true)
    val total = ranked.agg(max(col("rn"))).collect()(0)
    if (total.isNullAt(0)) return Seq((None, None))
    val step = math.max(total.getLong(0) / n, 1L)
    val bounds = ranked.where(col("rn") % step === 0 && col("rn") < total.getLong(0))
      .orderBy(col("rn")).limit(n - 1)
      .collect().map(r => r.getStruct(0).toSeq: Boundary)
      .distinct
    val opts = bounds.map(Option(_)).toSeq
    ((None +: opts) zip (opts :+ None)).toSeq
  }

  /** Driver-side lexicographic compare of two boundaries (components must be
    * mutually Comparable — Long/Int/String/etc as Spark rows return them).
    */
  def compareBoundaries(a: Boundary, b: Boundary): Int =
    a.zip(b).iterator.map { case (x, y) =>
      x.asInstanceOf[Comparable[Any]].compareTo(y)
    }.find(_ != 0).getOrElse(0)

  /** Render (start, end] ranges as JDBC partition predicates with
    * lexicographic comparisons — the composite-key form of
    * [[ChunkPlanner.jdbcPredicates]] (reference StatementUtils.java:132-188
    * emits the same expanded OR-chains for composite split keys). String
    * values are single-quote escaped.
    */
  def jdbcPredicates(
      keys: Seq[String],
      ranges: Seq[(Option[Boundary], Option[Boundary])]
  ): Array[String] = {
    // every type a Spark row can hand back for a comparable key column gets
    // an explicit rendering; anything else fails loudly rather than leaking
    // an unquoted String.valueOf into the pushed-down SQL
    def sqlLit(v: Any): String = v match {
      case s: String => "'" + s.replace("'", "''") + "'"
      case d: java.sql.Date => s"DATE '$d'"
      case t: java.sql.Timestamp => s"TIMESTAMP '$t'"
      case d: java.time.LocalDate => s"DATE '$d'"
      case t: java.time.Instant => s"TIMESTAMP '${java.sql.Timestamp.from(t)}'"
      case d: java.math.BigDecimal => d.toPlainString
      case d: BigDecimal => d.underlying.toPlainString
      case n @ (_: Long | _: Int | _: Short | _: Byte | _: Double | _: Float) =>
        String.valueOf(n)
      case b: Boolean => String.valueOf(b)
      case other =>
        throw new IllegalArgumentException(
          s"unsupported split-key literal type for JDBC predicate rendering: " +
            s"${other.getClass.getName} ($other)")
    }
    def gtSql(parts: List[(String, Any)]): String = parts match {
      case (k, v) :: Nil => s"$k > ${sqlLit(v)}"
      case (k, v) :: rest => s"($k > ${sqlLit(v)} OR ($k = ${sqlLit(v)} AND ${gtSql(rest)}))"
      case Nil => "1 = 1"
    }
    def leSql(parts: List[(String, Any)]): String = parts match {
      case (k, v) :: Nil => s"$k <= ${sqlLit(v)}"
      case (k, v) :: rest => s"($k < ${sqlLit(v)} OR ($k = ${sqlLit(v)} AND ${leSql(rest)}))"
      case Nil => "1 = 1"
    }
    ranges.map { case (lo, hi) =>
      val parts = lo.map(b => gtSql(keys.zip(b).toList)).toSeq ++
        hi.map(b => leSql(keys.zip(b).toList))
      if (parts.isEmpty) "1 = 1" else parts.mkString(" AND ")
    }.toArray
  }
}
