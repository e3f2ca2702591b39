package graft.cdc.split

import graft.SparkTestBase
import graft.cdc.model.Changelog.table
import org.apache.spark.sql.functions._

/** Property mirror of MySqlChunkSplitterTest: chunk ranges must partition
  * the key space exactly — disjoint and covering, every row in exactly one
  * chunk.
  */
class ChunkPlannerSpec extends SparkTestBase {

  private lazy val customer = table(spark, sfDir, "customer")

  test("iterative uneven ranges are disjoint and cover every key") {
    for (chunkSize <- Seq(7, 64, 1000)) {
      val ranges = ChunkPlanner.unevenChunkRangesIterative(customer, "c_custkey", chunkSize)
      assert(ranges.head._1.isEmpty && ranges.last._2.isEmpty)
      // chained boundaries: each end == next start
      ranges.sliding(2).foreach {
        case Seq((_, Some(e)), (Some(s2), _)) => assert(e == s2)
        case _ => ()
      }
      // every row in exactly one chunk under (start, end] semantics
      val keys = customer.select(col("c_custkey")).collect().map(_.getLong(0))
      for (k <- keys) {
        val n = ranges.count { case (lo, hi) =>
          lo.forall(k > _) && hi.forall(k <= _)
        }
        assert(n == 1, s"key $k in $n chunks (chunkSize=$chunkSize)")
      }
    }
  }

  test("even chunk stats account for every row exactly once") {
    val total = customer.count()
    val sum = ChunkPlanner.evenChunkStats(customer, "c_custkey", 64)
      .agg(org.apache.spark.sql.functions.sum("cnt")).collect()(0).getLong(0)
    assert(sum == total)
  }

  test("non-contiguous PKs (customer.sql-style gaps) split disjoint-covering") {
    // mirrors the reference's ddl/customer.sql deliberately gapped ids
    val s = spark
    import s.implicits._
    val gapped = (Seq(101L, 102L, 103L, 109L, 110L, 111L, 118L, 121L, 123L) ++
      (1000L to 1040L by 7) ++ Seq(2000L, 5000L)).toDF("c_custkey")
    for (chunkSize <- Seq(3, 5)) {
      val ranges = ChunkPlanner.unevenChunkRangesIterative(gapped, "c_custkey", chunkSize)
      val keys = gapped.collect().map(_.getLong(0))
      for (k <- keys) {
        val n = ranges.count { case (lo, hi) => lo.forall(k > _) && hi.forall(k <= _) }
        assert(n == 1, s"key $k in $n chunks")
      }
    }
  }

  test("even/uneven decision follows the reference's factor band") {
    // dense keys: factor ~1.0 -> even
    val dense = ChunkPlanner.distributionFactor(customer, "c_custkey")
      .collect()(0).getAs[Long]("factor_x10000")
    assert(ChunkPlanner.useEvenSplit(dense))
    // sparse synthetic: factor far above upper bound -> uneven
    assert(!ChunkPlanner.useEvenSplit(factorX10000 = 20000000000L))
    // ultra-dense duplicates: factor below lower bound -> uneven
    assert(!ChunkPlanner.useEvenSplit(factorX10000 = 100L))
    // dynamic chunk size floors at 1
    assert(ChunkPlanner.dynamicChunkSize(8096, 1L) == 1L)
    assert(ChunkPlanner.dynamicChunkSize(8096, 10000L) == 8096L)
  }

  test("jdbc partition predicates cover the key space exactly once") {
    val ranges: Seq[(Option[Long], Option[Long])] =
      Seq((None, Some(5L)), (Some(5L), Some(10L)), (Some(10L), None))
    val preds = ChunkPlanner.jdbcPredicates("c_custkey", ranges)
    assert(preds.sameElements(Array(
      "c_custkey < 5", "c_custkey >= 5 AND c_custkey < 10", "c_custkey >= 10")))
    // each predicate used as a JDBC partition WHERE clause: the union of
    // per-partition scans must be the table, with no overlap
    val total = customer.count()
    val sum = preds.map(p =>
      customer.where(org.apache.spark.sql.functions.expr(p)).count()).sum
    assert(sum == total)
    // the degenerate single-chunk plan scans everything
    assert(ChunkPlanner.jdbcPredicates("k", Seq((None, None))).head == "1 = 1")
  }

  test("quantile ranges cover exactly once and are roughly equi-depth") {
    val total = customer.count()
    for (n <- Seq(1, 4, 8)) {
      val ranges = ChunkPlanner.quantileRanges(customer, "c_custkey", n)
      val preds = ChunkPlanner.jdbcPredicates("c_custkey", ranges)
      val counts = preds.map(p =>
        customer.where(org.apache.spark.sql.functions.expr(p)).count())
      assert(counts.sum == total, s"n=$n: cover violated")
      if (n > 1) {
        // uniform keys: every bucket within 2x of ideal depth
        val ideal = total.toDouble / n
        counts.foreach(c => assert(c > ideal / 2 && c < ideal * 2,
          s"n=$n unbalanced: ${counts.mkString(",")}"))
      }
    }
  }

  test("analyze returns min<=max and exact count") {
    val r = ChunkPlanner.analyze(customer, "c_custkey").collect()(0)
    assert(r.getAs[Number]("min_k").longValue <= r.getAs[Number]("max_k").longValue)
    assert(r.getAs[Long]("cnt") == customer.count())
  }

  test("string-keyed iterative ranges are disjoint and cover every key") {
    for (chunkSize <- Seq(64, 300)) {
      val ranges = KeyedChunkPlanner.unevenChunkRangesIterative(
        customer, Seq("c_name"), chunkSize)
      assert(ranges.head._1.isEmpty && ranges.last._2.isEmpty)
      ranges.sliding(2).foreach {
        case Seq((_, Some(e)), (Some(s2), _)) => assert(e == s2)
        case _ => ()
      }
      val names = customer.select(col("c_name")).collect().map(_.getString(0))
      for (k <- names) {
        val n = ranges.count { case (lo, hi) =>
          lo.forall(b => k > b.head.asInstanceOf[String]) &&
            hi.forall(b => k <= b.head.asInstanceOf[String])
        }
        assert(n == 1, s"name $k in $n chunks (chunkSize=$chunkSize)")
      }
    }
  }

  test("composite-keyed iterative ranges are disjoint and cover every tuple") {
    val li = table(spark, sfDir, "lineitem")
    val keys = Seq("l_orderkey", "l_linenumber")
    val ranges = KeyedChunkPlanner.unevenChunkRangesIterative(li, keys, 512)
    assert(ranges.length >= 2, "fixture too small for a meaningful composite split")
    // membership checked THROUGH the Column algebra (tupleGreater/LessEq) so
    // the spec also proves inRange: each row lands in exactly one range
    val keyCols = keys.map(col)
    val flags = ranges.zipWithIndex.map { case ((lo, hi), i) =>
      when(KeyedChunkPlanner.inRange(keyCols, lo, hi), 1).otherwise(0).as(s"r$i")
    }
    val counts = li.select(flags.reduce(_ + _).as("n")).groupBy(col("n")).count().collect()
    assert(counts.length == 1 && counts(0).getInt(0) == 1,
      s"rows not in exactly one range: ${counts.mkString(",")}")
  }

  test("keyed jdbc predicates render lexicographic SQL that covers exactly once") {
    val li = table(spark, sfDir, "lineitem")
    val keys = Seq("l_orderkey", "l_linenumber")
    val ranges = KeyedChunkPlanner.unevenChunkRangesIterative(li, keys, 1024)
    val preds = KeyedChunkPlanner.jdbcPredicates(keys, ranges)
    val total = li.count()
    val sum = preds.map(p => li.where(expr(p)).count()).sum
    assert(sum == total, s"predicates over/under-cover: $sum vs $total\n${preds.mkString("\n")}")
    // string literal escaping
    val sp = KeyedChunkPlanner.jdbcPredicates(
      Seq("name"), Seq((Some(Seq("o'brien")), None)))
    assert(sp.head == "name > 'o''brien'")
    // temporal/decimal keys render typed literals, not bare toString
    val tp = KeyedChunkPlanner.jdbcPredicates(
      Seq("d", "ts", "amt"),
      Seq((Some(Seq(java.sql.Date.valueOf("2024-01-31"),
        java.sql.Timestamp.valueOf("2024-01-31 10:30:00"),
        new java.math.BigDecimal("12.3400"))), None)))
    assert(tp.head.contains("d > DATE '2024-01-31'"))
    assert(tp.head.contains("ts > TIMESTAMP '2024-01-31 10:30:00"))
    assert(tp.head.contains("amt > 12.3400"))
    // unsupported literal types fail loudly instead of leaking unquoted SQL
    intercept[IllegalArgumentException] {
      KeyedChunkPlanner.jdbcPredicates(
        Seq("k"), Seq((Some(Seq(new Object)), None)))
    }
  }

  test("string-key JDBC splitter under the collation contract covers a case-mixed key exactly") {
    // case-mixed VARCHAR key: binary (codepoint) order differs from any
    // case-insensitive collation ('B' < 'a'); Derby's default UCS_BASIC is
    // codepoint order, i.e. the SqlCollation.Binary contract
    val dir = java.nio.file.Files.createTempDirectory("derby_coll").toString
    val url = s"jdbc:derby:$dir/db;create=true"
    val names = table(spark, sfDir, "customer").select("c_custkey", "c_name")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val cased = names.map { case (k, n) =>
      (k, if (k % 2 == 0) n.toUpperCase else n)
    }
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.execute("CREATE TABLE T (ID BIGINT, CK VARCHAR(64))")
      st.close()
      val ins = conn.prepareStatement("INSERT INTO T VALUES (?, ?)")
      try cased.foreach { case (k, n) =>
        ins.setLong(1, k); ins.setString(2, n); ins.addBatch()
      } finally { ins.executeBatch(); ins.close() }
    } finally conn.close()

    val ranges = ChunkPlanner.unevenChunkRangesJdbcString(
      url, "T", "CK", chunkSize = 64, ChunkPlanner.SqlDialect.Ansi)
    assert(ranges.length >= 3)
    // the contract property: DB-probed boundaries ARE Spark-order
    // boundaries — the Spark-side keyed planner over the same rows agrees
    val s = spark
    import s.implicits._
    val df = cased.toSeq.toDF("id", "CK")
    val sparkRanges = KeyedChunkPlanner
      .unevenChunkRangesIterative(df, Seq("CK"), 64)
      .map { case (lo, hi) =>
        (lo.map(_.head.asInstanceOf[String]), hi.map(_.head.asInstanceOf[String]))
      }
    assert(ranges == sparkRanges,
      s"DB and Spark planners ordered boundaries differently:\n$ranges\nvs\n$sparkRanges")
    // pushed predicates partition the table exactly once
    val preds = ChunkPlanner.jdbcPredicatesString(
      "CK", ranges, ChunkPlanner.SqlCollation.Binary)
    val perChunk = spark.read.jdbc(url, "T", preds, new java.util.Properties())
    assert(perChunk.count() == cased.length)
    assert(perChunk.select("ID").distinct().count() == cased.length)
    // the MySQL/Postgres spellings render through the same contract
    assert(ChunkPlanner.jdbcPredicatesString("k",
      Seq((Some("o'brien"), Some("z"))),
      ChunkPlanner.SqlCollation.MySqlBinary).head ==
      "BINARY k > 'o''brien' AND BINARY k <= 'z'")
    assert(ChunkPlanner.SqlCollation.PostgresC.orderExpr("k") == """k COLLATE "C"""")
  }

  test("window-form keyed ranges agree with the iterative probe on unique keys") {
    // two formulations of the same operator must not drift (round-1 lesson:
    // test every variant): over a unique key the window form's distinct-rank
    // boundaries equal the probe loop's row boundaries exactly
    val chunkSize = 300
    val win = KeyedChunkPlanner.unevenChunkRanges(customer, Seq("c_name"), chunkSize)
      .select(col("split_id"), col("split_start.c_name"), col("split_end.c_name"))
      .collect()
      .map(r => (r.getLong(0), Option(r.getString(1)), Option(r.getString(2))))
      .sortBy(_._1)
    val iter = KeyedChunkPlanner
      .unevenChunkRangesIterative(customer, Seq("c_name"), chunkSize)
      .zipWithIndex
      .map { case ((lo, hi), i) =>
        (i.toLong, lo.map(_.head.asInstanceOf[String]), hi.map(_.head.asInstanceOf[String]))
      }
    assert(win.toSeq == iter)
  }

  test("window-form composite ranges cover every distinct tuple exactly once") {
    val li = table(spark, sfDir, "lineitem")
    val keys = Seq("l_orderkey", "l_linenumber")
    val ranges = KeyedChunkPlanner.unevenChunkRanges(li, keys, 2048)
      .collect()
      .map { r =>
        def b(i: Int): Option[Seq[Any]] =
          if (r.isNullAt(i)) None else Some(r.getStruct(i).toSeq)
        (b(1), b(2))
      }
    val keyCols = keys.map(col)
    val flags = ranges.zipWithIndex.map { case ((lo, hi), i) =>
      when(KeyedChunkPlanner.inRange(keyCols, lo, hi), 1).otherwise(0).as(s"r$i")
    }
    val counts = li.select(keyCols: _*).distinct()
      .select(flags.reduce(_ + _).as("n")).groupBy(col("n")).count().collect()
    assert(counts.length == 1 && counts(0).getInt(0) == 1,
      s"tuples not in exactly one window-form range: ${counts.mkString(",")}")
  }

  test("sampled keyed ranges cover exactly once and are roughly equi-depth") {
    val li = table(spark, sfDir, "lineitem")
    val keys = Seq("l_orderkey", "l_linenumber")
    val keyCols = keys.map(col)
    val total = li.count()
    for (n <- Seq(1, 4, 8)) {
      val ranges = KeyedChunkPlanner.sampledChunkRanges(li, keys, n, fraction = 0.3)
      // cover-exactly-once holds for ANY boundary set by construction
      val flags = ranges.zipWithIndex.map { case ((lo, hi), i) =>
        when(KeyedChunkPlanner.inRange(keyCols, lo, hi), 1).otherwise(0).as(s"r$i")
      }
      val counts = li.select(flags.reduce(_ + _).as("n")).groupBy(col("n")).count().collect()
      assert(counts.length == 1 && counts(0).getInt(0) == 1,
        s"n=$n: rows not in exactly one sampled range")
      if (n > 1) {
        assert(ranges.length > 1, s"n=$n produced a single range on a 30% sample")
        // near-uniform key distribution: sampled buckets within 3x of ideal
        val perRange = ranges.map { case (lo, hi) =>
          li.where(KeyedChunkPlanner.inRange(keyCols, lo, hi)).count()
        }
        val ideal = total.toDouble / ranges.length
        perRange.foreach(c => assert(c < ideal * 3,
          s"n=$n unbalanced: ${perRange.mkString(",")}"))
      }
    }
  }

  test("sample-rate policy takes the reference's three decision branches") {
    import ChunkPlanner.{samplePlan, SamplePlan}
    // below one chunk: single split, no sampling
    assert(samplePlan(sizeInBytes = 100, count = 10, chunkSizeBytes = 1024) ==
      SamplePlan(1, 0L))
    // above chunk size but under the sampling threshold: full sample
    assert(samplePlan(sizeInBytes = 10 * 1024, count = 500, chunkSizeBytes = 1024) ==
      SamplePlan(11, 500L))
    // reference constants: 102400 threshold, 5% rate
    assert(samplePlan(sizeInBytes = 64L << 20, count = 200000,
      chunkSizeBytes = 1L << 20) == SamplePlan(65, 10000L))
    // boundary: exactly at the threshold switches to the rate
    assert(samplePlan(sizeInBytes = 10 * 1024, count = 102400,
      chunkSizeBytes = 1024).numberOfSamples == 5120L)
  }

  test("sample-rate buckets form a covering split chain with capped ends") {
    val docs = graft.cdc.model.Changelog.table(spark, sfDir, "documents")
    val out = ChunkPlanner.sampleRateBuckets(
      docs, "doc_id", org.apache.spark.sql.functions.col("n_chars"),
      chunkSizeBytes = 16384L, samplingThreshold = 300L)
      .orderBy("split_id").collect()
    assert(out.length >= 3, s"expected caps+buckets, got ${out.length}")
    // leading cap: open start, closed at the first bucket's lo
    assert(out.head.isNullAt(2) && !out.head.isNullAt(3))
    // trailing cap: open end
    assert(!out.last.isNullAt(2) && out.last.isNullAt(3))
    // interior buckets chain: each start <= end, ends non-decreasing
    val mids = out.drop(1).dropRight(1)
    mids.foreach(r => assert(r.getLong(2) <= r.getLong(3)))
    mids.sliding(2).foreach {
      case Array(a, b) => assert(a.getLong(3) <= b.getLong(2))
      case _ =>
    }
    // single-chunk collection degenerates to one open split
    val single = ChunkPlanner.sampleRateBuckets(
      docs, "doc_id", org.apache.spark.sql.functions.col("n_chars"),
      chunkSizeBytes = Long.MaxValue)
      .collect()
    assert(single.length == 1 && single(0).isNullAt(2) && single(0).isNullAt(3))
  }

  test("keyed analyze agrees with the Long-path analyze on a single numeric key") {
    val a = ChunkPlanner.analyze(customer, "c_custkey").collect()(0)
    val b = KeyedChunkPlanner.analyze(customer, Seq("c_custkey")).collect()(0)
    assert(b.getStruct(0).getLong(0) == a.getAs[Number]("min_k").longValue)
    assert(b.getStruct(1).getLong(0) == a.getAs[Number]("max_k").longValue)
    assert(b.getLong(2) == a.getAs[Long]("cnt"))
  }
}
