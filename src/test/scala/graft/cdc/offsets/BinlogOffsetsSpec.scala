package graft.cdc.offsets

import org.scalatest.funsuite.AnyFunSuite
import BinlogOffsets._

/** Unit + property coverage for the offset total order and GTID interval-set
  * algebra (reference: BinlogOffset.java:173-246, Debezium GtidSet). These
  * operators have no DuckDB oracle, so this spec is their correctness gate.
  */
class BinlogOffsetsSpec extends AnyFunSuite {

  private def off(
      kind: OffsetKind = Specific,
      gtid: String = "",
      serverId: Long = 1L,
      tsSec: Long = 0L,
      file: String = "mysql-bin.000001",
      pos: Long = 4L,
      skip: Long = 0L
  ) = Offset(kind, gtid, serverId, tsSec, file, pos, skip)

  test("GtidSet parses ranges and singletons") {
    val s = GtidSet.parse("a:1-5:7,b:3")
    assert(s.intervals("a") == Vector((1L, 5L), (7L, 7L)))
    assert(s.intervals("b") == Vector((3L, 3L)))
  }

  test("GtidSet merges adjacent/overlapping intervals") {
    assert(GtidSet.parse("a:1-3:4-6") == GtidSet.parse("a:1-6"))
    assert(GtidSet.parse("a:1-5:3-8") == GtidSet.parse("a:1-8"))
  }

  test("containment: subset, equal, superset, disjoint server") {
    assert(GtidSet.parse("a:1-3").isContainedWithin(GtidSet.parse("a:1-5")))
    assert(GtidSet.parse("a:1-5").isContainedWithin(GtidSet.parse("a:1-5")))
    assert(!GtidSet.parse("a:1-9").isContainedWithin(GtidSet.parse("a:1-5")))
    assert(!GtidSet.parse("c:1-2").isContainedWithin(GtidSet.parse("a:1-5")))
    assert(GtidSet.parse("").isContainedWithin(GtidSet.parse("a:1-5")))
  }

  test("NON_STOPPING is the maximum offset") {
    val n = off(kind = NonStopping)
    val s = off(file = "mysql-bin.999999", pos = Long.MaxValue)
    assert(compareOffsets(n, s) > 0)
    assert(compareOffsets(s, n) < 0)
    assert(compareOffsets(n, off(kind = NonStopping)) == 0)
  }

  test("GTID comparison dominates file/pos") {
    val a = off(gtid = "a:1-3", file = "mysql-bin.000009")
    val b = off(gtid = "a:1-5", file = "mysql-bin.000001")
    assert(compareOffsets(a, b) < 0) // contained => older despite larger file
    assert(compareOffsets(b, a) > 0)
  }

  test("equal GTID sets tiebreak on restartSkipEvents") {
    val a = off(gtid = "a:1-5", skip = 1)
    val b = off(gtid = "a:1-5", skip = 2)
    assert(compareOffsets(a, b) < 0)
  }

  test("missing GTIDs assumed older than target with GTIDs, and vice versa") {
    assert(compareOffsets(off(), off(gtid = "a:1-5")) < 0)
    assert(compareOffsets(off(gtid = "a:1-5"), off()) > 0)
  }

  test("different servers compare by timestamp") {
    val a = off(serverId = 1, tsSec = 100, file = "mysql-bin.000009")
    val b = off(serverId = 2, tsSec = 200, file = "mysql-bin.000001")
    assert(compareOffsets(a, b) < 0)
  }

  test("same server: file then pos then skip-events") {
    assert(compareOffsets(off(file = "mysql-bin.000001"), off(file = "mysql-bin.000002")) < 0)
    assert(compareOffsets(off(pos = 4), off(pos = 8)) < 0)
    assert(compareOffsets(off(skip = 0), off(skip = 1)) < 0)
    assert(compareOffsets(off(), off()) == 0)
  }

  test("property: containment is reflexive and antisymmetric on intervals") {
    val sets =
      for (lo <- 1L to 20L; len <- 0L to 10L) yield GtidSet.parse(s"u:$lo-${lo + len}")
    for (a <- sets; b <- sets) {
      assert(a.isContainedWithin(a))
      if (a.isContainedWithin(b) && b.isContainedWithin(a)) assert(a == b)
      // interval containment must agree with arithmetic containment
      val (alo, ahi) = a.intervals("u").head
      val (blo, bhi) = b.intervals("u").head
      assert(a.isContainedWithin(b) == (blo <= alo && ahi <= bhi))
    }
  }

  test("filePosSkipGreater Column agrees with compareOffsets on every same-server triple") {
    val spark = graft.SparkTestBase.session
    import org.apache.spark.sql.functions.col
    val ref = off(file = "mysql-bin.000001", pos = 12, skip = 2)
    val triples = for {
      f <- Seq("mysql-bin.000000", "mysql-bin.000001", "mysql-bin.000002")
      p <- Seq(4L, 12L, 20L)
      k <- Seq(0L, 2L, 5L)
    } yield (f, p, k)
    import spark.implicits._
    val got = triples.toDF("file", "pos", "skip")
      .where(BinlogOffsets.filePosSkipGreater(
        col("file"), col("pos"), col("skip"), ref.file, ref.pos, ref.restartSkipEvents))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val want = triples.filter { case (f, p, k) =>
      compareOffsets(off(file = f, pos = p, skip = k), ref) > 0
    }.toSet
    assert(got == want)
    // the skip tiebreak really fires: same (file,pos), higher skip is kept
    assert(got.contains(("mysql-bin.000001", 12L, 5L)))
    assert(!got.contains(("mysql-bin.000001", 12L, 2L)))
  }

  test("property: compareOffsets is an antisymmetric total order on (file,pos)") {
    val offs = for (f <- 0 to 3; p <- 0L to 40L by 7) yield off(file = f"mysql-bin.$f%06d", pos = p)
    for (a <- offs; b <- offs; c <- offs) {
      assert(Integer.signum(compareOffsets(a, b)) == -Integer.signum(compareOffsets(b, a)))
      if (compareOffsets(a, b) <= 0 && compareOffsets(b, c) <= 0)
        assert(compareOffsets(a, c) <= 0)
    }
  }
}
