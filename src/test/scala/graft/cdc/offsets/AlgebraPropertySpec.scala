package graft.cdc.offsets

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import graft.cdc.offsets.BinlogOffsets._

/** Property-based coverage of the pure algebra (no SparkSession): GTID
  * interval-set containment vs brute-force membership, the offset total
  * order's laws, FNV vs an independent BigInt reference, and winnowing
  * invariants. These are the codepaths where SURVEY §7.4 flags "easy to get
  * subtly wrong".
  */
class AlgebraPropertySpec extends AnyFunSuite {

  private val params = SCTest.Parameters.default.withMinSuccessfulTests(300)
  private def check(p: Prop): Unit = {
    val r = SCTest.check(params, p)
    assert(r.passed, r.status.toString)
  }

  // --- GTID sets ----------------------------------------------------------

  /** Random GTID set over a tiny universe so containment is exercised both
    * ways: up to 2 uuids, txids in 1..40, up to 4 raw (possibly
    * overlapping/adjacent) intervals each.
    */
  private val gtidGen: Gen[String] = for {
    uuids <- Gen.someOf(Seq("s1", "s2"))
    parts <- Gen.sequence[Seq[String], String](uuids.map { u =>
      for {
        n <- Gen.choose(1, 4)
        ivs <- Gen.listOfN(n, for {
          lo <- Gen.choose(1L, 40L)
          len <- Gen.choose(0L, 8L)
        } yield s"$lo-${lo + len}")
      } yield (Seq(u) ++ ivs).mkString(":")
    })
  } yield parts.mkString(",")

  private def members(s: String): Set[(String, Long)] =
    GtidSet.parse(s).intervals.toSeq.flatMap { case (u, ivs) =>
      ivs.flatMap { case (lo, hi) => (lo to hi).map(u -> _) }
    }.toSet

  test("GTID containment == brute-force member subset") {
    check(Prop.forAll(gtidGen, gtidGen) { (a, b) =>
      GtidSet.parse(a).isContainedWithin(GtidSet.parse(b)) ==
        members(a).subsetOf(members(b))
    })
  }

  test("GTID parse normalizes to sorted, disjoint, non-adjacent intervals") {
    check(Prop.forAll(gtidGen) { s =>
      GtidSet.parse(s).intervals.values.forall { ivs =>
        ivs.forall { case (lo, hi) => lo <= hi } &&
          ivs.sliding(2).forall {
            case Vector((_, h1), (l2, _)) => l2 > h1 + 1 // gap of >= 1 txid
            case _ => true
          }
      }
    })
  }

  test("GTID containment is reflexive and member-equality implies mutual containment") {
    check(Prop.forAll(gtidGen) { s =>
      val g = GtidSet.parse(s)
      g.isContainedWithin(g)
    })
  }

  // --- offset total order -------------------------------------------------

  // NOTE (found by this property): the reference's comparison
  // (BinlogOffset.java:173-246) is NOT transitive across MIXED server ids —
  // cross-server pairs compare by timestamp while same-server pairs compare
  // by (file, pos), and the two orders can disagree (a>c by file/pos while
  // a<b<c by ts through a third server). Our replication is faithful, so
  // the total-order laws are asserted per server id, the only scope the
  // reference ever compares within (one binlog stream).
  private def filePosOffset(server: Long): Gen[Offset] = for {
    fileN <- Gen.choose(0, 3)
    pos <- Gen.choose(0L, 1000L)
    skip <- Gen.choose(0L, 3L)
    ts <- Gen.choose(0L, 100L)
    kind <- Gen.frequency(9 -> Gen.const(Specific), 1 -> Gen.const(NonStopping))
  } yield Offset(kind, "", server, ts, f"mysql-bin.$fileN%06d", pos, skip)

  test("same-server file/pos comparison is a total order (antisymmetric, transitive)") {
    val g = filePosOffset(server = 1L)
    check(Prop.forAll(g, g, g) { (a, b, c) =>
      val ab = Integer.signum(compareOffsets(a, b))
      val ba = Integer.signum(compareOffsets(b, a))
      val antisym = ab == -ba
      val trans =
        if (compareOffsets(a, b) <= 0 && compareOffsets(b, c) <= 0)
          compareOffsets(a, c) <= 0
        else true
      antisym && trans
    })
  }

  test("cross-server comparison is antisymmetric and timestamp-driven") {
    val g1 = filePosOffset(1L)
    val g2 = filePosOffset(2L)
    check(Prop.forAll(g1, g2) { (a, b) =>
      (a.kind == NonStopping || b.kind == NonStopping) ||
        (Integer.signum(compareOffsets(a, b)) ==
          -Integer.signum(compareOffsets(b, a)) &&
          (a.tsSec == b.tsSec ||
            Integer.signum(compareOffsets(a, b)) ==
              java.lang.Long.compare(a.tsSec, b.tsSec)))
    })
  }

  test("strict GTID containment orders offsets; NON_STOPPING dominates everything") {
    check(Prop.forAll(gtidGen, gtidGen) { (a, b) =>
      val oa = Offset(Specific, a, 1L, 0L, "f", 0L, 0L)
      val ob = Offset(Specific, b, 1L, 0L, "f", 0L, 0L)
      val ns = Offset(NonStopping, "", 1L, 0L, "f", 0L, 0L)
      val domNs = compareOffsets(oa, ns) == -1 && compareOffsets(ns, oa) == 1
      val sa = GtidSet.parse(a); val sb = GtidSet.parse(b)
      val ordered =
        if (sa == sb) Integer.signum(compareOffsets(oa, ob)) == 0 ||
          compareOffsets(oa, ob) == java.lang.Long.compare(0L, 0L)
        else if (sa.isContainedWithin(sb))
          compareOffsets(oa, ob) == -1 && compareOffsets(ob, oa) == 1
        else true // incomparable sets: Debezium reports "newer", no law
      domNs && ordered
    })
  }

  // --- hashes -------------------------------------------------------------

  test("fnv1a64 matches an independent BigInt mod-2^64 reference") {
    val M = BigInt(1) << 64
    check(Prop.forAll(Gen.listOf(Gen.choose(0, 255))) { bytes =>
      val arr = bytes.map(_.toByte).toArray
      val ref = arr.foldLeft(BigInt("cbf29ce484222325", 16)) { (h, b) =>
        ((h ^ BigInt(b & 0xff)) * BigInt("100000001b3", 16)).mod(M)
      }
      val signed = if (ref >= (BigInt(1) << 63)) (ref - M).toLong else ref.toLong
      graft.ext.TextAnalysis.fnv1a64Bytes(arr) == signed
    })
  }

  test("mix64 is injective per mix-key over sequential inputs") {
    // splitmix64's finalizer is a bijection for a fixed b — any collision
    // over a dense input range would break the MinHash family
    for (b <- Seq(0L, 1L, 31L)) {
      val outs = (0L until 20000L).map(a => graft.ext.Hashing.mix64(a, b))
      assert(outs.distinct.length == outs.length)
    }
  }

  // --- winnowing ----------------------------------------------------------

  test("winnow fingerprints are a subset of the k-gram hashes and cover every window") {
    val textGen = Gen.chooseNum(0, 60).flatMap(n =>
      Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))
    val (k, w) = (5, 3)
    check(Prop.forAll(textGen) { t =>
      val u = org.apache.spark.unsafe.types.UTF8String.fromString(t)
      val fps = graft.ext.Hashing.winnow(u, k, w).toLongArray().toSet
      val grams = (0 to math.max(t.length - k, 0))
        .map(i => t.substring(i, math.min(i + k, t.length)))
      val hs = grams.map(graft.ext.TextAnalysis.fnv1a64)
      val windowMins = (0 to math.max(hs.length - w, 0))
        .map(j => hs.slice(j, math.min(j + w, hs.length)).min).toSet
      fps == windowMins && fps.subsetOf(hs.toSet)
    })
  }

  // --- Mongo change-stream offsets ---------------------------------------

  private val bsonTsGen: Gen[(Long, Long)] = for {
    t <- Gen.choose(0L, Int.MaxValue.toLong)
    i <- Gen.choose(0L, Int.MaxValue.toLong)
  } yield (t, i)

  test("mongo resume-token order: lexicographic on (t, i), token-independent, NO_STOPPING maximal") {
    import MongoOffsets._
    check(Prop.forAll(bsonTsGen, bsonTsGen) { case ((t1, i1), (t2, i2)) =>
      val a = ChangeStreamOffset((t1 << 32) | i1, Some("tokA"))
      val b = ChangeStreamOffset((t2 << 32) | i2, Some("tokB"))
      val expected = if (t1 != t2) java.lang.Long.compare(t1, t2)
        else java.lang.Long.compare(i1, i2)
      Integer.signum(compare(a, b)) == Integer.signum(expected) &&
        compare(a, NoStopping) <= 0 &&
        (compare(a, NoStopping) == 0) == (a.tsValue == NoStopping.tsValue)
    })
  }

  test("mongo resume-token hex round trip at random timestamps") {
    import MongoOffsets._
    check(Prop.forAll(bsonTsGen) { case (t, i) =>
      val hexTok = f"82$t%08x$i%08x"
      val p = parseHex(hexTok)
      p.seconds == t && p.increment == i && p.tsValue == ((t << 32) | i)
    })
  }

  // --- keyed boundary compare --------------------------------------------

  private val boundaryGen: Gen[Seq[Any]] = for {
    k1 <- Gen.choose(-50L, 50L)
    k2 <- Gen.alphaLowerStr.map(_.take(4))
  } yield Seq[Any](k1, k2)

  test("compareBoundaries is a lexicographic total order (antisymmetric, transitive)") {
    import graft.cdc.split.KeyedChunkPlanner.compareBoundaries
    check(Prop.forAll(boundaryGen, boundaryGen, boundaryGen) { (a, b, c) =>
      val ab = Integer.signum(compareBoundaries(a, b))
      val ba = Integer.signum(compareBoundaries(b, a))
      val expected = {
        val c1 = java.lang.Long.compare(a.head.asInstanceOf[Long], b.head.asInstanceOf[Long])
        if (c1 != 0) c1
        else a(1).asInstanceOf[String].compareTo(b(1).asInstanceOf[String])
      }
      val antisym = ab == -ba && ab == Integer.signum(expected)
      // transitivity on this triple
      val (x, y, z) = (a, b, c)
      val trans =
        !(compareBoundaries(x, y) <= 0 && compareBoundaries(y, z) <= 0) ||
          compareBoundaries(x, z) <= 0
      antisym && trans
    })
  }

  // --- sequence-packing arithmetic ---------------------------------------

  private val packGen: Gen[(List[Long], Long)] = for {
    b <- Gen.choose(1L, 16L)
    n <- Gen.choose(1, 30)
    toks <- Gen.listOfN(n, Gen.choose(1L, 40L))
  } yield (toks, b)

  test("packing span arithmetic tiles every doc and fills every sequence") {
    check(Prop.forAll(packGen) { case (toks, b) =>
      // the same closed-form span arithmetic packSequences computes
      val cums = toks.scanLeft(0L)(_ + _)
      val spans = toks.zipWithIndex.flatMap { case (t, i) =>
        val (s0, e0) = (cums(i), cums(i + 1))
        ((s0 / b) to ((e0 - 1) / b)).map { seq =>
          val start = math.max(s0, seq * b)
          (i, seq, start - s0, start - seq * b, math.min(e0, (seq + 1) * b) - start)
        }
      }
      val total = toks.sum
      val tiles = toks.indices.forall { i =>
        val mine = spans.filter(_._1 == i).sortBy(_._2)
        mine.map(_._5).sum == toks(i) &&
          mine.headOption.forall(_._3 == 0L) &&
          mine.zip(mine.drop(1)).forall { case (a, c) => c._3 == a._3 + a._5 }
      }
      val lastSeq = (total - 1) / b
      val fills = spans.groupBy(_._2).forall { case (seq, ss) =>
        val tot = ss.map(_._5).sum
        if (seq == lastSeq) tot == total - lastSeq * b else tot == b
      }
      tiles && fills && spans.forall(_._5 > 0)
    })
  }
}
