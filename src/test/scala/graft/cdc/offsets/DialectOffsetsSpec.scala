package graft.cdc.offsets

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.SparkTestBase
import DialectOffsets._

/** Laws of the per-dialect offset encodings (reference:
  * RedoLogOffset.java:69-97 for the SCN branches; Debezium's pg/sqlserver
  * /db2 Lsn formats for the textual layouts): parse∘render = id, text-domain
  * order == numeric order, malformed/out-of-range guards, and agreement
  * between the Column forms and the driver-side models.
  */
class DialectOffsetsSpec extends SparkTestBase {

  private val params = SCTest.Parameters.default.withMinSuccessfulTests(300)
  private def check(p: Prop): Unit = {
    val r = SCTest.check(params, p)
    assert(r.passed, r.status.toString)
  }

  private val uint64Gen: Gen[BigInt] = for {
    hi <- Gen.chooseNum(0L, 0xffffffffL)
    lo <- Gen.chooseNum(0L, 0xffffffffL)
  } yield (BigInt(hi) << 32) | BigInt(lo)

  private val mssqlGen: Gen[SqlServerLsn] = for {
    v <- Gen.chooseNum(0L, 0xffffffffL)
    b <- Gen.chooseNum(0L, 0xffffffffL)
    sl <- Gen.chooseNum(0L, 0xffffL)
  } yield SqlServerLsn(v, b, sl)

  // --- Postgres ----------------------------------------------------------

  test("pg LSN: parse∘render = id and unsigned order over the full uint64 domain") {
    check(Prop.forAll(uint64Gen) { v =>
      PgLsn.parse(PgLsn(v).render).value == v
    })
    check(Prop.forAll(uint64Gen, uint64Gen) { (a, b) =>
      PgLsn.compare(PgLsn(a), PgLsn(b)).sign == a.compare(b).sign
    })
  }

  test("pg LSN column parse matches driver parse; top-bit values don't wrap") {
    val s = spark
    import s.implicits._
    // includes values above 2^63 — a signed-long decode would go negative
    val vals = Seq(BigInt(0), BigInt(1) << 32, (BigInt(1) << 64) - 1,
      BigInt("9223372036854775808"), BigInt(613) * 7001)
    val rows = vals.map(v => PgLsn(v).render).toDF("lsn")
      .select(col("lsn"), pgLsnValue(col("lsn")).as("v")).collect()
    rows.zip(vals).foreach { case (r, v) =>
      assert(BigInt(r.getDecimal(1).toBigInteger) == v)
      assert(PgLsn.parse(r.getString(0)).value == v)
    }
  }

  test("pg LSN: malformed text decodes to null, never conv's silent zero") {
    val s = spark
    import s.implicits._
    val rows = Seq("", "12", "1/2/3", "123456789/0", "xyz/1", "1/")
      .toDF("lsn").select(pgLsnValue(col("lsn")).as("v")).collect()
    rows.foreach(r => assert(r.isNullAt(0)))
    intercept[IllegalArgumentException](PgLsn.parse("1/2/3"))
  }

  test("pg LSN render column nulls out-of-uint32 halves") {
    val s = spark
    import s.implicits._
    val bad = Seq((4294967296L, 0L), (0L, -1L)).toDF("hi", "lo")
      .select(pgLsnText(col("hi"), col("lo")).as("lsn")).collect()
    bad.foreach(r => assert(r.isNullAt(0)))
    val ok = Seq((0xffffffffL, 0xffffffffL)).toDF("hi", "lo")
      .select(pgLsnText(col("hi"), col("lo")).as("lsn")).collect()(0).getString(0)
    assert(ok == "FFFFFFFF/FFFFFFFF")
  }

  // --- SQL Server / db2 --------------------------------------------------

  test("sqlserver LSN: canonical-text lexicographic order == tuple order") {
    check(Prop.forAll(mssqlGen, mssqlGen) { (a, b) =>
      a.render.compare(b.render).sign == SqlServerLsn.compare(a, b).sign
    })
    check(Prop.forAll(mssqlGen) { a =>
      SqlServerLsn.parse(a.render) == a
    })
  }

  test("sqlserver LSN column render/decode round-trips; NIL is minimal") {
    val s = spark
    import s.implicits._
    val cases = Seq((0L, 0L, 0L), (40L, 9808L, 5L), (0xffffffffL, 0xffffffffL, 0xffffL))
    val rows = cases.toDF("v", "b", "sl")
      .select(mssqlLsnText(col("v"), col("b"), col("sl")).as("lsn"))
      .select(col("lsn"), mssqlVlf(col("lsn")).as("v2"),
        mssqlBlock(col("lsn")).as("b2"), mssqlSlot(col("lsn")).as("s2"))
      .collect()
    rows.zip(cases).foreach { case (r, (v, b, sl)) =>
      assert(SqlServerLsn.parse(r.getString(0)) == SqlServerLsn(v, b, sl))
      assert(r.getLong(1) == v && r.getLong(2) == b && r.getLong(3) == sl)
    }
    assert(!SqlServerLsn.Nil_.isAvailable)
    check(Prop.forAll(mssqlGen) { a =>
      !a.isAvailable || SqlServerLsn.compare(SqlServerLsn.Nil_, a) < 0
    })
    // out-of-range slot nulls the render; malformed text nulls the decode
    val bad = Seq((0L, 0L, 65536L)).toDF("v", "b", "sl")
      .select(mssqlLsnText(col("v"), col("b"), col("sl")).as("lsn")).collect()(0)
    assert(bad.isNullAt(0))
    val badDecode = Seq("0028:0f40:0001", "zzzzzzzz:00000000:0000")
      .toDF("lsn").select(mssqlVlf(col("lsn")).as("v")).collect()
    badDecode.foreach(r => assert(r.isNullAt(0)))
  }

  test("db2 LSN: canonical 16-hex text order == numeric order; round trip") {
    check(Prop.forAll(uint64Gen) { v =>
      Db2Lsn.parse(Db2Lsn(v).render).value == v
    })
    check(Prop.forAll(uint64Gen, uint64Gen) { (a, b) =>
      Db2Lsn(a).render.compare(Db2Lsn(b).render).sign == a.compare(b).sign
    })
    intercept[IllegalArgumentException](Db2Lsn.parse("123"))
  }

  // --- Oracle SCN --------------------------------------------------------

  test("SCN compare replicates RedoLogOffset.compareTo branch for branch") {
    import ScnOffset._
    assert(compare(NoStopping, NoStopping) == 0)
    assert(compare(NoStopping, Initial) > 0 && compare(Initial, NoStopping) < 0)
    // NO_STOPPING outranks even numerically-huge SCNs — sentinel before math
    assert(compare(NoStopping, ScnOffset(Some(BigInt(10).pow(40)))) > 0)
    assert(compare(ScnOffset(None), Initial) < 0)
    assert(compare(Initial, ScnOffset(None)) > 0)
    assert(compare(ScnOffset(None), ScnOffset(None)) == 0)
    check(Prop.forAll(uint64Gen, uint64Gen) { (a, b) =>
      compare(ScnOffset(Some(a)), ScnOffset(Some(b))).sign == a.compare(b).sign
    })
  }

  test("SCN column compare agrees with the model incl. empty and huge SCNs") {
    val s = spark
    import s.implicits._
    val target = BigInt("18446744073709551616") // 2^64: past long range
    val scns = Seq("", "0", "613", target.toString,
      (target + 1).toString, (target - 1).toString)
    val rows = scns.toDF("scn")
      .select(col("scn"), scnCompare(col("scn"), target).as("cmp")).collect()
    rows.zip(scns).foreach { case (r, sc) =>
      val model = ScnOffset.compare(
        ScnOffset(if (sc.isEmpty) None else Some(BigInt(sc))),
        ScnOffset(Some(target)))
      assert(r.getInt(1) == model.sign, s"scn=$sc")
    }
    intercept[IllegalArgumentException](
      scnCompare(lit("1"), BigInt(Long.MinValue)))
  }
}
