package graft.cdc.source

import graft.SparkTestBase
import graft.cdc.model.RowImage
import graft.cdc.types.DialectWire
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Unavailable-value semantics for TOASTed columns under DEFAULT replica
  * identity (no before image in the WAL): the decoder must emit the
  * [[DialectWire.UnavailableValue]] placeholder — never NULL, which a
  * materializer would read as "set to NULL" and use to clobber the stored
  * value — and the placeholder-aware LWW materialization must carry the
  * latest actually-present value forward. Mirrors the reference's Debezium
  * `unavailable.value.placeholder` contract
  * (PostgresConnectorConfig#UNAVAILABLE_VALUE_PLACEHOLDER). The live-server
  * leg of the same story runs in PgLiveSpec (REPLICA IDENTITY FULL carry);
  * this spec pins the no-before-image half the fixture server doesn't
  * default to.
  */
class PgToastSpec extends SparkTestBase {

  private val t = RowImage.DeclaredTable(
    "tt",
    StructType(Seq(
      StructField("id", LongType),
      StructField("body", StringType),
      StructField("blob", BinaryType),
      StructField("amt", DecimalType(10, 2)))),
    pkCols = Seq("id"))

  private def df(rows: Seq[(String, Long, String)]): DataFrame = {
    val s = spark; import s.implicits._
    rows.toDF("lsn", "xid", "data")
  }

  // default replica identity: UPDATEs carry NO old-key section
  private val base = Seq(
    ("0/101", 1L, "table public.tt: INSERT: id[bigint]:1 body[text]:'big payload' blob[bytea]:'\\x0102' amt[numeric]:1.00"),
    ("0/102", 1L, "COMMIT 1 (at 2024-01-01 00:00:01+00)"),
    // unchanged TOAST on body AND blob, amt actually updated
    ("0/201", 2L, "table public.tt: UPDATE: id[bigint]:1 body[text]:unchanged-toast-datum blob[bytea]:unchanged-toast-datum amt[numeric]:2.00"),
    ("0/202", 2L, "COMMIT 2 (at 2024-01-01 00:00:02+00)"))

  test("no-before-image unchanged TOAST decodes to the placeholder, not NULL") {
    val ir = DialectWire.decodeTestDecoding(df(base), t)
    val u = ir.where(col("op") === "u").select(
      col("after.body"), col("after.blob").cast(StringType), col("after.amt").cast(StringType)).head
    assert(u.getString(0) == DialectWire.UnavailableValue)
    assert(u.getString(1) == DialectWire.UnavailableValue)
    assert(u.getString(2) == "2.00")
  }

  test("carry-aware materialization keeps the stored value under the placeholder") {
    val ir = DialectWire.decodeTestDecoding(df(base), t)
    val st = RowImage.upsertMaterialize(ir, t, carryUnavailable = true)
      .select(col("body"), col("blob").cast(StringType), col("amt").cast(StringType)).head
    assert(st.getString(0) == "big payload")
    assert(st.getString(1) == "")
    assert(st.getString(2) == "2.00")
    // the default (non-carrying) materialization would surface the
    // placeholder itself — still never NULL
    val raw = RowImage.upsertMaterialize(ir, t).select(col("body")).head.getString(0)
    assert(raw == DialectWire.UnavailableValue)
  }

  test("an explicit later NULL wins over the carry (NULL is a present value)") {
    val rows = base ++ Seq(
      ("0/301", 3L, "table public.tt: UPDATE: id[bigint]:1 body[text]:null blob[bytea]:'\\x03' amt[numeric]:3.00"),
      ("0/302", 3L, "COMMIT 3 (at 2024-01-01 00:00:03+00)"),
      ("0/401", 4L, "table public.tt: UPDATE: id[bigint]:1 body[text]:unchanged-toast-datum blob[bytea]:unchanged-toast-datum amt[numeric]:4.00"),
      ("0/402", 4L, "COMMIT 4 (at 2024-01-01 00:00:04+00)"))
    val ir = DialectWire.decodeTestDecoding(df(rows), t)
    val st = RowImage.upsertMaterialize(ir, t, carryUnavailable = true)
      .select(col("body"), col("blob").cast(StringType)).head
    assert(st.isNullAt(0), "txn 3 set body to SQL NULL; the carry must not resurrect it")
    assert(st.getString(1) == "")
  }

  test("a key whose visible history is all placeholders keeps the placeholder") {
    // stream started mid-life: the first visible record already lacks the value
    val rows = Seq(
      ("0/201", 2L, "table public.tt: UPDATE: id[bigint]:7 body[text]:unchanged-toast-datum blob[bytea]:'\\x05' amt[numeric]:2.00"),
      ("0/202", 2L, "COMMIT 2 (at 2024-01-01 00:00:02+00)"))
    val ir = DialectWire.decodeTestDecoding(df(rows), t)
    val st = RowImage.upsertMaterialize(ir, t, carryUnavailable = true)
      .select(col("body")).head
    assert(st.getString(0) == DialectWire.UnavailableValue)
  }

  test("unchanged TOAST on a non-string column with no before image fails loudly") {
    val rows = Seq(
      ("0/201", 2L, "table public.tt: UPDATE: id[bigint]:1 body[text]:'x' blob[bytea]:'\\x01' amt[numeric]:unchanged-toast-datum"),
      ("0/202", 2L, "COMMIT 2 (at 2024-01-01 00:00:02+00)"))
    val ir = DialectWire.decodeTestDecoding(df(rows), t)
    val e = intercept[Exception] { ir.collect() }
    def messages(x: Throwable): Seq[String] =
      Option(x).toSeq.flatMap(t => Option(t.getMessage).toSeq ++ messages(t.getCause))
    assert(messages(e).exists(_.contains("REPLICA IDENTITY FULL")), s"got: $e")
  }

  test("REPLICA IDENTITY FULL updates still inherit the before image (no placeholder)") {
    val rows = Seq(
      ("0/201", 2L, "table public.tt: UPDATE: old-key: id[bigint]:1 body[text]:'prior' blob[bytea]:'\\x01' amt[numeric]:1.00 new-tuple: id[bigint]:1 body[text]:unchanged-toast-datum blob[bytea]:unchanged-toast-datum amt[numeric]:2.00"),
      ("0/202", 2L, "COMMIT 2 (at 2024-01-01 00:00:02+00)"))
    val ir = DialectWire.decodeTestDecoding(df(rows), t)
    val u = ir.where(col("op") === "u")
      .select(col("after.body"), col("after.blob").cast(StringType)).head
    assert(u.getString(0) == "prior")
    assert(u.getString(1) == "")
  }

  test("a 'table ' line the header grammar cannot parse fails loudly, not silently") {
    // two drift forms: a ':' in the name breaks the header regex (empty
    // groups); a quoted identifier extracts WITH its quotes (never equal to
    // a declared name) — both must raise, not silently drop
    for (bad <- Seq(
        "table public.odd:name: INSERT: id[bigint]:1",
        "table \"public\".\"odd name\": INSERT: id[bigint]:1")) {
      val rows = Seq(
        ("0/201", 2L, bad),
        ("0/202", 2L, "COMMIT 2 (at 2024-01-01 00:00:02+00)"))
      val ir = DialectWire.decodeTestDecoding(df(rows), t)
      val e = intercept[Exception] { ir.collect() }
      def messages(x: Throwable): Seq[String] =
        Option(x).toSeq.flatMap(t => Option(t.getMessage).toSeq ++ messages(t.getCause))
      assert(messages(e).exists(_.contains("unparseable test_decoding")), s"got: $e")
    }
  }
}
