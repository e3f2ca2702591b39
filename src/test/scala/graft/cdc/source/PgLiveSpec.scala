package graft.cdc.source

import graft.SparkTestBase
import graft.cdc.model.RowImage
import graft.cdc.split.{ChunkPlanner, KeyedChunkPlanner}
import graft.cdc.split.ChunkPlanner.{SqlCollation, SqlDialect}
import graft.cdc.types.DialectWire
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The two faces this engine points at PostgreSQL, executed against a REAL
  * PostgreSQL 15 server (reference parity: PostgreSQLConnectorITCase runs
  * against a live postgres container):
  *
  *   1. the chunk splitter's Postgres dialect SQL — `COLLATE "C"` probes,
  *      boundary OFFSET/FETCH, pushed range predicates — planned live
  *      through the server's own parser and C collation, asserted equal to
  *      the Spark-side planner, with an ICU-collation negative control
  *      showing the contract is load-bearing;
  *   2. the logical-decoding CDC path — a replication slot served by
  *      contrib's `test_decoding` plugin, multi-transaction DML with
  *      quotes, NULLs, TOASTed values, and a key-changing UPDATE — decoded
  *      by [[DialectWire.decodeTestDecoding]] and LWW-materialized to
  *      exactly the table state the server itself reports, idempotent
  *      under replayed (peeked + consumed) change batches.
  */
class PgLiveSpec extends SparkTestBase {

  private val keys: Seq[String] =
    (0 until 519).map { i =>
      val c = if (i % 2 == 0) ('A' + i % 26).toChar else ('a' + i % 26).toChar
      f"$c%c$i%04d"
    } :+ "o'brien"

  test("Postgres dialect face live on PostgreSQL 15: probes, predicates, and the ICU negative control") {
    assume(PgLive.available, "no runnable PostgreSQL server in this environment")
    PgLive.withServer { h =>
      h.sql("CREATE TABLE t (k VARCHAR)")
      val values = keys.map(k => s"('${k.replace("'", "''")}')").mkString(", ")
      h.sql(s"INSERT INTO t VALUES $values")

      val ranges = ChunkPlanner.unevenChunkRangesJdbcString(
        "ignored", "t", "k", chunkSize = 64, SqlDialect.Postgres,
        connect = Some(_ => PgLive.connection(h)))
      assert(ranges.length == (keys.length + 63) / 64)

      val s = spark
      import s.implicits._
      val sparkRanges = KeyedChunkPlanner
        .unevenChunkRangesIterative(keys.toDF("k"), Seq("k"), 64)
        .map { case (lo, hi) =>
          (lo.map(_.head.asInstanceOf[String]), hi.map(_.head.asInstanceOf[String]))
        }
      assert(ranges == sparkRanges,
        s"PostgreSQL and Spark planners disagree:\n$ranges\nvs\n$sparkRanges")

      // pushed predicates under the same face partition the table exactly
      // once, quoted key included
      val preds = ChunkPlanner.jdbcPredicatesString("k", ranges, SqlCollation.PostgresC)
      val got = preds.flatMap(p =>
        h.sql(s"SELECT k FROM t WHERE $p").map(_.head.get))
      assert(got.length == keys.length, "chunks overlap or drop rows")
      assert(got.toSet == keys.toSet)

      // negative control: a linguistic ICU collation interleaves the case
      // runs the C face keeps apart, so its live-probed boundaries must NOT
      // be the Spark planner's
      val icu = SqlDialect(
        SqlCollation.Custom(k => s"""$k COLLATE "en-x-icu""""),
        ChunkPlanner.SqlLimit.Ansi)
      val wrong = ChunkPlanner.unevenChunkRangesJdbcString(
        "ignored", "t", "k", chunkSize = 64, icu,
        connect = Some(_ => PgLive.connection(h)))
      assert(wrong != sparkRanges,
        "ICU probing unexpectedly matched codepoint boundaries — fixture too weak")
    }
  }

  test("table discovery live on PostgreSQL: catalog listing + capture regex, re-run sees new tables") {
    assume(PgLive.available, "no runnable PostgreSQL server in this environment")
    PgLive.withServer { h =>
      h.sql("CREATE TABLE users_0 (id INT)")
      h.sql("CREATE TABLE users_1 (id INT)")
      h.sql("CREATE TABLE audit_log (id INT)")
      h.sql("CREATE VIEW users_v AS SELECT * FROM users_0") // views are not capturable
      val all = Discovery.listTables("ignored", "public",
        connect = Some(_ => PgLive.connection(h)))
      assert(all == Seq(("public", "audit_log"), ("public", "users_0"),
        ("public", "users_1")))
      val cap = Discovery.captured(all, Some("^public\\.users_[01]$"))
      assert(cap.map(_._2) == Seq("users_0", "users_1"))
      // the T8 flow's discovery half: a table added later is seen by the
      // same pass with a widened capture list
      h.sql("CREATE TABLE users_2 (id INT)")
      val again = Discovery.captured(
        Discovery.listTables("ignored", "public",
          connect = Some(_ => PgLive.connection(h))),
        Some("^public\\.users_[0-9]+$"))
      assert(again.map(_._2) == Seq("users_0", "users_1", "users_2"))
    }
  }

  private val cdcTable = RowImage.DeclaredTable(
    "cdc_t",
    StructType(Seq(
      StructField("id", IntegerType),
      StructField("name", StringType),
      StructField("amt", DecimalType(10, 2)),
      StructField("flag", BooleanType),
      StructField("born", DateType),
      StructField("seen", TimestampType),
      StructField("blob", BinaryType))),
    pkCols = Seq("id"))

  test("CDC end-to-end from live PostgreSQL: logical decoding in, the server's own table state out") {
    assume(PgLive.available, "no runnable PostgreSQL server in this environment")
    PgLive.withServer { h =>
      h.sql("""CREATE TABLE cdc_t (
        id INT PRIMARY KEY, name TEXT, amt NUMERIC(10,2), flag BOOLEAN,
        born DATE, seen TIMESTAMP, blob BYTEA)""")
      h.sql("ALTER TABLE cdc_t REPLICA IDENTITY FULL")
      h.sql("SELECT pg_create_logical_replication_slot('graft', 'test_decoding')")

      // txn 1: inserts — quotes, a value embedding the grammar's own
      // marker text, NULLs, every declared type
      h.sql("""BEGIN;
        INSERT INTO cdc_t VALUES
          (1, 'alice', 10.50, true, '2024-01-05', '2024-01-02 03:04:05.123456', '\x00ff10'),
          (2, e'o''brien new-tuple: id[integer]:9', 0.01, false, NULL, NULL, NULL),
          (3, NULL, NULL, NULL, '2024-02-29', '2024-02-29 23:59:59.999999', '\xdeadbeef'),
          (4, 'null', 4.00, true, '2024-03-01', '2024-03-01 00:00:00.000001', '\x');
        COMMIT;""")
      // txn 2: a TOASTed value (incompressible, so it actually toasts)
      h.sql("""INSERT INTO cdc_t
        SELECT 5, string_agg(md5(g::text), ''), 5.55, false,
               '2024-04-01', '2024-04-01 01:02:03.000004', '\x0b'
        FROM generate_series(1, 300) g""")
      // txn 3: updates — quote-bearing new value, null-out, and an UPDATE
      // not touching the TOASTed column (new tuple says
      // unchanged-toast-datum; the decoder must carry the old value)
      h.sql("""BEGIN;
        UPDATE cdc_t SET name = 'a''b c', amt = 99.99 WHERE id = 1;
        UPDATE cdc_t SET amt = NULL, flag = NOT flag WHERE id = 2;
        UPDATE cdc_t SET amt = 6.66 WHERE id = 5;
        COMMIT;""")
      // txn 4: delete, then reuse the key (LWW order by lsn must keep the
      // reinserted row)
      h.sql("BEGIN; DELETE FROM cdc_t WHERE id = 3; COMMIT;")
      h.sql("""INSERT INTO cdc_t VALUES (3, 'reborn', 3.33, true, '2024-05-05', '2024-05-05 05:05:05.000005', '\x33')""")
      // txn 5: a key-changing UPDATE — one wire record, two state
      // transitions (4 dies, 40 is born)
      h.sql("UPDATE cdc_t SET id = 40, name = 'moved' WHERE id = 4")

      // replay-then-consume: peek does not advance the slot, so the union
      // contains every change TWICE under identical lsns — the offset-keyed
      // LWW materialization must be idempotent across the duplication
      val changesSql = "SELECT lsn::text, xid::text::bigint, data FROM %s('graft', NULL, NULL, 'include-timestamp', 'on')"
      val peeked = h.sql(changesSql.format("pg_logical_slot_peek_changes"))
      val gotten = h.sql(changesSql.format("pg_logical_slot_get_changes"))
      assert(peeked == gotten, "peek and get disagree on the change stream")

      val s = spark
      import s.implicits._
      def toDf(rows: Seq[Seq[Option[String]]]) =
        rows.map(r => (r(0).get, r(1).get.toLong, r(2).get))
          .toDF("lsn", "xid", "data")
      val lines = toDf(peeked).unionByName(toDf(gotten))

      val ir = DialectWire.decodeTestDecoding(lines, cdcTable)

      // commit timestamps joined onto every row, non-decreasing in offset
      val tsRows = ir.orderBy(col("offset"))
        .select(col("ts_ms")).collect().map(_.getLong(0))
      assert(tsRows.length == 24, s"expected 24 IR rows (11 changes x2 replay, pk-update split to d+c), got ${tsRows.length}")
      assert(tsRows.sameElements(tsRows.sorted), "commit timestamps regressed against lsn order")

      val state = RowImage.upsertMaterialize(ir, cdcTable)
        .select(col("id"), col("name"),
          col("amt").cast("string").as("amt"),
          col("flag").cast("string").as("flag"),
          col("born").cast("string").as("born"),
          date_format(col("seen"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("seen"),
          lower(hex(col("blob"))).as("blob"))
        .orderBy(col("id"))
        .collect()
        .map(r => (0 until 7).map(i => Option(r.get(i)).map(_.toString)))

      val expected = h.sql("""SELECT id, name, amt::text, flag::text, born::text,
          to_char(seen, 'YYYY-MM-DD HH24:MI:SS.US'), encode(blob, 'hex')
        FROM cdc_t ORDER BY id""")

      assert(state.length == expected.length,
        s"row counts differ: spark=${state.length} pg=${expected.length}")
      state.zip(expected).foreach { case (a, e) =>
        assert(a == e, s"materialized row differs from the server's:\n$a\nvs\n$e")
      }

      // the TOAST carry is load-bearing: id=5's name survived an UPDATE
      // whose new tuple only said unchanged-toast-datum
      val toasted = state.find(_.head.contains("5")).get
      assert(toasted(1).get.length == 300 * 32)
    }
  }

  test("default replica identity live: unchanged TOAST yields the placeholder and the carry-aware merge matches the server") {
    assume(PgLive.available, "no runnable PostgreSQL server in this environment")
    PgLive.withServer { h =>
      // NO "REPLICA IDENTITY FULL": updates carry no before image, so an
      // untouched TOASTed datum is genuinely absent from the WAL — the
      // decode must surface DialectWire.UnavailableValue (never NULL) and
      // the carry-aware materialization must recover the stored value from
      // the key's earlier records
      h.sql("CREATE TABLE toast_t (id INT PRIMARY KEY, body TEXT, n INT)")
      h.sql("SELECT pg_create_logical_replication_slot('graft_toast', 'test_decoding')")
      h.sql("""INSERT INTO toast_t
        SELECT 1, string_agg(md5(g::text), ''), 10 FROM generate_series(1, 300) g""")
      h.sql("UPDATE toast_t SET n = 20 WHERE id = 1")

      val changes = h.sql("SELECT lsn::text, xid::text::bigint, data FROM " +
        "pg_logical_slot_get_changes('graft_toast', NULL, NULL, 'include-timestamp', 'on')")
      val s = spark
      import s.implicits._
      val lines = changes.map(r => (r(0).get, r(1).get.toLong, r(2).get))
        .toDF("lsn", "xid", "data")
      val tt = RowImage.DeclaredTable(
        "toast_t",
        StructType(Seq(
          StructField("id", IntegerType),
          StructField("body", StringType),
          StructField("n", IntegerType))),
        pkCols = Seq("id"))
      val ir = DialectWire.decodeTestDecoding(lines, tt)

      // the wire really said unchanged-toast-datum with no old-key section
      val u = ir.where(col("op") === "u").select(col("before"), col("after.body")).head
      assert(u.isNullAt(0), "default replica identity must produce no before image")
      assert(u.getString(1) == DialectWire.UnavailableValue)

      val got = RowImage.upsertMaterialize(ir, tt, carryUnavailable = true)
        .select(col("id").cast("string"), col("body"), col("n").cast("string"))
        .collect().map(r => (0 until 3).map(i => Option(r.get(i)).map(_.toString)))
      val want = h.sql("SELECT id, body, n FROM toast_t ORDER BY id")
      assert(got.length == 1 && got.head == want.head,
        s"carry-aware merge diverged from the server's table state")
    }
  }
}
