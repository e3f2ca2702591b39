package graft.cdc.split

import graft.SparkTestBase
import graft.cdc.split.ChunkPlanner.{SqlCollation, SqlDialect}

import scala.jdk.OptionConverters._

/** The Postgres dialect face EXECUTED by an engine that parses it. DuckDB's
  * SQL parser is derived from PostgreSQL's grammar and accepts the exact
  * spellings the planner pushes — `k COLLATE "C"` in ORDER BY and WHERE,
  * ANSI `OFFSET n ROWS FETCH NEXT 1 ROWS ONLY` — with codepoint comparison
  * semantics for the "C" collation, so every pinned probe and pushed
  * predicate string runs live here instead of being string-compared only
  * (reference parity: MySqlConnectorITCase runs the MySQL face against live
  * MySQL). The driver jar is discovered in the local artifact cache by
  * filename and loaded reflectively; the suite cancels (not fails) when the
  * jar is absent so the build stays environment-independent.
  */
class DialectLiveSpec extends SparkTestBase {

  private lazy val duckJar: Option[java.nio.file.Path] = {
    val root = java.nio.file.Paths.get(sys.props("user.home"), ".cache", "coursier")
    if (!java.nio.file.Files.isDirectory(root)) None
    else {
      val s = java.nio.file.Files.walk(root)
      try s.filter(p => p.getFileName.toString.matches("duckdb_jdbc-.*\\.jar"))
        .findFirst().toScala
      finally s.close()
    }
  }

  /** The DuckDB driver from outside the app classloader: DriverManager
    * refuses drivers the caller's classloader cannot see, so connections go
    * through the planner's `connect` injection point instead.
    */
  private lazy val duckDriver: Option[java.sql.Driver] = duckJar.map { jar =>
    val cl = new java.net.URLClassLoader(Array(jar.toUri.toURL), getClass.getClassLoader)
    Class.forName("org.duckdb.DuckDBDriver", true, cl)
      .getDeclaredConstructor().newInstance().asInstanceOf[java.sql.Driver]
  }

  private def connector(d: java.sql.Driver): String => java.sql.Connection =
    u => d.connect(u, new java.util.Properties())

  /** Case-mixed VARCHAR keys whose case-insensitive order differs from
    * codepoint order (every uppercase-prefixed key binary-sorts before every
    * lowercase-prefixed one), plus a quote-bearing key so predicate escaping
    * executes live too.
    */
  private val keys: Seq[String] =
    (0 until 519).map { i =>
      val c = if (i % 2 == 0) ('A' + i % 26).toChar else ('a' + i % 26).toChar
      f"$c%c$i%04d"
    } :+ "o'brien"

  test("""Postgres face live on DuckDB: COLLATE "C" probes plan the Spark planner's chunks""") {
    assume(duckDriver.nonEmpty, "duckdb_jdbc jar not present in the local artifact cache")
    val d = duckDriver.get
    val dbDir = java.nio.file.Files.createTempDirectory("duckdb_dialect")
    val url = s"jdbc:duckdb:$dbDir/dialect.db"

    val seed = connector(d)(url)
    try {
      val st = seed.createStatement()
      try st.executeUpdate("CREATE TABLE t (k VARCHAR)") finally st.close()
      val ins = seed.prepareStatement("INSERT INTO t VALUES (?)")
      try {
        keys.foreach { k => ins.setString(1, k); ins.addBatch() }
        ins.executeBatch()
      } finally ins.close()
    } finally seed.close()

    // the probe loop runs the pinned Postgres SQL against DuckDB's parser
    val ranges = ChunkPlanner.unevenChunkRangesJdbcString(
      url, "t", "k", chunkSize = 64, SqlDialect.Postgres,
      connect = Some(connector(d)))
    assert(ranges.length == (keys.length + 63) / 64, s"ranges=$ranges")

    // DB-probed boundaries ARE the Spark-side planner's boundaries — the
    // collation contract, now proven against a parsing engine
    val s = spark
    import s.implicits._
    val sparkRanges = KeyedChunkPlanner
      .unevenChunkRangesIterative(keys.toDF("k"), Seq("k"), 64)
      .map { case (lo, hi) =>
        (lo.map(_.head.asInstanceOf[String]), hi.map(_.head.asInstanceOf[String]))
      }
    assert(ranges == sparkRanges,
      s"DuckDB and Spark planners disagree:\n$ranges\nvs\n$sparkRanges")

    // the Ansi face (no collation cast — DuckDB's default IS codepoint)
    // plans the identical chunks through its own limit spelling
    val ansiRanges = ChunkPlanner.unevenChunkRangesJdbcString(
      url, "t", "k", chunkSize = 64, SqlDialect.Ansi,
      connect = Some(connector(d)))
    assert(ansiRanges == ranges)

    // pushed range predicates under the SAME collation face execute live
    // and partition the table exactly once (disjoint exact cover), with
    // the quoted key surviving the escape
    val preds = ChunkPlanner.jdbcPredicatesString("k", ranges, SqlCollation.PostgresC)
    val conn = connector(d)(url)
    val got = scala.collection.mutable.ArrayBuffer.empty[String]
    try preds.foreach { p =>
      val st = conn.prepareStatement(s"SELECT k FROM t WHERE $p")
      try {
        val rs = st.executeQuery()
        while (rs.next()) got += rs.getString(1)
        rs.close()
      } finally st.close()
    } finally conn.close()
    assert(got.length == keys.length, "chunks overlap or drop rows")
    assert(got.toSet == keys.toSet)
  }

  test("the dialect contract is load-bearing: a case-folding order breaks the cover the C face keeps") {
    assume(duckDriver.nonEmpty, "duckdb_jdbc jar not present in the local artifact cache")
    val d = duckDriver.get
    val dbDir = java.nio.file.Files.createTempDirectory("duckdb_dialect_neg")
    val url = s"jdbc:duckdb:$dbDir/dialect.db"
    val seed = connector(d)(url)
    try {
      val st = seed.createStatement()
      try st.executeUpdate("CREATE TABLE t (k VARCHAR)") finally st.close()
      val ins = seed.prepareStatement("INSERT INTO t VALUES (?)")
      try {
        keys.foreach { k => ins.setString(1, k); ins.addBatch() }
        ins.executeBatch()
      } finally ins.close()
    } finally seed.close()

    // probe with a WRONG face — DuckDB's NOCASE collation (a stand-in for
    // a ci column collation): the DB orders case-insensitively while the
    // planner's stop rule and the Spark scan compare by codepoint, so the
    // planned boundaries must NOT match the Spark planner's
    val noCase = SqlDialect(
      SqlCollation.Custom(k => s"$k COLLATE NOCASE"), ChunkPlanner.SqlLimit.Ansi)
    val wrong = ChunkPlanner.unevenChunkRangesJdbcString(
      url, "t", "k", chunkSize = 64, noCase, connect = Some(connector(d)))
    val s = spark
    import s.implicits._
    val sparkRanges = KeyedChunkPlanner
      .unevenChunkRangesIterative(keys.toDF("k"), Seq("k"), 64)
      .map { case (lo, hi) =>
        (lo.map(_.head.asInstanceOf[String]), hi.map(_.head.asInstanceOf[String]))
      }
    assert(wrong != sparkRanges,
      "NOCASE probing unexpectedly matched codepoint boundaries — fixture too weak")
  }
}
