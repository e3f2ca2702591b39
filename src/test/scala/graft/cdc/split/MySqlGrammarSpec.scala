package graft.cdc.split

import org.scalatest.funsuite.AnyFunSuite
import graft.cdc.split.ChunkPlanner.{SqlCollation, SqlDialect}

/** Executes the MySQL dialect face against the vendored MySQL grammar
  * (see [[MySqlGrammar]]): every probe/predicate string the planner can
  * emit under `SqlDialect.MySql` must PARSE, across plain, `$`-bearing and
  * backtick-quoted split keys and quote-bearing boundary values — and the
  * ANSI/Postgres faces must be REJECTED by the same parser, proving the
  * grammar is discriminating, not accept-everything. Reference parity
  * target: MySqlConnectorITCase runs these statements on live MySQL; no
  * MySQL engine exists in this sandbox (no mysqld, no H2 jar in the
  * offline cache), so parse-validation against the published grammar is
  * the strongest executable check available here.
  */
class MySqlGrammarSpec extends AnyFunSuite {

  private def accepted(sql: String): Unit =
    MySqlGrammar.parse(sql) match {
      case Right(_) => ()
      case Left(e) => fail(s"MySQL grammar rejected an emitted string: $e")
    }
  private def rejected(sql: String): String =
    MySqlGrammar.parse(sql) match {
      case Left(e) => e
      case Right(_) => fail(s"MySQL grammar accepted a non-MySQL string: [$sql]")
    }

  // split keys a live schema can throw at the planner: plain, $-bearing,
  // and backtick-quoted with an embedded (doubled) backtick and a space
  private val keys = Seq("k", "order_key$2", "`od``d key`")
  private val tables = Seq("t", "inventory.products", "`weird table`")

  test("every MySQL-face probe the planner emits parses under the MySQL grammar") {
    for (t <- tables; k <- keys) {
      accepted(ChunkPlanner.maxKeySql(t, k, SqlDialect.MySql))
      accepted(ChunkPlanner.firstBoundarySql(t, k, 50, SqlDialect.MySql))
      accepted(ChunkPlanner.boundaryProbeSql(t, k, 100, SqlDialect.MySql))
      accepted(ChunkPlanner.minMaxSql(t, k))
      accepted(ChunkPlanner.numericBoundaryProbeSql(t, k, 1000, n => s"LIMIT $n"))
    }
  }

  test("every MySQL-face pushed predicate parses, quote-bearing values included") {
    val ranges = Seq(
      (None, Some("m")), (Some("m"), Some("o'brien")),
      (Some("o'brien"), None), (None, None))
    for (k <- keys) {
      ChunkPlanner.jdbcPredicatesString(k, ranges, SqlCollation.MySqlBinary)
        .foreach(p => accepted(s"SELECT $k FROM t WHERE $p"))
      // and through the parsePredicate face (what spark.read.jdbc embeds)
      ChunkPlanner.jdbcPredicatesString(k, ranges, SqlCollation.MySqlBinary)
        .foreach(p => assert(MySqlGrammar.parsePredicate(p).isRight))
    }
    // numeric predicates share the grammar
    ChunkPlanner.jdbcPredicates("k", Seq((None, Some(5L)), (Some(5L), None)))
      .foreach(p => assert(MySqlGrammar.parsePredicate(p).isRight))
  }

  test("the golden strings pinned in JdbcScanSpec parse verbatim") {
    accepted("SELECT k FROM t WHERE BINARY k > ? ORDER BY BINARY k LIMIT 99, 1")
    accepted("SELECT k FROM t ORDER BY BINARY k DESC LIMIT 1")
    accepted("SELECT k FROM t ORDER BY BINARY k LIMIT 49, 1")
    assert(MySqlGrammar.parsePredicate("BINARY k <= 'm'").isRight)
    assert(MySqlGrammar.parsePredicate("BINARY k > 'm'").isRight)
    assert(MySqlGrammar.parsePredicate("1 = 1").isRight)
  }

  test("negative control: the ANSI/Postgres faces are parse errors in the MySQL grammar") {
    // genuine grammar divergence — MySQL's LIMIT production (§13.2.13) has
    // no OFFSET..ROWS / FETCH alternative, so the ANSI spelling the other
    // dialects execute live (Derby, PostgreSQL 15, DuckDB) must not parse
    rejected(ChunkPlanner.maxKeySql("t", "k", SqlDialect.Ansi))
    rejected(ChunkPlanner.firstBoundarySql("t", "k", 50, SqlDialect.Ansi))
    rejected(ChunkPlanner.boundaryProbeSql("t", "k", 100, SqlDialect.Postgres))
    rejected(ChunkPlanner.maxKeySql("t", "k", SqlDialect.Postgres))
    // the Postgres collation face: COLLATE is outside the emitted-MySQL
    // subset this parser implements (MySQL's own COLLATE production would
    // tokenize "C" as a STRING under default sql_mode), so the subset
    // parser rejects it — subset-incompleteness rejection, documented as
    // distinct from the true grammar divergence above
    rejected("""SELECT k FROM t WHERE k COLLATE "C" > 'm' LIMIT 1""")
    // malformed inputs don't slip through the tokenizer
    rejected("SELECT k FROM t WHERE k > 'unterminated")
    rejected("SELECT k FROM t LIMIT 1, 2, 3")
    rejected("SELECT k FROM (SELECT k FROM t)") // derived table needs alias
  }
}
