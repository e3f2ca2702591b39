package graft.cdc.split

/** A vendored parse-only validator for the MySQL SELECT grammar SUBSET the
  * chunk planner emits — written against the PUBLISHED grammar (MySQL 8.0
  * Reference Manual: §13.2.13 "SELECT Statement" for the
  * `LIMIT {[offset,] row_count | row_count OFFSET offset}` production and
  * the absence of ANSI `OFFSET ... ROWS` / `FETCH`; §12.11 "Cast Functions"
  * for the unary `BINARY expr` operator; the "COLLATE Clause" section for
  * the postfix `expr COLLATE collation_name` (collation_name an
  * identifier, never a string literal); §9.1.3.3 "Character Set
  * Introducers" for `_charset 'str'` / `_binary X'4D'`; §9.1.1.2/§9.1.1.3
  * hex (`X'1A'`, `0x1A`) and bit (`B'01'`) literals; §9.2 identifiers
  * incl. backtick quoting with doubled backticks; §9.1.1 string literals
  * with doubled single quotes; default sql_mode where a DOUBLE-quoted
  * token is a string literal, not an identifier).
  *
  * No MySQL server or MySQL-grammar engine exists in this sandbox, so the
  * emitted probe/predicate strings (ChunkPlanner's SqlDialect.MySql face)
  * cannot be executed; this parser is the strongest available substitute: a
  * faithful implementation of the relevant productions that must ACCEPT
  * every emitted string and — as the negative control proving the grammar
  * is discriminating — REJECT the ANSI/Postgres faces, whose
  * `OFFSET n ROWS FETCH NEXT 1 ROWS ONLY` spelling is a genuine parse
  * error in MySQL (the manual's LIMIT production has no ROWS/FETCH
  * alternative).
  *
  * Parse-only by design: names, collations and types are not resolved
  * (that is the server's semantic layer, out of scope for grammar
  * validation).
  */
object MySqlGrammar {

  sealed trait Tok
  private case class Kw(s: String) extends Tok // upper-cased reserved word
  private case class Ident(s: String) extends Tok // plain or `quoted`
  private case class Str(s: String) extends Tok // '...' or "..." (default mode)
  private case class Num(s: String) extends Tok
  // hex/bit literals are DISTINCT token kinds: legal as expression
  // primaries and charset-introducer bodies, but NOT where the grammar
  // requires an integer constant (LIMIT/OFFSET reject X'4D' in MySQL)
  private case class HexLit(s: String) extends Tok
  private case class BitLit(s: String) extends Tok
  private case class Sym(s: String) extends Tok // operators & punctuation
  private case object End extends Tok

  /** Reserved words this subset distinguishes from identifiers (MySQL 8.0
    * §9.3 keywords — all of these are reserved in MySQL).
    */
  private val keywords = Set(
    "SELECT", "FROM", "WHERE", "ORDER", "BY", "ASC", "DESC", "LIMIT",
    "OFFSET", "AND", "OR", "NOT", "BINARY", "AS", "COLLATE", "FETCH",
    "ROWS", "ROW", "NEXT", "FIRST", "ONLY", "UNION", "ALL", "DISTINCT",
    "IS", "NULL", "BETWEEN", "IN", "LIKE")

  final case class ParseError(msg: String) extends Exception(msg)

  private def tokenize(sql: String): Either[String, Vector[Tok]] = {
    val out = Vector.newBuilder[Tok]
    var i = 0
    val n = sql.length
    def err(m: String): Either[String, Vector[Tok]] = Left(s"$m at position $i in [$sql]")
    while (i < n) {
      val c = sql.charAt(i)
      if (c.isWhitespace) i += 1
      else if (c == '\'' || c == '"') {
        // string literal; embedded quotes escaped by doubling (§9.1.1).
        // Double quotes are STRING literals under default sql_mode (no
        // ANSI_QUOTES) — this is exactly why `COLLATE "C"` is not an
        // identifier in MySQL.
        val q = c
        val sb = new StringBuilder
        i += 1
        var closed = false
        while (i < n && !closed) {
          val ch = sql.charAt(i)
          if (ch == q) {
            if (i + 1 < n && sql.charAt(i + 1) == q) { sb.append(q); i += 2 }
            else { closed = true; i += 1 }
          } else { sb.append(ch); i += 1 }
        }
        if (!closed) return err("unterminated string literal")
        out += Str(sb.toString)
      } else if (c == '`') {
        // backtick-quoted identifier, doubled backtick escape (§9.2)
        val sb = new StringBuilder
        i += 1
        var closed = false
        while (i < n && !closed) {
          val ch = sql.charAt(i)
          if (ch == '`') {
            if (i + 1 < n && sql.charAt(i + 1) == '`') { sb.append('`'); i += 2 }
            else { closed = true; i += 1 }
          } else { sb.append(ch); i += 1 }
        }
        if (!closed) return err("unterminated quoted identifier")
        if (sb.isEmpty) return err("empty quoted identifier")
        out += Ident(sb.toString)
      } else if ((c == 'X' || c == 'x' || c == 'B' || c == 'b')
          && i + 1 < n && sql.charAt(i + 1) == '\'') {
        // hex literal X'1AF' / bit literal B'01' (§9.1.1.2/§9.1.1.3) —
        // quoted digit body, NO doubling escape (the body has no quotes)
        val isHex = c == 'X' || c == 'x'
        val start = i
        i += 2
        while (i < n && sql.charAt(i) != '\'') i += 1
        if (i >= n) return err("unterminated hex/bit literal")
        val body = sql.substring(start + 2, i)
        i += 1
        val ok = body.nonEmpty && (
          if (isHex) body.forall(ch => ch.isDigit || ('a' <= ch.toLower && ch.toLower <= 'f'))
          else body.forall(ch => ch == '0' || ch == '1'))
        if (!ok) return err(s"malformed ${if (isHex) "hex" else "bit"} literal body [$body]")
        out += (if (isHex) HexLit(sql.substring(start, i))
                else BitLit(sql.substring(start, i)))
      } else if (c == '0' && i + 1 < n
          && (sql.charAt(i + 1) == 'x' || sql.charAt(i + 1) == 'X')) {
        // 0x1AF hex literal form (§9.1.1.2)
        val start = i
        i += 2
        while (i < n && (sql.charAt(i).isDigit
          || ('a' <= sql.charAt(i).toLower && sql.charAt(i).toLower <= 'f'))) i += 1
        if (i == start + 2) return err("malformed 0x hex literal")
        out += HexLit(sql.substring(start, i))
      } else if (c.isDigit) {
        val start = i
        while (i < n && (sql.charAt(i).isDigit || sql.charAt(i) == '.')) i += 1
        out += Num(sql.substring(start, i))
      } else if (c.isLetter || c == '_' || c == '$') {
        val start = i
        while (i < n && (sql.charAt(i).isLetterOrDigit || sql.charAt(i) == '_' || sql.charAt(i) == '$')) i += 1
        val w = sql.substring(start, i)
        val up = w.toUpperCase(java.util.Locale.ROOT)
        out += (if (keywords.contains(up)) Kw(up) else Ident(w))
      } else {
        val two = if (i + 1 < n) sql.substring(i, i + 2) else ""
        if (Set(">=", "<=", "<>", "!=").contains(two)) { out += Sym(two); i += 2 }
        else if ("><=?,().*".indexOf(c) >= 0) { out += Sym(c.toString); i += 1 }
        else return err(s"unexpected character '$c'")
      }
    }
    out += End
    Right(out.result())
  }

  private final class P(toks: Vector[Tok], sql: String) {
    private var pos = 0
    def peek: Tok = toks(pos)
    def peek2: Tok = if (pos + 1 < toks.length) toks(pos + 1) else End
    def next(): Tok = { val t = toks(pos); pos += 1; t }
    def fail(m: String): Nothing =
      throw ParseError(s"$m (at token ${toks(pos)}) in [$sql]")
    def expectKw(k: String): Unit = next() match {
      case Kw(`k`) => ()
      case t => fail(s"expected $k, got $t")
    }
    def expectSym(s: String): Unit = next() match {
      case Sym(`s`) => ()
      case t => fail(s"expected '$s', got $t")
    }
    def atKw(k: String): Boolean = peek == Kw(k)
    def eatKw(k: String): Boolean = if (atKw(k)) { pos += 1; true } else false
    def eatSym(s: String): Boolean = if (peek == Sym(s)) { pos += 1; true } else false

    // query_expression := query_spec (no UNION in the subset)
    def query(): Unit = {
      expectKw("SELECT")
      selectItem()
      while (eatSym(",")) selectItem()
      expectKw("FROM")
      tableRef()
      if (eatKw("WHERE")) expr()
      if (eatKw("ORDER")) {
        expectKw("BY")
        orderItem()
        while (eatSym(",")) orderItem()
      }
      // §13.2.13: LIMIT {[offset,] row_count | row_count OFFSET offset}.
      // This production is the whole point: MySQL has NO `OFFSET n ROWS`
      // and NO `FETCH` — those are ANSI/PostgreSQL grammar.
      if (eatKw("LIMIT")) {
        number()
        if (eatSym(",")) number()
        else if (eatKw("OFFSET")) number()
      }
    }

    // LIMIT/OFFSET operands: §13.2.13 requires a nonnegative INTEGER
    // constant (or a placeholder) — hex/bit literals and decimals are
    // parse errors in real MySQL here, so they are rejected, not Num'd
    private def number(): Unit = next() match {
      case Num(d) if d.forall(_.isDigit) => ()
      case Sym("?") => () // prepared-statement placeholder is legal here in 8.0
      case t => fail(s"expected integer, got $t")
    }

    private def selectItem(): Unit = {
      if (eatSym("*")) return
      expr()
      if (eatKw("AS")) identifier()
      else peek match { case Ident(_) => identifier() case _ => () }
    }

    private def tableRef(): Unit = {
      if (eatSym("(")) { // derived table: MUST carry an alias (§13.2.11.8)
        query()
        expectSym(")")
        eatKw("AS")
        peek match {
          case Ident(_) => identifier()
          case t => fail(s"derived table requires an alias, got $t")
        }
      } else {
        qualifiedIdent()
        if (eatKw("AS")) identifier()
        else peek match { case Ident(_) => identifier() case _ => () }
      }
    }

    private def orderItem(): Unit = {
      expr()
      if (eatKw("ASC") || eatKw("DESC")) ()
    }

    // expr := and_expr { OR and_expr } ; and_expr := cmp { AND cmp }
    def expr(): Unit = { andExpr(); while (eatKw("OR")) andExpr() }
    private def andExpr(): Unit = { cmpExpr(); while (eatKw("AND")) cmpExpr() }
    private def cmpExpr(): Unit = {
      simpleExpr()
      peek match {
        case Sym(op) if Set(">", "<", "=", ">=", "<=", "<>", "!=").contains(op) =>
          next(); simpleExpr()
        case _ => ()
      }
    }

    // simple_expr := primary [COLLATE collation_name]... — the COLLATE
    // clause (§8.0 "COLLATE Clause", expr COLLATE collation_name) binds as
    // a postfix on the expression; collation_name is an (unquoted or
    // backtick-quoted) identifier, plus the reserved word `binary` which
    // doubles as a collation name in 8.0
    private def simpleExpr(): Unit = {
      primaryExpr()
      while (eatKw("COLLATE")) collationName()
    }

    private def collationName(): Unit = next() match {
      case Ident(_) => ()
      case Kw("BINARY") => () // SELECT ... COLLATE binary
      case t => fail(s"expected collation name, got $t")
    }

    // primary := BINARY simple_expr (§12.11 cast operator)
    //          | _charset introducer + string/hex literal (§9.1.3.3)
    //          | literal | ? | ident[(args)] | qualified ident | (expr)
    private def primaryExpr(): Unit = peek match {
      case Kw("BINARY") => next(); simpleExpr()
      case Ident(s) if s.startsWith("_") && (peek2 match {
            case Str(_) | HexLit(_) | BitLit(_) => true; case _ => false }) =>
        // charset introducer: `_binary 'abc'`, `_utf8mb4 X'4D'` — the
        // introducer must be DIRECTLY followed by a string/hex/bit literal
        next()
        peek match {
          case Str(_) | HexLit(_) | BitLit(_) => next(); ()
          case t => fail(s"charset introducer requires a string/hex/bit literal, got $t")
        }
      case Str(_) | Num(_) | HexLit(_) | BitLit(_) => next(); ()
      case Sym("?") => next(); ()
      case Sym("(") => next(); expr(); expectSym(")")
      case Ident(_) =>
        qualifiedIdent()
        if (eatSym("(")) { // function call
          if (!eatSym(")")) {
            if (!eatSym("*")) expr()
            while (eatSym(",")) expr()
            expectSym(")")
          }
        }
      case t => fail(s"expected expression, got $t")
    }

    private def identifier(): Unit = next() match {
      case Ident(_) => ()
      case t => fail(s"expected identifier, got $t")
    }

    private def qualifiedIdent(): Unit = {
      identifier()
      while (eatSym(".")) identifier()
    }

    def eof(): Unit = peek match {
      case End => ()
      case t => fail(s"trailing input: $t")
    }
  }

  /** Parse one statement; Right(()) = the MySQL grammar subset accepts it,
    * Left(message) = parse error (the rejection reason).
    */
  def parse(sql: String): Either[String, Unit] =
    tokenize(sql) match {
      case Left(e) => Left(e)
      case Right(toks) =>
        try { val p = new P(toks, sql); p.query(); p.eof(); Right(()) }
        catch { case ParseError(m) => Left(m) }
    }

  /** Parse a bare predicate (a WHERE-clause expression, as handed to
    * `spark.read.jdbc(..., predicates, ...)` which the driver embeds into
    * `WHERE (...)`).
    */
  def parsePredicate(p: String): Either[String, Unit] =
    parse(s"SELECT 1 FROM t WHERE $p")
}
