package graft.cdc.source

/** S8 against a LIVE catalog — the snapshot assigner's table-discovery
  * pass (reference: TableDiscoveryUtils.java:43 `listTables` filters the
  * server's table listing through the capture-list regex before chunk
  * planning; MySqlSnapshotSplitAssigner.java:192/224 re-runs it to find
  * newly added tables). The catalog face is pinned ANSI information_schema
  * SQL — executed live on PostgreSQL 15 (PgLiveSpec) — and the include
  * filter is the SAME regex semantics the in-stream capture filter (P7)
  * applies, so discovery and stream filtering can never disagree on a
  * table.
  *
  * Planner-scale driver work by design: the result is the capture list
  * (bounded by schema size), never data.
  */
object Discovery {

  /** The pinned catalog listing for one schema: base tables only, ordered
    * so the capture list is deterministic across runs.
    */
  def listTablesSql(schema: String): String =
    "SELECT table_schema, table_name FROM information_schema.tables " +
      s"WHERE table_schema = '${schema.replace("'", "''")}' " +
      "AND table_type = 'BASE TABLE' ORDER BY table_name"

  /** Execute the listing through the same four-method JDBC surface the
    * chunk prober uses (injectable for shimmed drivers).
    */
  def listTables(
      url: String,
      schema: String,
      connect: Option[String => java.sql.Connection] = None
  ): Seq[(String, String)] = {
    val conn = connect.getOrElse(
      (u: String) => java.sql.DriverManager.getConnection(u))(url)
    try {
      val st = conn.prepareStatement(listTablesSql(schema))
      try {
        val rs = st.executeQuery()
        val out = Seq.newBuilder[(String, String)]
        while (rs.next()) out += ((rs.getString(1), rs.getString(2)))
        out.result()
      } finally st.close()
    } finally conn.close()
  }

  /** Anchor an include regex so it must match the WHOLE identifier — the
    * reference's RelationalTableFilters semantics (full `matches()`, so
    * `public.users` does NOT capture `public.users_archive`). The in-stream
    * P7 filter wraps its rlike pattern through this same helper, so
    * discovery and stream filtering cannot disagree on a table.
    */
  def anchored(re: String): String = "^(?:" + re + ")$"

  /** The capture-list filter: `schema.table` against the include regex —
    * whole-identifier match (see [[anchored]]), identical semantics to the
    * in-stream P7 filter, applied at discovery time like the reference's
    * RelationalTableFilters.
    */
  def captured(
      tables: Seq[(String, String)], includeRegex: Option[String]): Seq[(String, String)] =
    includeRegex match {
      case None => tables
      case Some(re) =>
        val p = java.util.regex.Pattern.compile(re)
        tables.filter { case (s, t) => p.matcher(s + "." + t).matches() }
    }
}
