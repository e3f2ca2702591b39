package graft.cdc.source

import java.lang.reflect.{InvocationHandler, Method, Proxy}
import java.nio.file.{Files, Path}

/** Throwaway real-PostgreSQL harness for the live specs: initdb + pg_ctl on
  * a private temp directory, unix-socket only (no TCP port to collide on),
  * `wal_level=logical` so contrib's `test_decoding` output plugin can serve
  * a logical replication slot. PostgreSQL refuses to run as root, so every
  * server-side command is dropped to the `postgres` system user via `su`
  * when the JVM runs as root; specs `assume` [[PgLive.available]] and
  * cancel cleanly where the server or the user is absent.
  *
  * Queries go through the `psql` client binary (record/field separators set
  * to control bytes, an explicit NULL sentinel, ON_ERROR_STOP) — no JDBC
  * driver for PostgreSQL ships in this sandbox, and the planner probe loop
  * only needs the four-method java.sql surface [[PgLive.connection]] shims
  * over psql via dynamic proxies.
  */
object PgLive {

  private val pgBinDir: Option[Path] = {
    val roots = Seq("/usr/lib/postgresql/15/bin", "/usr/lib/postgresql/16/bin",
      "/usr/lib/postgresql/14/bin")
    roots.map(java.nio.file.Paths.get(_)).find(p => Files.isExecutable(p.resolve("initdb")))
  }

  private def isRoot: Boolean =
    System.getProperty("user.name") == "root"

  private def havePostgresUser: Boolean =
    run(Seq("id", "-u", "postgres"))._1 == 0

  lazy val available: Boolean =
    pgBinDir.nonEmpty && sys.env.get("SPARK_GRAFT_NO_PG").isEmpty &&
      (!isRoot || havePostgresUser) && run(Seq("psql", "--version"))._1 == 0

  private def run(cmd: Seq[String], cwd: Option[Path] = None): (Int, String, String) = {
    try {
      val pb = new ProcessBuilder(cmd: _*)
      cwd.foreach(d => pb.directory(d.toFile))
      val p = pb.start()
      // drain stderr on its own thread: a child that fills the ~64KB stderr
      // pipe while the JVM is blocked reading stdout to EOF would deadlock
      val errBuf = new java.util.concurrent.atomic.AtomicReference[String]("")
      val drainer = new Thread(() =>
        errBuf.set(new String(p.getErrorStream.readAllBytes(), "UTF-8")))
      drainer.setDaemon(true)
      drainer.start()
      val out = new String(p.getInputStream.readAllBytes(), "UTF-8")
      drainer.join()
      p.waitFor()
      (p.exitValue(), out, errBuf.get())
    } catch { case _: java.io.IOException => (127, "", "spawn failed") }
  }

  /** Run a server-side command as the unix user that may own the server. */
  private def asOwner(dir: Path, cmd: String): (Int, String, String) =
    if (isRoot) run(Seq("su", "postgres", "-s", "/bin/bash", "-c", cmd), Some(dir))
    else run(Seq("/bin/bash", "-c", cmd), Some(dir))

  final case class Handle(dir: Path, port: Int) {
    /** Execute SQL via psql; rows come back as string cells, None = NULL.
      * Any server error (syntax error included — the POINT of executing the
      * pinned dialect strings) raises with the server's message.
      */
    def sql(q: String): Seq[Seq[Option[String]]] = {
      val (code, out, err) = run(Seq("psql", "-h", dir.toString, "-p", port.toString,
        "-U", "graft", "-d", "postgres", "-X", "-v", "ON_ERROR_STOP=1",
        "-tA", "-F", "\u0001", "-P", "null=\u0002", "-c", q))
      if (code != 0) throw new RuntimeException(s"psql failed for [$q]: $err")
      if (out.isEmpty) Seq.empty
      else out.stripSuffix("\n").split("\n", -1).toSeq.map(
        _.split("\u0001", -1).toSeq.map(c => if (c == "\u0002") None else Some(c)))
    }
  }

  /** initdb + start + f(handle) + stop + delete, always. */
  def withServer[T](f: Handle => T): T = {
    val bin = pgBinDir.getOrElse(sys.error("no postgres binaries"))
    val dir = Files.createTempDirectory("graft_pg")
    dir.toFile.setReadable(true, false)
    dir.toFile.setWritable(true, false)
    dir.toFile.setExecutable(true, false)
    if (isRoot) run(Seq("chown", "postgres:postgres", dir.toString))
    val data = dir.resolve("data")
    val port = 50000 + (ProcessHandle.current().pid() % 10000).toInt
    try {
      val (ic, _, ierr) = asOwner(dir,
        s"${bin.resolve("initdb")} -D $data -U graft --auth=trust -E UTF8 --no-sync")
      require(ic == 0, s"initdb failed: $ierr")
      val (sc, _, serr) = asOwner(dir,
        s"""${bin.resolve("pg_ctl")} -D $data -w -l $dir/pg.log start """ +
          s"""-o "-k $dir -p $port -c listen_addresses='' -c wal_level=logical -c fsync=off"""")
      require(sc == 0, s"pg_ctl start failed: $serr")
      try f(Handle(dir, port))
      finally asOwner(dir, s"${bin.resolve("pg_ctl")} -D $data -m immediate stop")
    } finally {
      run(Seq("rm", "-rf", dir.toString))
      ()
    }
  }

  /** The four-method java.sql face the chunk planner's probe loop uses
    * (prepareStatement / setString / executeQuery / next / getString /
    * close), shimmed over psql with the single bind parameter inlined as a
    * quoted literal. Dynamic proxies keep this a test utility, not a
    * driver: anything outside the planner's surface throws.
    */
  def connection(h: Handle): java.sql.Connection = {
    def proxy[T](cls: Class[T])(pf: PartialFunction[(String, Array[AnyRef]), AnyRef]): T =
      Proxy.newProxyInstance(cls.getClassLoader, Array(cls), new InvocationHandler {
        override def invoke(o: AnyRef, m: Method, a: Array[AnyRef]): AnyRef = {
          val args = if (a == null) Array.empty[AnyRef] else a
          pf.applyOrElse((m.getName, args), { x: (String, Array[AnyRef]) =>
            x._1 match {
              case "close" | "clearParameters" => null
              case "isClosed"                  => java.lang.Boolean.FALSE
              case "toString"                  => s"psql-shim:${cls.getSimpleName}"
              case "hashCode"                  => Integer.valueOf(System.identityHashCode(o))
              case "equals"                    => java.lang.Boolean.valueOf(o eq args(0))
              case other => throw new UnsupportedOperationException(
                s"psql shim does not implement $other")
            }
          })
        }
      }).asInstanceOf[T]

    def resultSet(rows: Seq[Seq[Option[String]]]): java.sql.ResultSet = {
      var i = -1
      proxy(classOf[java.sql.ResultSet]) {
        case ("next", _) =>
          i += 1; java.lang.Boolean.valueOf(i < rows.length)
        case ("getString", Array(idx: Integer)) =>
          rows(i)(idx - 1).orNull
        case ("wasNull", _) => java.lang.Boolean.FALSE
      }
    }

    def statement(sqlText: String): java.sql.PreparedStatement = {
      var bound: Option[String] = None
      proxy(classOf[java.sql.PreparedStatement]) {
        case ("setString", Array(_: Integer, v: String)) =>
          bound = Some(v); null
        case ("executeQuery", _) =>
          val q = bound match {
            case Some(v) =>
              val lit = "'" + v.replace("'", "''") + "'"
              val j = sqlText.indexOf('?')
              require(j >= 0, s"no bind slot in [$sqlText]")
              sqlText.substring(0, j) + lit + sqlText.substring(j + 1)
            case None => sqlText
          }
          resultSet(h.sql(q))
        case ("executeUpdate", _) =>
          h.sql(sqlText); Integer.valueOf(0)
      }
    }

    proxy(classOf[java.sql.Connection]) {
      case ("prepareStatement", Array(q: String)) => statement(q)
      case ("createStatement", _)                 => statement("")
    }
  }
}
