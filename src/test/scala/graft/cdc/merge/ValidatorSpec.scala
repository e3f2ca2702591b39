package graft.cdc.merge

import graft.SparkTestBase
import graft.cdc.model.Changelog
import org.apache.spark.sql.functions._

/** P9 — the row-validator hook must pass clean data through untouched and
  * throw (with the message) on the first violating row.
  */
class ValidatorSpec extends SparkTestBase {

  test("valid condition passes all rows through") {
    val cl = Changelog.changelog(spark, sfDir)
    val out = ChangelogOps.validated(cl, col("offset") >= 0, "offset must be non-negative")
    assert(out.count() == cl.count())
  }

  test("violation throws at execution with the configured message") {
    val cl = Changelog.changelog(spark, sfDir)
    val bad = ChangelogOps.validated(cl, col("val") < 100, "REPLICA IDENTITY violation")
    val e = intercept[Exception](bad.count())
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("REPLICA IDENTITY violation")))
  }
}
