package graft.cdc.merge

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Transaction-consistent emission (Debezium transaction-metadata
  * buffering semantics): whole committed transactions or nothing.
  */
class TxnConsistentSpec extends SparkTestBase {
  import spark.implicits._

  private def log(rows: (Long, Long, String)*) =
    rows.toDF("offset", "txn", "op")
      .select(col("offset"), col("txn"), col("op"),
        lit(0L).as("pk"), lit(0L).as("ts_ms"), lit(0.0).as("val"))

  test("only committed transactions release, whole or not at all") {
    // txn 1 committed at offset 12; txn 2 has no commit marker
    val l = log((10, 1, "u"), (11, 1, "u"), (12, 1, "c"),
                (20, 2, "u"), (21, 2, "u"))
    val out = ChangelogOps
      .transactionConsistent(l, col("txn"), col("op") === "c")
      .select("offset").as[Long].collect().sorted
    assert(out.toSeq == Seq(10L, 11L, 12L))
  }

  test("events after their txn's commit marker are withheld (id reuse)") {
    val l = log((10, 1, "u"), (11, 1, "c"), (12, 1, "u"))
    val out = ChangelogOps
      .transactionConsistent(l, col("txn"), col("op") === "c")
      .select("offset").as[Long].collect().sorted
    assert(out.toSeq == Seq(10L, 11L))
  }

  test("commit_off is the txn's FIRST commit marker (stream-aligned)") {
    // the streaming operator releases at the first marker it sees in
    // offset order; batch must agree for multi-marker predicates too
    val l = log((10, 1, "c"), (11, 1, "u"), (12, 1, "c"),
                (20, 2, "c"), (30, 3, "u"))
    val out = ChangelogOps
      .transactionConsistent(l, col("txn"), col("op") === "c")
      .select(col("txn"), col("offset"), col("commit_off"))
      .as[(Long, Long, Long)].collect().sortBy(r => (r._3, r._2))
    // txn 1 releases only offset 10 under commit_off=10 (11, 12 arrive
    // after the marker -> withheld as id reuse); txn 3 withheld entirely
    assert(out.toSeq == Seq((1L, 10L, 10L), (2L, 20L, 20L))
      .sortBy(r => (r._3, r._2)))
  }

  test("empty log and all-uncommitted log both emit nothing") {
    val l = log((10, 1, "u"), (11, 2, "u"))
    assert(ChangelogOps
      .transactionConsistent(l, col("txn"), col("op") === "c").count() == 0)
    assert(ChangelogOps
      .transactionConsistent(l.limit(0), col("txn"), col("op") === "c")
      .count() == 0)
  }
}
