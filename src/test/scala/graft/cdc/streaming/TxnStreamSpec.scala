package graft.cdc.streaming

import graft.SparkTestBase
import graft.cdc.merge.ChangelogOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The streamed transaction-consistent emission must equal the batch
  * operator on the finished log, for every micro-batch split of the log.
  */
class TxnStreamSpec extends SparkTestBase {
  import TxnStream.TxnEvent

  /** 8 txns x 5 events; txns 0,2,3,5,7 commit ('c' as their 4th event),
    * txns 1,4 stay in flight, txn 6's marker is its LAST event. One
    * marker per txn — the operator's stated contract.
    */
  private def fixture: Seq[TxnEvent] = (0L until 40L).map { off =>
    val txn = off / 5
    val posInTxn = off % 5
    val committedTxn = Set(0L, 2L, 3L, 5L, 7L).contains(txn)
    val op =
      if (committedTxn && posInTxn == 3) "c"
      else if (txn == 6L && posInTxn == 4) "c"
      else "u"
    TxnEvent(off, txn, op, pk = off % 7, ts_ms = off * 1000, value = off * 0.5)
  }

  private def batchExpected(events: Seq[TxnEvent]): Set[(Long, Long, Long)] = {
    val s = spark
    import s.implicits._
    ChangelogOps.transactionConsistent(
        events.toDF().withColumnRenamed("value", "val"),
        col("txn_id"), col("op") === "c")
      .select("txn_id", "offset", "commit_off")
      .as[(Long, Long, Long)].collect().toSet
  }

  private def streamed(splits: Seq[Seq[TxnEvent]]): Set[(Long, Long, Long)] = {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val stream = MemoryStream[TxnEvent]
    val name = s"txn_out_${System.nanoTime}"
    val q = TxnStream
      .transactionConsistentStream(stream.toDS(), _.op == "c")
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    splits.foreach { b => stream.addData(b.toIndexedSeq); q.processAllAvailable() }
    q.stop()
    spark.table(name).select("txn_id", "offset", "commit_off")
      .as[(Long, Long, Long)].collect().toSet
  }

  test("stream equals batch for one-shot, per-txn, and ragged splits") {
    val want = batchExpected(fixture)
    assert(want.nonEmpty)
    for (splits <- Seq(
        Seq(fixture),                       // everything in one micro-batch
        fixture.grouped(5).toSeq,           // txn-aligned batches
        fixture.grouped(7).toSeq,           // markers split from their txns
        fixture.map(Seq(_))                 // one event per micro-batch
      )) {
      assert(streamed(splits) == want, s"split sizes ${splits.map(_.size)}")
    }
  }

  test("randomized logs and splits: stream equals batch (8 seeded runs)") {
    for (seed <- 1 to 8) {
      val rnd = new scala.util.Random(seed)
      val nTxn = 3 + rnd.nextInt(4)
      val committed = (0 until nTxn).filter(_ => rnd.nextBoolean()).toSet
      // assign each offset a random txn; each committed txn gets exactly
      // one marker at a random one of its positions (the stated contract)
      val n = 30 + rnd.nextInt(30)
      val txnOf = (0 until n).map(_ => rnd.nextInt(nTxn))
      val markerAt = committed.flatMap { t =>
        val posns = (0 until n).filter(txnOf(_) == t)
        if (posns.isEmpty) None else Some(posns(rnd.nextInt(posns.length)))
      }
      val log = (0 until n).map { i =>
        TxnEvent(i.toLong, txnOf(i).toLong,
          if (markerAt(i)) "c" else "u", i % 5, i * 100L, i * 0.25)
      }
      val want = batchExpected(log)
      // random batch split preserving offset order
      val splits = {
        val cuts = (Seq(0, n) ++ Seq.fill(rnd.nextInt(4))(rnd.nextInt(n)))
          .distinct.sorted
        cuts.zip(cuts.tail).map { case (a, b) => log.slice(a, b) }
      }
      assert(streamed(splits) == want,
        s"seed $seed, txns $nTxn, n $n, splits ${splits.map(_.size)}")
    }
  }

  test("late id-reuse events after the marker stay withheld") {
    // txn 0 commits at offset 3; offset 4 (post-marker) arrives a batch later
    val (pre, post) = fixture.take(5).partition(_.offset <= 3)
    val got = streamed(Seq(pre, post))
    assert(got == batchExpected(fixture.take(5)))
    assert(!got.exists(_._2 == 4L))
  }
}
