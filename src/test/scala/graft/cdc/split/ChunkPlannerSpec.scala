package graft.cdc.split

import graft.SparkTestBase
import graft.cdc.model.Changelog.table
import org.apache.spark.sql.functions._

/** Property mirror of MySqlChunkSplitterTest: chunk ranges must partition
  * the key space exactly — disjoint and covering, every row in exactly one
  * chunk.
  */
class ChunkPlannerSpec extends SparkTestBase {

  private lazy val customer = table(spark, sfDir, "customer")

  test("iterative uneven ranges are disjoint and cover every key") {
    for (chunkSize <- Seq(7, 64, 1000)) {
      val ranges = ChunkPlanner.unevenChunkRangesIterative(customer, "c_custkey", chunkSize)
      assert(ranges.head._1.isEmpty && ranges.last._2.isEmpty)
      // chained boundaries: each end == next start
      ranges.sliding(2).foreach {
        case Seq((_, Some(e)), (Some(s2), _)) => assert(e == s2)
        case _ => ()
      }
      // every row in exactly one chunk under (start, end] semantics
      val keys = customer.select(col("c_custkey")).collect().map(_.getLong(0))
      for (k <- keys) {
        val n = ranges.count { case (lo, hi) =>
          lo.forall(k > _) && hi.forall(k <= _)
        }
        assert(n == 1, s"key $k in $n chunks (chunkSize=$chunkSize)")
      }
    }
  }

  test("even chunk stats account for every row exactly once") {
    val total = customer.count()
    val sum = ChunkPlanner.evenChunkStats(customer, "c_custkey", 64)
      .agg(org.apache.spark.sql.functions.sum("cnt")).collect()(0).getLong(0)
    assert(sum == total)
  }

  test("analyze returns min<=max and exact count") {
    val r = ChunkPlanner.analyze(customer, "c_custkey").collect()(0)
    assert(r.getAs[Number]("min_k").longValue <= r.getAs[Number]("max_k").longValue)
    assert(r.getAs[Long]("cnt") == customer.count())
  }
}
