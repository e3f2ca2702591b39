package graft.cdc.split

import org.scalatest.funsuite.AnyFunSuite
import SplitState._

/** Mirror of MySqlSplitSerializerTest / PendingSplitsStateSerializerTest:
  * exact round-tripping of split state, including hostile identifiers.
  */
class SplitStateSpec extends AnyFunSuite {

  private val splits = Seq(
    SnapshotSplit("t1:0", "db.t1", None, Some(100L), 42L),
    SnapshotSplit("t1:1", "db.t1", Some(100L), Some(200L), 43L),
    SnapshotSplit("t1:2", "db.t1", Some(200L), None, 44L),
    SnapshotSplit("weird|id\\with\njunk", "db|x.t\\y", Some(-5L), Some(5L), 0L)
  )

  test("snapshot splits round-trip exactly, incl. escapes and unbounded ends") {
    for (s <- splits)
      assert(deserializeSnapshot(serializeSnapshot(s)) == s)
  }

  test("stream split round-trips with finished-split list") {
    val ss = StreamSplit(12345L, splits)
    assert(deserializeStream(serializeStream(ss)) == ss)
    assert(deserializeStream(serializeStream(StreamSplit(0L, Nil))) == StreamSplit(0L, Nil))
  }

  test("unknown version rejected") {
    val line = serializeSnapshot(splits.head).replaceFirst("^1\\|", "9|")
    intercept[IllegalArgumentException](deserializeSnapshot(line))
  }

  test("property: round-trip over generated split grids") {
    for {
      start <- Seq(None, Some(0L), Some(Long.MinValue), Some(99L))
      end <- Seq(None, Some(Long.MaxValue), Some(-1L))
      hwm <- Seq(0L, 7L, Long.MaxValue)
    } {
      val s = SnapshotSplit(s"id-$start-$end", "a.b", start, end, hwm)
      assert(deserializeSnapshot(serializeSnapshot(s)) == s)
    }
  }
}
