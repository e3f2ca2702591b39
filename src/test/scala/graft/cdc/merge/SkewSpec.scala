package graft.cdc.merge

import graft.SparkTestBase
import graft.cdc.model.Changelog
import org.apache.spark.sql.functions._

/** The salted two-stage merge must be semantically identical to the
  * single-shuffle merge for any bucket count, including a synthetic hot key.
  */
class SkewSpec extends SparkTestBase {

  private def asSet(df: org.apache.spark.sql.DataFrame) =
    df.select("pk", "last_offset", "last_op", "val").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3))).toSet

  test("salted merge equals plain merge on real data for several bucket counts") {
    val snap = Changelog.snapshot(spark, sfDir)
    val cl = Changelog.changelog(spark, sfDir)
    val plain = asSet(Changelog.upsertMaterialize(snap, cl))
    for (b <- Seq(1, 4, 32))
      assert(asSet(Skew.saltedUpsertMaterialize(snap, cl, b)) == plain, s"buckets=$b")
  }

  test("holds with a synthetic hot key dominating the changelog") {
    val s = spark
    import s.implicits._
    val hot = (0L until 5000L).map(i => (i, 7L, if (i % 997 == 0) "d" else "u", i, i * 0.5))
    val cold = Seq((5000L, 3L, "c", 5000L, 1.0), (5001L, 4L, "d", 5001L, 2.0))
    val cl = (hot ++ cold).toDF("offset", "pk", "op", "ts_ms", "val")
      .withColumn("props", lit(null).cast("string"))
    val snap = Seq((-1L, 7L, "r", 0L, 9.9), (-1L, 9L, "r", 0L, 8.8))
      .toDF("offset", "pk", "op", "ts_ms", "val")
      .withColumn("props", lit(null).cast("string"))
    val plain = asSet(Changelog.upsertMaterialize(snap, cl))
    assert(asSet(Skew.saltedUpsertMaterialize(snap, cl, 16)) == plain)
    // sanity: the hot key's last event (4999, 'u') survives, key 4 deleted
    assert(plain.exists(t => t._1 == 7L && t._2 == 4999L))
    assert(!plain.exists(_._1 == 4L))
  }
}
