package graft.cdc.model

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Debezium HashField-style masking on the generic IR. */
class MaskImagesSpec extends SparkTestBase {

  private val table = RowImage.DeclaredTable("t",
    StructType(Seq(
      StructField("id", LongType),
      StructField("name", StringType),
      StructField("amt", DecimalType(10, 2)))),
    pkCols = Seq("id"))

  private def ir = {
    val s = spark
    import s.implicits._
    Seq(
      (1L, "u", Some(("alice", "10.00")), Some(("bob", "20.00"))),
      (2L, "c", None, Some((null: String, "30.00"))),
      (3L, "d", Some(("carol", "40.00")), None)
    ).toDF("offset", "op", "b", "a")
      .select(col("offset"), col("op"), lit(0L).as("ts_ms"),
        struct(col("offset").as("id")).as("key"),
        when(col("b").isNotNull, struct(col("offset").as("id"),
          col("b._1").as("name"),
          col("b._2").cast(DecimalType(10, 2)).as("amt"))).as("before"),
        when(col("a").isNotNull, struct(col("offset").as("id"),
          col("a._1").as("name"),
          col("a._2").cast(DecimalType(10, 2)).as("amt"))).as("after"))
  }

  test("masked field hashes in both images; others and nulls untouched") {
    val m = RowImage.maskImages(ir, table, Set("name")).collect()
      .map(r => r.getLong(0) -> r).toMap
    def img(o: Long, f: String) = {
      val r = m(o)
      Option(r.getStruct(r.fieldIndex(f)))
    }
    val sha = java.security.MessageDigest.getInstance("SHA-256")
    def hex(s: String) =
      sha.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(img(1L, "before").get.getString(1) == hex("alice"))
    assert(img(1L, "after").get.getString(1) == hex("bob"))
    assert(img(1L, "after").get.getDecimal(2).toString == "20.00") // untouched
    assert(img(2L, "before").isEmpty)          // null image stays null
    assert(img(2L, "after").get.getString(1) == null) // null field stays null
    assert(img(3L, "after").isEmpty)
  }

  test("equal plaintexts keep equal digests (joinability survives)") {
    val twice = ir.union(ir)
    val m = RowImage.maskImages(twice, table, Set("name"))
      .where(col("offset") === 1L)
      .select(col("after.name")).distinct().count()
    assert(m == 1L)
  }

  test("non-string mask targets are rejected loudly") {
    intercept[IllegalArgumentException](
      RowImage.maskImages(ir, table, Set("amt")))
  }
}
