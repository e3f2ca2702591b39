package graft.cdc.types

import graft.SparkTestBase
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import java.nio.file.Files

/** A3 fixture analog (`column_type_test.sql` / `full_types`): one column per
  * supported type from the SURVEY §1.3 mapping, round-tripped through the
  * engine's storage format — the Spark-side equivalent of the reference's
  * full-types ITCase.
  */
class FullTypesSpec extends SparkTestBase {

  test("full-types row survives a parquet write/read round trip exactly") {
    val schema = StructType(Seq(
      StructField("c_bool", BooleanType),
      StructField("c_tinyint", ByteType),
      StructField("c_smallint", ShortType),
      StructField("c_int", IntegerType),
      StructField("c_bigint", LongType),
      StructField("c_dec20", DecimalType(20, 0)),
      StructField("c_dec", DecimalType(10, 4)),
      StructField("c_float", FloatType),
      StructField("c_double", DoubleType),
      StructField("c_date", DateType),
      StructField("c_ts_ntz", TimestampNTZType),
      StructField("c_time_ms", IntegerType), // TIME -> millis-of-day (§1.3)
      StructField("c_string", StringType),
      StructField("c_binary", BinaryType),
      StructField("c_set_arr", ArrayType(StringType)),
      StructField("c_map", MapType(StringType, IntegerType)),
      StructField("c_row", StructType(Seq(
        StructField("x", IntegerType), StructField("y", StringType))))
    ))
    val row = Row(
      true, 42.toByte, 1234.toShort, 123456, 1234567890123L,
      new java.math.BigDecimal("18446744073709551615"), // BIGINT UNSIGNED max
      new java.math.BigDecimal("3.1415"),
      2.5f, -1.25e10,
      java.sql.Date.valueOf("2024-02-29"),
      java.time.LocalDateTime.of(2024, 2, 29, 23, 59, 59, 123000000),
      86399999, // 23:59:59.999
      "utf8 — ünïcødé 中文 😀",
      Array[Byte](0, 1, -1, 127, -128),
      Seq("a", "b", "c"),
      Map("k1" -> 1, "k2" -> 2),
      Row(7, "nested")
    )
    val df = spark.createDataFrame(
      java.util.Arrays.asList(row), schema)
    val dir = Files.createTempDirectory("fulltypes").toString
    df.write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir)
    assert(back.schema == schema)
    val r = back.collect()(0)
    val orig = df.collect()(0)
    schema.indices.foreach { i =>
      (orig.get(i), r.get(i)) match {
        case (a: Array[Byte], b: Array[Byte]) => assert(a.sameElements(b), schema(i).name)
        case (a, b) => assert(a == b, schema(i).name)
      }
    }
  }
}
