package graft.cdc.model

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** The schema-history codec must round-trip full TableChange documents
  * (encode -> persist -> decode -> identical struct) so the T9 restart
  * pattern can rebuild captured-table schemas, like the reference's
  * FlinkJsonTableChangeSerializer.
  */
class TableChangeCodecSpec extends SparkTestBase {

  test("encode -> decode is the identity on the change struct (incl. null fields)") {
    val s = spark
    import s.implicits._
    val tbls = Seq("users_0", "users_1").toDF("tbl")
    val change = TableChangeCodec.usersChange(lit("CREATE"), col("tbl"))
    val rows = tbls.select(
      change.as("orig"),
      TableChangeCodec.decode(TableChangeCodec.encode(change)).as("roundtrip"))
    // struct equality covers every nested field, including the null
    // length/scale slots to_json omits and from_json must restore as null
    assert(rows.where(col("orig") =!= col("roundtrip")).count() == 0)
    assert(rows.where(col("roundtrip").isNull).count() == 0)
  }

  test("ddl renders CREATE/ALTER/DROP deterministically from the decoded struct") {
    val s = spark
    import s.implicits._
    val tbls = Seq("users_0").toDF("tbl")
    def render(typ: String): String = tbls.select(
      TableChangeCodec.ddl(TableChangeCodec.decode(TableChangeCodec.encode(
        TableChangeCodec.usersChange(lit(typ), col("tbl"))))).as("ddl"))
      .collect()(0).getString(0)
    assert(render("CREATE") ==
      "CREATE TABLE inventory.users_0 (pk BIGINT NOT NULL, val DOUBLE NOT NULL, " +
        "k INT(11), PRIMARY KEY (pk))")
    assert(render("ALTER") ==
      "ALTER TABLE inventory.users_0 (pk BIGINT NOT NULL, val DOUBLE NOT NULL, " +
        "k INT(11), PRIMARY KEY (pk))")
    assert(render("DROP") == "DROP TABLE inventory.users_0")
  }

  test("restart pattern: persisted history decodes to the latest schema per table") {
    val s = spark
    import s.implicits._
    // history log: CREATE at offset 10, ALTER at offset 20 for each table —
    // exactly what a long-running capture accumulates
    val tbls = Seq("users_0", "users_1", "users_2").toDF("tbl")
    val hist = tbls.select(col("tbl"), lit(10L).as("offset"),
        TableChangeCodec.encode(
          TableChangeCodec.usersChange(lit("CREATE"), col("tbl"))).as("payload"))
      .unionByName(tbls.select(col("tbl"), lit(20L).as("offset"),
        TableChangeCodec.encode(
          TableChangeCodec.usersChange(lit("ALTER"), col("tbl"))).as("payload")))
    val dir = java.nio.file.Files.createTempDirectory("schema_hist").toString
    hist.write.mode("overwrite").parquet(dir)

    // restart: read the persisted log, argmax the payload per table, decode
    val latest = spark.read.parquet(dir)
      .groupBy(col("tbl"))
      .agg(max_by(col("payload"), col("offset")).as("payload"))
      .select(col("tbl"), TableChangeCodec.decode(col("payload")).as("c"))
    val got = latest.select(col("tbl"), col("c.type").as("t"),
        col("c.id").as("id"), size(col("c.table.columns")).as("n"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2), r.getInt(3)))
      .toSet
    assert(got == Set(
      ("users_0", "ALTER", "inventory.users_0", 3),
      ("users_1", "ALTER", "inventory.users_1", 3),
      ("users_2", "ALTER", "inventory.users_2", 3)))
  }
}
