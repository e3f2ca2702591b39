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

  // Golden fixtures in the EXACT field set + order the reference's
  // serializer emits (FlinkJsonTableChangeSerializer.java:55-107, hand
  // derived: insertion-ordered Document, conditional nativeType/length/
  // scale omission, always-present enumValues, double-quoted TableId).
  private val debeziumCreate =
    """{"type":"CREATE","id":"\"inventory\".\"products\"","table":{""" +
      """"defaultCharsetName":"utf8mb4","primaryKeyColumnNames":["id"],""" +
      """"columns":[""" +
      """{"name":"id","jdbcType":-5,"nativeType":3,"typeName":"BIGINT",""" +
      """"typeExpression":"BIGINT","charsetName":null,"position":1,""" +
      """"optional":false,"autoIncremented":true,"generated":false,""" +
      """"enumValues":[]},""" +
      """{"name":"price","jdbcType":3,"typeName":"DECIMAL",""" +
      """"typeExpression":"DECIMAL","charsetName":null,"length":10,""" +
      """"scale":2,"position":2,"optional":true,"autoIncremented":false,""" +
      """"generated":false,"enumValues":[]},""" +
      """{"name":"status","jdbcType":1,"nativeType":247,"typeName":"ENUM",""" +
      """"typeExpression":"ENUM","charsetName":"utf8mb4","length":7,""" +
      """"position":3,"optional":true,"autoIncremented":false,""" +
      """"generated":false,"enumValues":["'on'","'off'"]}]}}"""

  private val debeziumDrop =
    """{"type":"DROP","id":"\"inventory\".\"products\"","table":{""" +
      """"defaultCharsetName":null,"primaryKeyColumnNames":[],"columns":[]}}"""

  test("reference-serialized history records decode byte-for-byte round-trip") {
    val s = spark
    import s.implicits._
    val df = Seq(debeziumCreate, debeziumDrop).toDF("payload")
      .withColumn("c", TableChangeCodec.decodeDebezium(col("payload")))
    // decoded fields carry the full Debezium column surface
    val create = df.where(col("c.type") === "CREATE")
      .select(col("c.id"), col("c.table.defaultCharsetName"),
        col("c.table.columns")).collect()(0)
    assert(create.getString(0) == "\"inventory\".\"products\"")
    assert(create.getString(1) == "utf8mb4")
    val cols = create.getSeq[org.apache.spark.sql.Row](2)
    assert(cols.map(_.getAs[String]("name")) == Seq("id", "price", "status"))
    val statusCol = cols(2)
    assert(statusCol.getSeq[String](statusCol.fieldIndex("enumValues")) ==
      Seq("'on'", "'off'"))
    assert(statusCol.getAs[Int]("nativeType") == 247)
    assert(cols(1).isNullAt(cols(1).fieldIndex("nativeType"))) // omitted -> null
    assert(cols(1).getAs[Int]("scale") == 2)
    assert(cols(0).getAs[Boolean]("autoIncremented"))
    // re-encode reproduces the reference bytes exactly (both conventions:
    // explicit charsetName null, omitted nativeType/length/scale)
    val back = df.select(
      TableChangeCodec.encodeDebezium(col("c")).as("js"), col("payload"))
      .collect()
    back.foreach(r => assert(r.getString(0) == r.getString(1),
      s"\n got: ${r.getString(0)}\nwant: ${r.getString(1)}"))
  }

  test("debezium ids unquote and the compact form decodes through the compat schema") {
    val s = spark
    import s.implicits._
    val parts = Seq(debeziumCreate).toDF("payload")
      .select(TableChangeCodec.tableIdParts(
        TableChangeCodec.decodeDebezium(col("payload")).getField("id")))
      .collect()(0).getSeq[String](0)
    assert(parts == Seq("inventory", "products"))
    // this engine's own compact documents remain decodable via the
    // tolerant compat schema: absent Debezium-only fields -> null
    val compact = spark.range(1).select(
      TableChangeCodec.encode(
        TableChangeCodec.usersChange(lit("CREATE"), lit("users_9"))).as("p"))
    val c = compact.select(TableChangeCodec.decodeDebezium(col("p")).as("c"))
      .select(col("c.type"), col("c.id"), col("c.table.columns")).collect()(0)
    assert(c.getString(0) == "CREATE" && c.getString(1) == "inventory.users_9")
    val ccols = c.getSeq[org.apache.spark.sql.Row](2)
    assert(ccols.map(_.getAs[String]("name")) == Seq("pk", "val", "k"))
    assert(ccols.forall(_.isNullAt(ccols.head.fieldIndex("typeExpression"))))
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
