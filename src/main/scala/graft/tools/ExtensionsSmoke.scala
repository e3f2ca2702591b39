package graft.tools

import org.apache.spark.sql.SparkSession

/** Proves the `spark.sql.extensions=graft.cdc.types.GraftExtensions` wiring:
  * a fresh session created with only that config must resolve every native
  * function through SQL (no programmatic registration call anywhere).
  * Forked `runMain` gives the clean JVM the extension mechanism needs.
  */
object ExtensionsSmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.extensions", "graft.cdc.types.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val r = spark.sql(
      """SELECT graft_fnv64('abc'),
        |       graft_mix64(1L, 2L),
        |       graft_dot(array(1D, 2D), array(3D, 4D)),
        |       graft_simhash64(array('a b c')),
        |       size(graft_minhash(array('a b c'), 4)),
        |       size(graft_winnow('hello world', 4, 2)),
        |       graft_wkb_geojson(CAST(NULL AS BINARY))""".stripMargin).collect()(0)
    assert(r.getLong(0) == graft.ext.TextAnalysis.fnv1a64("abc"))
    assert(r.getLong(1) == graft.ext.Hashing.mix64(1L, 2L))
    assert(r.getDouble(2) == 11.0)
    assert(r.getInt(4) == 4)
    assert(r.isNullAt(6))
    println("EXTENSIONS_SMOKE_OK all " + graft.cdc.types.GraftFunctions.all.size + " functions resolved via spark.sql.extensions")
    spark.stop()
  }
}
