package graft.cdc.types

import org.scalatest.funsuite.AnyFunSuite
import java.nio.{ByteBuffer, ByteOrder}

/** Round-trip coverage for the WKB->GeoJSON function (F12) — no DuckDB
  * oracle exists for it.
  */
class WkbSpec extends AnyFunSuite {

  test("point round-trip") {
    assert(Wkb.toGeoJson(Wkb.encodePoint(1.5, -2.25)) ==
      """{"type":"Point","coordinates":[1.5,-2.25]}""")
  }

  test("linestring round-trip") {
    assert(Wkb.toGeoJson(Wkb.encodeLineString(Seq((0.0, 0.0), (1.0, 2.0)))) ==
      """{"type":"LineString","coordinates":[[0.0,0.0],[1.0,2.0]]}""")
  }

  test("big-endian point decodes too") {
    val b = ByteBuffer.allocate(21).order(ByteOrder.BIG_ENDIAN)
    b.put(0.toByte).putInt(1).putDouble(3.0).putDouble(4.0)
    assert(Wkb.toGeoJson(b.array()) == """{"type":"Point","coordinates":[3.0,4.0]}""")
  }

  test("geometry collection with name fix-up") {
    val p1 = Wkb.encodePoint(1.0, 2.0)
    val b = ByteBuffer.allocate(9 + p1.length).order(ByteOrder.LITTLE_ENDIAN)
    b.put(1.toByte).putInt(7).putInt(1).put(p1)
    assert(Wkb.toGeoJson(b.array()) ==
      """{"type":"GeometryCollection","geometries":[{"type":"Point","coordinates":[1.0,2.0]}]}""")
  }

  test("polygon decodes rings") {
    val pts = Seq((0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 0.0))
    val b = ByteBuffer.allocate(13 + 16 * pts.size).order(ByteOrder.LITTLE_ENDIAN)
    b.put(1.toByte).putInt(3).putInt(1).putInt(pts.size)
    pts.foreach { case (x, y) => b.putDouble(x).putDouble(y) }
    assert(Wkb.toGeoJson(b.array()) ==
      """{"type":"Polygon","coordinates":[[[0.0,0.0],[4.0,0.0],[4.0,4.0],[0.0,0.0]]]}""")
  }

  test("null and unsupported type") {
    assert(Wkb.toGeoJson(null) == null)
    val b = ByteBuffer.allocate(5).order(ByteOrder.LITTLE_ENDIAN)
    b.put(1.toByte).putInt(99)
    intercept[IllegalArgumentException](Wkb.toGeoJson(b.array()))
  }
}
