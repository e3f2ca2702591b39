package graft.cdc.types

import java.nio.{ByteBuffer, ByteOrder}

/** Minimal WKB codec + GeoJSON rendering (F12) — the reference converts
  * MySQL GEOMETRY WKB to GeoJSON via `OGCGeometry.fromBinary(wkb).asGeoJson()`
  * (MySqlDeserializationConverterFactory.java:68-113). We implement the
  * public WKB wire format (OGC 06-103r4) directly for the geometry types the
  * reference's tests exercise: Point, LineString, Polygon,
  * GeometryCollection (whose type name the reference fixes up explicitly).
  *
  * Not SQL-expressible -> exposed as a scalar UDF; covered by ScalaTest
  * round-trip tests instead of a DuckDB oracle.
  */
object Wkb {

  private val PointT = 1
  private val LineStringT = 2
  private val PolygonT = 3
  private val GeometryCollectionT = 7

  /** Encode an (x, y) point as little-endian WKB. */
  def encodePoint(x: Double, y: Double): Array[Byte] = {
    val b = ByteBuffer.allocate(21).order(ByteOrder.LITTLE_ENDIAN)
    b.put(1.toByte).putInt(PointT).putDouble(x).putDouble(y)
    b.array()
  }

  /** Encode a linestring as little-endian WKB. */
  def encodeLineString(pts: Seq[(Double, Double)]): Array[Byte] = {
    val b = ByteBuffer.allocate(9 + 16 * pts.size).order(ByteOrder.LITTLE_ENDIAN)
    b.put(1.toByte).putInt(LineStringT).putInt(pts.size)
    pts.foreach { case (x, y) => b.putDouble(x).putDouble(y) }
    b.array()
  }

  /** WKB -> GeoJSON string. Number formatting uses Java's shortest-repr
    * double rendering (stable and deterministic).
    */
  def toGeoJson(wkb: Array[Byte]): String = {
    if (wkb == null) return null
    val b = ByteBuffer.wrap(wkb)
    readGeometry(b)
  }

  private def readGeometry(b: ByteBuffer): String = {
    val order = b.get()
    b.order(if (order == 1) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN)
    b.getInt() match {
      case PointT =>
        s"""{"type":"Point","coordinates":${coord(b)}}"""
      case LineStringT =>
        val n = b.getInt()
        val cs = (1 to n).map(_ => coord(b)).mkString(",")
        s"""{"type":"LineString","coordinates":[$cs]}"""
      case PolygonT =>
        val rings = b.getInt()
        val rs = (1 to rings).map { _ =>
          val n = b.getInt()
          (1 to n).map(_ => coord(b)).mkString("[", ",", "]")
        }.mkString(",")
        s"""{"type":"Polygon","coordinates":[$rs]}"""
      case GeometryCollectionT =>
        // The reference patches esri's "GeometryCollection" spelling
        // explicitly (MySqlDeserializationConverterFactory.java:93-102).
        val n = b.getInt()
        val gs = (1 to n).map(_ => readGeometry(b)).mkString(",")
        s"""{"type":"GeometryCollection","geometries":[$gs]}"""
      case t =>
        throw new IllegalArgumentException(s"unsupported WKB geometry type $t")
    }
  }

  private def coord(b: ByteBuffer): String =
    s"[${b.getDouble()},${b.getDouble()}]"
}
