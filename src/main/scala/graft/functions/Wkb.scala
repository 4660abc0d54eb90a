package graft.functions

import java.nio.{ByteBuffer, ByteOrder}

/** Minimal WKB (well-known binary) geometry codec — just enough to
  * reproduce the reference's spatial pushdown surface
  * [ha_mytile.cc:2312–2507]: parse a constant geometry, take its MBR,
  * and turn `ST_INTERSECTS`/`ST_WITHIN` into dimension ranges. Supports
  * 2-D Point / LineString / Polygon / MultiPoint / MultiLineString /
  * MultiPolygon / GeometryCollection in either byte order, with the
  * EWKB SRID flag tolerated (SRID skipped).
  *
  * Geometry VALUES in graft are WKB `binary` columns; the predicate
  * functions ([[GraftSqlFunctions]]) define intersection on MBRs —
  * exact for points and axis-aligned boxes, the same approximation the
  * reference's storage layer answers before MariaDB's exact re-check.
  */
object Wkb {

  /** (xmin, ymin, xmax, ymax) of a WKB geometry. */
  def mbr(wkb: Array[Byte]): (Double, Double, Double, Double) = {
    val st = new Mbr
    geom(ByteBuffer.wrap(wkb), st)
    if (!st.seen) throw new IllegalArgumentException("empty WKB geometry")
    (st.xmin, st.ymin, st.xmax, st.ymax)
  }

  /** WKB for POINT(x y) — little-endian, the common writer default. */
  def point(x: Double, y: Double): Array[Byte] = {
    val b = ByteBuffer.allocate(21).order(ByteOrder.LITTLE_ENDIAN)
    b.put(1: Byte).putInt(1).putDouble(x).putDouble(y)
    b.array()
  }

  /** WKB for the rectangle POLYGON((xmin ymin, xmax ymin, xmax ymax,
    * xmin ymax, xmin ymin)) — a convenient constant-region builder. */
  def box(xmin: Double, ymin: Double, xmax: Double, ymax: Double)
      : Array[Byte] = {
    val b = ByteBuffer.allocate(1 + 4 + 4 + 4 + 5 * 16)
      .order(ByteOrder.LITTLE_ENDIAN)
    b.put(1: Byte).putInt(3).putInt(1).putInt(5)
    for ((x, y) <- Seq((xmin, ymin), (xmax, ymin), (xmax, ymax),
      (xmin, ymax), (xmin, ymin))) { b.putDouble(x); b.putDouble(y) }
    b.array()
  }

  private final class Mbr {
    var seen = false
    var xmin = Double.PositiveInfinity
    var ymin = Double.PositiveInfinity
    var xmax = Double.NegativeInfinity
    var ymax = Double.NegativeInfinity
    def add(x: Double, y: Double): Unit = {
      seen = true
      if (x < xmin) xmin = x
      if (x > xmax) xmax = x
      if (y < ymin) ymin = y
      if (y > ymax) ymax = y
    }
  }

  private val SridFlag = 0x20000000
  private val ZFlag = 0x80000000
  private val MFlag = 0x40000000

  private def geom(b: ByteBuffer, st: Mbr): Unit = {
    b.order(if (b.get() == 0) ByteOrder.BIG_ENDIAN else ByteOrder.LITTLE_ENDIAN)
    val typeWord = b.getInt
    // EWKB Z/M geometries carry extra ordinates per point — masking the
    // flags off and reading a 2-double stride would silently misparse;
    // reject them like the ISO 1002/2002/3002 codes below
    if ((typeWord & ZFlag) != 0 || (typeWord & MFlag) != 0)
      throw new IllegalArgumentException(
        "unsupported geometry: EWKB Z/M dimensions (2-D WKB only)")
    if ((typeWord & SridFlag) != 0) b.getInt // skip EWKB SRID
    (typeWord & 0xFFFF) match {
      case 1 => st.add(b.getDouble, b.getDouble) // Point
      case 2 => // LineString
        val n = b.getInt
        var i = 0
        while (i < n) { st.add(b.getDouble, b.getDouble); i += 1 }
      case 3 => // Polygon: rings of points
        val rings = b.getInt
        var r = 0
        while (r < rings) {
          val n = b.getInt
          var i = 0
          while (i < n) { st.add(b.getDouble, b.getDouble); i += 1 }
          r += 1
        }
      case 4 | 5 | 6 | 7 => // Multi* / collection: nested full WKBs
        val n = b.getInt
        var i = 0
        while (i < n) { geom(b, st); i += 1 }
      case other => throw new IllegalArgumentException(
        s"unsupported WKB geometry type $other")
    }
  }
}
