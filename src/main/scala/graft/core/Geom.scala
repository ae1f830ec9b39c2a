package graft.core

/**
 * Flat geometry encoding shared by the typed (Dataset) and columnar
 * (Catalyst) sides of the engine.
 *
 * Layout (mirrors the variants of the reference's `Geometry` enum,
 * geo-types/src/geometry/mod.rs:51-62, collapsed to Double coords —
 * the reference's default `T = f64`):
 *
 *   kind   : 1=Point 2=LineString 3=Polygon 4=MultiPoint
 *            5=MultiLineString 6=MultiPolygon
 *            (Line/Rect/Triangle normalize to LineString/Polygon on
 *             construction; GeometryCollection is rejected in v0 —
 *             SURVEY.md §7.3 risk 6.)
 *   coords : interleaved x0,y0,x1,y1,...
 *   rings  : cumulative END offsets, in POINTS, of each ring/line.
 *            Point/MultiPoint: empty. LineString: [n].
 *            Polygon: [nExt, nExt+nHole1, ...].
 *            MultiLineString: one entry per line.
 *            MultiPolygon: entries for every ring of every part.
 *   parts  : cumulative END offsets, in RINGS, of each part
 *            (MultiPolygon only; others empty).
 *
 * Kernels take `(coords, start, end)` point slices so the Catalyst
 * `InternalRow` path and the case-class path share one code path
 * (the analogue of the reference's `geo-traits` accessor layer,
 * geo-traits/src/geometry.rs:19).
 */
final class FlatGeom(
    val kind: Byte,
    val coords: Array[Double],
    val rings: Array[Int],
    val parts: Array[Int]) extends Serializable {

  def numPoints: Int = coords.length >> 1
  def numRings: Int = if (rings.length == 0 && numPoints > 0 && kind != GeomKind.Point && kind != GeomKind.MultiPoint) 1 else rings.length
  def isEmpty: Boolean = coords.length == 0

  /** Point-start offset of ring i (in points). */
  def ringStart(i: Int): Int = if (i == 0) 0 else rings(i - 1)
  def ringEnd(i: Int): Int = rings(i)
  /** Ring-start offset of part p (in rings). */
  def partStart(p: Int): Int = if (p == 0) 0 else parts(p - 1)
  def partEnd(p: Int): Int = parts(p)
  def numParts: Int = kind match {
    case GeomKind.Point | GeomKind.LineString | GeomKind.Polygon => 1
    case GeomKind.MultiPoint => numPoints
    case GeomKind.MultiLineString => rings.length
    case GeomKind.MultiPolygon => parts.length
    case _ => 0
  }

  def x(i: Int): Double = coords(2 * i)
  def y(i: Int): Double = coords(2 * i + 1)

  override def equals(o: Any): Boolean = o match {
    case g: FlatGeom =>
      kind == g.kind &&
        java.util.Arrays.equals(coords, g.coords) &&
        java.util.Arrays.equals(rings, g.rings) &&
        java.util.Arrays.equals(parts, g.parts)
    case _ => false
  }
  override def hashCode: Int = {
    var h = kind.toInt
    h = 31 * h + java.util.Arrays.hashCode(coords)
    h = 31 * h + java.util.Arrays.hashCode(rings)
    h = 31 * h + java.util.Arrays.hashCode(parts)
    h
  }
  override def toString: String = Wkt.write(this)
}

object GeomKind {
  final val Point: Byte = 1
  final val LineString: Byte = 2
  final val Polygon: Byte = 3
  final val MultiPoint: Byte = 4
  final val MultiLineString: Byte = 5
  final val MultiPolygon: Byte = 6
  def name(k: Byte): String = k match {
    case Point => "POINT"
    case LineString => "LINESTRING"
    case Polygon => "POLYGON"
    case MultiPoint => "MULTIPOINT"
    case MultiLineString => "MULTILINESTRING"
    case MultiPolygon => "MULTIPOLYGON"
    case _ => s"UNKNOWN($k)"
  }
}

object FlatGeom {
  val empty: FlatGeom =
    new FlatGeom(GeomKind.Point, Array.emptyDoubleArray, Array.emptyIntArray, Array.emptyIntArray)

  def point(x: Double, y: Double): FlatGeom =
    new FlatGeom(GeomKind.Point, Array(x, y), Array.emptyIntArray, Array.emptyIntArray)

  def lineString(coords: Array[Double]): FlatGeom = {
    require(coords.length % 2 == 0, "interleaved coords must have even length")
    new FlatGeom(GeomKind.LineString, coords, Array(coords.length >> 1), Array.emptyIntArray)
  }

  def multiPoint(coords: Array[Double]): FlatGeom =
    new FlatGeom(GeomKind.MultiPoint, coords, Array.emptyIntArray, Array.emptyIntArray)

  /** Rings auto-closed, matching Polygon::new (reference
    * geo-types/src/geometry/polygon.rs:106-115). */
  def polygon(exterior: Array[Double], holes: Seq[Array[Double]] = Nil): FlatGeom = {
    val ext = closeRing(exterior)
    val hs = holes.map(closeRing)
    val coords = new Array[Double](ext.length + hs.map(_.length).sum)
    System.arraycopy(ext, 0, coords, 0, ext.length)
    var off = ext.length
    hs.foreach { h => System.arraycopy(h, 0, coords, off, h.length); off += h.length }
    val rings = new Array[Int](1 + hs.length)
    var cum = ext.length >> 1
    rings(0) = cum
    var i = 0
    while (i < hs.length) { cum += hs(i).length >> 1; rings(i + 1) = cum; i += 1 }
    new FlatGeom(GeomKind.Polygon, coords, rings, Array.emptyIntArray)
  }

  def multiLineString(lines: Seq[Array[Double]]): FlatGeom = {
    val coords = new Array[Double](lines.map(_.length).sum)
    var off = 0
    lines.foreach { l => System.arraycopy(l, 0, coords, off, l.length); off += l.length }
    val rings = new Array[Int](lines.length)
    var cum = 0
    var i = 0
    while (i < lines.length) { cum += lines(i).length >> 1; rings(i) = cum; i += 1 }
    new FlatGeom(GeomKind.MultiLineString, coords, rings, Array.emptyIntArray)
  }

  def multiPolygon(polys: Seq[FlatGeom]): FlatGeom = {
    require(polys.forall(_.kind == GeomKind.Polygon))
    val coords = new Array[Double](polys.map(_.coords.length).sum)
    var off = 0
    polys.foreach { p => System.arraycopy(p.coords, 0, coords, off, p.coords.length); off += p.coords.length }
    val rings = new Array[Int](polys.map(_.rings.length).sum)
    val parts = new Array[Int](polys.length)
    var ri = 0
    var pointCum = 0
    var ringCum = 0
    var pi = 0
    polys.foreach { p =>
      var j = 0
      while (j < p.rings.length) { rings(ri) = pointCum + p.rings(j); ri += 1; j += 1 }
      pointCum += p.numPoints
      ringCum += p.rings.length
      parts(pi) = ringCum
      pi += 1
    }
    new FlatGeom(GeomKind.MultiPolygon, coords, rings, parts)
  }

  def rect(minX: Double, minY: Double, maxX: Double, maxY: Double): FlatGeom =
    polygon(Array(minX, minY, maxX, minY, maxX, maxY, minX, maxY, minX, minY))

  /** Close a ring if open (first point appended at end), as the reference
    * does in Polygon::new / LineString::close (line_string.rs). */
  def closeRing(r: Array[Double]): Array[Double] = {
    if (r.length < 2) return r
    val n = r.length
    if (r(0) == r(n - 2) && r(1) == r(n - 1)) r
    else {
      val out = java.util.Arrays.copyOf(r, n + 2)
      out(n) = r(0)
      out(n + 1) = r(1)
      out
    }
  }

  /** Iterate the (start,end) point-slices of every ring/line of a geometry,
    * treating MultiPoint/Point as zero rings. */
  def foreachRing(g: FlatGeom)(f: (Int, Int) => Unit): Unit = {
    var prev = 0
    var i = 0
    while (i < g.rings.length) { f(prev, g.rings(i)); prev = g.rings(i); i += 1 }
  }

  /** Decompose a MultiPolygon (or Polygon) into per-polygon ring slices:
    * f(exteriorStart, exteriorEnd, holeRingIndices...) via callback over
    * (partIndex, ringStartIdx, ringEndIdx) in ring space. */
  def foreachPart(g: FlatGeom)(f: (Int, Int, Int) => Unit): Unit = g.kind match {
    case GeomKind.Polygon => f(0, 0, g.rings.length)
    case GeomKind.MultiPolygon =>
      var p = 0
      while (p < g.parts.length) { f(p, g.partStart(p), g.partEnd(p)); p += 1 }
    case _ => f(0, 0, g.rings.length)
  }

  /** Extract part p of a multi-geometry as its own FlatGeom. */
  def part(g: FlatGeom, p: Int): FlatGeom = g.kind match {
    case GeomKind.Point | GeomKind.LineString | GeomKind.Polygon => g
    case GeomKind.MultiPoint => point(g.x(p), g.y(p))
    case GeomKind.MultiLineString =>
      val s = g.ringStart(p) * 2; val e = g.ringEnd(p) * 2
      lineString(java.util.Arrays.copyOfRange(g.coords, s, e))
    case GeomKind.MultiPolygon =>
      val r0 = g.partStart(p); val r1 = g.partEnd(p)
      val ps = g.ringStart(r0) * 2
      val pe = g.ringEnd(r1 - 1) * 2
      val coords = java.util.Arrays.copyOfRange(g.coords, ps, pe)
      val rings = new Array[Int](r1 - r0)
      var i = r0
      while (i < r1) { rings(i - r0) = g.ringEnd(i) - g.ringStart(r0); i += 1 }
      new FlatGeom(GeomKind.Polygon, coords, rings, Array.emptyIntArray)
    case _ => g
  }
}
