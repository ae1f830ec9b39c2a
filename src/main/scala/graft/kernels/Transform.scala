package graft.kernels

import graft.core.{FlatGeom, GeomKind}
import scala.collection.mutable.ArrayBuffer

/**
 * Coordinate transforms: composable 2×3 affine matrices
 * (geo/src/algorithm/affine_ops.rs:30), rotate/scale/skew/translate
 * convenience builders (rotate.rs:13, scale.rs:10, skew.rs:11,
 * translate.rs:3), map-coords, densify (densify.rs:57-120), Chaikin
 * smoothing (chaikin_smoothing.rs:16), repeated-point removal
 * (remove_repeated_points.rs:12), line locate/interpolate
 * (line_locate_point.rs:34, line_interpolate_point.rs:34).
 */
object Transform {

  /** Affine matrix [a b xoff; d e yoff] applied as
    * x' = a·x + b·y + xoff ; y' = d·x + e·y + yoff
    * (affine_ops.rs AffineTransform layout). */
  final case class Affine(a: Double, b: Double, xoff: Double, d: Double, e: Double, yoff: Double) {
    @inline def applyX(x: Double, y: Double): Double = a * x + b * y + xoff
    @inline def applyY(x: Double, y: Double): Double = d * x + e * y + yoff
    /** this ∘ other (apply `other` first, then `this`). */
    def compose(o: Affine): Affine = Affine(
      a * o.a + b * o.d,
      a * o.b + b * o.e,
      a * o.xoff + b * o.yoff + xoff,
      d * o.a + e * o.d,
      d * o.b + e * o.e,
      d * o.xoff + e * o.yoff + yoff)
  }

  object Affine {
    val identity: Affine = Affine(1, 0, 0, 0, 1, 0)
    def translate(tx: Double, ty: Double): Affine = Affine(1, 0, tx, 0, 1, ty)
    def scale(sx: Double, sy: Double, ox: Double, oy: Double): Affine =
      Affine(sx, 0, ox - sx * ox, 0, sy, oy - sy * oy)
    /** Rotation by degrees CCW about (ox, oy) (rotate.rs semantics). */
    def rotate(degrees: Double, ox: Double, oy: Double): Affine = {
      val r = Math.toRadians(degrees)
      val c = Math.cos(r)
      val s = Math.sin(r)
      Affine(c, -s, ox - ox * c + oy * s, s, c, oy - ox * s - oy * c)
    }
    /** Shear by degrees along x/y about (ox, oy) (skew.rs). */
    def skew(degX: Double, degY: Double, ox: Double, oy: Double): Affine = {
      val tx = Math.tan(Math.toRadians(degX))
      val ty = Math.tan(Math.toRadians(degY))
      Affine(1, tx, -oy * tx, ty, 1, -ox * ty)
    }
  }

  /** Structure-preserving map over every coordinate (map_coords.rs:31). */
  def mapCoords(g: FlatGeom)(f: (Double, Double) => (Double, Double)): FlatGeom = {
    val out = new Array[Double](g.coords.length)
    var i = 0
    while (i < g.numPoints) {
      val (nx, ny) = f(g.x(i), g.y(i))
      out(2 * i) = nx
      out(2 * i + 1) = ny
      i += 1
    }
    new FlatGeom(g.kind, out, g.rings.clone(), g.parts.clone())
  }

  def affine(g: FlatGeom, m: Affine): FlatGeom = {
    val out = new Array[Double](g.coords.length)
    var i = 0
    while (i < g.numPoints) {
      val x = g.x(i); val y = g.y(i)
      out(2 * i) = m.applyX(x, y)
      out(2 * i + 1) = m.applyY(x, y)
      i += 1
    }
    new FlatGeom(g.kind, out, g.rings.clone(), g.parts.clone())
  }

  def toRadians(g: FlatGeom): FlatGeom = mapCoords(g)((x, y) => (Math.toRadians(x), Math.toRadians(y)))
  def toDegrees(g: FlatGeom): FlatGeom = mapCoords(g)((x, y) => (Math.toDegrees(x), Math.toDegrees(y)))

  /** Rotation center = bbox center (rotate.rs uses centroid for
    * `rotate_around_centroid`, bbox center for `rotate_around_center`). */
  def rotateAroundCenter(g: FlatGeom, degrees: Double): FlatGeom = {
    val bb = Planar.boundingRect(g)
    affine(g, Affine.rotate(degrees, (bb(0) + bb(2)) / 2.0, (bb(1) + bb(3)) / 2.0))
  }

  def rotateAroundCentroid(g: FlatGeom, degrees: Double): FlatGeom = {
    val c = Planar.centroid(g)
    if (c == null) g else affine(g, Affine.rotate(degrees, c(0), c(1)))
  }

  // ---------------------------------------------------------- densify

  /** Insert intermediate points so no segment exceeds `maxLength`
    * (densify.rs:57-120). `metric` chooses the interpolation space:
    * 0 = Euclidean, 1 = Haversine, 2 = Rhumb, 3 = Geodesic.
    *
    * Returns null when any segment would need more than [[MaxSplits]]
    * inserted points (absurd coordinates or a vanishing maxLength):
    * the SQL surface null-propagates instead of letting one malformed
    * row allocate without bound and kill the task. */
  def densify(g: FlatGeom, maxLength: Double, metric: Int): FlatGeom = {
    require(maxLength > 0.0, "densify max length must be positive")
    g.kind match {
      case GeomKind.Point | GeomKind.MultiPoint => g
      case GeomKind.LineString =>
        val r = densifyRange(g, 0, g.numPoints, maxLength, metric)
        if (r == null) null else FlatGeom.lineString(r)
      case GeomKind.MultiLineString =>
        val lines = ArrayBuffer[Array[Double]]()
        var overflow = false
        FlatGeom.foreachRing(g) { (s, e) =>
          val r = densifyRange(g, s, e, maxLength, metric)
          if (r == null) overflow = true else lines += r
        }
        if (overflow) null else FlatGeom.multiLineString(lines.toSeq)
      case GeomKind.Polygon =>
        val ext = densifyRange(g, g.ringStart(0), g.ringEnd(0), maxLength, metric)
        val holes = (1 until g.rings.length).map(r =>
          densifyRange(g, g.ringStart(r), g.ringEnd(r), maxLength, metric))
        if (ext == null || holes.contains(null)) null
        else FlatGeom.polygon(ext, holes)
      case GeomKind.MultiPolygon =>
        val polys = ArrayBuffer[FlatGeom]()
        var overflow = false
        FlatGeom.foreachPart(g) { (_, r0, r1) =>
          val ext = densifyRange(g, g.ringStart(r0), g.ringEnd(r0), maxLength, metric)
          val holes = (r0 + 1 until r1).map(r =>
            densifyRange(g, g.ringStart(r), g.ringEnd(r), maxLength, metric))
          if (ext == null || holes.contains(null)) overflow = true
          else polys += FlatGeom.polygon(ext, holes)
        }
        if (overflow) null else FlatGeom.multiPolygon(polys.toSeq)
      case _ => g
    }
  }

  /** Hard per-segment split cap: ~8.4M inserted points (134 MB of
    * coords) — beyond this the input is treated as malformed. */
  final val MaxSplits: Long = 1L << 23

  private def densifyRange(g: FlatGeom, s: Int, e: Int, maxLength: Double, metric: Int): Array[Double] = {
    val out = new ArrayBuffer[Double]()
    var i = s
    while (i < e - 1) {
      val x1 = g.x(i); val y1 = g.y(i); val x2 = g.x(i + 1); val y2 = g.y(i + 1)
      out += x1; out += y1
      // metric solve once per segment; inserted points reuse it
      var gAzi1 = 0.0
      var gS12 = 0.0
      var rTheta = 0.0
      var rDelta = 0.0
      val len = metric match {
        case 1 => Sphere.haversineDistance(x1, y1, x2, y2)
        case 2 =>
          val td = Sphere.rhumbThetaDelta(x1, y1, x2, y2)
          rTheta = td(0); rDelta = td(1)
          rDelta * Sphere.MeanEarthRadius
        case 3 =>
          val inv = Geodesic.inverse(x1, y1, x2, y2)
          gS12 = inv._1; gAzi1 = inv._2
          gS12
        case _ => Math.hypot(x2 - x1, y2 - y1)
      }
      if (len > maxLength) {
        // densify.rs: n = ceil(len / max) segments; insert n-1 points at
        // ratios k/n via the metric's point_at_ratio_between
        val nd = Math.ceil(len / maxLength)
        if (!(nd <= MaxSplits.toDouble)) return null // NaN or absurd
        val n = nd.toLong
        var k = 1L
        while (k < n) {
          val ratio = k.toDouble / n.toDouble
          metric match {
            case 1 =>
              val p = Sphere.haversinePointAtRatio(x1, y1, x2, y2, ratio)
              out += p(0); out += p(1)
            case 2 =>
              val p = Sphere.rhumbDestinationRad(x1, y1, rTheta, ratio * rDelta)
              out += p(0); out += p(1)
            case 3 =>
              val p = Geodesic.direct(x1, y1, gAzi1, gS12 * ratio)
              out += p(0); out += p(1)
            case _ =>
              out += x1 + (x2 - x1) * ratio
              out += y1 + (y2 - y1) * ratio
          }
          k += 1
        }
      }
      i += 1
    }
    if (e - 1 >= s) { out += g.x(e - 1); out += g.y(e - 1) }
    out.toArray
  }

  // ---------------------------------------------------------- chaikin

  /** One Chaikin corner-cutting iteration applied `n` times
    * (chaikin_smoothing.rs:16; closed rings wrap around, open lines keep
    * their endpoints). */
  def chaikin(g: FlatGeom, iterations: Int): FlatGeom = {
    var cur = g
    var it = 0
    while (it < iterations) { cur = chaikinOnce(cur); it += 1 }
    cur
  }

  private def chaikinOnce(g: FlatGeom): FlatGeom = g.kind match {
    case GeomKind.Point | GeomKind.MultiPoint => g
    case GeomKind.LineString =>
      FlatGeom.lineString(chaikinRange(g, 0, g.numPoints, closed = false))
    case GeomKind.MultiLineString =>
      val lines = ArrayBuffer[Array[Double]]()
      FlatGeom.foreachRing(g)((s, e) => lines += chaikinRange(g, s, e, closed = false))
      FlatGeom.multiLineString(lines.toSeq)
    case GeomKind.Polygon =>
      val ext = chaikinRange(g, g.ringStart(0), g.ringEnd(0), closed = true)
      val holes = (1 until g.rings.length).map(r =>
        chaikinRange(g, g.ringStart(r), g.ringEnd(r), closed = true))
      FlatGeom.polygon(ext, holes)
    case GeomKind.MultiPolygon =>
      val polys = ArrayBuffer[FlatGeom]()
      FlatGeom.foreachPart(g) { (_, r0, r1) =>
        val ext = chaikinRange(g, g.ringStart(r0), g.ringEnd(r0), closed = true)
        val holes = (r0 + 1 until r1).map(r =>
          chaikinRange(g, g.ringStart(r), g.ringEnd(r), closed = true))
        polys += FlatGeom.polygon(ext, holes)
      }
      FlatGeom.multiPolygon(polys.toSeq)
    case _ => g
  }

  private def chaikinRange(g: FlatGeom, s: Int, e: Int, closed: Boolean): Array[Double] = {
    val n = e - s
    if (n < 3) {
      val out = new Array[Double](2 * n)
      var i = 0
      while (i < n) { out(2 * i) = g.x(s + i); out(2 * i + 1) = g.y(s + i); i += 1 }
      return out
    }
    val out = new ArrayBuffer[Double]()
    if (!closed) { out += g.x(s); out += g.y(s) }
    var i = s
    val last = if (closed) e - 1 else e - 1
    while (i < last) {
      val x1 = g.x(i); val y1 = g.y(i); val x2 = g.x(i + 1); val y2 = g.y(i + 1)
      out += 0.75 * x1 + 0.25 * x2
      out += 0.75 * y1 + 0.25 * y2
      out += 0.25 * x1 + 0.75 * x2
      out += 0.25 * y1 + 0.75 * y2
      i += 1
    }
    if (!closed) { out += g.x(e - 1); out += g.y(e - 1) }
    else { out += out(0); out += out(1) }
    out.toArray
  }

  // ------------------------------------------------- repeated points

  /** Drop consecutive duplicate coords (remove_repeated_points.rs:12);
    * MultiPoint drops exact duplicates anywhere. */
  def removeRepeatedPoints(g: FlatGeom): FlatGeom = g.kind match {
    case GeomKind.Point => g
    case GeomKind.MultiPoint =>
      val seen = scala.collection.mutable.LinkedHashSet[(Double, Double)]()
      var i = 0
      while (i < g.numPoints) { seen += ((g.x(i), g.y(i))); i += 1 }
      val out = new Array[Double](seen.size * 2)
      var j = 0
      seen.foreach { case (x, y) => out(2 * j) = x; out(2 * j + 1) = y; j += 1 }
      FlatGeom.multiPoint(out)
    case GeomKind.LineString => FlatGeom.lineString(dedupRange(g, 0, g.numPoints))
    case GeomKind.MultiLineString =>
      val lines = ArrayBuffer[Array[Double]]()
      FlatGeom.foreachRing(g)((s, e) => lines += dedupRange(g, s, e))
      FlatGeom.multiLineString(lines.toSeq)
    case GeomKind.Polygon =>
      val ext = dedupRange(g, g.ringStart(0), g.ringEnd(0))
      val holes = (1 until g.rings.length).map(r => dedupRange(g, g.ringStart(r), g.ringEnd(r)))
      FlatGeom.polygon(ext, holes)
    case GeomKind.MultiPolygon =>
      val polys = ArrayBuffer[FlatGeom]()
      FlatGeom.foreachPart(g) { (_, r0, r1) =>
        val ext = dedupRange(g, g.ringStart(r0), g.ringEnd(r0))
        val holes = (r0 + 1 until r1).map(r => dedupRange(g, g.ringStart(r), g.ringEnd(r)))
        polys += FlatGeom.polygon(ext, holes)
      }
      FlatGeom.multiPolygon(polys.toSeq)
    case _ => g
  }

  private def dedupRange(g: FlatGeom, s: Int, e: Int): Array[Double] = {
    val out = new ArrayBuffer[Double]()
    var i = s
    while (i < e) {
      if (i == s || g.x(i) != g.x(i - 1) || g.y(i) != g.y(i - 1)) { out += g.x(i); out += g.y(i) }
      i += 1
    }
    out.toArray
  }

  // ------------------------------------- line locate / interpolate

  /** Fraction of total 2-D length at the closest point to (px, py)
    * (line_locate_point.rs:34). NaN when degenerate. */
  def lineLocatePoint(g: FlatGeom, px: Double, py: Double): Double = {
    val total = Planar.euclideanLength(g)
    if (total == 0.0 || total.isNaN) return Double.NaN
    var best = Double.PositiveInfinity
    var bestCum = 0.0
    var cum = 0.0
    FlatGeom.foreachRing(g) { (s, e) =>
      var i = s
      while (i < e - 1) {
        val x1 = g.x(i); val y1 = g.y(i); val x2 = g.x(i + 1); val y2 = g.y(i + 1)
        val segLen = Math.hypot(x2 - x1, y2 - y1)
        val d = Planar.pointSegDistance(px, py, x1, y1, x2, y2)
        if (d < best) {
          best = d
          val c = Planar.closestOnSeg(px, py, x1, y1, x2, y2)
          bestCum = cum + Math.hypot(c(0) - x1, c(1) - y1)
        }
        cum += segLen
        i += 1
      }
    }
    bestCum / total
  }

  /** Point at `fraction` of total length (line_interpolate_point.rs:34):
    * fraction clamped to [0,1]; null for empty/degenerate input. */
  def lineInterpolatePoint(g: FlatGeom, fraction: Double): Array[Double] = {
    if (g.numPoints == 0 || fraction.isNaN) return null
    val f = Math.max(0.0, Math.min(1.0, fraction))
    val total = Planar.euclideanLength(g)
    if (total == 0.0) return null
    val target = f * total
    var cum = 0.0
    var result: Array[Double] = null
    FlatGeom.foreachRing(g) { (s, e) =>
      var i = s
      while (i < e - 1 && result == null) {
        val x1 = g.x(i); val y1 = g.y(i); val x2 = g.x(i + 1); val y2 = g.y(i + 1)
        val segLen = Math.hypot(x2 - x1, y2 - y1)
        if (cum + segLen >= target && segLen > 0.0) {
          val t = (target - cum) / segLen
          result = Array(x1 + t * (x2 - x1), y1 + t * (y2 - y1))
        }
        cum += segLen
        i += 1
      }
    }
    if (result == null) Array(g.x(g.numPoints - 1), g.y(g.numPoints - 1)) else result
  }

  // -------------------------------------------------------- extremes

  /** Min/max coordinate values and their point indices
    * (geo/src/algorithm/extremes.rs:27). Returns
    * (xminIdx, xmin, yminIdx, ymin, xmaxIdx, xmax, ymaxIdx, ymax). */
  def extremes(g: FlatGeom): Array[Double] = {
    if (g.isEmpty) return null
    var xminI = 0; var yminI = 0; var xmaxI = 0; var ymaxI = 0
    var i = 1
    while (i < g.numPoints) {
      if (g.x(i) < g.x(xminI)) xminI = i
      if (g.x(i) > g.x(xmaxI)) xmaxI = i
      if (g.y(i) < g.y(yminI)) yminI = i
      if (g.y(i) > g.y(ymaxI)) ymaxI = i
      i += 1
    }
    Array(xminI.toDouble, g.x(xminI), yminI.toDouble, g.y(yminI),
      xmaxI.toDouble, g.x(xmaxI), ymaxI.toDouble, g.y(ymaxI))
  }
}
