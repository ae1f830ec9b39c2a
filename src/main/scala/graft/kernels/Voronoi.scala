package graft.kernels

import graft.core.FlatGeom
import scala.collection.mutable.ArrayBuffer

/**
 * Voronoi diagram of a point set, clipped to a rectangle — an operator
 * the reference lacks entirely (the geo crate has no Voronoi; its
 * Delaunay comes from the external `spade` crate,
 * geo/src/algorithm/triangulate_spade.rs:96, with no dual exposed).
 *
 * Construction: each cell is the intersection of the clip rectangle
 * with the half-planes closer to its site than to every other site
 * (Sutherland-Hodgman convex clipping against perpendicular
 * bisectors). O(n² · cell-size) per point set — chosen over the
 * Delaunay-dual extraction because it is exact, branch-free on
 * degeneracies (collinear/cocircular sites just produce touching
 * cells), and the operator is used per-GROUP in the engine (bounded
 * site counts, like concave hull), never across the whole relation.
 *
 * Cells are returned in SITE ORDER (first occurrence of each distinct
 * site), so cell i pairs with site i without a point-in-polygon
 * re-match; JTS's VoronoiDiagramBuilder returns collection order and
 * makes callers re-associate.
 */
object Voronoi {

  /** Default clip: the site envelope expanded by its larger dimension
    * on every side (the JTS VoronoiDiagramBuilder default). */
  def defaultClip(xs: Array[Double]): (Double, Double, Double, Double) = {
    var minX = Double.PositiveInfinity; var maxX = Double.NegativeInfinity
    var minY = Double.PositiveInfinity; var maxY = Double.NegativeInfinity
    var i = 0
    while (i < xs.length) {
      val x = xs(i); val y = xs(i + 1)
      if (x < minX) minX = x; if (x > maxX) maxX = x
      if (y < minY) minY = y; if (y > maxY) maxY = y
      i += 2
    }
    val pad = Math.max(maxX - minX, maxY - minY) match {
      case 0.0 => 1.0
      case d => d
    }
    (minX - pad, minY - pad, maxX + pad, maxY + pad)
  }

  /** Distinct sites of a geometry's coordinates, first-occurrence
    * order, interleaved. */
  def distinctSites(g: FlatGeom): Array[Double] = {
    val seen = scala.collection.mutable.LinkedHashSet[(Double, Double)]()
    var i = 0
    while (i < g.numPoints) { seen.add((g.x(i), g.y(i))); i += 1 }
    val out = new Array[Double](2 * seen.size)
    var k = 0
    seen.foreach { case (x, y) => out(2 * k) = x; out(2 * k + 1) = y; k += 1 }
    out
  }

  /** Voronoi cells of the interleaved `sites` (must be distinct),
    * clipped to [minX,maxX]×[minY,maxY]. Returns one closed CCW ring
    * per site, in site order; a site whose cell misses the clip
    * rectangle entirely (site far outside it) yields an empty array.
    * One site yields the whole rectangle. */
  def cells(sites: Array[Double], minX: Double, minY: Double,
      maxX: Double, maxY: Double): Array[Array[Double]] = {
    val n = sites.length >> 1
    val out = new Array[Array[Double]](n)
    if (n == 0 || minX >= maxX || minY >= maxY) {
      java.util.Arrays.fill(out.asInstanceOf[Array[AnyRef]], Array.emptyDoubleArray)
      return out
    }
    var i = 0
    while (i < n) {
      val xi = sites(2 * i); val yi = sites(2 * i + 1)
      // start from the clip rectangle (CCW) and cut by each bisector
      var poly = Array(minX, minY, maxX, minY, maxX, maxY, minX, maxY)
      var j = 0
      while (j < n && poly.length >= 6) {
        if (j != i) {
          val xj = sites(2 * j); val yj = sites(2 * j + 1)
          // keep p with |p-si|^2 <= |p-sj|^2:
          //   2(xj-xi)px + 2(yj-yi)py <= xj^2+yj^2-xi^2-yi^2
          val a = 2.0 * (xj - xi); val b = 2.0 * (yj - yi)
          val c = xj * xj + yj * yj - xi * xi - yi * yi
          poly = clipHalfPlane(poly, a, b, c)
        }
        j += 1
      }
      out(i) = if (poly.length >= 6) closeRing(poly) else Array.emptyDoubleArray
      i += 1
    }
    out
  }

  /** Sutherland-Hodgman: convex `poly` (open interleaved ring) cut by
    * a*x + b*y <= c. */
  private def clipHalfPlane(poly: Array[Double], a: Double, b: Double,
      c: Double): Array[Double] = {
    val n = poly.length >> 1
    val out = new ArrayBuffer[Double](poly.length + 4)
    var k = 0
    while (k < n) {
      val x1 = poly(2 * k); val y1 = poly(2 * k + 1)
      val k2 = (k + 1) % n
      val x2 = poly(2 * k2); val y2 = poly(2 * k2 + 1)
      val d1 = a * x1 + b * y1 - c
      val d2 = a * x2 + b * y2 - c
      if (d1 <= 0) { out += x1; out += y1 }
      if ((d1 < 0 && d2 > 0) || (d1 > 0 && d2 < 0)) {
        val t = d1 / (d1 - d2)
        out += x1 + t * (x2 - x1)
        out += y1 + t * (y2 - y1)
      }
      k += 1
    }
    // drop consecutive duplicates the crossing insertion can create
    // when a vertex lies exactly on the cut line
    val dd = new ArrayBuffer[Double](out.length)
    val m = out.length >> 1
    var q = 0
    while (q < m) {
      val l = dd.length
      if (l == 0 || dd(l - 2) != out(2 * q) || dd(l - 1) != out(2 * q + 1)) {
        dd += out(2 * q); dd += out(2 * q + 1)
      }
      q += 1
    }
    while (dd.length >= 4 && dd(0) == dd(dd.length - 2) && dd(1) == dd(dd.length - 1))
      dd.remove(dd.length - 2, 2)
    dd.toArray
  }

  private def closeRing(open: Array[Double]): Array[Double] = {
    val out = java.util.Arrays.copyOf(open, open.length + 2)
    out(open.length) = open(0)
    out(open.length + 1) = open(1)
    out
  }
}
