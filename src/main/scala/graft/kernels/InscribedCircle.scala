package graft.kernels

import graft.core.FlatGeom
import graft.index.STRtree

/**
 * Maximum inscribed circle and largest empty circle by successive
 * quad refinement (the published JTS/GEOS algorithm: branch-and-bound
 * over square cells with the Lipschitz bound value(cell) <=
 * value(centroid) + halfSide*sqrt(2)) — neither exists in the
 * reference (the geo crate has no inscribed-circle operator).
 *
 * The distance field is signed distance-to-boundary (positive inside)
 * for the inscribed circle, and distance-to-nearest-obstacle within a
 * convex-hull boundary for the empty circle; both share the solver.
 */
object InscribedCircle {

  /** (centerX, centerY, nearestX, nearestY, radius) of the maximum
    * inscribed circle of an areal geometry, to tolerance `tol` on the
    * radius; None for empty/non-areal input or tol <= 0. */
  def maximumInscribedCircle(g: FlatGeom, tol: Double): Option[(Double, Double, Double, Double, Double)] = {
    if (g == null || g.isEmpty || Relate.dimClass(g) != 2 || !(tol > 0)) return None
    val bnd = Topo.boundary(g)
    if (bnd.isEmpty) return None
    val (tree, x1, y1, x2, y2) = STRtree.ofSegments(bnd)
    @inline def segDist(px: Double, py: Double, i: Int): Double = {
      val dx = x2(i) - x1(i); val dy = y2(i) - y1(i)
      val l2 = dx * dx + dy * dy
      val t = if (l2 == 0) 0.0
        else Math.max(0.0, Math.min(1.0, ((px - x1(i)) * dx + (py - y1(i)) * dy) / l2))
      Math.hypot(px - (x1(i) + t * dx), py - (y1(i) + t * dy))
    }
    def value(px: Double, py: Double): Double = {
      val d = tree.nearestDist(px, py, Double.MaxValue, i => segDist(px, py, i))
      if (Planar.coordPos(g, px, py) != Planar.Outside) d else -d
    }
    solve(g, value, tol).map { case (cx, cy, r) =>
      // nearest boundary point from the center
      var best = Double.MaxValue; var bi = -1; var bt = 0.0
      var i = 0
      while (i < x1.length) {
        val dx = x2(i) - x1(i); val dy = y2(i) - y1(i)
        val l2 = dx * dx + dy * dy
        val t = if (l2 == 0) 0.0
          else Math.max(0.0, Math.min(1.0, ((cx - x1(i)) * dx + (cy - y1(i)) * dy) / l2))
        val d = Math.hypot(cx - (x1(i) + t * dx), cy - (y1(i) + t * dy))
        if (d < best) { best = d; bi = i; bt = t }
        i += 1
      }
      val nx = x1(bi) + bt * (x2(bi) - x1(bi))
      val ny = y1(bi) + bt * (y2(bi) - y1(bi))
      (cx, cy, nx, ny, r)
    }
  }

  /** Largest circle empty of the 0/1/2-D `obstacles`, centered within
    * the obstacles' convex hull (the JTS LargestEmptyCircle boundary
    * convention), to tolerance `tol`. */
  def largestEmptyCircle(obstacles: FlatGeom, tol: Double): Option[(Double, Double, Double, Double, Double)] = {
    if (obstacles == null || obstacles.isEmpty || !(tol > 0)) return None
    val hull = {
      val h = Hull.quickHull(obstacles.coords)
      if (h.length < 6) return None
      val p = FlatGeom.polygon(h)
      // collinear obstacle sets hull to a zero-area sliver: no interior
      if (Planar.unsignedArea(p) == 0.0) return None
      p
    }
    val (tree, x1, y1, x2, y2) = STRtree.ofSegments(segmentsOf(obstacles))
    @inline def segDist(px: Double, py: Double, i: Int): Double = {
      val dx = x2(i) - x1(i); val dy = y2(i) - y1(i)
      val l2 = dx * dx + dy * dy
      val t = if (l2 == 0) 0.0
        else Math.max(0.0, Math.min(1.0, ((px - x1(i)) * dx + (py - y1(i)) * dy) / l2))
      Math.hypot(px - (x1(i) + t * dx), py - (y1(i) + t * dy))
    }
    def value(px: Double, py: Double): Double = {
      val d = tree.nearestDist(px, py, Double.MaxValue, i => segDist(px, py, i))
      if (Planar.coordPos(hull, px, py) != Planar.Outside) d else -d
    }
    solve(hull, value, tol).map { case (cx, cy, r) =>
      var best = Double.MaxValue; var bx = cx; var by = cy
      var i = 0
      while (i < x1.length) {
        val dx = x2(i) - x1(i); val dy = y2(i) - y1(i)
        val l2 = dx * dx + dy * dy
        val t = if (l2 == 0) 0.0
          else Math.max(0.0, Math.min(1.0, ((cx - x1(i)) * dx + (cy - y1(i)) * dy) / l2))
        val d = Math.hypot(cx - (x1(i) + t * dx), cy - (y1(i) + t * dy))
        if (d < best) { best = d; bx = x1(i) + t * dx; by = y1(i) + t * dy }
        i += 1
      }
      (cx, cy, bx, by, r)
    }
  }

  /** All segments of any geometry as a MultiLineString; isolated
    * points become zero-length segments. */
  private def segmentsOf(g: FlatGeom): FlatGeom = {
    val lines = scala.collection.mutable.ArrayBuffer[Array[Double]]()
    if (g.rings.isEmpty) {
      var i = 0
      while (i < g.numPoints) {
        lines += Array(g.x(i), g.y(i), g.x(i), g.y(i))
        i += 1
      }
    } else FlatGeom.foreachRing(g) { (s, e) =>
      if (e - s == 1) lines += Array(g.x(s), g.y(s), g.x(s), g.y(s))
      else {
        val arr = new Array[Double](2 * (e - s))
        var i = s
        while (i < e) { arr(2 * (i - s)) = g.x(i); arr(2 * (i - s) + 1) = g.y(i); i += 1 }
        lines += arr
      }
    }
    FlatGeom.multiLineString(lines.toSeq)
  }

  /** Branch-and-bound quad refinement of `value` over the envelope of
    * `domain`, seeded with its interior point. */
  private def solve(domain: FlatGeom, value: (Double, Double) => Double,
      tol: Double): Option[(Double, Double, Double)] = {
    var minX = Double.PositiveInfinity; var maxX = Double.NegativeInfinity
    var minY = Double.PositiveInfinity; var maxY = Double.NegativeInfinity
    var i = 0
    while (i < domain.numPoints) {
      val x = domain.x(i); val y = domain.y(i)
      if (x < minX) minX = x; if (x > maxX) maxX = x
      if (y < minY) minY = y; if (y > maxY) maxY = y
      i += 1
    }
    if (!(maxX > minX) && !(maxY > minY)) return None
    val cx0 = (minX + maxX) / 2; val cy0 = (minY + maxY) / 2
    val h0 = Math.max(maxX - minX, maxY - minY) / 2
    // best-first queue on the cell's potential (centroid value + h*sqrt2)
    final case class Cell(x: Double, y: Double, h: Double, v: Double) {
      def potential: Double = v + h * Math.sqrt(2.0)
    }
    val pq = new java.util.PriorityQueue[Cell](64,
      (a: Cell, b: Cell) => java.lang.Double.compare(b.potential, a.potential))
    pq.add(Cell(cx0, cy0, h0, value(cx0, cy0)))
    // seed with the domain's interior point so a thin domain whose
    // envelope centroid is outside still converges
    val ip = Topo.interiorPointApprox(domain)
    var bestX = cx0; var bestY = cy0; var bestV = Double.NegativeInfinity
    if (ip != null) {
      bestX = ip(0); bestY = ip(1); bestV = value(ip(0), ip(1))
    }
    val first = pq.peek()
    if (first.v > bestV) { bestX = first.x; bestY = first.y; bestV = first.v }
    var iters = 0
    while (!pq.isEmpty && iters < 200000) {
      val cell = pq.poll()
      if (cell.potential - bestV > tol) {
        val h = cell.h / 2
        var qx = 0
        while (qx < 2) {
          var qy = 0
          while (qy < 2) {
            val nx = cell.x + (if (qx == 0) -h else h)
            val ny = cell.y + (if (qy == 0) -h else h)
            val v = value(nx, ny)
            if (v > bestV) { bestV = v; bestX = nx; bestY = ny }
            val c = Cell(nx, ny, h, v)
            if (c.potential - bestV > tol) pq.add(c)
            qy += 1
          }
          qx += 1
        }
      }
      iters += 1
    }
    if (bestV < 0) None else Some((bestX, bestY, bestV))
  }
}
