package graft.kernels

import graft.core.{FlatGeom, GeomKind}

/**
 * Minimum enclosing circle (smallest circle containing every vertex).
 *
 * Welzl's move-to-front algorithm (E. Welzl, "Smallest enclosing disks
 * (balls and ellipsoids)", 1991) in its deterministic incremental
 * form, run over the convex-hull vertices: the MEC is determined by
 * hull points only, so the O(h^3) worst case is bounded by the hull
 * size h, and the fixed scan order makes the result a pure function
 * of the input (no RNG — the engine's reproducibility contract).
 *
 * Reference surface parity: PostGIS ST_MinimumBoundingRadius /
 * ST_MinimumBoundingCircle; JTS MinimumBoundingCircle (oracle in
 * MecSpec). The geo crate has no counterpart (bonus surface).
 */
object Mec {

  /** Relative slack for the "outside" test: a point is outside when
    * dist^2 > r^2 * (1 + EPS). Protects against the support points
    * themselves re-triggering on last-ulp noise. */
  private final val EPS = 1e-12

  /** Exact MEC over interleaved points. Returns Array(cx, cy, r);
    * null for empty input. r = 0 for a single (repeated) point. */
  def circle(ptsIn: Array[Double]): Array[Double] = {
    if (ptsIn.length == 0) return null
    if (ptsIn.length == 2) return Array(ptsIn(0), ptsIn(1), 0.0)
    // Hull bound: MEC support points lie on the convex hull.
    val hull = Hull.quickHull(ptsIn)
    // quickHull returns a closed ring — drop the duplicated last point.
    val pts =
      if (hull.length >= 8) java.util.Arrays.copyOf(hull, hull.length - 2)
      else hull
    val n = pts.length >> 1
    if (n == 1) return Array(pts(0), pts(1), 0.0)

    var c = diameter(pts(0), pts(1), pts(2), pts(3))
    var i = 2
    while (i < n) {
      if (!inside(c, pts(2 * i), pts(2 * i + 1))) c = withOne(pts, i)
      i += 1
    }
    Array(c(0), c(1), Math.sqrt(c(2)))
  }

  /** MEC of pts[0..i-1] with pts(i) on the boundary. */
  private def withOne(pts: Array[Double], i: Int): Array[Double] = {
    val qx = pts(2 * i); val qy = pts(2 * i + 1)
    var c = diameter(pts(0), pts(1), qx, qy)
    var j = 1
    while (j < i) {
      if (!inside(c, pts(2 * j), pts(2 * j + 1))) c = withTwo(pts, j, qx, qy)
      j += 1
    }
    c
  }

  /** MEC of pts[0..j-1] with q and pts(j) on the boundary. */
  private def withTwo(pts: Array[Double], j: Int, qx: Double, qy: Double): Array[Double] = {
    val px = pts(2 * j); val py = pts(2 * j + 1)
    var c = diameter(qx, qy, px, py)
    var k = 0
    while (k < j) {
      if (!inside(c, pts(2 * k), pts(2 * k + 1)))
        c = circumcircle(qx, qy, px, py, pts(2 * k), pts(2 * k + 1))
      k += 1
    }
    c
  }

  /** (cx, cy, r^2) of the circle with segment ab as diameter. */
  private def diameter(ax: Double, ay: Double, bx: Double, by: Double): Array[Double] = {
    val cx = (ax + bx) / 2.0; val cy = (ay + by) / 2.0
    val dx = ax - cx; val dy = ay - cy
    Array(cx, cy, dx * dx + dy * dy)
  }

  /** (cx, cy, r^2) through three points; collinear inputs fall back
    * to the diameter of the two farthest apart. */
  private def circumcircle(ax: Double, ay: Double, bx: Double, by: Double,
      cx0: Double, cy0: Double): Array[Double] = {
    val d = 2.0 * (ax * (by - cy0) + bx * (cy0 - ay) + cx0 * (ay - by))
    if (d == 0.0) {
      val dab = sq(ax - bx) + sq(ay - by)
      val dac = sq(ax - cx0) + sq(ay - cy0)
      val dbc = sq(bx - cx0) + sq(by - cy0)
      if (dab >= dac && dab >= dbc) return diameter(ax, ay, bx, by)
      if (dac >= dbc) return diameter(ax, ay, cx0, cy0)
      return diameter(bx, by, cx0, cy0)
    }
    val a2 = ax * ax + ay * ay
    val b2 = bx * bx + by * by
    val c2 = cx0 * cx0 + cy0 * cy0
    val ux = (a2 * (by - cy0) + b2 * (cy0 - ay) + c2 * (ay - by)) / d
    val uy = (a2 * (cx0 - bx) + b2 * (ax - cx0) + c2 * (bx - ax)) / d
    Array(ux, uy, sq(ax - ux) + sq(ay - uy))
  }

  @inline private def sq(v: Double): Double = v * v

  @inline private def inside(c: Array[Double], x: Double, y: Double): Boolean = {
    val dx = x - c(0); val dy = y - c(1)
    dx * dx + dy * dy <= c(2) * (1.0 + EPS) + java.lang.Double.MIN_NORMAL
  }

  /** The circle as a polygon: 4*segs vertices at angles 2πk/(4·segs)
    * starting from angle 0, CCW, closed (the PostGIS
    * ST_MinimumBoundingCircle discretization). r = 0 → POINT. */
  def circlePolygon(c: Array[Double], segs: Int): FlatGeom = {
    if (c == null) return FlatGeom.empty
    val Array(cx, cy, r) = c
    if (r == 0.0) return FlatGeom.point(cx, cy)
    val n = 4 * math.max(1, segs)
    val ring = new Array[Double](2 * n + 2)
    var k = 0
    while (k < n) {
      val t = 2.0 * Math.PI * k / n
      ring(2 * k) = cx + r * Math.cos(t)
      ring(2 * k + 1) = cy + r * Math.sin(t)
      k += 1
    }
    ring(2 * n) = ring(0); ring(2 * n + 1) = ring(1)
    FlatGeom.polygon(ring)
  }
}
