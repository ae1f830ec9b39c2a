package graft.kernels

import graft.core.{FlatGeom, GeomKind}

/**
 * Geometric median (the point minimizing the sum of Euclidean
 * distances to the input points) — `ST_GeometricMedian` parity, an op
 * the reference geo crate does not have. Weiszfeld's fixed-point
 * iteration with the Vardi–Zhang (2000, PNAS 97:1423) modified step,
 * which stays convergent when an iterate lands exactly on an input
 * point (plain Weiszfeld divides by zero there):
 *
 *   T(y)  = (Σ pᵢ/dᵢ) / (Σ 1/dᵢ)      over pᵢ ≠ y
 *   R(y)  = Σ (pᵢ − y)/dᵢ             over pᵢ ≠ y
 *   η(y)  = 1 if y coincides with an input point, else 0
 *   y'    = max(0, 1 − η/‖R‖)·T(y) + min(1, η/‖R‖)·y
 *
 * Deterministic: start from the arithmetic centroid, fixed
 * left-to-right accumulation order, absolute step tolerance.
 */
object Median {

  /** Points-only contract (PostGIS: POINT/MULTIPOINT operands);
    * null for other types / empty input. */
  def geometricMedian(g: FlatGeom, tol: Double, maxIter: Int): FlatGeom = {
    if (g == null || g.isEmpty) return null
    if (g.kind != GeomKind.Point && g.kind != GeomKind.MultiPoint) return null
    val cs = g.coords
    val n = cs.length >> 1
    if (n == 1) return FlatGeom.point(cs(0), cs(1))

    // start: arithmetic mean (deterministic, inside the hull)
    var sx = 0.0; var sy = 0.0
    var i = 0
    while (i < cs.length) { sx += cs(i); sy += cs(i + 1); i += 2 }
    var x = sx / n; var y = sy / n

    var it = 0
    var moved = Double.MaxValue
    while (it < maxIter && moved > tol) {
      var wx = 0.0; var wy = 0.0; var w = 0.0
      var rx = 0.0; var ry = 0.0
      var hit = false
      i = 0
      while (i < cs.length) {
        val dx = cs(i) - x; val dy = cs(i + 1) - y
        val d = math.sqrt(dx * dx + dy * dy)
        if (d == 0.0) hit = true
        else {
          wx += cs(i) / d; wy += cs(i + 1) / d; w += 1.0 / d
          rx += dx / d; ry += dy / d
        }
        i += 2
      }
      if (w == 0.0) return FlatGeom.point(x, y) // all points coincide here
      val tx = wx / w; val ty = wy / w
      var nx = tx; var ny = ty
      if (hit) {
        val r = math.sqrt(rx * rx + ry * ry)
        if (r == 0.0) return FlatGeom.point(x, y) // y IS the median (optimality)
        val a = math.max(0.0, 1.0 - 1.0 / r)
        val b = math.min(1.0, 1.0 / r)
        nx = a * tx + b * x; ny = a * ty + b * y
      }
      val mx = nx - x; val my = ny - y
      moved = math.sqrt(mx * mx + my * my)
      x = nx; y = ny
      it += 1
    }
    FlatGeom.point(x, y)
  }

  /** Default tolerance: 1e-12 of the bbox diagonal (PostGIS shape:
    * extent-relative), floor 1e-300 so a degenerate bbox still
    * terminates. */
  def defaultTol(g: FlatGeom): Double = {
    val b = Planar.boundingRect(g)
    val dx = b(2) - b(0); val dy = b(3) - b(1)
    math.max(math.sqrt(dx * dx + dy * dy) * 1e-12, 1e-300)
  }
}
