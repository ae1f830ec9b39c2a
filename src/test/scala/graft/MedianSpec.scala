package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core.{FlatGeom, Wkt}
import graft.kernels.Median

/** Geometric median: closed-form optima + Vardi-Zhang coincidence
  * handling + first-principles optimality (no library has this op to
  * oracle against — the objective function itself is the check). */
class MedianSpec extends AnyFunSuite {

  private def med(w: String, tol: Double = 1e-12): Array[Double] = {
    val g = Median.geometricMedian(Wkt.read(w), tol, 20000)
    Array(g.x(0), g.y(0))
  }

  private def cost(pts: Array[Double], x: Double, y: Double): Double = {
    var s = 0.0
    var i = 0
    while (i < pts.length) {
      s += math.hypot(pts(i) - x, pts(i + 1) - y); i += 2
    }
    s
  }

  test("rectangle corners: median is the center (diagonal intersection)") {
    val m = med("MULTIPOINT((2 3),(10 3),(2 9),(10 9))")
    assert(math.abs(m(0) - 6) < 1e-9 && math.abs(m(1) - 6) < 1e-9)
  }

  test("equilateral triangle: median is the centroid (Fermat point)") {
    val m = med(s"MULTIPOINT((0 0),(2 0),(1 ${math.sqrt(3)}))")
    assert(math.abs(m(0) - 1.0) < 1e-9)
    assert(math.abs(m(1) - 1.0 / math.sqrt(3)) < 1e-9)
  }

  test("obtuse (>=120 deg) triangle: median is the obtuse vertex") {
    val m = med("MULTIPOINT((0 0),(4 0),(2 0.1))")
    assert(math.abs(m(0) - 2.0) < 1e-6 && math.abs(m(1) - 0.1) < 1e-6)
  }

  test("odd collinear: median is the middle point") {
    val m = med("MULTIPOINT((0 0),(1 0),(2 0),(3 0),(100 0))")
    assert(math.abs(m(0) - 2.0) < 1e-6 && math.abs(m(1)) < 1e-12)
  }

  test("centroid lands exactly on an input point: R=0 optimality exit") {
    // symmetric set whose centroid IS the middle input point
    val m = med("MULTIPOINT((-1 0),(1 0),(0 0))")
    assert(m(0) == 0.0 && m(1) == 0.0)
  }

  test("majority-coincident points pull the median onto themselves") {
    val m = med("MULTIPOINT((0 0),(0 0),(0 0),(9 0))")
    assert(math.abs(m(0)) < 1e-6 && math.abs(m(1)) < 1e-6)
  }

  test("optimality: result beats a probe grid on pseudo-random sets") {
    def lehmer(seed: Long) = Iterator.iterate(seed)(s => (s * 48271) % 2147483647).drop(1)
    for (seed <- Seq(5L, 17L, 4242L)) {
      val pts = lehmer(seed).take(24).map(v => (v % 100).toDouble).toArray
      val g = Median.geometricMedian(
        FlatGeom.multiPoint(pts), 1e-12, 20000)
      val c0 = cost(pts, g.x(0), g.y(0))
      for (dx <- -3 to 3; dy <- -3 to 3 if dx != 0 || dy != 0) {
        val c1 = cost(pts, g.x(0) + dx * 0.37, g.y(0) + dy * 0.37)
        assert(c0 <= c1 + 1e-9, s"seed=$seed probe ($dx,$dy): $c0 > $c1")
      }
    }
  }

  test("typed nulls: non-point operands, empty") {
    assert(Median.geometricMedian(Wkt.read("LINESTRING(0 0,1 1)"), 1e-9, 100) == null)
    assert(Median.geometricMedian(Wkt.read("POLYGON((0 0,1 0,1 1,0 1,0 0))"), 1e-9, 100) == null)
    assert(Median.geometricMedian(Wkt.read("MULTIPOINT EMPTY"), 1e-9, 100) == null)
    val p = Median.geometricMedian(Wkt.read("POINT(3 4)"), 1e-9, 100)
    assert(p.x(0) == 3.0 && p.y(0) == 4.0)
  }
}
