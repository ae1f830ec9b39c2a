package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.kernels.Mec

/** Minimum enclosing circle vs the live JTS MinimumBoundingCircle
  * (jts-core on the test classpath) + first-principles invariants. */
class MecSpec extends AnyFunSuite {

  private def lehmer(seed: Long): Iterator[Long] =
    Iterator.iterate(seed)(s => (s * 48271) % 2147483647).drop(1)

  private def randPts(seed: Long, n: Int): Array[Double] =
    lehmer(seed).take(2 * n).map(v => (v % 1000) / 7.0).toArray

  test("matches JTS MinimumBoundingCircle on pseudo-random point sets") {
    val gf = new org.locationtech.jts.geom.GeometryFactory()
    for (seed <- Seq(7L, 42L, 1234L, 99991L, 31337L); n <- Seq(3, 5, 17, 200)) {
      val pts = randPts(seed * n, n)
      val c = Mec.circle(pts)
      val jtsPts = (0 until n).map(i =>
        new org.locationtech.jts.geom.Coordinate(pts(2 * i), pts(2 * i + 1)))
      val mbc = new org.locationtech.jts.algorithm.MinimumBoundingCircle(
        gf.createMultiPointFromCoords(jtsPts.toArray))
      val jc = mbc.getCentre
      val jr = mbc.getRadius
      assert(math.abs(c(0) - jc.x) < 1e-7 && math.abs(c(1) - jc.y) < 1e-7,
        s"center mismatch seed=$seed n=$n: (${c(0)},${c(1)}) vs ($jc)")
      assert(math.abs(c(2) - jr) < 1e-7, s"radius mismatch seed=$seed n=$n: ${c(2)} vs $jr")
    }
  }

  test("encloses every input point and is supported by >= 2 points") {
    for (seed <- Seq(3L, 11L, 77L); n <- Seq(4, 9, 64)) {
      val pts = randPts(seed + n, n)
      val c = Mec.circle(pts)
      val r2 = c(2) * c(2) * (1 + 1e-9) + 1e-12
      var onBoundary = 0
      for (i <- 0 until n) {
        val d2 = math.pow(pts(2 * i) - c(0), 2) + math.pow(pts(2 * i + 1) - c(1), 2)
        assert(d2 <= r2, s"point $i outside: d2=$d2 r2=$r2")
        if (math.abs(math.sqrt(d2) - c(2)) < 1e-6 * (1 + c(2))) onBoundary += 1
      }
      assert(onBoundary >= 2, s"support points on boundary: $onBoundary")
    }
  }

  test("degenerate inputs: single point, two points, collinear") {
    assert(Mec.circle(Array(5.0, 7.0)).sameElements(Array(5.0, 7.0, 0.0)))
    val two = Mec.circle(Array(0.0, 0.0, 4.0, 0.0))
    assert(two(0) == 2.0 && two(1) == 0.0 && two(2) == 2.0)
    val col = Mec.circle(Array(0.0, 0.0, 1.0, 1.0, 3.0, 3.0, 2.0, 2.0))
    assert(math.abs(col(0) - 1.5) < 1e-12 && math.abs(col(1) - 1.5) < 1e-12)
    assert(math.abs(col(2) - 1.5 * math.sqrt(2)) < 1e-12)
  }

  test("circle polygon: vertex count, closure, radius-invariant") {
    val c = Array(10.0, 20.0, 5.0)
    val poly = Mec.circlePolygon(c, 12)
    assert(poly.numPoints == 4 * 12 + 1)
    assert(poly.x(0) == 15.0 && poly.y(0) == 20.0) // angle 0 = center + (r, 0)
    for (i <- 0 until poly.numPoints) {
      val d = math.hypot(poly.x(i) - 10.0, poly.y(i) - 20.0)
      assert(math.abs(d - 5.0) < 1e-12)
    }
    assert(Mec.circlePolygon(Array(1.0, 2.0, 0.0), 8).kind == graft.core.GeomKind.Point)
  }
}
