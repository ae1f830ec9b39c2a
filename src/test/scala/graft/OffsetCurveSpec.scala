package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core.{FlatGeom, Wkt}
import graft.kernels.{OffsetCurve, Planar}
import graft.index.STRtree

class OffsetCurveSpec extends AnyFunSuite {

  private def g(w: String): FlatGeom = Wkt.readOpt(w).get

  /** Oriented Hausdorff from our curve's densified samples to the JTS
    * curve's segments. */
  private def hausdorffTo(from: FlatGeom, to: FlatGeom): Double = {
    if (from.isEmpty || to.isEmpty) return if (from.isEmpty && to.isEmpty) 0.0 else Double.MaxValue
    val (tree, x1, y1, x2, y2) = STRtree.ofSegments(to)
    def segDist(px: Double, py: Double, i: Int): Double = {
      val dx = x2(i) - x1(i); val dy = y2(i) - y1(i)
      val l2 = dx * dx + dy * dy
      val t = if (l2 == 0) 0.0
        else Math.max(0.0, Math.min(1.0, ((px - x1(i)) * dx + (py - y1(i)) * dy) / l2))
      Math.hypot(px - (x1(i) + t * dx), py - (y1(i) + t * dy))
    }
    var worst = 0.0
    FlatGeom.foreachRing(from) { (s, e) =>
      var j = s
      while (j < e - 1) {
        var k = 0
        while (k < 5) {
          val px = from.x(j) + (from.x(j + 1) - from.x(j)) * k * 0.25
          val py = from.y(j) + (from.y(j + 1) - from.y(j)) * k * 0.25
          val d = tree.nearestDist(px, py, Double.MaxValue, i => segDist(px, py, i))
          if (d > worst) worst = d
          k += 1
        }
        j += 1
      }
    }
    worst
  }

  private def vsJts(w: String, d: Double): Unit = {
    val ours = OffsetCurve.offsetCurve(g(w), d)
    val jts = org.locationtech.jts.operation.buffer.OffsetCurve.getCurve(
      new org.locationtech.jts.io.WKTReader().read(w), d)
    val jtsF = Wkt.readOpt(new org.locationtech.jts.io.WKTWriter().write(jts)).get
    val tol = Math.max(1e-8, Math.abs(d) / 100.0)
    val h1 = hausdorffTo(ours, jtsF)
    val h2 = hausdorffTo(jtsF, ours)
    assert(h1 <= tol && h2 <= tol, s"hausdorff ours->jts=$h1 jts->ours=$h2 tol=$tol ($w d=$d)")
    val lo = Planar.euclideanLength(ours); val lj = jtsF match { case f => Planar.euclideanLength(f) }
    assert(math.abs(lo - lj) <= 0.02 * math.max(lo, lj) + 1e-9, s"length $lo vs $lj")
  }

  test("straight line: exact parallel on both sides") {
    val ours = OffsetCurve.offsetCurve(g("LINESTRING(0 0,10 0)"), 2.0)
    assert(ours.numPoints == 2)
    assert(ours.y(0) == 2.0 && ours.y(1) == 2.0)
    val right = OffsetCurve.offsetCurve(g("LINESTRING(0 0,10 0)"), -2.0)
    assert(right.y(0) == -2.0 && right.y(1) == -2.0)
  }

  test("right-angle bend matches JTS on both sides") {
    vsJts("LINESTRING(0 0,20 0,20 20)", 3.0)
    vsJts("LINESTRING(0 0,20 0,20 20)", -3.0)
  }

  test("zigzag matches JTS") {
    vsJts("LINESTRING(0 0,10 8,20 0,30 8,40 0)", 2.0)
    vsJts("LINESTRING(0 0,10 8,20 0,30 8,40 0)", -2.0)
  }

  test("concave cleaning: offset larger than the dent") {
    vsJts("LINESTRING(0 0,10 0,10 4,14 4,14 0,24 0)", 6.0)
  }

  test("degenerate inputs") {
    assert(OffsetCurve.offsetCurve(g("LINESTRING(0 0,10 0)"), 0.0).numPoints == 2)
    assert(OffsetCurve.offsetCurve(g("POINT(1 1)"), 2.0).isEmpty)
    assert(OffsetCurve.offsetCurve(g("LINESTRING EMPTY"), 2.0).isEmpty)
    assert(OffsetCurve.offsetCurve(null, 2.0).isEmpty)
    assert(OffsetCurve.offsetCurve(g("LINESTRING(0 0,10 0)"), Double.NaN).isEmpty)
  }
}
