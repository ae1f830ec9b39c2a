package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core.{FlatGeom, Wkt}
import graft.kernels.{Planar, Snap, Topo}

class SnapSpec extends AnyFunSuite {

  private def g(w: String): FlatGeom = Wkt.readOpt(w).get

  test("vertices snap to nearest reference vertex within tol") {
    val out = Snap.snapTo(g("LINESTRING(0.05 0.05,10 0,20 0.08)"),
      g("MULTIPOINT(0 0,20 0)"), 0.2)
    assert(out.x(0) == 0.0 && out.y(0) == 0.0)
    assert(out.x(1) == 10.0 && out.y(1) == 0.0) // beyond tol: unchanged
    assert(out.x(2) == 20.0 && out.y(2) == 0.0)
  }

  test("reference vertices near a segment interior are inserted in order") {
    val out = Snap.snapTo(g("LINESTRING(0 0,30 0)"),
      g("MULTIPOINT(20 0.05,10 0.1)"), 0.2)
    assert(out.numPoints == 4)
    assert(out.x(1) == 10.0 && out.y(1) == 0.1)
    assert(out.x(2) == 20.0 && out.y(2) == 0.05)
  }

  test("ring stays closed after snapping") {
    val out = Snap.snapTo(g("POLYGON((0.1 0,10 0,10 10,0.1 10,0.1 0))"),
      g("MULTIPOINT(0 0,0 10)"), 0.2)
    assert(out.x(0) == out.x(out.numPoints - 1) && out.y(0) == out.y(out.numPoints - 1))
    assert(out.x(0) == 0.0)
    assert(math.abs(Planar.unsignedArea(out) - 100.0) < 1e-9)
  }

  test("matches JTS GeometrySnapper on a mixed fixture") {
    val in = "LINESTRING(0.02 0,5 0.03,9.98 0,15 5)"
    val ref = "LINESTRING(0 0,10 0,10 10)"
    val ours = Snap.snapTo(g(in), g(ref), 0.1)
    val rdr = new org.locationtech.jts.io.WKTReader()
    val js = org.locationtech.jts.operation.overlay.snap.GeometrySnapper
      .snap(rdr.read(in), rdr.read(ref), 0.1)(0)
    val jF = Wkt.readOpt(new org.locationtech.jts.io.WKTWriter().write(js)).get
    assert(ours.numPoints == jF.numPoints, s"${ours.numPoints} vs ${jF.numPoints}")
    var i = 0
    while (i < ours.numPoints) {
      assert(ours.x(i) == jF.x(i) && ours.y(i) == jF.y(i), s"vertex $i differs")
      i += 1
    }
  }

  test("degenerate: zero tol / empty inputs are identity") {
    val in = g("LINESTRING(0 0,5 5)")
    assert(Snap.snapTo(in, g("POINT(1 1)"), 0.0) eq in)
    assert(Snap.snapTo(in, g("POINT EMPTY"), 1.0) eq in)
    assert(Snap.snapTo(null, g("POINT(1 1)"), 1.0) == null)
  }

  test("closestPair / shortest line witnesses") {
    val p = Topo.closestPair(g("POLYGON((0 0,4 0,4 4,0 4,0 0))"),
      g("POLYGON((10 0,14 0,14 4,10 4,10 0))"))
    assert(p != null)
    assert(p(0) == 4.0 && p(2) == 10.0 && p(1) == p(3))
    assert(math.abs(math.hypot(p(2) - p(0), p(3) - p(1)) - 6.0) < 1e-12)
    // point to segment interior
    val q = Topo.closestPair(g("POINT(5 3)"), g("LINESTRING(0 0,10 0)"))
    assert(q(0) == 5.0 && q(1) == 3.0 && q(2) == 5.0 && q(3) == 0.0)
    // intersecting -> null (no unique witness)
    assert(Topo.closestPair(g("POINT(1 1)"), g("POLYGON((0 0,2 0,2 2,0 2,0 0))")) == null)
  }
}
