package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core.{FlatGeom, Wkt}
import graft.kernels.{Planar, Split}

class SplitSpec extends AnyFunSuite {

  private def g(w: String): FlatGeom = Wkt.readOpt(w).get

  test("line split by a point on it") {
    val ps = Split.split(g("LINESTRING(0 0,10 0)"), g("POINT(4 0)"))
    assert(ps.length == 2)
    assert(ps(0).x(1) == 4.0 && ps(1).x(0) == 4.0)
    // point off the line: no split
    assert(Split.split(g("LINESTRING(0 0,10 0)"), g("POINT(4 1)")).length == 1)
    // point at an interior vertex
    val pv = Split.split(g("LINESTRING(0 0,5 5,10 0)"), g("POINT(5 5)"))
    assert(pv.length == 2)
  }

  test("line split by a crossing line") {
    val ps = Split.split(g("LINESTRING(0 0,10 10)"), g("LINESTRING(0 10,10 0)"))
    assert(ps.length == 2)
    assert(math.abs(ps.map(Planar.euclideanLength).sum - math.hypot(10, 10)) < 1e-12)
    // blade crossing exactly at an input vertex
    val pv = Split.split(g("LINESTRING(0 0,5 5,10 10)"), g("LINESTRING(0 10,10 0)"))
    assert(pv.length == 2)
    assert(pv(0).numPoints == 2 && pv(1).numPoints == 2)
  }

  test("polygon split by a line into two halves") {
    val ps = Split.split(g("POLYGON((0 0,10 0,10 10,0 10,0 0))"),
      g("LINESTRING(5 -1,5 11)"))
    assert(ps.length == 2)
    assert(ps.forall(p => math.abs(Planar.unsignedArea(p) - 50.0) < 1e-9))
  }

  test("polygon with hole split through the hole") {
    val ps = Split.split(
      g("POLYGON((0 0,10 0,10 10,0 10,0 0),(4 4,6 4,6 6,4 6,4 4))"),
      g("LINESTRING(5 -1,5 11)"))
    assert(ps.length == 2)
    // total = 100 - 4, halves equal by symmetry
    assert(math.abs(ps.map(Planar.unsignedArea).sum - 96.0) < 1e-9)
    assert(math.abs(Planar.unsignedArea(ps(0)) - 48.0) < 1e-9)
  }

  test("non-crossing blade leaves the polygon whole") {
    val ps = Split.split(g("POLYGON((0 0,10 0,10 10,0 10,0 0))"),
      g("LINESTRING(20 0,20 10)"))
    assert(ps.length == 1)
    assert(math.abs(Planar.unsignedArea(ps(0)) - 100.0) < 1e-12)
  }

  test("degenerate inputs") {
    assert(Split.split(g("POINT(1 1)"), g("LINESTRING(0 0,2 2)")).length == 1)
    assert(Split.split(g("LINESTRING EMPTY"), g("POINT(0 0)")).isEmpty)
    assert(Split.split(null, g("POINT(0 0)")).isEmpty)
    assert(Split.split(g("LINESTRING(0 0,2 2)"), null).length == 1)
  }
}
