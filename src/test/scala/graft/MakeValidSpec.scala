package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core.{FlatGeom, Wkt}
import graft.kernels.{MakeValid, Planar, Validation}

class MakeValidSpec extends AnyFunSuite {

  private def g(w: String): FlatGeom = Wkt.readOpt(w).get
  private def area(x: FlatGeom): Double = Planar.unsignedArea(x)
  private def fixed(w: String): FlatGeom = {
    val out = MakeValid.makeValid(g(w))
    assert(Validation.invalidReason(out).isEmpty, s"repair not valid: $w")
    out
  }

  test("bowtie splits into two triangles") {
    val out = fixed("POLYGON((0 0,10 10,10 0,0 10,0 0))")
    assert(out.numParts == 2)
    assert(math.abs(area(out) - 50.0) < 1e-9)
    // JTS agrees the input is invalid and our output is valid
    val rdr = new org.locationtech.jts.io.WKTReader()
    assert(!rdr.read("POLYGON((0 0,10 10,10 0,0 10,0 0))").isValid)
    assert(rdr.read(graft.core.Wkt.write(out)).isValid)
    // and the JTS GeometryFixer produces the same region for a bowtie
    val jfix = org.locationtech.jts.geom.util.GeometryFixer.fix(
      rdr.read("POLYGON((0 0,10 10,10 0,0 10,0 0))"))
    assert(math.abs(jfix.getArea - area(out)) < 1e-9)
  }

  test("valid input is returned unchanged") {
    val w = "POLYGON((0 0,10 0,10 10,0 10,0 0),(3 3,6 3,6 6,3 6,3 3))"
    val in = g(w)
    assert(MakeValid.makeValid(in) eq in) // identity, not a rebuild
    assert(math.abs(area(MakeValid.makeValid(in)) - 91.0) < 1e-12)
  }

  test("overlapping shells: double-covered region drops (even-odd rule)") {
    // invalid MultiPolygon whose shells overlap on [4,6]^2: the
    // overlap has even parity and is excluded from BOTH shells (the GEOS
    // 'linework' behavior), leaving 36 + 36 - 2*4 = 64
    val w = "MULTIPOLYGON(((0 0,6 0,6 6,0 6,0 0)),((4 4,10 4,10 10,4 10,4 4)))"
    val out = fixed(w)
    assert(math.abs(area(out) - 64.0) < 1e-9)
    // the overlap interior is NOT in the repaired region
    assert(graft.kernels.Planar.coordPos(out, 5.0, 5.0) == graft.kernels.Planar.Outside)
    assert(graft.kernels.Planar.coordPos(out, 1.0, 1.0) == graft.kernels.Planar.Inside)
    assert(graft.kernels.Planar.coordPos(out, 9.0, 9.0) == graft.kernels.Planar.Inside)
  }

  test("hole outside its shell becomes its own part") {
    val w = "POLYGON((0 0,4 0,4 4,0 4,0 0),(6 6,9 6,9 9,6 9,6 6))"
    val out = fixed(w)
    assert(out.numParts == 2)
    assert(math.abs(area(out) - (16.0 + 9.0)) < 1e-9)
  }

  test("self-touching ring (figure-8 at a vertex)") {
    val out = fixed("POLYGON((0 0,4 0,4 4,0 4,0 0,0 -4,-4 -4,-4 0,0 0))")
    assert(math.abs(area(out) - 32.0) < 1e-9)
  }

  test("0/1-D and empty pass through") {
    assert(MakeValid.makeValid(g("POINT(1 1)")).kind == g("POINT(1 1)").kind)
    assert(MakeValid.makeValid(g("LINESTRING(0 0,1 1)")).numPoints == 2)
    assert(MakeValid.makeValid(g("POLYGON EMPTY")).isEmpty)
    assert(MakeValid.makeValid(null) == null)
    // degenerate zero-area ring collapses to empty
    assert(MakeValid.makeValid(g("POLYGON((0 0,4 0,0 0))")).isEmpty)
  }
}
