package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core.{FlatGeom, Wkt}
import graft.kernels.{InscribedCircle, Planar}

class InscribedCircleSpec extends AnyFunSuite {

  private def mic(w: String, tol: Double) =
    InscribedCircle.maximumInscribedCircle(Wkt.readOpt(w).get, tol)

  test("square: exact center and radius") {
    val Some((cx, cy, nx, ny, r)) = mic("POLYGON((0 0,10 0,10 10,0 10,0 0))", 1e-9)
    assert(math.abs(cx - 5) < 1e-6 && math.abs(cy - 5) < 1e-6)
    assert(math.abs(r - 5) < 1e-6)
    // nearest boundary point is at distance r from the center
    assert(math.abs(math.hypot(nx - cx, ny - cy) - r) < 1e-6)
  }

  test("wide rectangle: radius h/2, center on the medial segment") {
    val Some((cx, cy, _, _, r)) = mic("POLYGON((0 0,30 0,30 10,0 10,0 0))", 1e-7)
    assert(math.abs(r - 5) < 1e-5)
    assert(math.abs(cy - 5) < 1e-5)
    assert(cx >= 5 - 1e-5 && cx <= 25 + 1e-5)
  }

  test("polygon with hole: circle avoids the hole") {
    val w = "POLYGON((0 0,20 0,20 20,0 20,0 0),(8 8,12 8,12 12,8 12,8 8))"
    val Some((cx, cy, _, _, r)) = mic(w, 1e-7)
    val g = Wkt.readOpt(w).get
    assert(Planar.coordPos(g, cx, cy) > 0)
    // JTS oracle agreement on the radius
    val jg = new org.locationtech.jts.io.WKTReader().read(w)
    val jmic = new org.locationtech.jts.algorithm.construct.MaximumInscribedCircle(jg, 1e-7)
    val jr = jmic.getRadiusLine.getLength
    assert(math.abs(r - jr) < 1e-4, s"r=$r jts=$jr")
  }

  test("L-shape matches the JTS oracle radius") {
    val w = "POLYGON((0 0,40 0,40 12,12 12,12 40,0 40,0 0))"
    val Some((_, _, _, _, r)) = mic(w, 1e-7)
    val jg = new org.locationtech.jts.io.WKTReader().read(w)
    val jmic = new org.locationtech.jts.algorithm.construct.MaximumInscribedCircle(jg, 1e-7)
    assert(math.abs(r - jmic.getRadiusLine.getLength) < 1e-4)
  }

  test("degenerate inputs") {
    assert(mic("POLYGON EMPTY", 1e-6).isEmpty)
    assert(InscribedCircle.maximumInscribedCircle(
      Wkt.readOpt("LINESTRING(0 0,5 5)").get, 1e-6).isEmpty)
    assert(InscribedCircle.maximumInscribedCircle(
      Wkt.readOpt("POLYGON((0 0,10 0,10 10,0 10,0 0))").get, 0.0).isEmpty)
    assert(InscribedCircle.maximumInscribedCircle(null, 1e-6).isEmpty)
  }

  test("largest empty circle among a point grid matches JTS") {
    // 5x5 integer grid with the center point removed: the emptiest
    // spot is the middle, radius sqrt(2)*5 (half-diagonal of the 10x10
    // inner square... verified against the live oracle rather than
    // assumed)
    val pts = for {
      x <- 0 to 4; y <- 0 to 4 if !(x == 2 && y == 2)
    } yield s"${x * 10} ${y * 10}"
    val w = s"MULTIPOINT(${pts.mkString(",")})"
    val Some((cx, cy, _, _, r)) =
      InscribedCircle.largestEmptyCircle(Wkt.readOpt(w).get, 1e-7)
    val jg = new org.locationtech.jts.io.WKTReader().read(w)
    val jlec = new org.locationtech.jts.algorithm.construct.LargestEmptyCircle(jg, null, 1e-7)
    val jr = jlec.getRadiusLine.getLength
    val jc = jlec.getCenter.getCoordinate
    assert(math.abs(r - jr) < 1e-4, s"r=$r jts=$jr")
    assert(math.hypot(cx - jc.x, cy - jc.y) < 1e-3, s"center ($cx,$cy) vs (${jc.x},${jc.y})")
  }

  test("largest empty circle: degenerate obstacle sets") {
    assert(InscribedCircle.largestEmptyCircle(
      Wkt.readOpt("MULTIPOINT(0 0,1 1,2 2)").get, 1e-6).isEmpty) // collinear
    assert(InscribedCircle.largestEmptyCircle(
      Wkt.readOpt("POINT(3 3)").get, 1e-6).isEmpty)
    assert(InscribedCircle.largestEmptyCircle(null, 1e-6).isEmpty)
  }
}
