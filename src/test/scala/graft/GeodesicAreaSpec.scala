package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core.{FlatGeom, Wkt}
import graft.kernels.GeodesicArea

/**
 * Exact ellipsoidal area vs the reference's doc/test values
 * (geo/src/algorithm/geodesic_area.rs — themselves geographiclib
 * PolygonArea outputs), plus analytic pole-cap closures.
 */
class GeodesicAreaSpec extends AnyFunSuite {

  private def poly(wkt: String): FlatGeom = Wkt.read(wkt)

  private def ringWkt(pts: Seq[(Double, Double)]): String =
    "POLYGON((" + (pts :+ pts.head).map { case (x, y) => s"$x $y" }.mkString(",") + "))"

  test("O2 arena unsigned area (geodesic_area.rs doc: 78_596 m^2)") {
    val o2 = poly("POLYGON((0.00388383 51.501574,0.00538587 51.502278," +
      "0.00553607 51.503299,0.00467777 51.504181,0.00327229 51.504435," +
      "0.00187754 51.504168,0.00087976 51.503380,0.00107288 51.502324," +
      "0.00185608 51.501770,0.00388383 51.501574))")
    val a = GeodesicArea.unsignedArea(o2)
    assert(Math.abs(a - 78596.0) < 1.0, s"O2 area $a")
  }

  test("australia-ish polygon signed area (test_negative/test_positive)") {
    val cw = poly("POLYGON((125 -15,144 -15,154 -27,148 -39,130 -33," +
      "117 -37,113 -22,125 -15))")
    val aCw = GeodesicArea.signedArea(cw)
    assert(Math.abs(aCw - (-7786102826806.07)) < 2e3, s"signed CW $aCw")
    val ccw = poly("POLYGON((125 -15,113 -22,117 -37,130 -33,148 -39," +
      "154 -27,144 -15,125 -15))")
    val aCcw = GeodesicArea.signedArea(ccw)
    assert(Math.abs(aCcw - 7786102826806.07) < 2e3, s"signed CCW $aCcw")
    // unsigned of the CW ring wraps to total − |area| (test_negative)
    val uCw = GeodesicArea.unsignedArea(cw)
    assert(Math.abs(uCw - (GeodesicArea.EarthArea - 7786102826806.07)) < 2e3,
      s"unsigned CW $uCw vs ${GeodesicArea.EarthArea - 7786102826806.07}")
  }

  test("missing endpoint auto-closes (test_missing_endpoint)") {
    val open = poly("POLYGON((125 -15,113 -22,117 -37,130 -33,148 -39," +
      "154 -27,144 -15))") // parser closes the ring
    assert(Math.abs(GeodesicArea.signedArea(open) - 7786102826806.07) < 2e3)
  }

  test("holes subtract regardless of winding (test_holes)") {
    val expected = 1203317999173.7063
    val ccwExt =
      "POLYGON((0 0,10 0,10 10,0 10,0 0),(1 1,1 2,2 2,2 1,1 1),(5 5,5 6,6 6,6 5,5 5))"
    val a1 = GeodesicArea.signedArea(poly(ccwExt))
    assert(Math.abs(a1 - expected) < 1e3, s"holes ccw/cw $a1")
    // holes wound CCW (same as exterior) must still subtract
    val ccwHoles =
      "POLYGON((0 0,10 0,10 10,0 10,0 0),(1 1,2 1,2 2,1 2,1 1),(5 5,6 5,6 6,5 6,5 5))"
    val a2 = GeodesicArea.signedArea(poly(ccwHoles))
    assert(Math.abs(a2 - expected) < 1e3, s"holes ccw/ccw $a2")
    // CW exterior flips the sign
    val cwExt =
      "POLYGON((0 0,0 10,10 10,10 0,0 0),(1 1,1 2,2 2,2 1,1 1),(5 5,5 6,6 6,6 5,5 5))"
    val a3 = GeodesicArea.signedArea(poly(cwExt))
    assert(Math.abs(a3 + expected) < 1e3, s"holes cw ext $a3")
  }

  test("diamond with hole (test_diamond: 18462065880.09138)") {
    val d = poly("POLYGON((1 0,2 1,1 2,0 1,1 0),(1 0.5,0.5 1,1 1.5,1.5 1,1 0.5))")
    val a = GeodesicArea.signedArea(d)
    assert(Math.abs(a - 18462065880.09138) < 50.0, s"diamond $a")
    assert(Math.abs(GeodesicArea.unsignedArea(d) - 18462065880.09138) < 50.0)
  }

  test("north and south pole caps close against the analytic strip area") {
    // CCW (east-about) ring at latitude 80 encloses the north cap
    val northRing = ringWkt((0 until 36).map(i => (i * 10.0 - 180.0, 80.0)))
    val capN = GeodesicArea.signedArea(poly(northRing))
    val exactN = 2.0 * Math.PI * (GeodesicArea.aPhi(Math.PI / 2) -
      GeodesicArea.aPhi(Math.toRadians(80)))
    // geodesic edges bulge poleward vs the parallel, so the enclosed
    // area is slightly SMALLER than the parallel cap; 10° chords at
    // lat 80 bulge ~0.08°, so allow a 1% band and require the sign
    // and magnitude to match the cap, not the hemisphere
    assert(capN > 0 && Math.abs(capN - exactN) / exactN < 0.02,
      s"north cap $capN vs $exactN")
    // west-about ring at -80 encloses the south cap (CCW seen on the
    // chart traversing decreasing longitude)
    val southRing = ringWkt((0 until 36).map(i => (180.0 - i * 10.0, -80.0)))
    val capS = GeodesicArea.signedArea(poly(southRing))
    assert(capS > 0 && Math.abs(capS - exactN) / exactN < 0.02,
      s"south cap $capS vs $exactN")
  }

  test("earth area constant matches 4π times the authalic radius squared") {
    // authalic c² for WGS-84 ≈ 6371007.1809 m → area ≈ 5.100656e14
    assert(Math.abs(GeodesicArea.EarthArea - 5.100656217240886e14) < 1e7)
  }
}
