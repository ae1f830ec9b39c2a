package graft

import graft.core.{FlatGeom, Wkt}
import graft.kernels.Crs
import org.scalatest.funsuite.AnyFunSuite

/** CRS reprojection (kernels/Crs) against published vectors and the
  * reference's own fixture pair nl_plots.wkt ↔ nl_plots_epsg_28992.wkt
  * (same Dutch cadastral plots in WGS-84 and RD New — the validation
  * data geo ships for its feature-gated proj support). */
class CrsSpec extends AnyFunSuite {

  private def fixture(name: String): FlatGeom = {
    val src = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream(s"/fixtures/$name"), "UTF-8")
    try Wkt.read(src.mkString.trim) finally src.close()
  }

  test("web mercator matches the published closed form") {
    // (0,0) is the origin; the antimeridian maps to the published
    // half-circumference 20037508.342789244
    val (x0, y0) = Crs.mercatorFwd(0, 0)
    assert(x0 == 0.0 && math.abs(y0) < 1e-9)
    val (x1, _) = Crs.mercatorFwd(180, 0)
    assert(math.abs(x1 - 20037508.342789244) < 1e-6)
    // equatorial scale: 1 degree of longitude = 111319.49079327358 m
    val (x2, _) = Crs.mercatorFwd(1, 0)
    assert(math.abs(x2 - 111319.49079327358) < 1e-6)
    // round trip
    val (lon, lat) = Crs.mercatorInv(Crs.mercatorFwd(5.1, 52.3)._1,
      Crs.mercatorFwd(5.1, 52.3)._2)
    assert(math.abs(lon - 5.1) < 1e-12)
    assert(math.abs(lat - 52.3) < 1e-12)
  }

  test("UTM matches a published vector (CN Tower, zone 17N)") {
    // CN Tower 43°38'33.24"N 79°23'13.7"W → 17N 630084 E 4833438 N
    // (the standard published UTM example); assert within 1 m of the
    // rounded published values
    val lat = 43 + 38.0 / 60 + 33.24 / 3600
    val lon = -(79 + 23.0 / 60 + 13.7 / 3600)
    assert(Crs.utmZone(lon) == 17)
    val (e, n) = Crs.utmFwd(lon, lat, 17, south = false)
    assert(math.abs(e - 630084.0) < 1.0, s"easting $e")
    assert(math.abs(n - 4833438.0) < 1.0, s"northing $n")
  }

  test("UTM round trip is sub-micrometer (Krüger order-6 series)") {
    for ((lon, lat) <- Seq((5.2, 52.1), (-73.98, 40.75), (174.8, -41.3), (13.4, 52.5))) {
      val zone = Crs.utmZone(lon)
      val south = lat < 0
      val (e, n) = Crs.utmFwd(lon, lat, zone, south)
      val (lon2, lat2) = Crs.utmInv(e, n, zone, south)
      val err = graft.kernels.Sphere.haversineDistance(lon, lat, lon2, lat2)
      assert(err < 1e-6, s"($lon,$lat) roundtrip err $err m")
    }
  }

  test("RD New base point is exact by construction") {
    // Amersfoort (Onze Lieve Vrouwetoren): RD (155000, 463000) is the
    // polynomial expansion point for WGS-84 (5.38720621, 52.15517440)
    val (x, y) = Crs.rdFwd(5.38720621, 52.15517440)
    assert(x == 155000.0 && y == 463000.0)
    val (lon, lat) = Crs.rdInv(155000, 463000)
    assert(lon == 5.38720621 && lat == 52.15517440)
  }

  test("RD New matches the reference fixture pair (nl_plots)") {
    val wgs = fixture("nl_plots.wkt")
    val rd = fixture("nl_plots_epsg_28992.wkt")
    assert(wgs.numPoints == rd.numPoints)
    var maxErr = 0.0
    var i = 0
    while (i < wgs.numPoints) {
      val (x, y) = Crs.rdFwd(wgs.x(i), wgs.y(i))
      maxErr = math.max(maxErr, math.hypot(x - rd.x(i), y - rd.y(i)))
      i += 1
    }
    // Schreutelkamp & van Strien publish ≈0.35 m worst-case inside the
    // Dutch bound; the fixture was produced by a grid-corrected
    // transformation, so allow the combined meter-level tolerance
    info(f"forward max error vs fixture: $maxErr%.3f m over ${wgs.numPoints} vertices")
    assert(maxErr < 1.0, f"forward max error $maxErr%.3f m")

    var maxDeg = 0.0
    i = 0
    while (i < rd.numPoints) {
      val (lon, lat) = Crs.rdInv(rd.x(i), rd.y(i))
      maxDeg = math.max(maxDeg,
        math.max(math.abs(lon - wgs.x(i)), math.abs(lat - wgs.y(i))))
      i += 1
    }
    info(f"inverse max error vs fixture: ${maxDeg * 3600}%.4f arcsec")
    assert(maxDeg < 2e-5, f"inverse max error $maxDeg%.2e deg") // ≈1.4 m

    // self round trip (polynomials are not exact inverses; published
    // consistency is centimeter level inside the bound)
    var rt = 0.0
    i = 0
    while (i < wgs.numPoints) {
      val (x, y) = Crs.rdFwd(wgs.x(i), wgs.y(i))
      val (lon, lat) = Crs.rdInv(x, y)
      val (x2, y2) = Crs.rdFwd(lon, lat)
      rt = math.max(rt, math.hypot(x2 - x, y2 - y))
      i += 1
    }
    assert(rt < 0.05, f"self roundtrip $rt%.4f m")
  }

  test("geometry transform preserves structure; dispatcher routes SRIDs") {
    val poly = Wkt.read("POLYGON((5.3 52.1,5.5 52.1,5.5 52.2,5.3 52.1))")
    val out = Crs.transform(poly, 4326, 28992)
    assert(out.kind == poly.kind && out.numPoints == poly.numPoints)
    val back = Crs.transform(out, 28992, 4326)
    var i = 0
    while (i < poly.numPoints) {
      assert(math.abs(back.x(i) - poly.x(i)) < 2e-6)
      assert(math.abs(back.y(i) - poly.y(i)) < 2e-6)
      i += 1
    }
    // merc → utm routes through 4326
    val (mx, my) = Crs.mercatorFwd(13.4, 52.5)
    val (e, n2) = Crs.transformPoint(3857, 32633, mx, my)
    val (e2, n3) = Crs.utmFwd(13.4, 52.5, 33, south = false)
    assert(math.abs(e - e2) < 1e-6 && math.abs(n2 - n3) < 1e-6)
    assertThrows[IllegalArgumentException](Crs.transformPoint(4326, 999999, 0, 0))
  }

  test("EPSG:27700 projection core matches the OS worked example") {
    // Ordnance Survey, "A guide to coordinate systems in Great
    // Britain" (the standard worked example): OSGB36 lat 52°39'27.2531"N,
    // lon 1°43'4.5177"E -> E 651409.903, N 313177.270. This drives
    // the generic TmProj on Airy 1830 WITHOUT the datum shift (the
    // example is given in OSGB36 coordinates).
    val lat = 52 + 39.0 / 60 + 27.2531 / 3600
    val lon = 1 + 43.0 / 60 + 4.5177 / 3600
    val (ee, nn) = Crs.bng.fwd(lon, lat)
    assert(math.abs(ee - 651409.903) < 0.005, f"E $ee%.4f")
    assert(math.abs(nn - 313177.270) < 0.005, f"N $nn%.4f")
    // Krüger-core inverse closes sub-micron
    val (lo, la) = Crs.bng.inv(ee, nn)
    assert(math.abs(lo - lon) < 1e-10 && math.abs(la - lat) < 1e-10)
  }

  test("EPSG:27700 end-to-end (with Helmert datum shift) round trips") {
    // WGS-84 London-ish point through the full dispatcher: Helmert +
    // TM forward, then back. The planar engine drops ellipsoidal
    // height at each datum hop (h=0 in, h≈+50 m out, truncated), so
    // the round trip closes at the millimeter level (~1e-8 deg), not
    // exactly — assert 1e-7 (≈ 1 cm), far under the ~5 m single-
    // Helmert realization accuracy
    for ((lon, lat) <- Seq((-0.1276, 51.5072), (-3.1883, 55.9533), (1.3, 52.6))) {
      val (x, y) = Crs.fromGeographic(27700, lon, lat)
      val (lo, la) = Crs.toGeographic(27700, x, y)
      assert(math.abs(lo - lon) < 1e-7 && math.abs(la - lat) < 1e-7, s"($lon,$lat)")
      // the OSGB36 datum shift is ~50-120 m on the ground; confirm the
      // Helmert actually moved the point into the other datum
      val (lo2, la2) = Crs.wgsToOsgb36.fwd(lon, lat)
      val shiftM = math.hypot((lo2 - lon) * 111320 * math.cos(math.toRadians(lat)),
        (la2 - lat) * 110574)
      assert(shiftM > 40 && shiftM < 200, f"datum shift $shiftM%.1f m")
    }
  }

  test("Lambert conformal conic matches Snyder's worked example") {
    // Snyder 1987 pp. 296-297 (Appendix A, LCC ellipsoid example):
    // Clarke 1866, lat1 33N lat2 45N, origin (23N, 96W); point
    // (35N, 75W) -> x = 1,894,410.9 m, y = 1,564,649.5 m.
    val clarke1866A = 6378206.4
    val clarke1866F = 1 - math.sqrt(1 - 0.00676866) // from e^2 in Snyder
    val p = new Crs.LccProj(clarke1866A, clarke1866F, lat0 = 23.0, lon0 = -96.0,
      lat1 = 33.0, lat2 = 45.0, falseE = 0.0, falseN = 0.0)
    val (x, y) = p.fwd(-75.0, 35.0)
    assert(math.abs(x - 1894410.9) < 0.5, f"x $x%.2f")
    assert(math.abs(y - 1564649.5) < 0.5, f"y $y%.2f")
    val (lon, lat) = p.inv(x, y)
    assert(math.abs(lon - -75.0) < 1e-9 && math.abs(lat - 35.0) < 1e-9)
  }

  test("EPSG:2154 Lambert-93: k=1 at standard parallels, round trips, Paris sanity") {
    val p = Crs.lambert93
    // 2SP construction: unit scale at both standard parallels, below
    // unit between them
    assert(math.abs(p.k(44.0) - 1.0) < 1e-12)
    assert(math.abs(p.k(49.0) - 1.0) < 1e-12)
    assert(p.k(46.5) < 1.0)
    val (x, y) = Crs.fromGeographic(2154, 2.3522, 48.8566) // Paris
    assert(x > 640000 && x < 670000, f"Paris x $x%.0f")
    assert(y > 6840000 && y < 6880000, f"Paris y $y%.0f")
    for ((lon, lat) <- Seq((2.3522, 48.8566), (5.37, 43.30), (-1.55, 47.22), (7.75, 48.58))) {
      val (xx, yy) = Crs.fromGeographic(2154, lon, lat)
      val (lo, la) = Crs.toGeographic(2154, xx, yy)
      assert(math.abs(lo - lon) < 1e-10 && math.abs(la - lat) < 1e-10, s"($lon,$lat)")
    }
  }

  test("EPSG:25832 agrees with WGS-84 UTM 32N to sub-millimeter") {
    // GRS80 vs WGS-84 differ only in 1/f at the 1e-9 level; the same
    // point must project within a millimeter of the wgs84 UTM engine
    for ((lon, lat) <- Seq((9.99, 53.55), (11.57, 48.14), (6.96, 50.94))) {
      val (e1, n1) = Crs.fromGeographic(25832, lon, lat)
      val (e2, n2) = Crs.utmFwd(lon, lat, 32, south = false)
      assert(math.hypot(e1 - e2, n1 - n2) < 1e-3, s"($lon,$lat)")
      val (lo, la) = Crs.toGeographic(25832, e1, n1)
      assert(math.abs(lo - lon) < 1e-10 && math.abs(la - lat) < 1e-10)
    }
  }
}
