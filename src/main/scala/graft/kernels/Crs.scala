package graft.kernels

import graft.core.FlatGeom

/**
 * CRS reprojection from published formulas — no projection library.
 *
 * The reference feature-gates reprojection onto a C library
 * (geo/src/algorithm/proj.rs:2, transform.rs:32 — `use-proj` is off by
 * default), so this surface is BEYOND the executed reference. Supported
 * systems, chosen for real-user coverage and for the validation data the
 * reference itself ships (nl_plots.wkt ↔ nl_plots_epsg_28992.wkt):
 *
 *  - EPSG:4326  WGS-84 geographic (lon/lat degrees) — the hub; every
 *    transform routes through it.
 *  - EPSG:3857  Web/Pseudo Mercator, spherical formulas on R=6378137
 *    (the published Web-Mercator definition).
 *  - EPSG:32601–32660 / 32701–32760  UTM north/south on WGS-84 —
 *    transverse Mercator by the Krüger series in n to order n^6
 *    (Karney 2011, "Transverse Mercator with an accuracy of a few
 *    nanometers", eqs. 12–36); round-trip error is sub-micron.
 *  - EPSG:28992  RD New (Netherlands) — the Schreutelkamp & van Strien
 *    approximation polynomials (Geodesia 2001, "Benaderingsformules
 *    voor de transformatie tussen RD- en WGS84-kaartcoördinaten"),
 *    published accuracy ≈ 0.35 m within the Dutch bound; validated here
 *    against the reference's own fixture pair (CrsSpec).
 *  - EPSG:27700  British National Grid — the generic [[TmProj]] Krüger
 *    core on Airy 1830 (validated against the OS worked example) plus
 *    the published OS 7-parameter Helmert WGS-84→OSGB36 shift (~5 m,
 *    the documented limit of a single-Helmert OSGB36 realization).
 *  - EPSG:25832/25833  ETRS89 / UTM 32N, 33N on GRS80 (ETRS89 ≈
 *    WGS-84 at this engine's precision — no datum shift).
 *  - EPSG:2154  RGF93 / Lambert-93 — Lambert conformal conic 2SP
 *    ([[LccProj]], Snyder 1987 formulas, validated against Snyder's
 *    worked example), RGF93 ≈ WGS-84.
 *
 * All functions take/return (x, y) = (easting|lon, northing|lat).
 */
object Crs {

  // WGS-84 ellipsoid
  private val A = 6378137.0
  private val F = 1.0 / 298.257223563
  private val E = math.sqrt(F * (2 - F)) // first eccentricity

  private val D2R = math.Pi / 180
  private val R2D = 180 / math.Pi

  // ------------------------------------------------------- Web Mercator

  def mercatorFwd(lon: Double, lat: Double): (Double, Double) =
    (A * lon * D2R, A * math.log(math.tan(math.Pi / 4 + lat * D2R / 2)))

  def mercatorInv(x: Double, y: Double): (Double, Double) =
    (x / A * R2D, (2 * math.atan(math.exp(y / A)) - math.Pi / 2) * R2D)

  // ------------------------------------- Transverse Mercator (Krüger)

  private val n = F / (2 - F)
  private val n2 = n * n; private val n3 = n2 * n; private val n4 = n3 * n
  private val n5 = n4 * n; private val n6 = n5 * n
  /** Rectifying-circle radius A (Karney 2011 eq. 14). */
  private val Arect = A / (1 + n) * (1 + n2 / 4 + n4 / 64 + n6 / 256)
  /** Forward series coefficients α_j (Karney 2011 eq. 35). */
  private val alpha = Array(
    n / 2 - 2.0 / 3 * n2 + 5.0 / 16 * n3 + 41.0 / 180 * n4 - 127.0 / 288 * n5
      + 7891.0 / 37800 * n6,
    13.0 / 48 * n2 - 3.0 / 5 * n3 + 557.0 / 1440 * n4 + 281.0 / 630 * n5
      - 1983433.0 / 1935360 * n6,
    61.0 / 240 * n3 - 103.0 / 140 * n4 + 15061.0 / 26880 * n5
      + 167603.0 / 181440 * n6,
    49561.0 / 161280 * n4 - 179.0 / 168 * n5 + 6601661.0 / 7257600 * n6,
    34729.0 / 80640 * n5 - 3418889.0 / 1995840 * n6,
    212378941.0 / 319334400 * n6)
  /** Inverse series coefficients β_j (Karney 2011 eq. 36). */
  private val beta = Array(
    n / 2 - 2.0 / 3 * n2 + 37.0 / 96 * n3 - 1.0 / 360 * n4 - 81.0 / 512 * n5
      + 96199.0 / 604800 * n6,
    1.0 / 48 * n2 + 1.0 / 15 * n3 - 437.0 / 1440 * n4 + 46.0 / 105 * n5
      - 1118711.0 / 3870720 * n6,
    17.0 / 480 * n3 - 37.0 / 840 * n4 - 209.0 / 4480 * n5 + 5569.0 / 90720 * n6,
    4397.0 / 161280 * n4 - 11.0 / 504 * n5 - 830251.0 / 7257600 * n6,
    4583.0 / 161280 * n5 - 108847.0 / 3991680 * n6,
    20648693.0 / 638668800 * n6)

  private val K0 = 0.9996
  private val FalseE = 500000.0

  /** Forward TM about central meridian lon0 (degrees). */
  def tmFwd(lon: Double, lat: Double, lon0: Double): (Double, Double) = {
    val phi = lat * D2R
    val dlam = (lon - lon0) * D2R
    val sphi = math.sin(phi)
    // conformal latitude: tau' = sinh(asinh(tan φ) − e atanh(e sin φ))
    val t = math.sinh(atanh(sphi) - E * atanh(E * sphi))
    val xiP = math.atan2(t, math.cos(dlam))
    val etaP = asinh(math.sin(dlam) / math.hypot(t, math.cos(dlam)))
    var xi = xiP; var eta = etaP
    var j = 0
    while (j < 6) {
      val k = 2.0 * (j + 1)
      xi += alpha(j) * math.sin(k * xiP) * math.cosh(k * etaP)
      eta += alpha(j) * math.cos(k * xiP) * math.sinh(k * etaP)
      j += 1
    }
    (K0 * Arect * eta, K0 * Arect * xi)
  }

  /** Inverse TM: (x, y) relative to the natural origin (no false E/N). */
  def tmInv(x: Double, y: Double, lon0: Double): (Double, Double) = {
    val xi0 = y / (K0 * Arect)
    val eta0 = x / (K0 * Arect)
    var xi = xi0; var eta = eta0
    var j = 0
    while (j < 6) {
      val k = 2.0 * (j + 1)
      xi -= beta(j) * math.sin(k * xi0) * math.cosh(k * eta0)
      eta -= beta(j) * math.cos(k * xi0) * math.sinh(k * eta0)
      j += 1
    }
    val sh = math.sinh(eta)
    val tauP = math.sin(xi) / math.hypot(sh, math.cos(xi))
    val dlam = math.atan2(sh, math.cos(xi))
    // invert the conformal latitude: χ → φ by fixed point on
    // tan(π/4+φ/2) = tan(π/4+χ/2)·((1+e sinφ)/(1−e sinφ))^(e/2)
    val chi = math.atan(tauP)
    val tc = math.tan(math.Pi / 4 + chi / 2)
    var phi = chi
    var i = 0
    while (i < 10) {
      val s = math.sin(phi)
      val next = 2 * math.atan(tc * math.pow((1 + E * s) / (1 - E * s), E / 2)) -
        math.Pi / 2
      if (math.abs(next - phi) < 1e-15) { phi = next; i = 10 }
      else { phi = next; i += 1 }
    }
    (lon0 + dlam * R2D, phi * R2D)
  }

  @inline private def atanh(x: Double): Double = 0.5 * math.log((1 + x) / (1 - x))
  @inline private def asinh(x: Double): Double = math.log(x + math.hypot(x, 1.0))

  /** UTM zone (1–60) for a longitude, standard 6° slices. */
  def utmZone(lon: Double): Int = {
    val norm = ((lon + 180) % 360 + 360) % 360 - 180
    math.min(60, (math.floor((norm + 180) / 6) + 1).toInt)
  }

  def utmFwd(lon: Double, lat: Double, zone: Int, south: Boolean): (Double, Double) = {
    val lon0 = zone * 6.0 - 183.0
    val (x, y) = tmFwd(lon, lat, lon0)
    (x + FalseE, y + (if (south) 1e7 else 0.0))
  }

  def utmInv(x: Double, y: Double, zone: Int, south: Boolean): (Double, Double) =
    tmInv(x - FalseE, y - (if (south) 1e7 else 0.0), zone * 6.0 - 183.0)

  // --------------------------------------------- RD New (EPSG:28992)

  private val RdX0 = 155000.0
  private val RdY0 = 463000.0
  private val RdPhi0 = 52.15517440
  private val RdLam0 = 5.38720621

  /** WGS-84 → RD New (Schreutelkamp & van Strien 2001, table 3/4). */
  def rdFwd(lon: Double, lat: Double): (Double, Double) = {
    val dp = 0.36 * (lat - RdPhi0)
    val dl = 0.36 * (lon - RdLam0)
    val dp2 = dp * dp; val dp3 = dp2 * dp
    val dl2 = dl * dl; val dl3 = dl2 * dl; val dl4 = dl3 * dl
    val x = RdX0 +
      190094.945 * dl +
      -11832.228 * dp * dl +
      -114.221 * dp2 * dl +
      -32.391 * dl3 +
      -0.705 * dp +
      -2.340 * dp3 * dl +
      -0.608 * dp * dl3 +
      -0.008 * dl2 +
      0.148 * dp2 * dl3
    val y = RdY0 +
      309056.544 * dp +
      3638.893 * dl2 +
      73.077 * dp2 +
      -157.984 * dp * dl2 +
      59.788 * dp3 +
      0.433 * dl +
      -6.439 * dp2 * dl2 +
      -0.032 * dp * dl +
      0.092 * dl4 +
      -0.054 * dp * dl4
    (x, y)
  }

  /** RD New → WGS-84 (Schreutelkamp & van Strien 2001, table 1/2). */
  def rdInv(x: Double, y: Double): (Double, Double) = {
    val dx = (x - RdX0) * 1e-5
    val dy = (y - RdY0) * 1e-5
    val dx2 = dx * dx; val dx3 = dx2 * dx; val dx4 = dx3 * dx; val dx5 = dx4 * dx
    val dy2 = dy * dy; val dy3 = dy2 * dy; val dy4 = dy3 * dy
    val phi = RdPhi0 + (
      3235.65389 * dy +
      -32.58297 * dx2 +
      -0.24750 * dy2 +
      -0.84978 * dx2 * dy +
      -0.06550 * dy3 +
      -0.01709 * dx2 * dy2 +
      -0.00738 * dx +
      0.00530 * dx4 +
      -0.00039 * dx2 * dy3 +
      0.00033 * dx4 * dy +
      -0.00012 * dx * dy) / 3600
    val lam = RdLam0 + (
      5260.52916 * dx +
      105.94684 * dx * dy +
      2.45656 * dx * dy2 +
      -0.81885 * dx3 +
      0.05594 * dx * dy3 +
      -0.05607 * dx3 * dy +
      0.01199 * dy +
      -0.00256 * dx3 * dy2 +
      0.00128 * dx * dy4 +
      0.00022 * dy2 +
      -0.00022 * dx2 +
      0.00026 * dx5) / 3600
    (lam, phi)
  }

  // ---------------------- generic parameterized projections (round 5)
  // The Krüger TM core above is specialized to WGS-84/UTM constants;
  // these generalize the same published math to EPSG-keyed parameter
  // sets so national grids resolve without a projection library.

  /**
   * Parameterized transverse Mercator (Krüger series in n to order
   * n^6, Karney 2011 — the same series as the WGS-84 specialization
   * above, with coefficients derived from THIS ellipsoid's third
   * flattening) with natural-origin latitude, scale, and false
   * easting/northing. Covers the national TM grids (OSGB, ETRS89/UTM,
   * Gauss-Krüger families).
   */
  final class TmProj(val a: Double, val f: Double, val lon0: Double,
      val lat0: Double, val k0: Double, val falseE: Double, val falseN: Double) {
    private val e = math.sqrt(f * (2 - f))
    private val nn = f / (2 - f)
    private val m2 = nn * nn; private val m3 = m2 * nn; private val m4 = m3 * nn
    private val m5 = m4 * nn; private val m6 = m5 * nn
    private val arect = a / (1 + nn) * (1 + m2 / 4 + m4 / 64 + m6 / 256)
    private val al = Array(
      nn / 2 - 2.0 / 3 * m2 + 5.0 / 16 * m3 + 41.0 / 180 * m4 - 127.0 / 288 * m5
        + 7891.0 / 37800 * m6,
      13.0 / 48 * m2 - 3.0 / 5 * m3 + 557.0 / 1440 * m4 + 281.0 / 630 * m5
        - 1983433.0 / 1935360 * m6,
      61.0 / 240 * m3 - 103.0 / 140 * m4 + 15061.0 / 26880 * m5
        + 167603.0 / 181440 * m6,
      49561.0 / 161280 * m4 - 179.0 / 168 * m5 + 6601661.0 / 7257600 * m6,
      34729.0 / 80640 * m5 - 3418889.0 / 1995840 * m6,
      212378941.0 / 319334400 * m6)
    private val be = Array(
      nn / 2 - 2.0 / 3 * m2 + 37.0 / 96 * m3 - 1.0 / 360 * m4 - 81.0 / 512 * m5
        + 96199.0 / 604800 * m6,
      1.0 / 48 * m2 + 1.0 / 15 * m3 - 437.0 / 1440 * m4 + 46.0 / 105 * m5
        - 1118711.0 / 3870720 * m6,
      17.0 / 480 * m3 - 37.0 / 840 * m4 - 209.0 / 4480 * m5 + 5569.0 / 90720 * m6,
      4397.0 / 161280 * m4 - 11.0 / 504 * m5 - 830251.0 / 7257600 * m6,
      4583.0 / 161280 * m5 - 108847.0 / 3991680 * m6,
      20648693.0 / 638668800 * m6)

    /** (eta, xi) on the rectifying circle, no scale/origin applied. */
    private def raw(lon: Double, lat: Double): (Double, Double) = {
      val phi = lat * D2R
      val dlam = (lon - lon0) * D2R
      val sphi = math.sin(phi)
      val t = math.sinh(atanh(sphi) - e * atanh(e * sphi))
      val xiP = math.atan2(t, math.cos(dlam))
      val etaP = asinh(math.sin(dlam) / math.hypot(t, math.cos(dlam)))
      var xi = xiP; var eta = etaP
      var j = 0
      while (j < 6) {
        val k = 2.0 * (j + 1)
        xi += al(j) * math.sin(k * xiP) * math.cosh(k * etaP)
        eta += al(j) * math.cos(k * xiP) * math.sinh(k * etaP)
        j += 1
      }
      (eta, xi)
    }
    /** Northing of the natural-origin latitude (meridian distance). */
    private val y0 = if (lat0 == 0.0) 0.0 else { val (_, xi) = raw(lon0, lat0); k0 * arect * xi }

    def fwd(lon: Double, lat: Double): (Double, Double) = {
      val (eta, xi) = raw(lon, lat)
      (k0 * arect * eta + falseE, k0 * arect * xi - y0 + falseN)
    }

    def inv(x: Double, y: Double): (Double, Double) = {
      val xi0 = (y - falseN + y0) / (k0 * arect)
      val eta0 = (x - falseE) / (k0 * arect)
      var xi = xi0; var eta = eta0
      var j = 0
      while (j < 6) {
        val k = 2.0 * (j + 1)
        xi -= be(j) * math.sin(k * xi0) * math.cosh(k * eta0)
        eta -= be(j) * math.cos(k * xi0) * math.sinh(k * eta0)
        j += 1
      }
      val sh = math.sinh(eta)
      val tauP = math.sin(xi) / math.hypot(sh, math.cos(xi))
      val dlam = math.atan2(sh, math.cos(xi))
      val chi = math.atan(tauP)
      val tc = math.tan(math.Pi / 4 + chi / 2)
      var phi = chi
      var i = 0
      while (i < 10) {
        val s = math.sin(phi)
        val next = 2 * math.atan(tc * math.pow((1 + e * s) / (1 - e * s), e / 2)) -
          math.Pi / 2
        if (math.abs(next - phi) < 1e-15) { phi = next; i = 10 }
        else { phi = next; i += 1 }
      }
      (lon0 + dlam * R2D, phi * R2D)
    }
  }

  /**
   * Lambert conformal conic, two standard parallels (Snyder 1987,
   * "Map Projections — A Working Manual", pp. 107–109, eqs. 14-15 /
   * 15-1..15-11): the conic family behind Lambert-93, the US State
   * Plane south zones, and most mid-latitude national grids.
   */
  final class LccProj(val a: Double, val f: Double, val lat0: Double,
      val lon0: Double, val lat1: Double, val lat2: Double,
      val falseE: Double, val falseN: Double) {
    val e: Double = math.sqrt(f * (2 - f))
    private def mFn(phi: Double): Double = {
      val s = math.sin(phi)
      math.cos(phi) / math.sqrt(1 - e * e * s * s)
    }
    private def tFn(phi: Double): Double = {
      val s = math.sin(phi)
      math.tan(math.Pi / 4 - phi / 2) /
        math.pow((1 - e * s) / (1 + e * s), e / 2)
    }
    private val p1 = lat1 * D2R; private val p2 = lat2 * D2R
    private val m1v = mFn(p1); private val m2v = mFn(p2)
    private val t0v = tFn(lat0 * D2R); private val t1v = tFn(p1); private val t2v = tFn(p2)
    /** Cone constant n (= sin of the cone's apex latitude). */
    val n: Double =
      if (lat1 == lat2) math.sin(p1)
      else (math.log(m1v) - math.log(m2v)) / (math.log(t1v) - math.log(t2v))
    val bigF: Double = m1v / (n * math.pow(t1v, n))
    val rho0: Double = a * bigF * math.pow(t0v, n)

    /** Point scale factor (exactly 1 at both standard parallels). */
    def k(latDeg: Double): Double = {
      val phi = latDeg * D2R
      a * bigF * math.pow(tFn(phi), n) * n / (a * mFn(phi))
    }

    def fwd(lon: Double, lat: Double): (Double, Double) = {
      val rho = a * bigF * math.pow(tFn(lat * D2R), n)
      val theta = n * (lon - lon0) * D2R
      (falseE + rho * math.sin(theta), falseN + rho0 - rho * math.cos(theta))
    }

    def inv(x: Double, y: Double): (Double, Double) = {
      val dx = x - falseE
      val dy = rho0 - (y - falseN)
      val sgn = if (n >= 0) 1.0 else -1.0
      val rho = sgn * math.hypot(dx, dy)
      val theta = math.atan2(sgn * dx, sgn * dy)
      val tP = math.pow(rho / (a * bigF), 1 / n)
      var phi = math.Pi / 2 - 2 * math.atan(tP)
      var i = 0
      while (i < 10) {
        val s = math.sin(phi)
        val next = math.Pi / 2 -
          2 * math.atan(tP * math.pow((1 - e * s) / (1 + e * s), e / 2))
        if (math.abs(next - phi) < 1e-15) { phi = next; i = 10 }
        else { phi = next; i += 1 }
      }
      (lon0 + theta / n * R2D, phi * R2D)
    }
  }

  /**
   * 7-parameter Helmert datum shift (position-vector convention,
   * EPSG method 9606) through geocentric coordinates: geodetic on the
   * source ellipsoid → XYZ → translate/rotate/scale → geodetic on the
   * target ellipsoid (heights in/out are 0 — the planar-engine
   * contract). Rotations in arc-seconds, scale in ppm.
   */
  final class Helmert(tx: Double, ty: Double, tz: Double,
      rxSec: Double, rySec: Double, rzSec: Double, ppm: Double,
      aFrom: Double, fFrom: Double, aTo: Double, fTo: Double) {
    private val rx = rxSec / 3600 * D2R; private val ry = rySec / 3600 * D2R
    private val rz = rzSec / 3600 * D2R; private val s = 1 + ppm * 1e-6

    private def toXyz(a: Double, f: Double, lon: Double, lat: Double): (Double, Double, Double) = {
      val e2 = f * (2 - f)
      val phi = lat * D2R; val lam = lon * D2R
      val sp = math.sin(phi); val cp = math.cos(phi)
      val nu = a / math.sqrt(1 - e2 * sp * sp)
      (nu * cp * math.cos(lam), nu * cp * math.sin(lam), nu * (1 - e2) * sp)
    }
    private def toGeodetic(a: Double, f: Double, x: Double, y: Double, z: Double): (Double, Double) = {
      val e2 = f * (2 - f)
      val lam = math.atan2(y, x)
      val p = math.hypot(x, y)
      var phi = math.atan2(z, p * (1 - e2))
      var i = 0
      while (i < 12) {
        val sp = math.sin(phi)
        val nu = a / math.sqrt(1 - e2 * sp * sp)
        val next = math.atan2(z + e2 * nu * sp, p)
        if (math.abs(next - phi) < 1e-14) { phi = next; i = 12 }
        else { phi = next; i += 1 }
      }
      (lam * R2D, phi * R2D)
    }

    /** Source-datum (lon, lat) → target-datum (lon, lat). */
    def fwd(lon: Double, lat: Double): (Double, Double) = {
      val (x, y, z) = toXyz(aFrom, fFrom, lon, lat)
      val x2 = tx + s * (x - rz * y + ry * z)
      val y2 = ty + s * (rz * x + y - rx * z)
      val z2 = tz + s * (-ry * x + rx * y + z)
      toGeodetic(aTo, fTo, x2, y2, z2)
    }
    /** Exact inverse of [[fwd]] (inverted similarity transform). */
    def inv(lon: Double, lat: Double): (Double, Double) = {
      val (x2, y2, z2) = toXyz(aTo, fTo, lon, lat)
      // undo scale+translation, then the transposed (inverse) rotation
      val dx = (x2 - tx) / s; val dy = (y2 - ty) / s; val dz = (z2 - tz) / s
      val x = dx + rz * dy - ry * dz
      val y = -rz * dx + dy + rx * dz
      val z = ry * dx - rx * dy + dz
      toGeodetic(aFrom, fFrom, x, y, z)
    }
  }

  // EPSG-keyed instances. Ellipsoids: GRS80 (ETRS89/RGF93 ≈ WGS-84 at
  // the engine's precision — no datum shift), Airy 1830 (OSGB36, which
  // DOES need the published Helmert shift from WGS-84).
  private val Grs80A = 6378137.0
  private val Grs80F = 1.0 / 298.257222101
  private val AiryA = 6377563.396
  private val AiryF = 1.0 / 299.3249646

  /** EPSG:27700 British National Grid projection core (on OSGB36). */
  val bng: TmProj = new TmProj(AiryA, AiryF, lon0 = -2.0, lat0 = 49.0,
    k0 = 0.9996012717, falseE = 400000.0, falseN = -100000.0)
  /** WGS-84 → OSGB36 Helmert (OS 7-param, ~5 m published accuracy). */
  val wgsToOsgb36: Helmert = new Helmert(-446.448, 125.157, -542.060,
    -0.1502, -0.2470, -0.8421, 20.4894, A, F, AiryA, AiryF)
  /** EPSG:25832 / 25833 ETRS89 UTM zones 32N / 33N (GRS80). */
  val etrs32: TmProj = new TmProj(Grs80A, Grs80F, 9.0, 0.0, 0.9996, 500000.0, 0.0)
  val etrs33: TmProj = new TmProj(Grs80A, Grs80F, 15.0, 0.0, 0.9996, 500000.0, 0.0)
  /** EPSG:2154 RGF93 / Lambert-93 (France, LCC 2SP on GRS80). */
  val lambert93: LccProj = new LccProj(Grs80A, Grs80F, lat0 = 46.5, lon0 = 3.0,
    lat1 = 44.0, lat2 = 49.0, falseE = 700000.0, falseN = 6600000.0)

  // ------------------------------------------------------- dispatcher

  private def isUtm(srid: Int): Boolean =
    (srid >= 32601 && srid <= 32660) || (srid >= 32701 && srid <= 32760)

  def supported(srid: Int): Boolean =
    srid == 4326 || srid == 3857 || srid == 28992 || srid == 27700 ||
      srid == 25832 || srid == 25833 || srid == 2154 || isUtm(srid)

  /** Any supported SRID → EPSG:4326 (lon, lat). */
  def toGeographic(srid: Int, x: Double, y: Double): (Double, Double) = srid match {
    case 4326 => (x, y)
    case 3857 => mercatorInv(x, y)
    case 28992 => rdInv(x, y)
    case 27700 => val (lo, la) = bng.inv(x, y); wgsToOsgb36.inv(lo, la)
    case 25832 => etrs32.inv(x, y)
    case 25833 => etrs33.inv(x, y)
    case 2154 => lambert93.inv(x, y)
    case s if isUtm(s) =>
      val south = s >= 32701
      utmInv(x, y, if (south) s - 32700 else s - 32600, south)
    case s => throw new IllegalArgumentException(s"unsupported SRID $s")
  }

  /** EPSG:4326 (lon, lat) → any supported SRID. */
  def fromGeographic(srid: Int, lon: Double, lat: Double): (Double, Double) = srid match {
    case 4326 => (lon, lat)
    case 3857 => mercatorFwd(lon, lat)
    case 28992 => rdFwd(lon, lat)
    case 27700 => val (lo, la) = wgsToOsgb36.fwd(lon, lat); bng.fwd(lo, la)
    case 25832 => etrs32.fwd(lon, lat)
    case 25833 => etrs33.fwd(lon, lat)
    case 2154 => lambert93.fwd(lon, lat)
    case s if isUtm(s) =>
      val south = s >= 32701
      utmFwd(lon, lat, if (south) s - 32700 else s - 32600, south)
    case s => throw new IllegalArgumentException(s"unsupported SRID $s")
  }

  def transformPoint(from: Int, to: Int, x: Double, y: Double): (Double, Double) = {
    if (from == to) return (x, y)
    val (lon, lat) = toGeographic(from, x, y)
    fromGeographic(to, lon, lat)
  }

  /** Reproject every coordinate of a geometry (structure preserved). */
  def transform(g: FlatGeom, from: Int, to: Int): FlatGeom =
    if (from == to) g
    else Transform.mapCoords(g)((x, y) => transformPoint(from, to, x, y))
}
