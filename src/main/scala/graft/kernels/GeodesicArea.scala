package graft.kernels

import graft.core.{FlatGeom, GeomKind}

/**
 * Exact ellipsoidal (WGS-84) polygon area — the engine analogue of the
 * reference's `GeodesicArea` (geo/src/algorithm/geodesic_area.rs:9,
 * which delegates to geographiclib's PolygonArea, Karney 2013).
 *
 * Derivation is from first principles rather than the C4 Fourier
 * series: the area between a closed curve and the equator is
 * ∮ A(φ) dλ with A(φ) the exact area of a 1-radian-wide equator-to-φ
 * strip,
 *
 *   A(φ) = (b²/2) · [ sinφ / (1 − e²sin²φ) + atanh(e·sinφ)/e ],
 *
 * whose φ-derivative is the ellipsoid's area element ρ(φ)·ν(φ)·cosφ
 * (meridian × prime-vertical curvature radii). Along a geodesic,
 * dλ/ds = sinα / (ν cosφ) (the standard geodesic ODE), so each edge
 * contributes ∫ A(φ(s))·sinα(s)/(ν cosφ(s)) ds, evaluated with
 * Gauss-Legendre quadrature over direct-problem samples
 * ([[Geodesic.directFull]]). The integrand is analytic with variation
 * scale ~ the earth radius, so 16-point panels over ≤500 km chunks
 * converge far below the double-precision noise of the edge solves.
 * Winding of the accumulated Δλ detects pole-enclosing rings.
 *
 * Semantics mirror the reference trait (geodesic_area.rs): signed area
 * is positive for CCW exteriors, hole areas subtract regardless of
 * their winding; the unsigned variant reduces a >half-earth ring into
 * [0, total-earth-area).
 */
object GeodesicArea {

  private val E2 = Geodesic.E2
  private val E = Math.sqrt(E2)
  private val B2 = Geodesic.B * Geodesic.B

  @inline private def atanh(x: Double): Double = 0.5 * Math.log((1.0 + x) / (1.0 - x))

  /** Exact area from the equator to latitude φ per radian of longitude. */
  @inline def aPhi(phi: Double): Double = {
    val s = Math.sin(phi)
    (B2 / 2.0) * (s / (1.0 - E2 * s * s) + atanh(E * s) / E)
  }

  /** A(π/2): one-radian wedge of the northern hemisphere. */
  private val APole: Double = aPhi(Math.PI / 2.0)

  /** Total surface area of the WGS-84 ellipsoid (= 4π·c², c² authalic). */
  val EarthArea: Double = 4.0 * Math.PI * APole

  // ---- Gauss-Legendre nodes: computed, not transcribed (Newton on
  // P_n with the Chebyshev-like initial guess; converges to 1 ulp).
  private val GlN = 16
  private val (glX, glW): (Array[Double], Array[Double]) = {
    val x = new Array[Double](GlN)
    val w = new Array[Double](GlN)
    var i = 0
    while (i < GlN) {
      var z = Math.cos(Math.PI * (i + 0.75) / (GlN + 0.5))
      var it = 0
      var pp = 0.0
      while (it < 100) {
        var p1 = 1.0; var p2 = 0.0
        var j = 0
        while (j < GlN) {
          val p3 = p2; p2 = p1
          p1 = ((2.0 * j + 1.0) * z * p2 - j * p3) / (j + 1.0)
          j += 1
        }
        pp = GlN * (z * p1 - p2) / (z * z - 1.0)
        val z1 = z
        z = z1 - p1 / pp
        if (Math.abs(z - z1) < 1e-15) it = 100 else it += 1
      }
      x(i) = z
      w(i) = 2.0 / ((1.0 - z * z) * pp * pp)
      i += 1
    }
    (x, w)
  }

  /** ∫ A(φ) dλ contribution of one geodesic edge (non-meridian). */
  private def edgeIntegral(lon1: Double, lat1: Double, azi1: Double, s12: Double): Double = {
    val chunks = Math.max(1, Math.ceil(s12 / 500000.0).toInt)
    val h = s12 / chunks
    var total = 0.0
    var c = 0
    while (c < chunks) {
      val mid = c * h + h / 2.0
      var i = 0
      while (i < GlN) {
        val s = mid + glX(i) * h / 2.0
        val (_, lat, azi) = Geodesic.directFull(lon1, lat1, azi1, s)
        val phi = Math.toRadians(lat)
        val alp = Math.toRadians(azi)
        val sphi = Math.sin(phi)
        val nu = Geodesic.A / Math.sqrt(1.0 - E2 * sphi * sphi)
        val integrand = aPhi(phi) * Math.sin(alp) / (nu * Math.cos(phi))
        total += glW(i) * (h / 2.0) * integrand
        i += 1
      }
      c += 1
    }
    total
  }

  /** Signed enclosed area of one ring (vertex list, open or closed):
    * positive for counter-clockwise (east-about) rings, pole
    * enclosure handled via the Δλ winding number. */
  def ringArea(coords: Array[Double], start: Int, end: Int): Double = {
    val n = end - start
    if (n < 3) return 0.0
    var sRaw = 0.0
    var dLam = 0.0
    var i = start
    while (i < end) {
      val j = if (i + 1 < end) i + 1 else start
      val lon1 = coords(2 * i); val lat1 = coords(2 * i + 1)
      val lon2 = coords(2 * j); val lat2 = coords(2 * j + 1)
      if (!(lon1 == lon2 && lat1 == lat2)) {
        val (s12, azi1, _) = Geodesic.inverse(lon1, lat1, lon2, lat2)
        val dl = Math.toRadians(angDiffDeg(lon1, lon2))
        dLam += dl
        if (s12 > 0.0) {
          val sazi = Math.abs(Math.sin(Math.toRadians(azi1)))
          if (sazi < 1e-12 && dl != 0.0) {
            // meridian edge over a pole: A(φ) jumps at the pole, the
            // whole ∫A dλ contribution is the jump there
            val northPole = Math.abs(azi1) < 90.0
            sRaw += dl * (if (northPole) APole else -APole)
          } else {
            sRaw += edgeIntegral(lon1, lat1, azi1, s12)
          }
        }
      }
      i += 1
    }
    val w = Math.round(dLam / (2.0 * Math.PI)).toDouble
    // Green's theorem in the (λ, φ) chart: CCW boundary ⇒ ∮A dλ = −area;
    // each pole encirclement shifts by a hemisphere (2π·A(pole)).
    val raw = w * 2.0 * Math.PI * APole - sRaw
    // Normalize into (−total/2, total/2] (geographiclib's AreaReduce):
    // a ring seen as "everything except a cap" and "minus the cap" are
    // the same area modulo the total; report the smaller-magnitude one.
    var r = raw % EarthArea
    if (r > EarthArea / 2.0) r -= EarthArea
    else if (r <= -EarthArea / 2.0) r += EarthArea
    r
  }

  @inline private def angDiffDeg(l1: Double, l2: Double): Double = {
    var d = (l2 - l1) % 360.0
    if (d > 180.0) d -= 360.0
    else if (d <= -180.0 && !(d == -180.0 && l2 > l1)) d += 360.0
    d
  }

  /** Reference `geodesic_area_signed`: exterior sign follows its
    * winding; hole areas subtract regardless of their winding. */
  def signedArea(g: FlatGeom): Double = g.kind match {
    case GeomKind.Polygon => signedPoly(g, 0, g.rings.length)
    case GeomKind.MultiPolygon =>
      var total = 0.0
      FlatGeom.foreachPart(g)((_, r0, r1) => total += signedPoly(g, r0, r1))
      total
    case _ => 0.0
  }

  private def signedPoly(g: FlatGeom, r0: Int, r1: Int): Double = {
    val ext = ringArea(g.coords, g.ringStart(r0), g.ringEnd(r0))
    var holes = 0.0
    var r = r0 + 1
    while (r < r1) {
      holes += Math.abs(ringArea(g.coords, g.ringStart(r), g.ringEnd(r)))
      r += 1
    }
    ext - Math.signum(ext) * holes
  }

  /** Reference `geodesic_area_unsigned`: each exterior reduced into
    * [0, EarthArea) — supports rings larger than half the earth;
    * holes (assumed smaller than half the earth) subtract. */
  def unsignedArea(g: FlatGeom): Double = g.kind match {
    case GeomKind.Polygon => unsignedPoly(g, 0, g.rings.length)
    case GeomKind.MultiPolygon =>
      var total = 0.0
      FlatGeom.foreachPart(g)((_, r0, r1) => total += unsignedPoly(g, r0, r1))
      total
    case _ => 0.0
  }

  private def unsignedPoly(g: FlatGeom, r0: Int, r1: Int): Double = {
    val extRaw = ringArea(g.coords, g.ringStart(r0), g.ringEnd(r0))
    val ext = ((extRaw % EarthArea) + EarthArea) % EarthArea
    var holes = 0.0
    var r = r0 + 1
    while (r < r1) {
      val u = Math.abs(ringArea(g.coords, g.ringStart(r), g.ringEnd(r)))
      holes += Math.min(u, EarthArea - u)
      r += 1
    }
    ext - holes
  }
}
