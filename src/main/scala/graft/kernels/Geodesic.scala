package graft.kernels

/**
 * WGS-84 ellipsoidal geodesics — a from-scratch Scala implementation of
 * Karney's algorithm (C.F.F. Karney, "Algorithms for geodesics",
 * J. Geodesy 87, 2013, doi:10.1007/s00146-012-0578-0), 6th-order
 * series, solving the direct and inverse problems.
 *
 * This re-expresses the semantics the reference gets from
 * geographiclib-rs (geo/src/algorithm/line_measures/metric_spaces/
 * geodesic.rs:39-243) without porting that crate: the equations come
 * from the published paper (series expansions Eqs. 15-25, astroid
 * starting-point construction §5, Newton iteration §4).
 */
object Geodesic {

  // WGS-84 (matches geo's wgs84() usage; constants geo/src/lib.rs:240-246)
  final val A = 6378137.0
  final val F = 1.0 / 298.257223563
  final val F1 = 1.0 - F
  final val E2 = F * (2.0 - F)
  final val EP2 = E2 / (1.0 - E2) // e'^2
  final val N = F / (2.0 - F) // third flattening
  final val B = A * F1

  private final val Tiny = Math.sqrt(java.lang.Double.MIN_NORMAL)
  private final val Tol0 = Math.ulp(1.0)
  private final val Tol1 = 200.0 * Tol0
  private final val Tol2 = Math.sqrt(Tol0)
  private final val TolB = Tol0 * Tol2
  private final val XThresh = 1000.0 * Tol2
  private final val MaxIt1 = 20
  private final val MaxIt2 = MaxIt1 + 53 + 10
  private final val ETol2 =
    0.1 * Tol2 / Math.sqrt(Math.max(0.001, Math.abs(F)) * Math.min(1.0, 1.0 - F / 2.0) / 2.0)

  // ------------------------------------------------- angle utilities

  @inline private def sq(x: Double): Double = x * x

  private def norm2(s: Double, c: Double): (Double, Double) = {
    val h = Math.hypot(s, c)
    (s / h, c / h)
  }

  /** sin/cos of x degrees, exact at quadrant boundaries. */
  private[kernels] def sincosd(x: Double): (Double, Double) = {
    var r = x % 360.0
    val q = Math.round(r / 90.0).toInt
    r -= 90.0 * q
    val rad = Math.toRadians(r)
    val s = Math.sin(rad)
    val c = Math.cos(rad)
    (q & 3) match {
      case 0 => (s, c)
      case 1 => (c, -s)
      case 2 => (-s, -c)
      case _ => (-c, s)
    }
  }

  private def atan2d(y: Double, x: Double): Double = {
    // exact quadrant handling: compute in [-45, 45] then rotate back
    var yy = y; var xx = x; var q = 0
    if (Math.abs(yy) > Math.abs(xx)) { val t = xx; xx = yy; yy = t; q = 2 }
    if (xx < 0) { xx = -xx; q += 1 }
    var ang = Math.toDegrees(Math.atan2(yy, xx))
    q match {
      case 1 => ang = (if (yy >= 0) 180.0 else -180.0) - ang
      case 2 => ang = 90.0 - ang
      case 3 => ang = -90.0 + ang
      case _ =>
    }
    ang
  }

  private def angNormalize(x: Double): Double = {
    val y = Math.IEEEremainder(x, 360.0)
    if (y == -180.0) 180.0 else y
  }

  /** Exact angle difference y - x in (-180, 180], plus the tail. */
  private def angDiff(x: Double, y: Double): (Double, Double) = {
    // sum with error term
    val d0 = Math.IEEEremainder(-x, 360.0)
    val d1 = Math.IEEEremainder(y, 360.0)
    val s = d0 + d1
    val up = s - d1
    val vpp = s - up
    val t = (d0 - up) + (d1 - vpp)
    var d = angNormalize(s)
    if (d == 180.0 && t > 0.0) d = -180.0
    val total = d + t
    val err = t - (total - d)
    (total, err)
  }

  private def angRound(x: Double): Double = {
    val z = 1.0 / 16.0
    if (x == 0.0) 0.0
    else {
      var y = Math.abs(x)
      if (y < z) y = z - (z - y)
      if (x < 0) -y else y
    }
  }

  // per-thread scratch buffers: the inverse problem evaluates these
  // series many times per call; fresh arrays per evaluation dominate
  // allocation at high parallelism
  private final class Scratch {
    val c1 = new Array[Double](7)
    val c1p = new Array[Double](7)
    val c2 = new Array[Double](7)
    val c3 = new Array[Double](6)
  }
  private val scratch = ThreadLocal.withInitial[Scratch](() => new Scratch)

  // --------------------------------------------------------- series

  /** Clenshaw sum of the sine series Σ c(l)·sin(2l·σ) (sinp) or the
    * cosine series with c indexed from 1. */
  private def sinCosSeries(sinp: Boolean, sinx: Double, cosx: Double, c: Array[Double]): Double = {
    var k = c.length - 1 // c(0) unused
    val ar = 2.0 * (cosx - sinx) * (cosx + sinx)
    var y0 = 0.0
    var y1 = 0.0
    if ((k & 1) != 0) { y0 = c(k); k -= 1 }
    while (k > 0) {
      y1 = ar * y0 - y1 + c(k); k -= 1
      y0 = ar * y1 - y0 + c(k); k -= 1
    }
    if (sinp) 2.0 * sinx * cosx * y0 else cosx * (y0 - y1)
  }

  /** A1 − 1 (Karney Eq. 17, order 6). */
  private def a1m1f(eps: Double): Double = {
    val eps2 = sq(eps)
    val t = eps2 * (eps2 * (eps2 + 4.0) + 64.0) / 256.0
    (t + eps) / (1.0 - eps)
  }

  /** C1 coefficients (Karney Eq. 18). */
  private def c1f(eps: Double): Array[Double] = {
    val e = eps; val e2 = sq(eps)
    val c = scratch.get().c1
    c(1) = -e / 2.0 + 3.0 / 16.0 * e * e2 - 1.0 / 32.0 * e * sq(e2)
    c(2) = -e2 / 16.0 + 1.0 / 32.0 * sq(e2) - 9.0 / 2048.0 * e2 * sq(e2)
    c(3) = -1.0 / 48.0 * e * e2 + 3.0 / 256.0 * e * sq(e2)
    c(4) = -5.0 / 512.0 * sq(e2) + 3.0 / 512.0 * e2 * sq(e2)
    c(5) = -7.0 / 1280.0 * e * sq(e2)
    c(6) = -7.0 / 2048.0 * e2 * sq(e2)
    c
  }

  /** C1' coefficients (inverse of the I1 series, Karney Eq. 21). */
  private def c1pf(eps: Double): Array[Double] = {
    val e = eps; val e2 = sq(eps)
    val c = scratch.get().c1p
    c(1) = e / 2.0 - 9.0 / 32.0 * e * e2 + 205.0 / 1536.0 * e * sq(e2)
    c(2) = 5.0 / 16.0 * e2 - 37.0 / 96.0 * sq(e2) + 1335.0 / 4096.0 * e2 * sq(e2)
    c(3) = 29.0 / 96.0 * e * e2 - 75.0 / 128.0 * e * sq(e2)
    c(4) = 539.0 / 1536.0 * sq(e2) - 2391.0 / 2560.0 * e2 * sq(e2)
    c(5) = 3467.0 / 7680.0 * e * sq(e2)
    c(6) = 38081.0 / 61440.0 * e2 * sq(e2)
    c
  }

  /** A2 − 1 (Karney Eq. 42 refinement). */
  private def a2m1f(eps: Double): Double = {
    val eps2 = sq(eps)
    val t = eps2 * (eps2 * (25.0 * eps2 + 36.0) + 64.0) / 256.0
    (t - eps) / (1.0 + eps)
  }

  /** C2 coefficients (Karney Eq. 43). */
  private def c2f(eps: Double): Array[Double] = {
    val e = eps; val e2 = sq(eps)
    val c = scratch.get().c2
    c(1) = e / 2.0 + 1.0 / 16.0 * e * e2 + 1.0 / 32.0 * e * sq(e2)
    c(2) = 3.0 / 16.0 * e2 + 1.0 / 32.0 * sq(e2) + 35.0 / 2048.0 * e2 * sq(e2)
    c(3) = 5.0 / 48.0 * e * e2 + 5.0 / 256.0 * e * sq(e2)
    c(4) = 35.0 / 512.0 * sq(e2) + 7.0 / 512.0 * e2 * sq(e2)
    c(5) = 63.0 / 1280.0 * e * sq(e2)
    c(6) = 77.0 / 2048.0 * e2 * sq(e2)
    c
  }

  // A3 / C3 coefficients: polynomials in n evaluated once (Karney
  // Eqs. 24-25, order 6)
  private val A3x: Array[Double] = Array(
    1.0,
    (N - 1.0) / 2.0,
    (N * (3.0 * N - 1.0) - 2.0) / 8.0,
    ((-N - 3.0) * N - 1.0) / 16.0,
    (-2.0 * N - 3.0) / 64.0,
    -3.0 / 128.0)

  /** A3 as a polynomial in eps (ascending powers with A3x). */
  def a3f(eps: Double): Double = {
    var v = 0.0
    var i = A3x.length - 1
    while (i >= 0) { v = v * eps + A3x(i); i -= 1 }
    v
  }

  // C3[l] coefficients of eps^j, l = 1..5 (ascending eps powers per l)
  private val C3x: Array[Array[Double]] = Array(
    // C3[1]: eps^1..eps^5
    Array((1.0 - N) / 4.0, (1.0 - N * N) / 8.0, ((3.0 - N) * N + 3.0) / 64.0,
      (2.0 * N + 5.0) / 128.0, 3.0 / 128.0),
    // C3[2]: eps^2..eps^5
    Array(((N - 3.0) * N + 2.0) / 32.0, ((-3.0 * N - 2.0) * N + 3.0) / 64.0,
      (N + 3.0) / 128.0, 5.0 / 256.0),
    // C3[3]: eps^3..eps^5
    Array(((5.0 * N - 9.0) * N + 5.0) / 192.0, (-10.0 * N + 9.0) / 384.0, 7.0 / 512.0),
    // C3[4]: eps^4..eps^5
    Array((-14.0 * N + 7.0) / 512.0, 7.0 / 512.0),
    // C3[5]: eps^5
    Array(21.0 / 2560.0))

  private def c3f(eps: Double): Array[Double] = {
    val c = scratch.get().c3 // c(1)..c(5)
    var l = 1
    while (l <= 5) {
      val coefs = C3x(l - 1)
      var v = 0.0
      var j = coefs.length - 1
      while (j >= 0) { v = v * eps + coefs(j); j -= 1 }
      // multiply by eps^l
      var m = 0
      while (m < l) { v *= eps; m += 1 }
      c(l) = v
      l += 1
    }
    c
  }

  // ---------------------------------------------------------- direct

  /** Direct problem: from (lon1, lat1) with initial azimuth azi1 (deg)
    * travel s12 meters. Returns (lon2, lat2, azi2). */
  def directFull(lon1: Double, lat1: Double, azi1: Double, s12: Double): (Double, Double, Double) = {
    val (salp1, calp1) = sincosd(angRound(azi1))
    val lat1x = angRound(Math.max(-90.0, Math.min(90.0, lat1)))
    var (sbet1, cbet1) = sincosd(lat1x)
    sbet1 *= F1
    val n1 = norm2(sbet1, cbet1); sbet1 = n1._1; cbet1 = Math.max(Tiny, n1._2)
    val dn1 = Math.sqrt(1.0 + EP2 * sq(sbet1))

    val salp0 = salp1 * cbet1
    val calp0 = Math.hypot(calp1, salp1 * sbet1)
    var ssig1 = sbet1
    val somg1 = salp0 * sbet1
    var csig1 = if (sbet1 != 0.0 || calp1 != 0.0) cbet1 * calp1 else 1.0
    val comg1 = csig1
    val ns = norm2(ssig1, csig1); ssig1 = ns._1; csig1 = ns._2

    val k2 = sq(calp0) * EP2
    val eps = k2 / (2.0 * (1.0 + Math.sqrt(1.0 + k2)) + k2)
    val a1m1 = a1m1f(eps)
    val c1 = c1f(eps)
    val b11 = sinCosSeries(sinp = true, ssig1, csig1, c1)
    val sB = Math.sin(b11); val cB = Math.cos(b11)
    val stau1 = ssig1 * cB + csig1 * sB
    val ctau1 = csig1 * cB - ssig1 * sB
    val c1p = c1pf(eps)

    val tau12 = s12 / (B * (1.0 + a1m1))
    val sT = Math.sin(tau12); val cT = Math.cos(tau12)
    var b12 = -sinCosSeries(sinp = true, stau1 * cT + ctau1 * sT, ctau1 * cT - stau1 * sT, c1p)
    var sig12 = tau12 - (b12 - b11)
    var ssig12 = Math.sin(sig12)
    var csig12 = Math.cos(sig12)
    if (Math.abs(F) > 0.01) {
      // one Newton correction pass (Karney §8 refinement)
      val ssig2t = ssig1 * csig12 + csig1 * ssig12
      val csig2t = csig1 * csig12 - ssig1 * ssig12
      b12 = sinCosSeries(sinp = true, ssig2t, csig2t, c1)
      val serr = (1.0 + a1m1) * (sig12 + (b12 - b11)) - s12 / B
      sig12 -= serr / Math.sqrt(1.0 + k2 * sq(ssig2t))
      ssig12 = Math.sin(sig12)
      csig12 = Math.cos(sig12)
    }
    val ssig2 = ssig1 * csig12 + csig1 * ssig12
    val csig2 = csig1 * csig12 - ssig1 * ssig12
    val sbet2 = calp0 * ssig2
    var cbet2 = Math.hypot(salp0, calp0 * csig2)
    if (cbet2 == 0.0) cbet2 = Tiny
    val somg2 = salp0 * ssig2
    val comg2 = csig2
    val salp2 = salp0
    val calp2 = calp0 * csig2

    val omg12 = Math.atan2(somg2 * comg1 - comg2 * somg1, comg2 * comg1 + somg2 * somg1)
    val c3 = c3f(eps)
    val a3c = -F * salp0 * a3f(eps)
    val b31 = sinCosSeries(sinp = true, ssig1, csig1, c3)
    val b32 = sinCosSeries(sinp = true, ssig2, csig2, c3)
    val lam12 = omg12 + a3c * (sig12 + (b32 - b31))
    val lon12 = Math.toDegrees(lam12)
    val lon2 = angNormalize(angNormalize(lon1) + angNormalize(lon12))
    val lat2 = atan2d(sbet2, F1 * cbet2)
    val azi2 = atan2d(salp2, calp2)
    (lon2, lat2, azi2)
  }

  def direct(lon1: Double, lat1: Double, azi1: Double, s12: Double): Array[Double] = {
    val (lon2, lat2, _) = directFull(lon1, lat1, azi1, s12)
    Array(lon2, lat2)
  }

  // --------------------------------------------------------- inverse

  /** Inverse problem: (s12 meters, azi1 deg, azi2 deg). */
  def inverse(lon1: Double, lat1In: Double, lon2: Double, lat2In: Double): (Double, Double, Double) = {
    var lat1 = angRound(Math.max(-90.0, Math.min(90.0, lat1In)))
    var lat2 = angRound(Math.max(-90.0, Math.min(90.0, lat2In)))
    val (lon12full, lon12err) = angDiff(lon1, lon2)
    var lonsign = if (lon12full >= 0.0) 1.0 else -1.0
    // round near-meridional differences to exact; lon12s is the
    // SUPPLEMENT 180 − lon12 (drives the near-antipodal machinery)
    val lon12 = angRound(lonsign * lon12full) // ≥ 0
    val lon12s = angRound((180.0 - lon12) - lonsign * lon12err)
    val lam12 = Math.toRadians(lon12)
    var (slam12, clam12) = if (lon12 > 90.0) {
      val (s, c) = sincosd(lon12s)
      (s, -c)
    } else sincosd(lon12)

    var swapp = if (Math.abs(lat1) < Math.abs(lat2)) -1.0 else 1.0
    if (swapp < 0) {
      lonsign *= -1.0
      val t = lat1; lat1 = lat2; lat2 = t
    }
    val latsign = if (lat1 < 0.0) 1.0 else -1.0
    lat1 *= latsign
    lat2 *= latsign

    var (sbet1, cbet1) = sincosd(lat1)
    sbet1 *= F1
    val nb1 = norm2(sbet1, cbet1); sbet1 = nb1._1; cbet1 = Math.max(Tiny, nb1._2)
    var (sbet2, cbet2) = sincosd(lat2)
    sbet2 *= F1
    val nb2 = norm2(sbet2, cbet2); sbet2 = nb2._1; cbet2 = Math.max(Tiny, nb2._2)

    if (cbet1 < -sbet1) { if (cbet2 == cbet1) sbet2 = Math.copySign(sbet1, sbet2) }
    else { if (Math.abs(sbet2) == -sbet1) cbet2 = cbet1 }

    val dn1 = Math.sqrt(1.0 + EP2 * sq(sbet1))
    val dn2 = Math.sqrt(1.0 + EP2 * sq(sbet2))

    var sig12 = 0.0
    var s12x = 0.0
    var m12x = 0.0
    var salp1 = 0.0; var calp1 = 0.0; var salp2 = 0.0; var calp2 = 0.0

    val meridian = lat1 == -90.0 || slam12 == 0.0
    var done = false
    if (meridian) {
      calp1 = clam12; salp1 = slam12
      salp2 = 0.0; calp2 = 1.0
      val ssig1 = sbet1; val csig1 = calp1 * cbet1
      val ssig2 = sbet2; val csig2 = calp2 * cbet2
      sig12 = Math.atan2(Math.max(0.0, csig1 * ssig2 - ssig1 * csig2), csig1 * csig2 + ssig1 * ssig2)
      // meridional geodesic: calp0 = 0 ⇒ k² = e'²
      val epsMer = EP2 / (2.0 * (1.0 + Math.sqrt(1.0 + EP2)) + EP2)
      val lr = lengths(epsMer, sig12, ssig1, csig1, dn1, ssig2, csig2, dn2, cbet1, cbet2)
      s12x = lr._1; m12x = lr._2
      if (sig12 < 1.0 || m12x >= 0.0) {
        if (sig12 < 3.0 * Tiny) { sig12 = 0.0; m12x = 0.0; s12x = 0.0 }
        m12x *= B
        s12x *= B
        done = true
      }
      // else: prolate fallback — with WGS-84 f>0 this cannot happen
    }
    if (!done && sbet1 == 0.0 && lon12s >= F * 180.0) {
      // equatorial line
      calp1 = 0.0; calp2 = 0.0; salp1 = 1.0; salp2 = 1.0
      s12x = A * lam12
      sig12 = lam12 / F1
      m12x = B * Math.sin(sig12)
      done = true
    }
    if (!done) {
      val st = inverseStart(sbet1, cbet1, dn1, sbet2, cbet2, dn2, lam12, slam12, clam12)
      sig12 = st._1; salp1 = st._2; calp1 = st._3; salp2 = st._4; calp2 = st._5
      val dnm = st._6
      if (sig12 >= 0.0) {
        // short-line shortcut
        s12x = sig12 * B * dnm
        m12x = sq(dnm) * B * Math.sin(sig12 / dnm)
      } else {
        // Newton iteration on alp1
        var tripn = false
        var tripb = false
        var salp1a = Tiny; var calp1a = 1.0
        var salp1b = Tiny; var calp1b = -1.0
        var eps = 0.0
        var ssig1 = 0.0; var csig1 = 0.0; var ssig2 = 0.0; var csig2 = 0.0
        var numit = 0
        var break = false
        while (numit < MaxIt2 && !break) {
          val l = lambda12(sbet1, cbet1, dn1, sbet2, cbet2, dn2, salp1, calp1,
            slam12, clam12, diffp = numit < MaxIt1)
          // lambda12's eta is computed relative to lam120, so l.lam12 IS
          // the residual v = λ12(α1) − λ12_target already
          val v = l.lam12
          salp2 = l.salp2; calp2 = l.calp2
          sig12 = l.sig12
          ssig1 = l.ssig1; csig1 = l.csig1; ssig2 = l.ssig2; csig2 = l.csig2
          eps = l.eps
          if (tripb || !(Math.abs(v) >= (if (tripn) 8.0 else 1.0) * Tol0)) {
            break = true
          } else {
            if (v > 0.0 && (numit > MaxIt1 || calp1 / salp1 > calp1b / salp1b)) {
              salp1b = salp1; calp1b = calp1
            } else if (v < 0.0 && (numit > MaxIt1 || calp1 / salp1 < calp1a / salp1a)) {
              salp1a = salp1; calp1a = calp1
            }
            numit += 1
            var newtonOk = false
            if (numit < MaxIt1 && l.dlam12 > 0.0) {
              val dalp1 = -v / l.dlam12
              val sdalp1 = Math.sin(dalp1); val cdalp1 = Math.cos(dalp1)
              val nsalp1 = salp1 * cdalp1 + calp1 * sdalp1
              if (nsalp1 > 0.0 && Math.abs(dalp1) < Math.PI) {
                calp1 = calp1 * cdalp1 - salp1 * sdalp1
                salp1 = nsalp1
                val nn = norm2(salp1, calp1); salp1 = nn._1; calp1 = nn._2
                tripn = Math.abs(v) <= 16.0 * Tol0
                newtonOk = true
              }
            }
            if (!newtonOk) {
              salp1 = (salp1a + salp1b) / 2.0
              calp1 = (calp1a + calp1b) / 2.0
              val nn = norm2(salp1, calp1); salp1 = nn._1; calp1 = nn._2
              tripn = false
              tripb = Math.abs(salp1a - salp1) + (calp1a - calp1) < TolB ||
                Math.abs(salp1 - salp1b) + (calp1 - calp1b) < TolB
            }
          }
        }
        val lr = lengths(eps, sig12, ssig1, csig1, dn1, ssig2, csig2, dn2, cbet1, cbet2)
        s12x = lr._1 * B
        m12x = lr._2 * B
      }
    }

    val s12 = 0.0 + s12x
    if (swapp < 0) {
      var t = salp1; salp1 = salp2; salp2 = t
      t = calp1; calp1 = calp2; calp2 = t
    }
    salp1 *= swapp * lonsign; calp1 *= swapp * latsign
    salp2 *= swapp * lonsign; calp2 *= swapp * latsign
    (s12, atan2d(salp1, calp1), atan2d(salp2, calp2))
  }

  def inverseDistance(lon1: Double, lat1: Double, lon2: Double, lat2: Double): Double =
    inverse(lon1, lat1, lon2, lat2)._1

  def inverseAzimuth(lon1: Double, lat1: Double, lon2: Double, lat2: Double): Double = {
    val az = inverse(lon1, lat1, lon2, lat2)._2
    (az + 360.0) % 360.0
  }

  /** Point at a fraction of the geodesic between two points
    * (geodesic.rs:205-243 point_at_ratio_between). */
  def pointAtRatio(lon1: Double, lat1: Double, lon2: Double, lat2: Double, ratio: Double): Array[Double] = {
    val (s12, azi1, _) = inverse(lon1, lat1, lon2, lat2)
    direct(lon1, lat1, azi1, s12 * ratio)
  }

  def length(g: graft.core.FlatGeom): Double = {
    var sum = 0.0
    graft.core.FlatGeom.foreachRing(g) { (s, e) =>
      var i = s
      while (i < e - 1) {
        sum += inverseDistance(g.x(i), g.y(i), g.x(i + 1), g.y(i + 1))
        i += 1
      }
    }
    sum
  }

  // ------------------------------------------------------ subroutines

  /** Returns (s12b, m12b) — distance and reduced length over b. */
  private[kernels] def lengths(eps: Double, sig12: Double,
      ssig1: Double, csig1: Double, dn1: Double,
      ssig2: Double, csig2: Double, dn2: Double,
      cbet1: Double, cbet2: Double): (Double, Double) = {
    val a1 = 1.0 + a1m1f(eps)
    val a2 = 1.0 + a2m1f(eps)
    val c1 = c1f(eps)
    val c2 = c2f(eps)
    val m0x = a1 - a2
    val b1 = sinCosSeries(sinp = true, ssig2, csig2, c1) - sinCosSeries(sinp = true, ssig1, csig1, c1)
    val b2 = sinCosSeries(sinp = true, ssig2, csig2, c2) - sinCosSeries(sinp = true, ssig1, csig1, c2)
    val j12 = m0x * sig12 + (a1 * b1 - a2 * b2)
    val m12b = dn2 * (csig1 * ssig2) - dn1 * (ssig1 * csig2) - csig1 * csig2 * j12
    val s12b = a1 * (sig12 + b1)
    (s12b, m12b)
  }

  /** Solve κ⁴ + 2κ³ − (x²+y²−1)κ² − 2y²κ − y² = 0 for positive root
    * (Karney Eq. 65, the astroid construction). */
  private def astroid(x: Double, y: Double): Double = {
    val p = sq(x)
    val q = sq(y)
    val r = (p + q - 1.0) / 6.0
    if (!(q == 0.0 && r <= 0.0)) {
      val s = p * q / 4.0
      val r2 = sq(r)
      val r3 = r * r2
      val disc = s * (s + 2.0 * r3)
      var u = r
      if (disc >= 0.0) {
        var t3 = s + r3
        t3 += (if (t3 < 0.0) -Math.sqrt(disc) else Math.sqrt(disc))
        val t = Math.cbrt(t3)
        u += t + (if (t != 0.0) r2 / t else 0.0)
      } else {
        val ang = Math.atan2(Math.sqrt(-disc), -(s + r3))
        u += 2.0 * r * Math.cos(ang / 3.0)
      }
      val v = Math.sqrt(sq(u) + q)
      val uv = if (u < 0.0) q / (v - u) else u + v
      val w = (uv - q) / (2.0 * v)
      uv / (Math.sqrt(uv + sq(w)) + w)
    } else 0.0
  }

  /** Starting point for Newton's method; sig12 >= 0 signals the
    * short-line shortcut (Karney §5). Returns
    * (sig12, salp1, calp1, salp2, calp2, dnm). */
  private[kernels] def inverseStart(sbet1: Double, cbet1: Double, dn1: Double,
      sbet2: Double, cbet2: Double, dn2: Double,
      lam12: Double, slam12: Double, clam12: Double):
      (Double, Double, Double, Double, Double, Double) = {
    var sig12 = -1.0
    var salp2 = Double.NaN
    var calp2 = Double.NaN
    var dnm = Double.NaN
    val sbet12 = sbet2 * cbet1 - cbet2 * sbet1
    val cbet12 = cbet2 * cbet1 + sbet2 * sbet1
    val sbet12a = sbet2 * cbet1 + cbet2 * sbet1

    val shortline = cbet12 >= 0.0 && sbet12 < 0.5 && cbet2 * lam12 < 0.5
    var somg12 = 0.0
    var comg12 = 0.0
    if (shortline) {
      var sbetm2 = sq(sbet1 + sbet2)
      sbetm2 /= sbetm2 + sq(cbet1 + cbet2)
      dnm = Math.sqrt(1.0 + EP2 * sbetm2)
      val omg12 = lam12 / (F1 * dnm)
      somg12 = Math.sin(omg12)
      comg12 = Math.cos(omg12)
    } else {
      somg12 = slam12
      comg12 = clam12
    }

    var salp1 = cbet2 * somg12
    var calp1 =
      if (comg12 >= 0.0) sbet12 + cbet2 * sbet1 * sq(somg12) / (1.0 + comg12)
      else sbet12a - cbet2 * sbet1 * sq(somg12) / (1.0 - comg12)
    val ssig12 = Math.hypot(salp1, calp1)
    val csig12 = sbet1 * sbet2 + cbet1 * cbet2 * comg12

    if (shortline && ssig12 < ETol2) {
      salp2 = cbet1 * somg12
      calp2 = sbet12 - cbet1 * sbet2 *
        (if (comg12 >= 0.0) sq(somg12) / (1.0 + comg12) else 1.0 - comg12)
      val nn = norm2(salp2, calp2); salp2 = nn._1; calp2 = nn._2
      sig12 = Math.atan2(ssig12, csig12)
    } else if (Math.abs(N) > 0.1 || csig12 >= 0.0 || ssig12 >= 6.0 * Math.abs(N) * Math.PI * sq(cbet1)) {
      // nothing to do: default starting guess is fine
    } else {
      // scales for the astroid near-antipodal construction (f > 0 branch)
      val lam12x = Math.atan2(-slam12, -clam12)
      val k2 = sq(sbet1) * EP2
      val eps = k2 / (2.0 * (1.0 + Math.sqrt(1.0 + k2)) + k2)
      val lamscale = F * cbet1 * a3f(eps) * Math.PI
      val betscale = lamscale * cbet1
      val x = lam12x / lamscale
      val y = sbet12a / betscale
      if (y > -Tol1 && x > -1.0 - XThresh) {
        salp1 = Math.min(1.0, -x)
        calp1 = -Math.sqrt(1.0 - sq(salp1))
      } else {
        val k = astroid(x, y)
        val omg12a = lamscale * (-x * k / (1.0 + k))
        somg12 = Math.sin(omg12a)
        comg12 = -Math.cos(omg12a)
        salp1 = cbet2 * somg12
        calp1 = sbet12a - cbet2 * sbet1 * sq(somg12) / (1.0 - comg12)
      }
    }
    if (!(salp1 <= 0.0)) {
      val nn = norm2(salp1, calp1); salp1 = nn._1; calp1 = nn._2
    } else {
      salp1 = 1.0; calp1 = 0.0
    }
    (sig12, salp1, calp1, salp2, calp2, dnm)
  }

  private[kernels] final case class Lam12Result(lam12: Double, salp2: Double, calp2: Double,
      sig12: Double, ssig1: Double, csig1: Double, ssig2: Double, csig2: Double,
      eps: Double, dlam12: Double)

  /** λ12 given α1, with derivative dλ12/dα1 when diffp (Karney §4). */
  private[kernels] def lambda12(sbet1: Double, cbet1: Double, dn1: Double,
      sbet2: Double, cbet2: Double, dn2: Double,
      salp1In: Double, calp1In: Double,
      slam120: Double, clam120: Double, diffp: Boolean): Lam12Result = {
    var salp1 = salp1In
    var calp1 = calp1In
    if (sbet1 == 0.0 && calp1 == 0.0) calp1 = -Tiny

    val salp0 = salp1 * cbet1
    val calp0 = Math.hypot(calp1, salp1 * sbet1)

    var ssig1 = sbet1
    val somg1 = salp0 * sbet1
    var csig1 = calp1 * cbet1
    val comg1 = csig1
    val n1 = norm2(ssig1, csig1); ssig1 = n1._1; csig1 = n1._2

    val salp2 = if (cbet2 != cbet1) salp0 / cbet2 else salp1
    val calp2 =
      if (cbet2 != cbet1 || Math.abs(sbet2) != -sbet1)
        Math.sqrt(sq(calp1 * cbet1) +
          (if (cbet1 < -sbet1) (cbet2 - cbet1) * (cbet1 + cbet2)
           else (sbet1 - sbet2) * (sbet1 + sbet2))) / cbet2
      else Math.abs(calp1)

    var ssig2 = sbet2
    val somg2 = salp0 * sbet2
    var csig2 = calp2 * cbet2
    val comg2 = csig2
    val n2 = norm2(ssig2, csig2); ssig2 = n2._1; csig2 = n2._2

    val sig12 = Math.atan2(Math.max(0.0, csig1 * ssig2 - ssig1 * csig2),
      csig1 * csig2 + ssig1 * ssig2)
    val somg12 = Math.max(0.0, comg1 * somg2 - somg1 * comg2)
    val comg12 = comg1 * comg2 + somg1 * somg2
    val eta = Math.atan2(somg12 * clam120 - comg12 * slam120,
      comg12 * clam120 + somg12 * slam120)

    val k2 = sq(calp0) * EP2
    val eps = k2 / (2.0 * (1.0 + Math.sqrt(1.0 + k2)) + k2)
    val c3 = c3f(eps)
    val b312 = sinCosSeries(sinp = true, ssig2, csig2, c3) -
      sinCosSeries(sinp = true, ssig1, csig1, c3)
    val domg12 = -F * a3f(eps) * salp0 * (sig12 + b312)
    val lam12 = eta + domg12

    var dlam12 = Double.NaN
    if (diffp) {
      if (calp2 == 0.0) dlam12 = -2.0 * F1 * dn1 / sbet1
      else {
        val lr = lengths(eps, sig12, ssig1, csig1, dn1, ssig2, csig2, dn2, cbet1, cbet2)
        dlam12 = lr._2 * F1 / (calp2 * cbet2)
      }
    }
    Lam12Result(lam12, salp2, calp2, sig12, ssig1, csig1, ssig2, csig2, eps, dlam12)
  }
}
