package graft.kernels

/**
 * Vincenty inverse distance (Vincenty 1975, "Direct and inverse
 * solutions of geodesics on the ellipsoid") — the reference exposes it
 * alongside Karney (geo/src/algorithm/vincenty_distance.rs:14).
 * Returns NaN when the iteration fails to converge (the reference
 * returns Err; NaN maps to SQL NULL).
 */
object Vincenty {

  private final val A = Sphere.EquatorialEarthRadius
  private final val B = Sphere.PolarEarthRadius
  private final val F = 1.0 / 298.257223563

  def distance(lon1: Double, lat1: Double, lon2: Double, lat2: Double): Double = {
    val L = Math.toRadians(lon2 - lon1)
    val u1 = Math.atan((1.0 - F) * Math.tan(Math.toRadians(lat1)))
    val u2 = Math.atan((1.0 - F) * Math.tan(Math.toRadians(lat2)))
    val sinU1 = Math.sin(u1); val cosU1 = Math.cos(u1)
    val sinU2 = Math.sin(u2); val cosU2 = Math.cos(u2)

    var lambda = L
    var lambdaP = 0.0
    var iterLimit = 100
    var cosSqAlpha = 0.0
    var sinSigma = 0.0
    var cosSigma = 0.0
    var cos2SigmaM = 0.0
    var sigma = 0.0
    var converged = false
    while (iterLimit > 0 && !converged) {
      val sinLambda = Math.sin(lambda)
      val cosLambda = Math.cos(lambda)
      sinSigma = Math.sqrt(
        (cosU2 * sinLambda) * (cosU2 * sinLambda) +
          (cosU1 * sinU2 - sinU1 * cosU2 * cosLambda) * (cosU1 * sinU2 - sinU1 * cosU2 * cosLambda))
      if (sinSigma == 0.0) return 0.0 // coincident points
      cosSigma = sinU1 * sinU2 + cosU1 * cosU2 * cosLambda
      sigma = Math.atan2(sinSigma, cosSigma)
      val sinAlpha = cosU1 * cosU2 * sinLambda / sinSigma
      cosSqAlpha = 1.0 - sinAlpha * sinAlpha
      cos2SigmaM = if (cosSqAlpha == 0.0) 0.0 else cosSigma - 2.0 * sinU1 * sinU2 / cosSqAlpha
      val c = F / 16.0 * cosSqAlpha * (4.0 + F * (4.0 - 3.0 * cosSqAlpha))
      lambdaP = lambda
      lambda = L + (1.0 - c) * F * sinAlpha *
        (sigma + c * sinSigma * (cos2SigmaM + c * cosSigma * (-1.0 + 2.0 * cos2SigmaM * cos2SigmaM)))
      if (Math.abs(lambda - lambdaP) <= 1e-12) converged = true
      iterLimit -= 1
    }
    if (!converged) return Double.NaN // antipodal non-convergence

    val uSq = cosSqAlpha * (A * A - B * B) / (B * B)
    val bigA = 1.0 + uSq / 16384.0 * (4096.0 + uSq * (-768.0 + uSq * (320.0 - 175.0 * uSq)))
    val bigB = uSq / 1024.0 * (256.0 + uSq * (-128.0 + uSq * (74.0 - 47.0 * uSq)))
    val deltaSigma = bigB * sinSigma * (cos2SigmaM + bigB / 4.0 *
      (cosSigma * (-1.0 + 2.0 * cos2SigmaM * cos2SigmaM) -
        bigB / 6.0 * cos2SigmaM * (-3.0 + 4.0 * sinSigma * sinSigma) *
          (-3.0 + 4.0 * cos2SigmaM * cos2SigmaM)))
    B * bigA * (sigma - deltaSigma)
  }
}
