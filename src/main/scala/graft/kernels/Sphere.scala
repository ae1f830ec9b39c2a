package graft.kernels

import graft.core.{FlatGeom, GeomKind}

/**
 * Spherical-earth kernels: Haversine distance / bearing / destination /
 * interpolation, rhumb-line navigation, Chamberlain-Duquette spherical
 * area, cross-track distance.
 *
 * Constants reproduced from the reference (geo/src/lib.rs:236-246) —
 * required bit-identical for fixture matching.
 */
object Sphere {

  /** IUGG mean earth radius, meters (geo/src/lib.rs:236). */
  final val MeanEarthRadius = 6371008.8
  /** WGS-84 equatorial radius (geo/src/lib.rs:240). */
  final val EquatorialEarthRadius = 6378137.0
  /** WGS-84 polar radius (geo/src/lib.rs:244). */
  final val PolarEarthRadius = 6356752.314245
  /** WGS-84 inverse flattening. */
  final val WGS84InvFlattening = 298.257223563

  @inline private def rad(d: Double): Double = Math.toRadians(d)
  @inline private def deg(r: Double): Double = Math.toDegrees(r)

  /** ((lon + 540) % 360) - 180 (geo/src/utils.rs:151-157). */
  @inline def normalizeLongitude(lon: Double): Double = ((lon + 540.0) % 360.0) - 180.0

  // -------------------------------------------------------- haversine

  /** Great-circle distance in meters, haversine formula with mean radius
    * (geo .../metric_spaces/haversine.rs:137-146). */
  def haversineDistance(lon1: Double, lat1: Double, lon2: Double, lat2: Double): Double = {
    val theta1 = rad(lat1)
    val theta2 = rad(lat2)
    val deltaTheta = rad(lat2 - lat1)
    val deltaLambda = rad(lon2 - lon1)
    val sdt = Math.sin(deltaTheta / 2.0)
    val sdl = Math.sin(deltaLambda / 2.0)
    val a = sdt * sdt + Math.cos(theta1) * Math.cos(theta2) * sdl * sdl
    val c = 2.0 * Math.asin(Math.sqrt(a))
    MeanEarthRadius * c
  }

  /** Initial great-circle bearing in degrees [0, 360)
    * (haversine.rs:47-59). North 0°, East 90°. */
  def haversineBearing(lon1: Double, lat1: Double, lon2: Double, lat2: Double): Double = {
    val lngA = rad(lon1); val latA = rad(lat1)
    val lngB = rad(lon2); val latB = rad(lat2)
    val deltaLng = lngB - lngA
    val s = Math.cos(latB) * Math.sin(deltaLng)
    val c = Math.cos(latA) * Math.sin(latB) - Math.sin(latA) * Math.cos(latB) * Math.cos(deltaLng)
    val degrees = deg(Math.atan2(s, c))
    (degrees + 360.0) % 360.0
  }

  /** Great-circle destination point (haversine.rs:88-104). Returns
    * (lon, lat) degrees, longitude normalized to [-180, 180). */
  def haversineDestination(lon: Double, lat: Double, bearingDeg: Double, meters: Double): Array[Double] = {
    val centerLng = rad(lon)
    val centerLat = rad(lat)
    val bearingRad = rad(bearingDeg)
    val r = meters / MeanEarthRadius
    val newLat = Math.asin(
      Math.sin(centerLat) * Math.cos(r) + Math.cos(centerLat) * Math.sin(r) * Math.cos(bearingRad))
    val newLng = Math.atan2(
      Math.sin(bearingRad) * Math.sin(r) * Math.cos(centerLat),
      Math.cos(r) - Math.sin(centerLat) * Math.sin(newLat)) + centerLng
    Array(normalizeLongitude(deg(newLng)), deg(newLat))
  }

  /** Point at `ratio` of the great-circle between two points
    * (haversine.rs:202-231: bearing+destination when ratio in (0,1)). */
  def haversinePointAtRatio(lon1: Double, lat1: Double, lon2: Double, lat2: Double, ratio: Double): Array[Double] = {
    if ((lon1 == lon2 && lat1 == lat2) || ratio == 0.0) return Array(lon1, lat1)
    if (ratio == 1.0) return Array(lon2, lat2)
    val d = haversineDistance(lon1, lat1, lon2, lat2)
    val b = haversineBearing(lon1, lat1, lon2, lat2)
    haversineDestination(lon1, lat1, b, d * ratio)
  }

  /** Haversine length of the line components of a geometry
    * (length.rs:24 with Haversine metric). */
  def haversineLength(g: FlatGeom): Double = {
    var sum = 0.0
    FlatGeom.foreachRing(g) { (s, e) =>
      var i = s
      while (i < e - 1) {
        sum += haversineDistance(g.x(i), g.y(i), g.x(i + 1), g.y(i + 1))
        i += 1
      }
    }
    sum
  }

  // ------------------------------------------------------------ rhumb

  /** Loxodrome (rhumb line) distance in meters
    * (geo .../metric_spaces/rhumb.rs + rhumb/mod.rs RhumbCalculations). */
  def rhumbDistance(lon1: Double, lat1: Double, lon2: Double, lat2: Double): Double =
    rhumbDelta(lon1, lat1, lon2, lat2) * MeanEarthRadius

  private def rhumbDeltaLambda(lon1: Double, lon2: Double): Double = {
    var dl = rad(lon2 - lon1)
    if (dl > Math.PI) dl -= 2.0 * Math.PI
    if (dl < -Math.PI) dl += 2.0 * Math.PI
    dl
  }

  private def rhumbDeltaPsi(phi1: Double, phi2: Double): Double =
    Math.log(Math.tan(phi2 / 2.0 + Math.PI / 4.0) / Math.tan(phi1 / 2.0 + Math.PI / 4.0))

  private def rhumbDelta(lon1: Double, lat1: Double, lon2: Double, lat2: Double): Double = {
    val phi1 = rad(lat1); val phi2 = rad(lat2)
    val deltaLambda = rhumbDeltaLambda(lon1, lon2)
    val deltaPhi = phi2 - phi1
    val deltaPsi = rhumbDeltaPsi(phi1, phi2)
    val threshold = 10.0e-12
    val q = if (deltaPsi > threshold) deltaPhi / deltaPsi else Math.cos(phi1)
    Math.sqrt(deltaPhi * deltaPhi + q * q * deltaLambda * deltaLambda)
  }

  /** Rhumb bearing, degrees [0, 360) (rhumb.rs:48-55). */
  def rhumbBearing(lon1: Double, lat1: Double, lon2: Double, lat2: Double): Double = {
    val phi1 = rad(lat1); val phi2 = rad(lat2)
    val deltaLambda = rhumbDeltaLambda(lon1, lon2)
    val deltaPsi = rhumbDeltaPsi(phi1, phi2)
    val theta = Math.atan2(deltaLambda, deltaPsi)
    (deg(theta) + 360.0) % 360.0
  }

  /** Rhumb destination (rhumb/mod.rs calculate_destination). */
  def rhumbDestination(lon: Double, lat: Double, bearingDeg: Double, meters: Double): Array[Double] = {
    val delta = meters / MeanEarthRadius
    val lambda1 = rad(lon)
    val phi1 = rad(lat)
    val theta = rad(bearingDeg)
    calculateRhumbDestination(delta, lambda1, phi1, theta)
  }

  private def calculateRhumbDestination(delta: Double, lambda1: Double, phi1: Double, theta: Double): Array[Double] = {
    val threshold = 10.0e-12
    val deltaPhi = delta * Math.cos(theta)
    var phi2 = phi1 + deltaPhi
    // beyond-the-pole normalization
    if (Math.abs(phi2) > Math.PI / 2.0)
      phi2 = if (phi2 > 0.0) Math.PI - phi2 else -Math.PI - phi2
    val deltaPsi = rhumbDeltaPsi(phi1, phi2)
    val q = if (Math.abs(deltaPsi) > threshold) deltaPhi / deltaPsi else Math.cos(phi1)
    val deltaLambda = (delta * Math.sin(theta)) / q
    val lambda2 = lambda1 + deltaLambda
    Array(normalizeLongitude(deg(lambda2)), deg(phi2))
  }

  /** (theta, delta) of a loxodrome leg — the hoisted per-segment solve
    * for densify. Bit-identical to the rhumbPointAtRatio composition:
    * rhumbDestinationRad(lon1, lat1, theta, ratio * delta) equals
    * rhumbPointAtRatio(lon1, lat1, lon2, lat2, ratio). */
  def rhumbThetaDelta(lon1: Double, lat1: Double, lon2: Double, lat2: Double): Array[Double] = {
    val phi1 = rad(lat1); val phi2 = rad(lat2)
    val deltaLambda = rhumbDeltaLambda(lon1, lon2)
    val deltaPhi = phi2 - phi1
    val deltaPsi = rhumbDeltaPsi(phi1, phi2)
    val theta = Math.atan2(deltaLambda, deltaPsi)
    val threshold = 10.0e-12
    val q = if (deltaPsi > threshold) deltaPhi / deltaPsi else Math.cos(phi1)
    Array(theta, Math.sqrt(deltaPhi * deltaPhi + q * q * deltaLambda * deltaLambda))
  }

  /** Destination on the loxodrome from a degree point, radian-space
    * bearing/arc (the reuse surface for rhumbThetaDelta). */
  def rhumbDestinationRad(lon: Double, lat: Double, theta: Double, delta: Double): Array[Double] =
    calculateRhumbDestination(delta, rad(lon), rad(lat), theta)

  /** Point at ratio along the rhumb line (rhumb/mod.rs intermediate). */
  def rhumbPointAtRatio(lon1: Double, lat1: Double, lon2: Double, lat2: Double, ratio: Double): Array[Double] = {
    val phi1 = rad(lat1)
    val deltaLambda = rhumbDeltaLambda(lon1, lon2)
    val deltaPsi = rhumbDeltaPsi(phi1, rad(lat2))
    val theta = Math.atan2(deltaLambda, deltaPsi)
    val delta = ratio * rhumbDelta(lon1, lat1, lon2, lat2)
    calculateRhumbDestination(delta, rad(lon1), phi1, theta)
  }

  def rhumbLength(g: FlatGeom): Double = {
    var sum = 0.0
    FlatGeom.foreachRing(g) { (s, e) =>
      var i = s
      while (i < e - 1) {
        sum += rhumbDistance(g.x(i), g.y(i), g.x(i + 1), g.y(i + 1))
        i += 1
      }
    }
    sum
  }

  // ------------------------------------------- spherical (C&D 2007) area

  /** Chamberlain & Duquette 2007 approximate spherical ring area, m²
    * (geo/src/algorithm/chamberlain_duquette_area.rs:73-103). */
  def cdRingArea(cs: Array[Double], start: Int, end: Int): Double = {
    val n = end - start
    var total = 0.0
    if (n > 2) {
      var i = 0
      while (i < n) {
        val (lo, mid, hi) =
          if (i == n - 2) (n - 2, n - 1, 0)
          else if (i == n - 1) (n - 1, 0, 1)
          else (i, i + 1, i + 2)
        val p1x = cs(2 * (start + lo))
        val p2y = cs(2 * (start + mid) + 1)
        val p3x = cs(2 * (start + hi))
        total += (rad(p3x) - rad(p1x)) * Math.sin(rad(p2y))
        i += 1
      }
      total = total * EquatorialEarthRadius * EquatorialEarthRadius / -2.0
    }
    total
  }

  /** Signed C&D area of a geometry: polygons = exterior + holes
    * (chamberlain_duquette_area.rs Polygon impl: ext plus Σ interiors). */
  def cdSignedArea(g: FlatGeom): Double = g.kind match {
    case GeomKind.Polygon | GeomKind.MultiPolygon =>
      var sum = 0.0
      FlatGeom.foreachRing(g) { (s, e) => sum += cdRingArea(g.coords, s, e) }
      sum
    case _ => 0.0
  }

  def cdUnsignedArea(g: FlatGeom): Double = g.kind match {
    case GeomKind.Polygon => Math.abs(cdSignedArea(g))
    case GeomKind.MultiPolygon =>
      var sum = 0.0
      var p = 0
      while (p < g.parts.length) {
        var part = 0.0
        var r = g.partStart(p)
        while (r < g.partEnd(p)) { part += cdRingArea(g.coords, g.ringStart(r), g.ringEnd(r)); r += 1 }
        sum += Math.abs(part)
        p += 1
      }
      sum
    case _ => 0.0
  }

  // ------------------------------------------------------- cross-track

  /** Distance of point from the great circle through (a, b), meters
    * (geo/src/algorithm/cross_track_distance.rs:40-51). */
  def crossTrackDistance(px: Double, py: Double,
      ax: Double, ay: Double, bx: Double, by: Double): Double = {
    val d13 = haversineDistance(ax, ay, px, py) / MeanEarthRadius
    val theta13 = rad(haversineBearing(ax, ay, px, py))
    val theta12 = rad(haversineBearing(ax, ay, bx, by))
    val dxt = Math.asin(Math.sin(d13) * Math.sin(theta12 - theta13))
    MeanEarthRadius * Math.abs(dxt)
  }
}
