package graft.index

/**
 * Geohash codec (Niemeyer 2008, public algorithm): interleaved binary
 * subdivision of (lon, lat) — even bit positions split longitude, odd
 * split latitude — grouped 5 bits per base-32 character. The STRING
 * counterpart of the Morton [[CellId]] grid: prefix-comparable,
 * human-pasteable, and the interop format other systems expect.
 * Coordinates are clamped into [-180,180] × [-90,90] like `cellId`.
 */
object Geohash {

  val Alphabet = "0123456789bcdefghjkmnpqrstuvwxyz"
  final val MaxPrecision = 12 // 60 bits < 2^63

  def encode(lon: Double, lat: Double, precision: Int): String = {
    require(precision >= 1 && precision <= MaxPrecision,
      s"precision $precision out of [1,$MaxPrecision]")
    val x = Math.min(Math.max(lon, -180.0), 180.0)
    val y = Math.min(Math.max(lat, -90.0), 90.0)
    var lonLo = -180.0; var lonHi = 180.0
    var latLo = -90.0; var latHi = 90.0
    val out = new java.lang.StringBuilder(precision)
    var bitCount = 0
    var ch = 0
    var even = true // even interleave position -> longitude bit
    while (out.length < precision) {
      ch <<= 1
      if (even) {
        val mid = (lonLo + lonHi) / 2
        if (x >= mid) { ch |= 1; lonLo = mid } else lonHi = mid
      } else {
        val mid = (latLo + latHi) / 2
        if (y >= mid) { ch |= 1; latLo = mid } else latHi = mid
      }
      even = !even
      bitCount += 1
      if (bitCount == 5) { out.append(Alphabet.charAt(ch)); bitCount = 0; ch = 0 }
    }
    out.toString
  }

  /** Bounding box (minLon, minLat, maxLon, maxLat) of a geohash cell.
    * Throws on characters outside the base-32 alphabet. */
  def decodeBounds(hash: String): Array[Double] = {
    require(hash.nonEmpty && hash.length <= MaxPrecision, s"bad geohash '$hash'")
    var lonLo = -180.0; var lonHi = 180.0
    var latLo = -90.0; var latHi = 90.0
    var even = true
    var i = 0
    while (i < hash.length) {
      val v = Alphabet.indexOf(hash.charAt(i).toLower)
      require(v >= 0, s"invalid geohash char '${hash.charAt(i)}'")
      var b = 4
      while (b >= 0) {
        val bit = (v >> b) & 1
        if (even) {
          val mid = (lonLo + lonHi) / 2
          if (bit == 1) lonLo = mid else lonHi = mid
        } else {
          val mid = (latLo + latHi) / 2
          if (bit == 1) latLo = mid else latHi = mid
        }
        even = !even
        b -= 1
      }
      i += 1
    }
    Array(lonLo, latLo, lonHi, latHi)
  }

  /** Cell-centre decode: (lon, lat). */
  def decode(hash: String): (Double, Double) = {
    val b = decodeBounds(hash)
    ((b(0) + b(2)) / 2, (b(1) + b(3)) / 2)
  }

  /** The (up to 8) neighbouring cells at the same precision — the
    * expansion ring for geohash-keyed dwithin-style joins. Longitude
    * wraps across the antimeridian; rows beyond the poles drop (a
    * polar cell has 5 neighbours). Deterministic order, no duplicates. */
  def neighbors(hash: String): Array[String] = {
    val b = decodeBounds(hash)
    val lonW = b(2) - b(0)
    val latH = b(3) - b(1)
    val cLon = (b(0) + b(2)) / 2
    val cLat = (b(1) + b(3)) / 2
    val out = new scala.collection.mutable.LinkedHashSet[String]
    var dy = 1
    while (dy >= -1) {
      var dx = -1
      while (dx <= 1) {
        if (!(dx == 0 && dy == 0)) {
          val lat = cLat + dy * latH
          if (lat > -90.0 && lat < 90.0) {
            var lon = cLon + dx * lonW
            if (lon < -180.0) lon += 360.0 else if (lon >= 180.0) lon -= 360.0
            out += encode(lon, lat, hash.length)
          }
        }
        dx += 1
      }
      dy -= 1
    }
    out.toArray.filterNot(_ == hash)
  }
}
