package graft.kernels

import graft.core.{FlatGeom, GeomKind}

/**
 * ST_GeneratePoints parity: n uniform random points inside a polygon,
 * fully deterministic from an explicit seed. Instead of PostGIS's
 * bbox rejection loop (unbounded worst case on sliver polygons), the
 * polygon triangulates once (the engine's earcut) and each point
 * samples a triangle by area then a uniform position via the
 * square-root warp — exactly n draws, O(n + tris) always.
 *
 * PRNG: SplitMix64 (Vigna, public domain) in counter mode —
 * out(i) = mix(seed + i·GOLDEN) — so draw i is a pure function of
 * (seed, i): no sequential state, identical at any parallelism.
 */
object RandomPoints {

  private final val Golden = 0x9E3779B97F4A7C15L

  /** SplitMix64 finalizer. */
  private def mix(z0: Long): Long = {
    var z = z0
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Uniform double in [0, 1) from draw counter `i`. */
  private def u01(seed: Long, i: Long): Double =
    (mix(seed + i * Golden) >>> 11) * (1.0 / (1L << 53))

  /** Cap: a typed null beats an OOM on a pathological request. */
  final val MaxPoints = 1 << 20

  /** n uniform points in a (multi)polygon as a MULTIPOINT; null for
    * non-areal operands, n <= 0, n > [[MaxPoints]], or empty input. */
  def generatePoints(g: FlatGeom, n: Int, seed: Long): FlatGeom = {
    if (g == null || g.isEmpty || n <= 0 || n > MaxPoints) return null
    if (g.kind != GeomKind.Polygon && g.kind != GeomKind.MultiPolygon) return null
    val tris = Shapes.earcut(g)
    if (tris == null || tris.isEmpty) return null
    // cumulative triangle areas (deterministic left-to-right order)
    val cum = new Array[Double](tris.length)
    var total = 0.0
    var t = 0
    while (t < tris.length) {
      val c = tris(t)
      val a2 = math.abs((c(2) - c(0)) * (c(5) - c(1)) - (c(4) - c(0)) * (c(3) - c(1)))
      total += a2 * 0.5
      cum(t) = total
      t += 1
    }
    if (total <= 0.0) return null
    val out = new Array[Double](2 * n)
    var i = 0
    while (i < n) {
      val pick = u01(seed, 3L * i) * total
      // first triangle with cum >= pick (binary search)
      var lo = 0; var hi = tris.length - 1
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (cum(mid) >= pick) hi = mid else lo = mid + 1
      }
      val c = tris(lo)
      // uniform in triangle: P = (1-sqrt(r1))·A + sqrt(r1)(1-r2)·B + sqrt(r1)r2·C
      val s = math.sqrt(u01(seed, 3L * i + 1))
      val r = u01(seed, 3L * i + 2)
      val a = 1.0 - s
      val b = s * (1.0 - r)
      val cc = s * r
      out(2 * i) = a * c(0) + b * c(2) + cc * c(4)
      out(2 * i + 1) = a * c(1) + b * c(3) + cc * c(5)
      i += 1
    }
    FlatGeom.multiPoint(out) // PostGIS contract: always a MULTIPOINT
  }
}
