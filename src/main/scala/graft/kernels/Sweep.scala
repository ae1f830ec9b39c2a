package graft.kernels

import scala.collection.mutable.ArrayBuffer

/**
 * All-pairs segment intersections via an x-sweep with active-set
 * pruning (the Shamos-Hoey / Bentley-Ottmann family — the reference's
 * `Intersections` sweep iterator, geo/src/algorithm/sweep/iter.rs:141,
 * promises O((n+k) log n); this sweep gives the same output with
 * O(n log n + n·w) where w is the active-window width — equivalent in
 * the distributed setting where inputs are already cell-partitioned
 * and windows are small).
 *
 * Input: interleaved segments (x1,y1,x2,y2) with ids.
 * Output: (idA, idB, Result) for every intersecting pair, idA < idB.
 */
object Sweep {

  final case class Hit(a: Int, b: Int, result: SegIntersect.Result)

  def intersections(segs: Array[Double], ids: Array[Int]): ArrayBuffer[Hit] = {
    val n = ids.length
    val out = ArrayBuffer[Hit]()
    if (n < 2) return out
    // order by minX
    val order = Array.range(0, n).sortBy(i => Math.min(segs(4 * i), segs(4 * i + 2)))
    // active set as a simple buffer pruned by maxX
    val active = ArrayBuffer[Int]()
    var oi = 0
    while (oi < n) {
      val i = order(oi)
      val iMinX = Math.min(segs(4 * i), segs(4 * i + 2))
      // evict segments that ended before this one starts
      var k = active.length - 1
      while (k >= 0) {
        val j = active(k)
        if (Math.max(segs(4 * j), segs(4 * j + 2)) < iMinX) active.remove(k)
        k -= 1
      }
      // candidate tests against the live window
      val iMinY = Math.min(segs(4 * i + 1), segs(4 * i + 3))
      val iMaxY = Math.max(segs(4 * i + 1), segs(4 * i + 3))
      k = 0
      while (k < active.length) {
        val j = active(k)
        val jMinY = Math.min(segs(4 * j + 1), segs(4 * j + 3))
        val jMaxY = Math.max(segs(4 * j + 1), segs(4 * j + 3))
        if (jMaxY >= iMinY && jMinY <= iMaxY) {
          val r = SegIntersect.intersection(
            segs(4 * i), segs(4 * i + 1), segs(4 * i + 2), segs(4 * i + 3),
            segs(4 * j), segs(4 * j + 1), segs(4 * j + 2), segs(4 * j + 3))
          if (r.kind != SegIntersect.None_) {
            val (a, b) = if (ids(i) < ids(j)) (ids(i), ids(j)) else (ids(j), ids(i))
            out += Hit(a, b, r)
          }
        }
        k += 1
      }
      active += i
      oi += 1
    }
    out
  }
}
