package graft.kernels

import scala.collection.mutable.ArrayBuffer

/**
 * Convex hulls over interleaved coordinate arrays.
 *
 * `quickHull` is the default (matching ConvexHull's default algorithm,
 * geo/src/algorithm/convex_hull/mod.rs:42-59 → qhull.rs:19), including
 * its slice-mutation order so output ring order matches the reference.
 * `grahamHull` is the Graham-scan variant (graham.rs:20-80) with the
 * `includeOnHull` collinear-point switch.
 *
 * Both return a closed ring, CCW, as interleaved coords.
 */
object Hull {

  @inline private def lexLess(ax: Double, ay: Double, bx: Double, by: Double): Boolean =
    ax < bx || (ax == bx && ay < by)

  @inline private def swapPt(a: Array[Double], i: Int, j: Int): Unit = {
    if (i != j) {
      val tx = a(2 * i); val ty = a(2 * i + 1)
      a(2 * i) = a(2 * j); a(2 * i + 1) = a(2 * j + 1)
      a(2 * j) = tx; a(2 * j + 1) = ty
    }
  }

  @inline private def isCCW(ax: Double, ay: Double, bx: Double, by: Double, px: Double, py: Double): Boolean =
    Robust.orient2d(ax, ay, bx, by, px, py) == Robust.CounterClockwise

  /** In-place unstable partition of point range [lo, hi): afterwards
    * [lo, ret) satisfies pred (exact port of utils.rs:11-32). */
  private def partition(a: Array[Double], lo: Int, hi: Int)(pred: Int => Boolean): Int = {
    val len = hi - lo
    if (len == 0) return lo
    var l = 0
    var r = len - 1
    while (true) {
      while (l < len && pred(lo + l)) l += 1
      while (r > 0 && !pred(lo + r)) r -= 1
      if (l >= r) return lo + l
      swapPt(a, lo + l, lo + r)
    }
    lo // unreachable
  }

  private def closeRing(buf: ArrayBuffer[Double]): Array[Double] = {
    if (buf.length >= 2 && (buf(0) != buf(buf.length - 2) || buf(1) != buf(buf.length - 1))) {
      buf += buf(0)
      buf += buf(1)
    }
    buf.toArray
  }

  /** Hulls for <4 points (convex_hull/mod.rs:70-97). */
  private def trivialHull(pts: Array[Double], includeOnHull: Boolean): Array[Double] = {
    val n = pts.length / 2
    var ls: ArrayBuffer[Double] = ArrayBuffer(pts.toIndexedSeq: _*)
    if (!includeOnHull) {
      // lex sort
      val idx = (0 until n).sortWith((i, j) =>
        lexLess(pts(2 * i), pts(2 * i + 1), pts(2 * j), pts(2 * j + 1)))
      ls = ArrayBuffer[Double]()
      idx.foreach { i => ls += pts(2 * i); ls += pts(2 * i + 1) }
      if (ls.length / 2 == 3 &&
          Robust.orient2d(ls(0), ls(1), ls(2), ls(3), ls(4), ls(5)) == Robust.Collinear) {
        ls.remove(2, 2)
      }
    }
    if (ls.length == 2) { ls += ls(0); ls += ls(1) }
    val ring = closeRing(ls)
    // maintain CCW invariant
    if (Planar.ringWinding(ring, 0, ring.length / 2) == Planar.CW) reverseRing(ring) else ring
  }

  private def reverseRing(r: Array[Double]): Array[Double] = {
    val n = r.length / 2
    val out = new Array[Double](r.length)
    var i = 0
    while (i < n) { out(2 * i) = r(2 * (n - 1 - i)); out(2 * i + 1) = r(2 * (n - 1 - i) + 1); i += 1 }
    out
  }

  /** Quick hull (qhull.rs:19-106). Input: interleaved coords (not
    * mutated); output: closed CCW ring, collinear points excluded. */
  def quickHull(input: Array[Double]): Array[Double] = {
    val n = input.length / 2
    if (n == 0) return Array.emptyDoubleArray
    if (n < 4) return trivialHull(input, includeOnHull = false)
    val a = input.clone()

    // least_and_greatest_index (utils.rs:120-148): strict comparisons keep
    // the earliest extreme on ties.
    var minIdx = 0; var maxIdx = 0
    var i = 1
    while (i < n) {
      if (lexLess(a(2 * i), a(2 * i + 1), a(2 * minIdx), a(2 * minIdx + 1))) minIdx = i
      if (lexLess(a(2 * maxIdx), a(2 * maxIdx + 1), a(2 * i), a(2 * i + 1))) maxIdx = i
      i += 1
    }

    var lo = 0
    val hi = n
    swapPt(a, lo, lo + minIdx)
    val minX = a(2 * lo); val minY = a(2 * lo + 1)
    lo += 1
    var mIdx = maxIdx
    if (mIdx == 0) mIdx = minIdx
    mIdx = if (mIdx == 0) 0 else mIdx - 1
    swapPt(a, lo, lo + mIdx)
    val maxX = a(2 * lo); val maxY = a(2 * lo + 1)
    lo += 1

    val hull = new ArrayBuffer[Double](2 * n)

    var m = partition(a, lo, hi)(p => isCCW(maxX, maxY, minX, minY, a(2 * p), a(2 * p + 1)))
    hullSet(maxX, maxY, minX, minY, a, lo, m, hull)
    hull += maxX; hull += maxY
    m = partition(a, lo, hi)(p => isCCW(minX, minY, maxX, maxY, a(2 * p), a(2 * p + 1)))
    hullSet(minX, minY, maxX, maxY, a, lo, m, hull)
    hull += minX; hull += minY
    closeRing(hull)
  }

  /** qhull.rs:63-106 hull_set recursion, preserving mutation order. */
  private def hullSet(ax: Double, ay: Double, bx: Double, by: Double,
      a: Array[Double], lo0: Int, hi: Int, hull: ArrayBuffer[Double]): Unit = {
    var lo = lo0
    if (hi == lo) return
    if (hi - lo == 1) { hull += a(2 * lo); hull += a(2 * lo + 1); return }
    val porthX = ay - by
    val porthY = bx - ax
    // furthest by dot product; Rust Iterator::max_by keeps the LAST max
    var bestIdx = lo
    var best = porthX * (a(2 * lo) - ax) + porthY * (a(2 * lo + 1) - ay)
    var i = lo + 1
    while (i < hi) {
      val d = porthX * (a(2 * i) - ax) + porthY * (a(2 * i + 1) - ay)
      if (d >= best) { best = d; bestIdx = i }
      i += 1
    }
    swapPt(a, lo, bestIdx)
    val fx = a(2 * lo); val fy = a(2 * lo + 1)
    lo += 1
    var m = partition(a, lo, hi)(p => isCCW(fx, fy, bx, by, a(2 * p), a(2 * p + 1)))
    hullSet(fx, fy, bx, by, a, lo, m, hull)
    hull += fx; hull += fy
    m = partition(a, lo, hi)(p => isCCW(ax, ay, fx, fy, a(2 * p), a(2 * p + 1)))
    hullSet(ax, ay, fx, fy, a, lo, m, hull)
  }

  /** Graham scan (graham.rs:20-80). Output closed CCW ring; when
    * `includeOnHull`, collinear boundary points are kept. */
  def grahamHull(input: Array[Double], includeOnHull: Boolean): Array[Double] = {
    val n = input.length / 2
    if (n == 0) return Array.emptyDoubleArray
    if (n < 4) return trivialHull(input, includeOnHull)
    val a = input.clone()
    // least_index
    var minIdx = 0
    var i = 1
    while (i < n) {
      if (lexLess(a(2 * i), a(2 * i + 1), a(2 * minIdx), a(2 * minIdx + 1))) minIdx = i
      i += 1
    }
    swapPt(a, 0, minIdx)
    val hx = a(0); val hy = a(1)

    // sort remaining by angle around head; collinear → by squared distance
    val rest = (1 until n).toArray.map(j => (a(2 * j), a(2 * j + 1)))
    val sorted = rest.sortWith { case ((qx, qy), (rx, ry)) =>
      Robust.orient2d(qx, qy, hx, hy, rx, ry) match {
        case Robust.CounterClockwise => false // q > r
        case Robust.Clockwise => true // q < r
        case _ =>
          val d1 = (hx - qx) * (hx - qx) + (hy - qy) * (hy - qy)
          val d2 = (hx - rx) * (hx - rx) + (hy - ry) * (hy - ry)
          d1 < d2
      }
    }

    val out = new ArrayBuffer[Double](2 * n)
    out += hx; out += hy
    sorted.foreach { case (px, py) =>
      var break = false
      while (!break && out.length / 2 > 1) {
        val len = out.length / 2
        Robust.orient2d(out(2 * (len - 2)), out(2 * (len - 2) + 1),
          out(2 * (len - 1)), out(2 * (len - 1) + 1), px, py) match {
          case Robust.CounterClockwise => break = true
          case Robust.Clockwise => out.remove(out.length - 2, 2)
          case _ => if (includeOnHull) break = true else out.remove(out.length - 2, 2)
        }
      }
      val lastX = out(out.length - 2); val lastY = out(out.length - 1)
      if (includeOnHull || px != lastX || py != lastY) { out += px; out += py }
    }
    closeRing(out)
  }
}
