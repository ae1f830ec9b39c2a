package graft.kernels

import graft.core.{FlatGeom, GeomKind}
import graft.index.STRtree
import scala.collection.mutable.ArrayBuffer

/**
 * Offset curve of a line (positive distance = left of travel), an
 * operator the reference lacks. Same architecture as JTS OffsetCurve:
 * the raw per-segment offset polyline (parallel segments bridged by
 * round fans at outside turns) self-intersects near concavities, so
 * instead of cleaning it directly, the curve is extracted from the
 * boundary of the buffer at |d| — the buffer's union machinery has
 * already resolved every self-intersection — keeping only boundary
 * segments that lie within a match tolerance of the raw polyline
 * (cap arcs and the far side never match), then re-chaining the kept
 * pieces into maximal arcs.
 */
object OffsetCurve {

  /** Match tolerance factor (JTS OffsetCurve.MATCH_DISTANCE_FACTOR). */
  private val MatchDistanceFactor = 10000.0

  def offsetCurve(g: FlatGeom, dist: Double, quadSegs: Int = Buffer.DefaultQuadSegs): FlatGeom = {
    val empty = FlatGeom.multiLineString(Nil)
    if (g == null || g.isEmpty || Relate.dimClass(g) != 1) return empty
    if (dist == 0.0) return g
    if (java.lang.Double.isNaN(dist) || java.lang.Double.isInfinite(dist)) return empty
    val out = new ArrayBuffer[Array[Double]]
    FlatGeom.foreachRing(g) { (s, e) =>
      val raw = rawOffset(g, s, e, dist, quadSegs)
      if (raw.length >= 4) {
        // buffer of just this path
        val pathCoords = new Array[Double](2 * (e - s))
        var i = s
        while (i < e) {
          pathCoords(2 * (i - s)) = g.x(i); pathCoords(2 * (i - s) + 1) = g.y(i)
          i += 1
        }
        val buf = Buffer.buffer(FlatGeom.lineString(pathCoords), Math.abs(dist), quadSegs)
        if (!buf.isEmpty) {
          val bnd = Topo.boundary(buf)
          val matchDist = Math.abs(dist) / MatchDistanceFactor
          // index the raw polyline; keep boundary segments whose mid
          // and endpoints all sit within matchDist of it
          val segs = rawSegTree(raw)
          FlatGeom.foreachRing(bnd) { (bs, be) =>
            var j = bs
            while (j < be - 1) {
              val ax = bnd.x(j); val ay = bnd.y(j)
              val bx = bnd.x(j + 1); val by = bnd.y(j + 1)
              val mx = (ax + bx) / 2; val my = (ay + by) / 2
              if (segs(ax, ay) <= matchDist && segs(bx, by) <= matchDist &&
                  segs(mx, my) <= matchDist)
                out += Array(ax, ay, bx, by)
              j += 1
            }
          }
        }
      }
    }
    if (out.isEmpty) return empty
    Lines.lineMerge(FlatGeom.multiLineString(out.toSeq.map(s =>
      Array(s(0), s(1), s(2), s(3)))))
  }

  /** Distance-to-raw-polyline closure backed by an STR-tree. */
  private def rawSegTree(raw: Array[Double]): (Double, Double) => Double = {
    val n = (raw.length >> 1) - 1
    val x1 = new Array[Double](n); val y1 = new Array[Double](n)
    val x2 = new Array[Double](n); val y2 = new Array[Double](n)
    var i = 0
    while (i < n) {
      x1(i) = raw(2 * i); y1(i) = raw(2 * i + 1)
      x2(i) = raw(2 * i + 2); y2(i) = raw(2 * i + 3)
      i += 1
    }
    val minX = new Array[Double](n); val minY = new Array[Double](n)
    val maxX = new Array[Double](n); val maxY = new Array[Double](n)
    i = 0
    while (i < n) {
      minX(i) = Math.min(x1(i), x2(i)); minY(i) = Math.min(y1(i), y2(i))
      maxX(i) = Math.max(x1(i), x2(i)); maxY(i) = Math.max(y1(i), y2(i))
      i += 1
    }
    val tree = STRtree.build(minX, minY, maxX, maxY)
    (px: Double, py: Double) => tree.nearestDist(px, py, Double.MaxValue, { k =>
      val dx = x2(k) - x1(k); val dy = y2(k) - y1(k)
      val l2 = dx * dx + dy * dy
      val t = if (l2 == 0) 0.0
        else Math.max(0.0, Math.min(1.0, ((px - x1(k)) * dx + (py - y1(k)) * dy) / l2))
      Math.hypot(px - (x1(k) + t * dx), py - (y1(k) + t * dy))
    })
  }

  /** Raw offset polyline of path [s,e) at signed distance d: parallel
    * segment offsets, bridged by inscribed fans on outside turns and
    * joined directly (the buffer will clean the overlap) on inside
    * turns. Uses the same one-sided simplification as the buffer so
    * the extracted boundary matches. */
  private def rawOffset(g: FlatGeom, s: Int, e: Int, d: Double, qs: Int): Array[Double] = {
    // collapse consecutive duplicates
    val raw = new ArrayBuffer[Double]
    var i = s
    while (i < e) {
      val x = g.x(i); val y = g.y(i)
      val n = raw.length
      if (n == 0 || raw(n - 2) != x || raw(n - 1) != y) { raw += x; raw += y }
      i += 1
    }
    var n = raw.length >> 1
    if (n < 2) return Array.emptyDoubleArray
    val tol = Math.abs(d) / Buffer.SimplifyFactor
    val orient = if (d > 0) Robust.CounterClockwise else Robust.Clockwise
    val pts = if (n > 3) Buffer.oneSidedSimplify(raw.toArray, n, tol, orient) else raw.toArray
    n = pts.length >> 1
    val side = if (d > 0) 1.0 else -1.0
    val ad = Math.abs(d)
    val out = new ArrayBuffer[Double]
    @inline def add(x: Double, y: Double): Unit = {
      val m = out.length
      if (m == 0 || out(m - 2) != x || out(m - 1) != y) { out += x; out += y }
    }
    var k = 0
    while (k < n - 1) {
      val ax = pts(2 * k); val ay = pts(2 * k + 1)
      val bx = pts(2 * k + 2); val by = pts(2 * k + 3)
      val len = Math.hypot(bx - ax, by - ay)
      if (len > 0) {
        val nx = side * -(by - ay) / len * ad; val ny = side * (bx - ax) / len * ad
        add(ax + nx, ay + ny); add(bx + nx, by + ny)
        // bridge to the next segment's offset with a fan on the gap side
        if (k + 2 < n) {
          val cx = pts(2 * k + 4); val cy = pts(2 * k + 5)
          val len2 = Math.hypot(cx - bx, cy - by)
          if (len2 > 0) {
            val u1x = (bx - ax) / len; val u1y = (by - ay) / len
            val u2x = (cx - bx) / len2; val u2y = (cy - by) / len2
            val cross = u1x * u2y - u1y * u2x
            val gapSide = if (cross < 0) 1.0 else -1.0
            if (gapSide == side && Math.abs(cross) > 1e-12) {
              // outside turn: inscribed arc around the vertex
              val n1x = side * -u1y; val n1y = side * u1x
              val n2x = side * -u2y; val n2y = side * u2x
              val total = Math.acos(Math.max(-1.0, Math.min(1.0, n1x * n2x + n1y * n2y)))
              val quantum = Math.PI / (2.0 * qs)
              val nSegs = Math.max(1, Math.round(total / quantum).toInt)
              val inc = total / nSegs
              val start = Math.atan2(n1y, n1x)
              var t = 1
              while (t <= nSegs) {
                val a = start - side * t * inc
                add(bx + ad * Math.cos(a), by + ad * Math.sin(a))
                t += 1
              }
            }
          }
        }
      }
      k += 1
    }
    out.toArray
  }
}
