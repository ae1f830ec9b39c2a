package graft.kernels

import graft.core.{FlatGeom, GeomKind}
import scala.collection.mutable.ArrayBuffer

/**
 * Linear-referencing pair ops over two (multi)linestrings:
 *
 * - [[sharedPaths]] — the PostGIS ST_SharedPaths contract: the
 *   collinear-overlap linework of the two inputs, split into the
 *   part where both lines run the SAME direction and the part where
 *   they run OPPOSITE directions, each merged into maximal chains.
 * - [[crossingDirection]] — the PostGIS ST_LineCrossingDirection
 *   code set over PROPER interior crossings (touch-only contacts do
 *   not count; the documented engine contract):
 *     0 no crossing; -1/1 single cross ending left/right;
 *     -2/2 multiple crossings, net left/right;
 *     -3/3 multiple crossings returning to the start side, first
 *     cross left/right.
 *   "Left" means line2's direction at the crossing points to the
 *   left of line1's segment direction (positive z of the cross
 *   product), i.e. line2 ENDS on line1's left.
 *
 * Split points and containment tests ride on the exact Shewchuk
 * orientation (kernels/Robust) — collinearity is decided exactly,
 * never by distance tolerance.
 */
object SharedPaths {

  private def segsOf(g: FlatGeom): Seq[Array[Double]] = {
    val out = ArrayBuffer.empty[Array[Double]]
    FlatGeom.foreachRing(g) { (s, e) =>
      var i = s
      while (i < e - 1) {
        val ax = g.x(i); val ay = g.y(i); val bx = g.x(i + 1); val by = g.y(i + 1)
        if (ax != bx || ay != by) out += Array(ax, ay, bx, by)
        i += 1
      }
    }
    out.toSeq
  }

  /** (sameDirection, oppositeDirection) shared linework as
    * MultiLineStrings (empty MultiLineString when none). Null-like
    * inputs (non-lines) yield None. */
  def sharedPaths(a: FlatGeom, b: FlatGeom): Option[(FlatGeom, FlatGeom)] = {
    def isLine(g: FlatGeom) =
      g.kind == GeomKind.LineString || g.kind == GeomKind.MultiLineString
    if (!isLine(a) || !isLine(b)) return None
    val segsA = segsOf(a)
    val segsB = segsOf(b)
    val same = ArrayBuffer.empty[Array[Double]]
    val opp = ArrayBuffer.empty[Array[Double]]
    for (sa <- segsA) {
      val Array(ax, ay, bx, by) = sa
      val dx = bx - ax; val dy = by - ay
      val len2 = dx * dx + dy * dy
      // parameter positions of collinear-overlap endpoints on sa
      var ts = List(0.0, 1.0)
      for (sb <- segsB) {
        val Array(cx, cy, ex, ey) = sb
        if (Robust.orient2d(ax, ay, bx, by, cx, cy) == 0 &&
          Robust.orient2d(ax, ay, bx, by, ex, ey) == 0) {
          val tc = ((cx - ax) * dx + (cy - ay) * dy) / len2
          val te = ((ex - ax) * dx + (ey - ay) * dy) / len2
          if (tc > 0.0 && tc < 1.0) ts ::= tc
          if (te > 0.0 && te < 1.0) ts ::= te
        }
      }
      val cuts = ts.distinct.sorted
      var i = 0
      while (i < cuts.length - 1) {
        val t0 = cuts(i); val t1 = cuts(i + 1)
        val mx = ax + dx * (t0 + t1) / 2.0
        val my = ay + dy * (t0 + t1) / 2.0
        // find a B segment collinearly containing the midpoint
        var dir = 0
        for (sb <- segsB if dir == 0) {
          val Array(cx, cy, ex, ey) = sb
          if (Robust.orient2d(cx, cy, ex, ey, mx, my) == 0 &&
            mx >= math.min(cx, ex) && mx <= math.max(cx, ex) &&
            my >= math.min(cy, ey) && my <= math.max(cy, ey)) {
            val dot = dx * (ex - cx) + dy * (ey - cy)
            dir = if (dot >= 0.0) 1 else -1
          }
        }
        if (dir != 0) {
          val piece = Array(ax + dx * t0, ay + dy * t0, ax + dx * t1, ay + dy * t1)
          if (dir > 0) same += piece else opp += piece
        }
        i += 1
      }
    }
    def merge(pieces: ArrayBuffer[Array[Double]]): FlatGeom =
      if (pieces.isEmpty)
        new FlatGeom(GeomKind.MultiLineString, Array.emptyDoubleArray,
          Array.emptyIntArray, Array.emptyIntArray)
      else {
        val m = Lines.lineMerge(FlatGeom.multiLineString(pieces.toSeq))
        // PostGIS always returns MULTILINESTRING members
        if (m.kind == GeomKind.LineString)
          new FlatGeom(GeomKind.MultiLineString, m.coords,
            if (m.coords.isEmpty) Array.emptyIntArray else Array(m.numPoints),
            Array.emptyIntArray)
        else m
      }
    Some((merge(same), merge(opp)))
  }

  /** PostGIS ST_LineCrossingDirection codes over proper crossings of
    * line2 through line1 (see object doc). Non-line input → MinValue
    * sentinel (SQL null). */
  def crossingDirection(l1: FlatGeom, l2: FlatGeom): Int = {
    if (l1.kind != GeomKind.LineString || l2.kind != GeomKind.LineString)
      return Int.MinValue
    // collect proper crossings in line2 order with their side sign
    case class Cross(seg2Idx: Int, t2: Double, left: Boolean)
    val segs1 = segsOf(l1)
    val segs2 = segsOf(l2)
    val crosses = ArrayBuffer.empty[Cross]
    var j = 0
    for (sb <- segs2) {
      val Array(cx, cy, ex, ey) = sb
      for (sa <- segs1) {
        val Array(ax, ay, bx, by) = sa
        if (SegIntersect.properlyCross(ax, ay, bx, by, cx, cy, ex, ey)) {
          // param of the crossing along sb (for ordering along line2)
          val d = (bx - ax) * (ey - cy) - (by - ay) * (ex - cx)
          val t2 = ((ax - cx) * (by - ay) - (ay - cy) * (bx - ax)) / -d
          val left = d > 0 // z of dir1 × dir2
          crosses += Cross(j, t2, left)
        }
      }
      j += 1
    }
    if (crosses.isEmpty) return 0
    val ordered = crosses.sortBy(c => (c.seg2Idx, c.t2))
    val nLeft = ordered.count(_.left)
    val nRight = ordered.length - nLeft
    if (ordered.length == 1) { if (ordered.head.left) -1 else 1 }
    else if (nLeft == nRight) { if (ordered.head.left) -3 else 3 }
    else if (nLeft > nRight) -2
    else 2
  }
}
