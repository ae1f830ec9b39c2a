package graft.kernels

import graft.core.{FlatGeom, GeomKind}
import scala.collection.mutable.{ArrayBuffer, LinkedHashMap}

/**
 * Linework utilities the reference lacks: line merging (JTS
 * LineMerger semantics — join linestrings end-to-end through nodes
 * where exactly two line-ends meet, never through junctions) and full
 * noding (split all segments at their crossings and collinear-overlap
 * endpoints, dissolve duplicates, and return the maximal arcs between
 * junctions). Both are deterministic: chains start from junction/
 * terminal nodes in first-appearance order and preserve the first
 * member's direction.
 */
object Lines {

  private val emptyMls = FlatGeom.multiLineString(Nil)

  /** JTS LineMerger: maximal linestrings formed by joining input
    * lines at endpoints of degree exactly 2. Non-1-D input → empty. */
  def lineMerge(g: FlatGeom): FlatGeom = {
    if (g == null || g.isEmpty || Relate.dimClass(g) != 1) return emptyMls
    val lines = new ArrayBuffer[Array[Double]]
    FlatGeom.foreachRing(g) { (s, e) =>
      if (e - s >= 2) {
        val arr = new Array[Double](2 * (e - s))
        var i = s
        while (i < e) { arr(2 * (i - s)) = g.x(i); arr(2 * (i - s) + 1) = g.y(i); i += 1 }
        lines += arr
      }
    }
    mergeChains(lines)
  }

  /** Fully node linework: every segment split at crossings and
    * collinear overlaps, duplicates dissolved, pieces re-chained into
    * maximal arcs between junctions. Areal input contributes its
    * boundary; points are ignored. */
  def node(g: FlatGeom): FlatGeom = {
    if (g == null || g.isEmpty) return emptyMls
    val src = if (Relate.dimClass(g) == 2) Topo.boundary(g) else g
    val segs = new ArrayBuffer[Array[Double]]
    FlatGeom.foreachRing(src) { (s, e) =>
      var i = s
      while (i < e - 1) {
        if (src.x(i) != src.x(i + 1) || src.y(i) != src.y(i + 1))
          segs += Array(src.x(i), src.y(i), src.x(i + 1), src.y(i + 1))
        i += 1
      }
    }
    if (segs.isEmpty) return emptyMls
    val noded = UnaryUnion.nodeSegments(segs, new ArrayBuffer[Array[Double]], None)
    mergeChains(ArrayBuffer.from(noded.map(s => Array(s(0), s(1), s(2), s(3)))))
  }

  /** Substring of a LineString between length fractions t0 <= t1 (the
    * PostGIS ST_LineSubstring contract): endpoints interpolated,
    * interior vertices preserved. t0 == t1 yields a zero-length
    * two-coordinate line at the interpolated point (PostGIS returns a
    * POINT there; a degenerate line keeps the return type stable).
    * Null for non-LineStrings or out-of-range fractions. */
  def lineSubstring(g: FlatGeom, t0: Double, t1: Double): FlatGeom = {
    if (g == null || g.isEmpty || Relate.dimClass(g) != 1 ||
        g.kind != graft.core.GeomKind.LineString) return null
    if (!(t0 >= 0.0) || !(t1 <= 1.0) || !(t0 <= t1)) return null
    val n = g.numPoints
    var total = 0.0
    var i = 0
    while (i < n - 1) { total += Math.hypot(g.x(i + 1) - g.x(i), g.y(i + 1) - g.y(i)); i += 1 }
    if (total == 0.0) return FlatGeom.lineString(Array(g.x(0), g.y(0), g.x(0), g.y(0)))
    val d0 = t0 * total; val d1 = t1 * total
    val out = new ArrayBuffer[Double]
    @inline def add(x: Double, y: Double): Unit = {
      val m = out.length
      if (m == 0 || out(m - 2) != x || out(m - 1) != y) { out += x; out += y }
    }
    var acc = 0.0
    i = 0
    while (i < n - 1) {
      val ax = g.x(i); val ay = g.y(i); val bx = g.x(i + 1); val by = g.y(i + 1)
      val seg = Math.hypot(bx - ax, by - ay)
      if (seg > 0) {
        val sEnd = acc + seg
        if (sEnd >= d0 && acc <= d1) {
          val f0 = Math.max(0.0, (d0 - acc) / seg)
          val f1 = Math.min(1.0, (d1 - acc) / seg)
          add(ax + f0 * (bx - ax), ay + f0 * (by - ay))
          add(ax + f1 * (bx - ax), ay + f1 * (by - ay))
        }
        acc = sEnd
      }
      i += 1
    }
    if (out.length < 4) {
      // zero-length request: degenerate line at the interpolated point
      if (out.length == 2) { out += out(0); out += out(1) }
      else return null
    }
    FlatGeom.lineString(out.toArray)
  }

  /** Reverse every ring/line's coordinate order (structure kept). */
  def reverse(g: FlatGeom): FlatGeom = {
    if (g == null || g.isEmpty) return g
    if (g.rings.isEmpty) return g // point kinds: order is identity
    val coords = new Array[Double](g.coords.length)
    FlatGeom.foreachRing(g) { (s, e) =>
      var i = 0
      val m = e - s
      while (i < m) {
        coords(2 * (s + i)) = g.x(e - 1 - i)
        coords(2 * (s + i) + 1) = g.y(e - 1 - i)
        i += 1
      }
    }
    new FlatGeom(g.kind, coords, g.rings, g.parts)
  }

  /** Chain `lines` through degree-2 endpoints. */
  private def mergeChains(lines: ArrayBuffer[Array[Double]]): FlatGeom = {
    if (lines.isEmpty) return emptyMls
    final case class End(line: Int, atStart: Boolean)
    val incident = LinkedHashMap[(Double, Double), ArrayBuffer[End]]()
    @inline def startOf(l: Array[Double]) = (l(0), l(1))
    @inline def endOf(l: Array[Double]) = (l(l.length - 2), l(l.length - 1))
    lines.zipWithIndex.foreach { case (l, i) =>
      incident.getOrElseUpdate(startOf(l), new ArrayBuffer) += End(i, atStart = true)
      incident.getOrElseUpdate(endOf(l), new ArrayBuffer) += End(i, atStart = false)
    }
    val used = new Array[Boolean](lines.length)
    val out = new ArrayBuffer[Array[Double]]

    /** Append line `i` to `buf`, oriented to start from `from`. */
    def append(buf: ArrayBuffer[Double], i: Int, fromStart: Boolean): (Double, Double) = {
      val l = lines(i)
      val n = l.length >> 1
      if (fromStart) {
        var k = if (buf.isEmpty) 0 else 1
        while (k < n) { buf += l(2 * k); buf += l(2 * k + 1); k += 1 }
        endOf(l)
      } else {
        var k = if (buf.isEmpty) n - 1 else n - 2
        while (k >= 0) { buf += l(2 * k); buf += l(2 * k + 1); k -= 1 }
        startOf(l)
      }
    }

    def walk(seed: Int, seedFromStart: Boolean): Unit = {
      val buf = new ArrayBuffer[Double]
      if (buf.isEmpty) {
        val l = lines(seed)
        val (sx, sy) = if (seedFromStart) startOf(l) else endOf(l)
        buf += sx; buf += sy
      }
      var cur = seed
      var fromStart = seedFromStart
      var cont = true
      while (cont) {
        used(cur) = true
        val tip = append(buf, cur, fromStart)
        val ends = incident(tip)
        if (ends.length == 2) {
          val nxt = ends.find(e => !used(e.line))
          nxt match {
            case Some(e) => cur = e.line; fromStart = e.atStart
            case None => cont = false
          }
        } else cont = false
      }
      out += buf.toArray
    }

    // 1. chains anchored at terminals/junctions (degree != 2), in
    // first-appearance order, preserving the anchor line's direction
    lines.indices.foreach { i =>
      if (!used(i)) {
        val degS = incident(startOf(lines(i))).length
        val degE = incident(endOf(lines(i))).length
        if (degS != 2) walk(i, seedFromStart = true)
        else if (degE != 2) walk(i, seedFromStart = false)
      }
    }
    // 2. leftover pure loops (every node degree 2)
    lines.indices.foreach { i => if (!used(i)) walk(i, seedFromStart = true) }
    if (out.length == 1) FlatGeom.lineString(out(0))
    else FlatGeom.multiLineString(out.toSeq)
  }
}
