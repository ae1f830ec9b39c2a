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
