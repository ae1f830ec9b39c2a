package graft.kernels

import graft.core.{FlatGeom, GeomKind}

/**
 * Canonical (normalized) geometry form with JTS `Geometry.normalize()`
 * semantics — the missing piece behind the corpus's `equalsNorm`
 * cases (the reference's derived `PartialEq` is structural only, so
 * its runner never executes them):
 *
 *  - LineString: traversal direction flips when the reversed
 *    coordinate sequence is lexicographically smaller (first
 *    differing end-pair decides, exactly JTS's `normalize()`);
 *  - Polygon rings: scrolled to start at the minimum coordinate,
 *    exterior CLOCKWISE, holes COUNTER-clockwise (JTS
 *    `Polygon.normalize`), holes sorted;
 *  - Multi-part geometries: every part normalizes, then parts sort
 *    lexicographically (polygons by their shells).
 *
 * normalize(a) == normalize(b) (structural equality) is then JTS's
 * `equalsNorm`. Normalization is idempotent.
 */
object Normalize {

  private def cmpPt(x1: Double, y1: Double, x2: Double, y2: Double): Int = {
    val cx = java.lang.Double.compare(x1, x2)
    if (cx != 0) cx else java.lang.Double.compare(y1, y2)
  }

  /** Lexicographic compare of interleaved coordinate arrays (pairwise
    * points; a strict prefix is smaller). */
  private def cmpSeq(a: Array[Double], b: Array[Double]): Int = {
    val na = a.length >> 1; val nb = b.length >> 1
    var i = 0
    while (i < na && i < nb) {
      val c = cmpPt(a(2 * i), a(2 * i + 1), b(2 * i), b(2 * i + 1))
      if (c != 0) return c
      i += 1
    }
    java.lang.Integer.compare(na, nb)
  }

  private def reversed(cs: Array[Double]): Array[Double] = {
    val n = cs.length >> 1
    val out = new Array[Double](cs.length)
    var i = 0
    while (i < n) {
      out(2 * i) = cs(2 * (n - 1 - i))
      out(2 * i + 1) = cs(2 * (n - 1 - i) + 1)
      i += 1
    }
    out
  }

  /** JTS LineString.normalize: reverse iff, at the first index where
    * the sequence differs from its mirror, forward > backward. */
  def lineCanonical(cs: Array[Double]): Array[Double] = {
    val n = cs.length >> 1
    var i = 0
    while (i < n / 2) {
      val j = n - 1 - i
      val c = cmpPt(cs(2 * i), cs(2 * i + 1), cs(2 * j), cs(2 * j + 1))
      if (c != 0) return if (c > 0) reversed(cs) else cs
      i += 1
    }
    cs
  }

  /** Closed-ring canonical form: scroll to the minimum coordinate
    * (over the distinct points), then enforce orientation
    * (clockwise = true for shells, false for holes — JTS
    * `Polygon.normalize`'s convention). Input must be closed;
    * output is closed and starts at the minimum coordinate. */
  def ringCanonical(ring: Array[Double], clockwise: Boolean): Array[Double] = {
    val n = (ring.length >> 1) - 1 // distinct points
    if (n < 1) return ring
    var mi = 0
    var i = 1
    while (i < n) {
      if (cmpPt(ring(2 * i), ring(2 * i + 1), ring(2 * mi), ring(2 * mi + 1)) < 0) mi = i
      i += 1
    }
    val scrolled = new Array[Double](ring.length)
    i = 0
    while (i < n) {
      val src = (mi + i) % n
      scrolled(2 * i) = ring(2 * src)
      scrolled(2 * i + 1) = ring(2 * src + 1)
      i += 1
    }
    scrolled(2 * n) = scrolled(0)
    scrolled(2 * n + 1) = scrolled(1)
    // shoelace: positive = CCW
    var area2 = 0.0
    i = 0
    while (i < n) {
      area2 += scrolled(2 * i) * scrolled(2 * i + 3) -
        scrolled(2 * i + 2) * scrolled(2 * i + 1)
      i += 1
    }
    val isCcw = area2 > 0.0
    if (isCcw == clockwise) reversed(scrolled) else scrolled
  }

  private def ringsOf(g: FlatGeom, rStart: Int, rEnd: Int): IndexedSeq[Array[Double]] =
    (rStart until rEnd).map { r =>
      java.util.Arrays.copyOfRange(g.coords, g.ringStart(r) * 2, g.ringEnd(r) * 2)
    }

  private def polygonCanonical(rings: IndexedSeq[Array[Double]]): (Array[Double], Seq[Array[Double]]) = {
    val shell = ringCanonical(rings.head, clockwise = true)
    val holes = rings.tail.map(h => ringCanonical(h, clockwise = false))
      .sortWith((a, b) => cmpSeq(a, b) < 0)
    (shell, holes)
  }

  def normalize(g: FlatGeom): FlatGeom = {
    if (g.isEmpty) return g
    g.kind match {
      case GeomKind.Point => g
      case GeomKind.MultiPoint =>
        val n = g.numPoints
        val pts = (0 until n).map(i => (g.x(i), g.y(i)))
          .sortWith((a, b) => cmpPt(a._1, a._2, b._1, b._2) < 0)
        val out = new Array[Double](2 * n)
        pts.zipWithIndex.foreach { case ((x, y), i) => out(2 * i) = x; out(2 * i + 1) = y }
        FlatGeom.multiPoint(out)
      case GeomKind.LineString =>
        FlatGeom.lineString(lineCanonical(g.coords))
      case GeomKind.MultiLineString =>
        val lines = ringsOf(g, 0, g.rings.length).map(lineCanonical)
          .sortWith((a, b) => cmpSeq(a, b) < 0)
        FlatGeom.multiLineString(lines)
      case GeomKind.Polygon =>
        val (shell, holes) = polygonCanonical(ringsOf(g, 0, g.numRings))
        FlatGeom.polygon(shell, holes)
      case GeomKind.MultiPolygon =>
        val polys = (0 until g.numParts).map { p =>
          polygonCanonical(ringsOf(g, g.partStart(p), g.partEnd(p)))
        }.sortWith((a, b) => cmpSeq(a._1, b._1) < 0)
          .map { case (shell, holes) => FlatGeom.polygon(shell, holes) }
        FlatGeom.multiPolygon(polys)
      case _ => g
    }
  }

  /** JTS equalsNorm: structural equality of the canonical forms. */
  def equalsNorm(a: FlatGeom, b: FlatGeom): Boolean =
    normalize(a) == normalize(b)
}
