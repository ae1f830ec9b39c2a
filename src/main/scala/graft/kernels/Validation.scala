package graft.kernels

import graft.core.{FlatGeom, GeomKind}

import scala.collection.mutable.ArrayBuffer

/**
 * OGC-SFA validity checking with typed reasons (the reference's
 * validation module, geo/src/algorithm/validation/mod.rs:62-86 and the
 * polygon rules in validation/polygon.rs:17), aligned with the JTS
 * conformance corpus (TestValid.xml / TestValid2.xml):
 *  - finite coordinates everywhere
 *  - LineStrings need ≥ 2 DISTINCT points (repeated points are fine)
 *  - rings: closed, ≥ 4 points after collapsing repeats, no
 *    self-intersection (repeated vertices allowed, spikes are not)
 *  - holes inside the shell; every ring pair (shell-hole, hole-hole)
 *    may touch at AT MOST one point (edge contact = infinitely many);
 *    the ring-touch graph must be acyclic (else the interior
 *    disconnects); a hole must not equal the shell
 *  - MultiPolygon parts: interiors disjoint AND boundaries may share
 *    only finitely many points (no edge contact)
 */
object Validation {

  /** None = valid; Some(reason) = first failure found. */
  def invalidReason(g: FlatGeom): Option[String] = {
    // finite coordinates everywhere (geo-types doc: Coord must be finite)
    var i = 0
    while (i < g.numPoints) {
      if (!java.lang.Double.isFinite(g.x(i)) || !java.lang.Double.isFinite(g.y(i)))
        return Some(s"non-finite coordinate at index $i")
      i += 1
    }
    g.kind match {
      case GeomKind.Point | GeomKind.MultiPoint => None
      case GeomKind.LineString =>
        if (g.numPoints > 0 && distinctCount(g, 0, g.numPoints) < 2)
          Some("LineString with fewer than 2 distinct points")
        else None
      case GeomKind.MultiLineString =>
        var bad: Option[String] = None
        FlatGeom.foreachRing(g) { (s, e) =>
          if (bad.isEmpty && e - s > 0 && distinctCount(g, s, e) < 2)
            bad = Some("LineString with fewer than 2 distinct points")
        }
        bad
      case GeomKind.Polygon => polygonReason(g, 0, g.rings.length)
      case GeomKind.MultiPolygon =>
        var bad: Option[String] = None
        FlatGeom.foreachPart(g) { (p, r0, r1) =>
          if (bad.isEmpty) bad = polygonReason(g, r0, r1).map(r => s"part $p: $r")
        }
        if (bad.nonEmpty) return bad
        // parts: disjoint interiors, boundaries meeting at finitely
        // many points only (edge contact between parts is invalid —
        // JTS TestValid2 cases 226/227)
        var p1 = 0
        while (p1 < g.parts.length) {
          var p2 = p1 + 1
          while (p2 < g.parts.length) {
            val a = FlatGeom.part(g, p1)
            val b = FlatGeom.part(g, p2)
            val m = Relate.relate(a, b)
            if (m(0) != Relate.F) return Some(s"parts $p1 and $p2 overlap")
            if (m(4) == 1) return Some(s"parts $p1 and $p2 share a boundary edge")
            p2 += 1
          }
          p1 += 1
        }
        None
      case k => Some(s"unsupported kind $k")
    }
  }

  private def distinctCount(g: FlatGeom, s: Int, e: Int): Int = {
    val seen = scala.collection.mutable.HashSet[(Double, Double)]()
    var i = s
    while (i < e) { seen.add((g.x(i), g.y(i))); i += 1 }
    seen.size
  }

  /** Ring vertices with consecutive repeats collapsed and the closing
    * duplicate dropped — the geometry JTS validates against. */
  private def cleanRing(g: FlatGeom, s: Int, e: Int): Array[Double] = {
    val out = new ArrayBuffer[Double]()
    var i = s
    while (i < e) {
      val x = g.x(i); val y = g.y(i)
      if (out.length < 2 || out(out.length - 2) != x || out(out.length - 1) != y) {
        out += x; out += y
      }
      i += 1
    }
    // drop closing duplicate
    if (out.length >= 4 && out(0) == out(out.length - 2) && out(1) == out(out.length - 1)) {
      out.remove(out.length - 2, 2)
    }
    out.toArray
  }

  private def polygonReason(g: FlatGeom, r0: Int, r1: Int): Option[String] = {
    if (r1 == r0) return None // empty polygon is valid-empty
    val cleaned = new Array[Array[Double]](r1 - r0)
    var r = r0
    while (r < r1) {
      val s = g.ringStart(r); val e = g.ringEnd(r)
      val n = e - s
      if (n > 0 && n >= 2 && (g.x(s) != g.x(e - 1) || g.y(s) != g.y(e - 1)))
        return Some(s"ring ${r - r0} is not closed")
      val cs = cleanRing(g, s, e)
      cleaned(r - r0) = cs
      if (n > 0 && cs.length < 6)
        return Some(s"ring ${r - r0} has fewer than 3 distinct points")
      if (ringSelfIntersects(cs))
        return Some(s"ring ${r - r0} is self-intersecting")
      r += 1
    }
    // holes inside the shell, pairwise touch rules, acyclic touch graph
    val shell = FlatGeom.polygon(closed(cleaned(0)))
    r = r0 + 1
    val touchEdges = new ArrayBuffer[(Int, Int)]()
    while (r < r1) {
      val hcs = cleaned(r - r0)
      if (hcs.nonEmpty) {
        val hole = FlatGeom.polygon(closed(hcs))
        val m = Relate.relate(hole, shell)
        // hole interior must be inside the shell interior
        if (m(2) != Relate.F) return Some(s"interior ring ${r - r0} lies outside the shell")
        if (Relate.isEqualTopo(m)) return Some(s"interior ring ${r - r0} equals the shell")
        ringContact(hcs, cleaned(0)) match {
          case ContactMany => return Some(
            s"interior ring ${r - r0} touches the shell at more than one point")
          case ContactOne => touchEdges += ((0, r - r0))
          case ContactNone =>
        }
        // holes must not cross, nest, or multi-touch each other
        var r2 = r + 1
        while (r2 < r1) {
          val h2cs = cleaned(r2 - r0)
          if (h2cs.nonEmpty) {
            val hole2 = FlatGeom.polygon(closed(h2cs))
            val mm = Relate.relate(hole, hole2)
            if (mm(0) != Relate.F)
              return Some(s"interior rings ${r - r0} and ${r2 - r0} overlap")
            ringContact(hcs, h2cs) match {
              case ContactMany => return Some(
                s"interior rings ${r - r0} and ${r2 - r0} touch at more than one point")
              case ContactOne => touchEdges += ((r - r0, r2 - r0))
              case ContactNone =>
            }
          }
          r2 += 1
        }
      }
      r += 1
    }
    // acyclic ring-touch graph, else the interior disconnects
    if (hasCycle(r1 - r0, touchEdges.toSeq))
      return Some("interior is disconnected by a cycle of touching rings")
    None
  }

  private def closed(cs: Array[Double]): Array[Double] = {
    if (cs.length >= 2 && (cs(0) != cs(cs.length - 2) || cs(1) != cs(cs.length - 1))) {
      val out = new Array[Double](cs.length + 2)
      System.arraycopy(cs, 0, out, 0, cs.length)
      out(cs.length) = cs(0); out(cs.length + 1) = cs(1)
      out
    } else cs
  }

  private final val ContactNone = 0
  private final val ContactOne = 1
  private final val ContactMany = 2

  /** How two non-crossing rings touch: not at all, at exactly one
    * point, or at more (incl. along an edge = infinitely many). */
  private def ringContact(a: Array[Double], b: Array[Double]): Int = {
    val points = scala.collection.mutable.HashSet[(Double, Double)]()
    val an = a.length / 2
    val bn = b.length / 2
    var i = 0
    while (i < an) {
      val i2 = (i + 1) % an
      var j = 0
      while (j < bn) {
        val j2 = (j + 1) % bn
        val r = SegIntersect.intersection(a(2 * i), a(2 * i + 1), a(2 * i2), a(2 * i2 + 1),
          b(2 * j), b(2 * j + 1), b(2 * j2), b(2 * j2 + 1))
        r.kind match {
          case SegIntersect.None_ =>
          case SegIntersect.CollinearOverlap =>
            if (r.x0 != r.x1 || r.y0 != r.y1) return ContactMany
            else points += ((r.x0, r.y0))
          case _ =>
            points += ((r.x0, r.y0))
            if (points.size > 1) return ContactMany
        }
        j += 1
      }
      i += 1
    }
    if (points.size > 1) ContactMany
    else if (points.size == 1) ContactOne
    else ContactNone
  }

  /** Union-find cycle detection over ring-touch edges. */
  private def hasCycle(n: Int, edges: Seq[(Int, Int)]): Boolean = {
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = {
      var r = x
      while (parent(r) != r) r = parent(r)
      r
    }
    edges.exists { case (u, v) =>
      val ru = find(u); val rv = find(v)
      if (ru == rv) true else { parent(ru) = rv; false }
    }
  }

  /**
   * OGC `IsSimple` (JTS semantics): a geometry is simple when its only
   * self-intersections are at boundary points.
   *  - Point: trivially simple.
   *  - MultiPoint: simple iff no repeated coordinates.
   *  - LineString: no self-intersection except consecutive-segment
   *    endpoints (closure of a closed ring allowed).
   *  - MultiLineString: each element simple; elements may meet only at
   *    points that are endpoints of BOTH (a closed element has no
   *    boundary, so nothing may touch it).
   *  - Polygon / MultiPolygon: every ring simple as a closed line
   *    (a bowtie shell is not simple).
   */
  def isSimple(g: FlatGeom): Boolean = g.kind match {
    case GeomKind.Point => true
    case GeomKind.MultiPoint =>
      val seen = scala.collection.mutable.HashSet[(Double, Double)]()
      var ok = true
      var i = 0
      while (i < g.numPoints && ok) { ok = seen.add((g.x(i), g.y(i))); i += 1 }
      ok
    case GeomKind.LineString =>
      lineIsSimple(g, 0, g.numPoints)
    case GeomKind.Polygon | GeomKind.MultiPolygon =>
      var ok = true
      FlatGeom.foreachRing(g)((s, e) => if (ok) ok = lineIsSimple(g, s, e))
      ok
    case GeomKind.MultiLineString =>
      var ok = true
      FlatGeom.foreachRing(g)((s, e) => if (ok) ok = lineIsSimple(g, s, e))
      if (!ok) return false
      // pairwise: elements may only touch at mutual OPEN endpoints
      val ranges = ArrayBuffer[(Int, Int)]()
      FlatGeom.foreachRing(g)((s, e) => ranges += ((s, e)))
      var li = 0
      while (li < ranges.length && ok) {
        var lj = li + 1
        while (lj < ranges.length && ok) {
          ok = linesTouchOnlyAtEndpoints(g, ranges(li), ranges(lj))
          lj += 1
        }
        li += 1
      }
      ok
    case _ => true
  }

  private def lineIsSimple(g: FlatGeom, s: Int, e: Int): Boolean = {
    val n = e - s
    if (n < 2) return true
    val closed = g.x(s) == g.x(e - 1) && g.y(s) == g.y(e - 1)
    val segCount = n - 1
    var i = 0
    while (i < segCount) {
      var j = i + 1
      while (j < segCount) {
        val adjacent = j == i + 1 || (closed && i == 0 && j == segCount - 1)
        val a1 = s + i; val a2 = s + i + 1
        val b1 = s + j; val b2 = s + j + 1
        val r = SegIntersect.intersection(g.x(a1), g.y(a1), g.x(a2), g.y(a2),
          g.x(b1), g.y(b1), g.x(b2), g.y(b2))
        if (adjacent) {
          if (r.kind == SegIntersect.CollinearOverlap) return false
        } else if (r.kind != SegIntersect.None_) return false
        j += 1
      }
      i += 1
    }
    true
  }

  private def linesTouchOnlyAtEndpoints(g: FlatGeom,
      ra: (Int, Int), rb: (Int, Int)): Boolean = {
    val (as_, ae) = ra
    val (bs, be) = rb
    val aClosed = g.x(as_) == g.x(ae - 1) && g.y(as_) == g.y(ae - 1)
    val bClosed = g.x(bs) == g.x(be - 1) && g.y(bs) == g.y(be - 1)
    @inline def isEndpointA(x: Double, y: Double): Boolean = !aClosed &&
      ((x == g.x(as_) && y == g.y(as_)) || (x == g.x(ae - 1) && y == g.y(ae - 1)))
    @inline def isEndpointB(x: Double, y: Double): Boolean = !bClosed &&
      ((x == g.x(bs) && y == g.y(bs)) || (x == g.x(be - 1) && y == g.y(be - 1)))
    var i = as_
    while (i < ae - 1) {
      var j = bs
      while (j < be - 1) {
        val r = SegIntersect.intersection(g.x(i), g.y(i), g.x(i + 1), g.y(i + 1),
          g.x(j), g.y(j), g.x(j + 1), g.y(j + 1))
        r.kind match {
          case SegIntersect.None_ =>
          case SegIntersect.SinglePointImproper =>
            if (!(isEndpointA(r.x0, r.y0) && isEndpointB(r.x0, r.y0))) return false
          case _ => return false // proper crossing or collinear overlap
        }
        j += 1
      }
      i += 1
    }
    true
  }

  /** Non-adjacent segment pairs of a cleaned ring (no repeated
    * consecutive points, open) must not intersect; adjacent pairs may
    * share only their common endpoint (a spike is a collinear
    * overlap). */
  private def ringSelfIntersects(cs: Array[Double]): Boolean = {
    val n = cs.length / 2
    if (n < 3) return false
    var i = 0
    while (i < n) {
      val i2 = (i + 1) % n
      var j = i + 1
      while (j < n) {
        val j2 = (j + 1) % n
        val adjacent = j == i + 1 || (i == 0 && j == n - 1)
        if (!adjacent) {
          if (SegIntersect.intersects(cs(2 * i), cs(2 * i + 1), cs(2 * i2), cs(2 * i2 + 1),
            cs(2 * j), cs(2 * j + 1), cs(2 * j2), cs(2 * j2 + 1))) return true
        } else {
          val r = SegIntersect.intersection(cs(2 * i), cs(2 * i + 1), cs(2 * i2), cs(2 * i2 + 1),
            cs(2 * j), cs(2 * j + 1), cs(2 * j2), cs(2 * j2 + 1))
          if (r.kind == SegIntersect.CollinearOverlap) return true
        }
        j += 1
      }
      i += 1
    }
    false
  }
}
