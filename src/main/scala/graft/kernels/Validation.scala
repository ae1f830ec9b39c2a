package graft.kernels

import graft.core.{FlatGeom, GeomKind}

/**
 * OGC-SFA validity checking with typed reasons (the reference's
 * validation module, geo/src/algorithm/validation/mod.rs:62-86 and the
 * polygon rules in validation/polygon.rs:17): finite coordinates,
 * minimum point counts, ring simplicity, holes inside the shell, holes
 * not crossing each other, multipolygon parts not overlapping.
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
        if (g.numPoints == 1) Some("LineString with a single point") else None
      case GeomKind.MultiLineString =>
        var bad: Option[String] = None
        FlatGeom.foreachRing(g) { (s, e) =>
          if (bad.isEmpty && e - s == 1) bad = Some("LineString with a single point")
        }
        bad
      case GeomKind.Polygon => polygonReason(g, 0, g.rings.length)
      case GeomKind.MultiPolygon =>
        var bad: Option[String] = None
        FlatGeom.foreachPart(g) { (p, r0, r1) =>
          if (bad.isEmpty) bad = polygonReason(g, r0, r1).map(r => s"part $p: $r")
        }
        if (bad.nonEmpty) return bad
        // parts must not overlap (touching at points/edges is allowed)
        var p1 = 0
        while (p1 < g.parts.length) {
          var p2 = p1 + 1
          while (p2 < g.parts.length) {
            val a = FlatGeom.part(g, p1)
            val b = FlatGeom.part(g, p2)
            val m = Relate.relate(a, b)
            if (m(0) != Relate.F) return Some(s"parts $p1 and $p2 overlap")
            p2 += 1
          }
          p1 += 1
        }
        None
      case k => Some(s"unsupported kind $k")
    }
  }

  private def polygonReason(g: FlatGeom, r0: Int, r1: Int): Option[String] = {
    if (r1 == r0) return None // empty polygon is valid-empty
    var r = r0
    while (r < r1) {
      val s = g.ringStart(r); val e = g.ringEnd(r)
      val n = e - s
      if (n > 0 && n < 4)
        return Some(s"ring ${r - r0} has fewer than 4 points")
      if (n >= 4 && (g.x(s) != g.x(e - 1) || g.y(s) != g.y(e - 1)))
        return Some(s"ring ${r - r0} is not closed")
      if (ringSelfIntersects(g, s, e))
        return Some(s"ring ${r - r0} is self-intersecting")
      r += 1
    }
    // holes inside the shell, not crossing it
    val shell = FlatGeom.polygon(
      java.util.Arrays.copyOfRange(g.coords, g.ringStart(r0) * 2, g.ringEnd(r0) * 2))
    r = r0 + 1
    while (r < r1) {
      val hole = FlatGeom.polygon(
        java.util.Arrays.copyOfRange(g.coords, g.ringStart(r) * 2, g.ringEnd(r) * 2))
      if (!hole.isEmpty) {
        val m = Relate.relate(hole, shell)
        // hole interior must be inside the shell interior
        if (m(2) != Relate.F) return Some(s"interior ring ${r - r0} lies outside the shell")
        // holes must not cross or nest into each other
        var r2 = r + 1
        while (r2 < r1) {
          val hole2 = FlatGeom.polygon(
            java.util.Arrays.copyOfRange(g.coords, g.ringStart(r2) * 2, g.ringEnd(r2) * 2))
          val mm = Relate.relate(hole, hole2)
          if (mm(0) != Relate.F)
            return Some(s"interior rings ${r - r0} and ${r2 - r0} overlap")
          r2 += 1
        }
      }
      r += 1
    }
    None
  }

  /** Non-adjacent segment pairs of a ring must not intersect (point
    * touches between non-consecutive segments are also invalid for
    * rings, except the shared vertices of consecutive segments). */
  private def ringSelfIntersects(g: FlatGeom, s: Int, e: Int): Boolean = {
    val segCount = e - s - 1
    var i = 0
    while (i < segCount) {
      var j = i + 1
      while (j < segCount) {
        val adjacent = j == i + 1 || (i == 0 && j == segCount - 1)
        val a1 = s + i; val a2 = s + i + 1
        val b1 = s + j; val b2 = s + j + 1
        if (!adjacent) {
          if (SegIntersect.intersects(g.x(a1), g.y(a1), g.x(a2), g.y(a2),
            g.x(b1), g.y(b1), g.x(b2), g.y(b2))) return true
        } else {
          // consecutive segments may only share their common endpoint
          val r = SegIntersect.intersection(g.x(a1), g.y(a1), g.x(a2), g.y(a2),
            g.x(b1), g.y(b1), g.x(b2), g.y(b2))
          if (r.kind == SegIntersect.CollinearOverlap) return true
        }
        j += 1
      }
      i += 1
    }
    false
  }
}
