package graft.kernels

import graft.core.{FlatGeom, GeomKind}

/**
 * Topological predicates over geometry pairs: intersects / contains /
 * within / disjoint, plus the Euclidean distance dispatch matrix.
 *
 * Semantics follow the reference's two-tier design (geo/src/algorithm/
 * contains/mod.rs:33, intersects/mod.rs:37): cheap kernels (bbox
 * pretests, PIP via `coordPosInRing`, robust segment tests) specialised
 * per type-pair. DE-9IM corner cases that require the full relate
 * engine (geomgraph) are approximated by vertex/edge tests — the full
 * matrix engine is a later-round item (SURVEY.md §7 step 8).
 */
object Topo {

  // ------------------------------------------------------- intersects

  /** DE-9IM "not disjoint" (geo/src/algorithm/intersects/mod.rs:37). */
  def intersects(a: FlatGeom, b: FlatGeom): Boolean = {
    if (a.isEmpty || b.isEmpty) return false
    if (!Planar.bboxIntersects(Planar.boundingRect(a), Planar.boundingRect(b))) return false
    val ka = kindClass(a.kind)
    val kb = kindClass(b.kind)
    (ka, kb) match {
      case (0, _) => pointsIntersect(a, b)
      case (_, 0) => pointsIntersect(b, a)
      case (1, 1) => linesIntersectLines(a, b)
      case (1, 2) => lineIntersectsPolygon(a, b)
      case (2, 1) => lineIntersectsPolygon(b, a)
      case (2, 2) => polygonsIntersect(a, b)
      case _ => false
    }
  }

  /** 0 = puntal, 1 = lineal, 2 = polygonal. */
  @inline private def kindClass(k: Byte): Int = k match {
    case GeomKind.Point | GeomKind.MultiPoint => 0
    case GeomKind.LineString | GeomKind.MultiLineString => 1
    case _ => 2
  }

  private def pointsIntersect(pts: FlatGeom, other: FlatGeom): Boolean = {
    var i = 0
    while (i < pts.numPoints) {
      if (Planar.coordPos(other, pts.x(i), pts.y(i)) != Planar.Outside) return true
      i += 1
    }
    false
  }

  private def anySegPairIntersects(a: FlatGeom, b: FlatGeom): Boolean = {
    var found = false
    FlatGeom.foreachRing(a) { (as_, ae) =>
      if (!found) {
        var i = as_
        while (i < ae - 1 && !found) {
          FlatGeom.foreachRing(b) { (bs, be) =>
            if (!found) {
              var j = bs
              while (j < be - 1 && !found) {
                if (SegIntersect.intersects(a.x(i), a.y(i), a.x(i + 1), a.y(i + 1),
                    b.x(j), b.y(j), b.x(j + 1), b.y(j + 1))) found = true
                j += 1
              }
            }
          }
          i += 1
        }
      }
    }
    found
  }

  private def linesIntersectLines(a: FlatGeom, b: FlatGeom): Boolean =
    anySegPairIntersects(a, b)

  private def lineIntersectsPolygon(line: FlatGeom, poly: FlatGeom): Boolean = {
    // any boundary crossing, or the line lies (partly) inside
    if (anySegPairIntersects(line, poly)) return true
    // no boundary intersection → line is entirely inside or outside each part
    var i = 0
    while (i < line.numPoints) {
      if (Planar.coordPos(poly, line.x(i), line.y(i)) != Planar.Outside) return true
      i += 1
    }
    false
  }

  private def polygonsIntersect(a: FlatGeom, b: FlatGeom): Boolean = {
    if (anySegPairIntersects(a, b)) return true
    // no ring crossings → either disjoint or one fully inside the other
    if (b.numPoints > 0 && Planar.coordPos(a, b.x(0), b.y(0)) != Planar.Outside) return true
    if (a.numPoints > 0 && Planar.coordPos(b, a.x(0), a.y(0)) != Planar.Outside) return true
    false
  }

  // --------------------------------------------------------- contains

  /** DE-9IM `T*F**F***` (geo/src/algorithm/contains/mod.rs:1-4):
    * b's interior intersects a's interior, and no part of b is exterior
    * to a. Boundary-only overlap does NOT count as containment. */
  def contains(a: FlatGeom, b: FlatGeom): Boolean = {
    if (a.isEmpty || b.isEmpty) return false
    val ra = Planar.boundingRect(a)
    val rb = Planar.boundingRect(b)
    if (!(ra(0) <= rb(0) && ra(1) <= rb(1) && ra(2) >= rb(2) && ra(3) >= rb(3))) return false
    val ka = kindClass(a.kind)
    val kb = kindClass(b.kind)
    (ka, kb) match {
      case (0, 0) =>
        // every point of b equals some point of a (and a has no extra
        // requirement since points have no boundary)
        var i = 0
        var ok = true
        while (i < b.numPoints && ok) {
          var found = false
          var j = 0
          while (j < a.numPoints && !found) {
            if (a.x(j) == b.x(i) && a.y(j) == b.y(i)) found = true
            j += 1
          }
          ok = found
          i += 1
        }
        ok
      case (0, _) => false // a point never contains a line/polygon
      case (1, 0) => lineContainsPoints(a, b)
      case (2, 0) => polygonContainsPoints(a, b)
      case (1, 1) => lineContainsLine(a, b)
      case (1, 2) => false
      case (2, 1) => polygonContainsLine(a, b)
      case (2, 2) => polygonContainsPolygon(a, b)
      case _ => false
    }
  }

  def within(a: FlatGeom, b: FlatGeom): Boolean = contains(b, a)

  /** Polygon ∋ point via coordinate_position (contains/polygon.rs:9-29):
    * strictly interior — boundary is not contained. All points of a
    * MultiPoint must be interior-or-boundary with at least one interior. */
  private def polygonContainsPoints(poly: FlatGeom, pts: FlatGeom): Boolean = {
    var anyInterior = false
    var i = 0
    while (i < pts.numPoints) {
      val pos = Planar.coordPos(poly, pts.x(i), pts.y(i))
      if (pos == Planar.Outside) return false
      if (pos == Planar.Inside) anyInterior = true
      i += 1
    }
    anyInterior
  }

  def polygonContainsPoint(poly: FlatGeom, x: Double, y: Double): Boolean =
    Planar.coordPos(poly, x, y) == Planar.Inside

  private def lineContainsPoints(line: FlatGeom, pts: FlatGeom): Boolean = {
    var anyInterior = false
    var i = 0
    while (i < pts.numPoints) {
      val pos = Planar.coordPos(line, pts.x(i), pts.y(i))
      if (pos == Planar.Outside) return false
      if (pos == Planar.Inside) anyInterior = true
      i += 1
    }
    anyInterior
  }

  /** Line ∋ line: every segment midpoint and vertex of b on a; at least
    * one interior intersection. Midpoint sampling is exact only when b's
    * vertices land on a — sufficient for the fixtures; full relate later. */
  private def lineContainsLine(a: FlatGeom, b: FlatGeom): Boolean = {
    var i = 0
    while (i < b.numPoints) {
      if (Planar.coordPos(a, b.x(i), b.y(i)) == Planar.Outside) return false
      i += 1
    }
    var ok = true
    FlatGeom.foreachRing(b) { (s, e) =>
      var j = s
      while (j < e - 1 && ok) {
        val mx = (b.x(j) + b.x(j + 1)) / 2.0
        val my = (b.y(j) + b.y(j + 1)) / 2.0
        if (Planar.coordPos(a, mx, my) == Planar.Outside) ok = false
        j += 1
      }
    }
    ok
  }

  /** Polygon ∋ line: no vertex outside, no proper boundary crossing, and
    * at least one point of the line strictly interior. */
  private def polygonContainsLine(poly: FlatGeom, line: FlatGeom): Boolean = {
    var i = 0
    var anyInterior = false
    while (i < line.numPoints) {
      val pos = Planar.coordPos(poly, line.x(i), line.y(i))
      if (pos == Planar.Outside) return false
      if (pos == Planar.Inside) anyInterior = true
      i += 1
    }
    if (properCross(line, poly)) return false
    if (anyInterior) return true
    // all vertices on the boundary: test segment midpoints
    var anyMidInterior = false
    var allMidInside = true
    FlatGeom.foreachRing(line) { (s, e) =>
      var j = s
      while (j < e - 1 && allMidInside) {
        val mx = (line.x(j) + line.x(j + 1)) / 2.0
        val my = (line.y(j) + line.y(j + 1)) / 2.0
        val pos = Planar.coordPos(poly, mx, my)
        if (pos == Planar.Outside) allMidInside = false
        if (pos == Planar.Inside) anyMidInterior = true
        j += 1
      }
    }
    allMidInside && anyMidInterior
  }

  /** Polygon ∋ polygon: all of b's vertices non-outside a, no proper
    * boundary crossing, b's interior sample strictly inside a, and none
    * of a's holes poking into b (hole vertex strictly inside b ⇒ fail
    * unless hole fully inside a hole of b — approximated). */
  private def polygonContainsPolygon(a: FlatGeom, b: FlatGeom): Boolean = {
    var i = 0
    while (i < b.numPoints) {
      if (Planar.coordPos(a, b.x(i), b.y(i)) == Planar.Outside) return false
      i += 1
    }
    if (properCross(b, a)) return false
    // representative interior point of b must be inside a
    val rep = representativePoint(b)
    if (rep == null) return false
    Planar.coordPos(a, rep(0), rep(1)) == Planar.Inside
  }

  private def properCross(a: FlatGeom, b: FlatGeom): Boolean = {
    var found = false
    FlatGeom.foreachRing(a) { (as_, ae) =>
      if (!found) {
        var i = as_
        while (i < ae - 1 && !found) {
          FlatGeom.foreachRing(b) { (bs, be) =>
            if (!found) {
              var j = bs
              while (j < be - 1 && !found) {
                if (SegIntersect.properlyCross(a.x(i), a.y(i), a.x(i + 1), a.y(i + 1),
                    b.x(j), b.y(j), b.x(j + 1), b.y(j + 1))) found = true
                j += 1
              }
            }
          }
          i += 1
        }
      }
    }
    found
  }

  /** Cheap representative interior point for INTERNAL relate/contains
    * dispatch: the centroid when it already lies strictly inside (one
    * PIP test, no allocation-heavy scanline), else the full
    * reference-faithful interiorPointApprox. Callers only need SOME
    * interior point — the SQL surface keeps the exact algorithm. */
  def representativePoint(g: FlatGeom): Array[Double] = {
    if (g.isEmpty) return null
    if (g.kind == GeomKind.Polygon || g.kind == GeomKind.MultiPolygon) {
      val c = Planar.centroid(g)
      if (c != null && Planar.coordPos(g, c(0), c(1)) == Planar.Inside) return c
    }
    interiorPointApprox(g)
  }

  /** Interior point (faithful re-expression of the reference's
    * InteriorPoint, geo/src/algorithm/interior_point.rs):
    *  - Point: itself; MultiPoint: the member closest to the centroid.
    *  - LineString: 1-2 coords -> the FIRST coord (a computed midpoint
    *    may not lie on the segment in floats, interior_point.rs:97-98);
    *    else the non-endpoint vertex closest to the centroid.
    *  - MultiLineString: each component's interior point, then the one
    *    closest to the overall centroid.
    *  - Polygon/MultiPolygon: per-part scanline at the bbox mid-y
    *    (perturbed toward the nearest distinct vertex y when a vertex
    *    lies exactly on it); ALL consecutive intersection pairs become
    *    candidate segments, widest first; the first whose midpoint
    *    intersects the part wins, weighted by its width when properly
    *    contained and 0 when only on the boundary (zero-area parts).
    *    A MultiPolygon returns the first part with the greatest weight,
    *    so flat parts rank below real ones (interior_point.rs:137-253).
    */
  def interiorPointApprox(g: FlatGeom): Array[Double] = {
    if (g.isEmpty) return null
    g.kind match {
      case GeomKind.Point => Array(g.x(0), g.y(0))
      case GeomKind.MultiPoint =>
        val c = Planar.centroid(g)
        if (c == null) return Array(g.x(0), g.y(0))
        var bi = 0
        var bd = Double.PositiveInfinity
        var i = 0
        while (i < g.numPoints) {
          val d = Math.hypot(g.x(i) - c(0), g.y(i) - c(1))
          if (d < bd) { bd = d; bi = i }
          i += 1
        }
        Array(g.x(bi), g.y(bi))
      case GeomKind.LineString | GeomKind.MultiLineString =>
        val overall = Planar.centroid(g)
        var best: Array[Double] = null
        var bd = Double.PositiveInfinity
        FlatGeom.foreachRing(g) { (s, e) =>
          val ip = lineStringInteriorPoint(g, s, e)
          if (ip != null) {
            val d = if (overall == null) 0.0
              else Math.hypot(ip(0) - overall(0), ip(1) - overall(1))
            if (d < bd) { bd = d; best = ip }
          }
        }
        best
      case GeomKind.Polygon | GeomKind.MultiPolygon =>
        var best: Array[Double] = null
        var bw = Double.NegativeInfinity
        FlatGeom.foreachPart(g) { (_, r0, r1) =>
          val pw = polygonInteriorPointWeighted(g, r0, r1)
          if (pw != null && pw._2 > bw) { bw = pw._2; best = pw._1 }
        }
        best
      case _ => Array(g.x(0), g.y(0))
    }
  }

  /** LineString component rule (interior_point.rs:94-111). */
  private def lineStringInteriorPoint(g: FlatGeom, s: Int, e: Int): Array[Double] = {
    val n = e - s
    if (n <= 0) null
    else if (n <= 2) Array(g.x(s), g.y(s))
    else {
      val c = rangeLineCentroid(g, s, e)
      var bi = s + 1
      var bd = Double.PositiveInfinity
      var i = s + 1
      while (i < e - 1) {
        val d = Math.hypot(g.x(i) - c(0), g.y(i) - c(1))
        if (d < bd) { bd = d; bi = i }
        i += 1
      }
      Array(g.x(bi), g.y(bi))
    }
  }

  /** Length-weighted centroid of one polyline range; falls back to the
    * first coord for zero-length ranges (matches geo's degenerate
    * LineString centroid used by interior_point). */
  private def rangeLineCentroid(g: FlatGeom, s: Int, e: Int): Array[Double] = {
    var len = 0.0
    var cx = 0.0
    var cy = 0.0
    var i = s
    while (i < e - 1) {
      val l = Math.hypot(g.x(i + 1) - g.x(i), g.y(i + 1) - g.y(i))
      cx += (g.x(i) + g.x(i + 1)) / 2.0 * l
      cy += (g.y(i) + g.y(i + 1)) / 2.0 * l
      len += l
      i += 1
    }
    if (len > 0.0) Array(cx / len, cy / len) else Array(g.x(s), g.y(s))
  }

  /** One polygon part: (interior point, weight) or null for an empty
    * part (interior_point.rs polygon_interior_point_with_segment_length). */
  private def polygonInteriorPointWeighted(g: FlatGeom, r0: Int, r1: Int): (Array[Double], Double) = {
    val extN = g.ringEnd(r0) - g.ringStart(r0)
    if (extN <= 0) return null
    if (extN == 1) return (Array(g.x(g.ringStart(r0)), g.y(g.ringStart(r0))), 0.0)

    // part bounds
    var ymin = Double.PositiveInfinity
    var ymax = Double.NegativeInfinity
    var r = r0
    while (r < r1) {
      var i = g.ringStart(r)
      while (i < g.ringEnd(r)) {
        val y = g.y(i)
        if (y < ymin) ymin = y
        if (y > ymax) ymax = y
        i += 1
      }
      r += 1
    }
    var yMid = (ymin + ymax) / 2.0
    // perturb toward the nearest distinct vertex y if a vertex sits on it
    var onMid = false
    var closest = Double.NaN
    var closestD = Double.PositiveInfinity
    r = r0
    while (r < r1) {
      var i = g.ringStart(r)
      while (i < g.ringEnd(r)) {
        val y = g.y(i)
        if (y == yMid) onMid = true
        else {
          val d = Math.abs(y - yMid)
          if (d < closestD) { closestD = d; closest = y }
        }
        i += 1
      }
      r += 1
    }
    if (onMid && !closest.isNaN) yMid = (yMid + closest) / 2.0

    // scanline intersections with every edge (collinear edges push both
    // endpoints; endpoint touches push the endpoint)
    val xs = scala.collection.mutable.ArrayBuffer[Double]()
    r = r0
    while (r < r1) {
      var i = g.ringStart(r)
      while (i < g.ringEnd(r) - 1) {
        val y1 = g.y(i); val y2 = g.y(i + 1)
        val x1 = g.x(i); val x2 = g.x(i + 1)
        if (y1 == yMid && y2 == yMid) { xs += x1; xs += x2 }
        else if ((y1 - yMid) * (y2 - yMid) <= 0.0) {
          if (y1 == yMid) xs += x1
          else if (y2 == yMid) xs += x2
          else xs += x1 + (yMid - y1) / (y2 - y1) * (x2 - x1)
        }
        i += 1
      }
      r += 1
    }
    val sorted = xs.sorted
    // ALL consecutive pairs, widest first (stable sort keeps scan order
    // on ties, matching the reference's total_cmp sort_by)
    val segs = (0 until sorted.length - 1)
      .map(k => ((sorted(k) + sorted(k + 1)) / 2.0, sorted(k + 1) - sorted(k)))
      .sortBy(-_._2)
    for ((mx, w) <- segs) {
      val pos = Planar.coordPosInPolygon(g, r0, r1, mx, yMid)
      if (pos == Planar.Inside) return (Array(mx, yMid), w)
      if (pos == Planar.OnBoundary) return (Array(mx, yMid), 0.0)
    }
    // nothing intersected (degenerate diagonal slivers): first coord
    (Array(g.x(g.ringStart(r0)), g.y(g.ringStart(r0))), 0.0)
  }

  // --------------------------------------------------------- distance

  /** Euclidean distance between two geometries (geo/src/algorithm/
    * line_measures/metric_spaces/euclidean/distance.rs:28-338 pairwise
    * matrix). 0 when intersecting; else min over component distances. */
  def euclideanDistance(a: FlatGeom, b: FlatGeom): Double = {
    if (a.isEmpty || b.isEmpty) return Double.NaN
    if (intersects(a, b)) return 0.0
    var min = Double.PositiveInfinity
    // min over: points of a vs segments/points of b, and vice versa
    min = Math.min(min, pointsToGeom(a, b, min))
    min = Math.min(min, pointsToGeom(b, a, min))
    min
  }

  /** Above this many probe×segment pairs, index the segment side with
    * a packed STR-tree and branch-and-bound each probe point instead
    * of scanning all segments — the reference's CachedEnvelope R*-tree
    * strategy for large linestring/polygon pairs
    * (euclidean_distance.rs:8-10, geometry_graph.rs:49). */
  private final val IndexPairThreshold = 4096

  private def pointsToGeom(pts: FlatGeom, other: FlatGeom, bound: Double): Double = {
    var min = bound
    val otherSegs = if (other.kind == GeomKind.MultiPoint) 0 else other.numPoints - 1
    if (otherSegs >= 16 && pts.numPoints.toLong * otherSegs >= IndexPairThreshold) {
      val (tree, sx1, sy1, sx2, sy2) = graft.index.STRtree.ofSegments(other)
      var i = 0
      while (i < pts.numPoints) {
        val px = pts.x(i); val py = pts.y(i)
        min = tree.nearestDist(px, py, min,
          k => Planar.pointSegDistance(px, py, sx1(k), sy1(k), sx2(k), sy2(k)))
        i += 1
      }
      return min
    }
    var i = 0
    while (i < pts.numPoints) {
      val px = pts.x(i); val py = pts.y(i)
      if (other.numPoints == 1) {
        min = Math.min(min, Math.hypot(px - other.x(0), py - other.y(0)))
      } else if (other.kind == GeomKind.MultiPoint) {
        var j = 0
        while (j < other.numPoints) {
          min = Math.min(min, Math.hypot(px - other.x(j), py - other.y(j)))
          j += 1
        }
      } else {
        FlatGeom.foreachRing(other) { (s, e) =>
          var j = s
          while (j < e - 1) {
            min = Math.min(min, Planar.pointSegDistance(px, py,
              other.x(j), other.y(j), other.x(j + 1), other.y(j + 1)))
            j += 1
          }
        }
      }
      i += 1
    }
    min
  }


  /** Witness points of the minimum distance: [ax, ay, bx, by] with
    * (ax,ay) on a and (bx,by) on b, or null for empty/intersecting
    * inputs (no unique witness). Brute-force argmin twin of
    * euclideanDistance — callers needing only the scalar should use
    * that (it carries the STR-tree branch-and-bound). */
  def closestPair(a: FlatGeom, b: FlatGeom): Array[Double] = {
    if (a.isEmpty || b.isEmpty || intersects(a, b)) return null
    var best = Double.PositiveInfinity
    val out = new Array[Double](4)
    def scan(pts: FlatGeom, other: FlatGeom, ptsAreA: Boolean): Unit = {
      var i = 0
      while (i < pts.numPoints) {
        val px = pts.x(i); val py = pts.y(i)
        @inline def consider(qx: Double, qy: Double): Unit = {
          val d = Math.hypot(px - qx, py - qy)
          if (d < best) {
            best = d
            if (ptsAreA) { out(0) = px; out(1) = py; out(2) = qx; out(3) = qy }
            else { out(0) = qx; out(1) = qy; out(2) = px; out(3) = py }
          }
        }
        if (other.kind == GeomKind.Point || other.kind == GeomKind.MultiPoint) {
          var j = 0
          while (j < other.numPoints) { consider(other.x(j), other.y(j)); j += 1 }
        } else {
          FlatGeom.foreachRing(other) { (s, e) =>
            var j = s
            while (j < e - 1) {
              val x1 = other.x(j); val y1 = other.y(j)
              val x2 = other.x(j + 1); val y2 = other.y(j + 1)
              val dx = x2 - x1; val dy = y2 - y1
              val l2 = dx * dx + dy * dy
              val t = if (l2 == 0) 0.0
                else Math.max(0.0, Math.min(1.0, ((px - x1) * dx + (py - y1) * dy) / l2))
              consider(x1 + t * dx, y1 + t * dy)
              j += 1
            }
          }
        }
        i += 1
      }
    }
    scan(a, b, ptsAreA = true)
    scan(b, a, ptsAreA = false)
    if (best.isInfinity) null else out
  }

  // -------------------------------------------------- set similarity

  /** Hausdorff distance over coordinate sets
    * (geo/src/algorithm/hausdorff_distance.rs:13: max over both
    * directions of min point-to-point distance). */
  def hausdorffDistance(a: FlatGeom, b: FlatGeom): Double = {
    @inline def directed(p: FlatGeom, q: FlatGeom): Double = {
      var worst = 0.0
      var i = 0
      while (i < p.numPoints) {
        var best = Double.PositiveInfinity
        var j = 0
        while (j < q.numPoints) {
          val d = Math.hypot(p.x(i) - q.x(j), p.y(i) - q.y(j))
          if (d < best) best = d
          j += 1
        }
        if (best > worst) worst = best
        i += 1
      }
      worst
    }
    Math.max(directed(a, b), directed(b, a))
  }

  /** Discrete Fréchet distance between two LineStrings, Eiter-Mannila DP
    * (geo/src/algorithm/frechet_distance.rs:12). */
  def frechetDistance(a: FlatGeom, b: FlatGeom): Double = {
    val n = a.numPoints
    val m = b.numPoints
    if (n == 0 || m == 0) return 0.0
    val ca = Array.fill(n * m)(-1.0)
    @inline def dist(i: Int, j: Int): Double = Math.hypot(a.x(i) - b.x(j), a.y(i) - b.y(j))
    def c(i: Int, j: Int): Double = {
      val k = i * m + j
      if (ca(k) > -1.0) return ca(k)
      val v =
        if (i == 0 && j == 0) dist(0, 0)
        else if (i == 0) Math.max(c(0, j - 1), dist(0, j))
        else if (j == 0) Math.max(c(i - 1, 0), dist(i, 0))
        else Math.max(Math.min(Math.min(c(i - 1, j), c(i - 1, j - 1)), c(i, j - 1)), dist(i, j))
      ca(k) = v
      v
    }
    // iterative fill to avoid deep recursion on long lines
    var i = 0
    while (i < n) {
      var j = 0
      while (j < m) {
        val d = dist(i, j)
        val v =
          if (i == 0 && j == 0) d
          else if (i == 0) Math.max(ca(j - 1), d)
          else if (j == 0) Math.max(ca((i - 1) * m), d)
          else Math.max(Math.min(Math.min(ca((i - 1) * m + j), ca((i - 1) * m + j - 1)), ca(i * m + j - 1)), d)
        ca(i * m + j) = v
        j += 1
      }
      i += 1
    }
    ca(n * m - 1)
  }

  /** Minimum clearance (JTS MinimumClearance, gated by the
    * general/TestMinimumClearance.xml corpus; no counterpart in the
    * geo crate): the smallest positive distance between (a) two
    * distinct vertices or (b) a vertex and a segment it is not an
    * endpoint of. Robustness measure: moving any vertex by less than
    * the clearance cannot change the geometry's topology. Returns
    * (Double.MaxValue, null) when no candidate exists (empty, single
    * point, all-coincident). The second element is the realizing
    * clearance line [vx, vy, px, py]. */
  def minClearance(g: FlatGeom): (Double, Array[Double]) = {
    if (g == null || g.isEmpty) return (Double.MaxValue, null)
    val n = g.numPoints
    var best = Double.MaxValue
    var line: Array[Double] = null
    // vertex-vertex candidates
    var i = 0
    while (i < n) {
      var j = i + 1
      while (j < n) {
        val dx = g.x(j) - g.x(i)
        val dy = g.y(j) - g.y(i)
        val d2 = dx * dx + dy * dy
        if (d2 > 0 && d2 < best * best) {
          val d = Math.sqrt(d2)
          if (d < best) { best = d; line = Array(g.x(i), g.y(i), g.x(j), g.y(j)) }
        }
        j += 1
      }
      i += 1
    }
    // vertex-segment candidates (vertex not an endpoint of the segment)
    i = 0
    while (i < n) {
      val vx = g.x(i)
      val vy = g.y(i)
      FlatGeom.foreachRing(g) { (s, e) =>
        var k = s
        while (k < e - 1) {
          val px = g.x(k); val py = g.y(k)
          val qx = g.x(k + 1); val qy = g.y(k + 1)
          if (!(vx == px && vy == py) && !(vx == qx && vy == qy)) {
            val dx = qx - px
            val dy = qy - py
            val len2 = dx * dx + dy * dy
            if (len2 > 0) {
              var t = ((vx - px) * dx + (vy - py) * dy) / len2
              if (t < 0) t = 0
              if (t > 1) t = 1
              val cx = px + t * dx
              val cy = py + t * dy
              val ddx = vx - cx
              val ddy = vy - cy
              val d2 = ddx * ddx + ddy * ddy
              if (d2 > 0 && d2 < best * best) {
                val d = Math.sqrt(d2)
                if (d < best) { best = d; line = Array(vx, vy, cx, cy) }
              }
            }
          }
          k += 1
        }
      }
      i += 1
    }
    (best, line)
  }

  /** OGC Mod-2 boundary (JTS `Geometry.getBoundary`, gated by the
    * general/TestBoundary.xml corpus):
    *  - 0-D → empty (MultiPoint EMPTY on our surface);
    *  - 1-D → the part endpoints occurring an ODD number of times
    *    (a closed part contributes nothing; shared endpoints cancel
    *    pairwise);
    *  - 2-D → every ring as a closed line (MultiLineString).
    * The geo crate has no boundary operator — its relate engine
    * computes boundary classes implicitly; this exposes them. */
  def boundary(g: FlatGeom): FlatGeom = g.kind match {
    case GeomKind.Point | GeomKind.MultiPoint =>
      FlatGeom.multiPoint(Array.emptyDoubleArray)
    case GeomKind.LineString | GeomKind.MultiLineString =>
      val count = scala.collection.mutable.LinkedHashMap[(Double, Double), Int]()
      FlatGeom.foreachRing(g) { (s, e) =>
        if (e - s >= 2) {
          val p0 = (g.x(s), g.y(s))
          val p1 = (g.x(e - 1), g.y(e - 1))
          if (p0 != p1) {
            count(p0) = count.getOrElse(p0, 0) + 1
            count(p1) = count.getOrElse(p1, 0) + 1
          }
        }
      }
      val pts = count.iterator.filter(_._2 % 2 == 1).map(_._1).toArray
      FlatGeom.multiPoint(pts.flatMap(p => Array(p._1, p._2)))
    case GeomKind.Polygon | GeomKind.MultiPolygon =>
      val lines = scala.collection.mutable.ArrayBuffer[Array[Double]]()
      FlatGeom.foreachRing(g) { (s, e) =>
        lines += java.util.Arrays.copyOfRange(g.coords, 2 * s, 2 * e)
      }
      if (lines.length == 1) FlatGeom.lineString(lines(0))
      else FlatGeom.multiLineString(lines.toSeq)
    case _ => FlatGeom.multiPoint(Array.emptyDoubleArray)
  }
}
