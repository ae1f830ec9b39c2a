package graft.kernels

import graft.core.{FlatGeom, GeomKind}
import scala.collection.mutable.ArrayBuffer

/**
 * Constructive shape operators: concave hull (mapbox-concaveman-style
 * edge peeling — re-derivation of geo/src/algorithm/concave_hull.rs:41),
 * minimum rotated rectangle (rotating calipers over the convex hull —
 * minimum_rotated_rect.rs:30), ear-clipping triangulation
 * (triangulate_earcut.rs:6 semantics, Meister's ear theorem),
 * LineString segmentization (linestring_segment.rs:20,39), dimensions
 * (dimensions.rs:36), haversine closest point
 * (haversine_closest_point.rs:36).
 */
object Shapes {

  // ----------------------------------------------------- concave hull

  /** Concave hull with concavity parameter: start from the quick hull,
    * repeatedly dig an edge toward its closest interior point when
    * `edgeLength / decisionDistance > concavity` (the concaveman rule,
    * concave_hull.rs:216-245). Returns a closed ring. */
  def concaveHull(coords: Array[Double], concavity: Double): Array[Double] = {
    val hull = Hull.quickHull(coords)
    val n = coords.length / 2
    if (n < 4) return hull

    // interior = points not on the hull (by exact coordinate identity)
    val hullSet = new java.util.HashSet[Long]()
    var i = 0
    while (i < hull.length / 2) {
      hullSet.add(java.lang.Double.doubleToLongBits(hull(2 * i)) * 31 ^
        java.lang.Double.doubleToLongBits(hull(2 * i + 1)))
      i += 1
    }
    val interior = ArrayBuffer[(Double, Double)]()
    i = 0
    while (i < n) {
      val key = java.lang.Double.doubleToLongBits(coords(2 * i)) * 31 ^
        java.lang.Double.doubleToLongBits(coords(2 * i + 1))
      if (!hullSet.contains(key)) interior += ((coords(2 * i), coords(2 * i + 1)))
      i += 1
    }

    final case class Edge(x1: Double, y1: Double, x2: Double, y2: Double)
    val queue = scala.collection.mutable.ArrayDeque[Edge]()
    val liveEdges = scala.collection.mutable.LinkedHashSet[Edge]()
    i = 0
    while (i < hull.length / 2 - 1) {
      val e = Edge(hull(2 * i), hull(2 * i + 1), hull(2 * i + 2), hull(2 * i + 3))
      queue.append(e)
      liveEdges += e
      i += 1
    }

    @inline def segDist(px: Double, py: Double, e: Edge): Double =
      Planar.pointSegDistance(px, py, e.x1, e.y1, e.x2, e.y2)

    val out = ArrayBuffer[Double]()
    while (queue.nonEmpty) {
      val line = queue.removeHead()
      val edgeLength = Math.hypot(line.x2 - line.x1, line.y2 - line.y1)
      val maxDist = edgeLength / concavity
      val h = maxDist + maxDist
      val w = edgeLength + h
      val searchDist = Math.sqrt(w * w + h * h) / 2.0
      val cx = (line.x1 + line.x2) / 2.0
      val cy = (line.y1 + line.y2) / 2.0

      // closest live interior point within searchDist of the edge centroid
      var bestIdx = -1
      var bestD = Double.PositiveInfinity
      var j = 0
      while (j < interior.length) {
        val p = interior(j)
        if (p != null && Math.hypot(p._1 - cx, p._2 - cy) <= searchDist) {
          val d = segDist(p._1, p._2, line)
          if (d < bestD) { bestD = d; bestIdx = j }
        }
        j += 1
      }
      var dug = false
      if (bestIdx >= 0) {
        val p = interior(bestIdx)
        // the closest current edge to that point must be THIS edge
        var closestEdge: Edge = null
        var ced = Double.PositiveInfinity
        liveEdges.foreach { e =>
          val d = segDist(p._1, p._2, e)
          if (d < ced) { ced = d; closestEdge = e }
        }
        val decisionDistance = Math.min(
          Math.hypot(p._1 - line.x1, p._2 - line.y1),
          Math.hypot(p._1 - line.x2, p._2 - line.y2))
        if (edgeLength / decisionDistance > concavity && closestEdge == line) {
          interior(bestIdx) = null
          liveEdges -= line
          val e1 = Edge(line.x1, line.y1, p._1, p._2)
          val e2 = Edge(p._1, p._2, line.x2, line.y2)
          liveEdges += e1
          liveEdges += e2
          queue.prepend(e2)
          queue.prepend(e1)
          dug = true
        }
      }
      if (!dug) {
        if (out.isEmpty || out(out.length - 2) != line.x1 || out(out.length - 1) != line.y1) {
          out += line.x1; out += line.y1
        }
        out += line.x2; out += line.y2
      }
    }
    FlatGeom.closeRing(out.toArray)
  }

  // ------------------------------------- k-nearest concave hull

  /** Moreira & Santos 2007 k-nearest-neighbours concave hull with the
    * reference's auto-escalating K (k_nearest_concave_hull.rs:29,
    * K_MULTIPLIER = 1.5 at :9): walk the boundary counter-clockwise,
    * at each step choosing among the k nearest remaining points the
    * one with the largest right-hand turn that does not intersect the
    * hull built so far; if the walk strands or leaves points outside,
    * retry with a larger k. Returns a closed ring. */
  def kNearestConcaveHull(coordsIn: Array[Double], k: Int): Array[Double] = {
    // near-duplicate removal (relative DELTA = 1e-9, :93-131)
    val pts = ArrayBuffer[(Double, Double)]()
    val delta = 1e-9
    @inline def feq(a: Double, b: Double): Boolean = {
      val da = Math.abs(a * delta)
      b > a - da && b < a + da
    }
    var i = 0
    while (i < coordsIn.length / 2) {
      val x = coordsIn(2 * i); val y = coordsIn(2 * i + 1)
      if (!pts.exists(p => feq(p._1, x) && feq(p._2, y))) pts += ((x, y))
      i += 1
    }
    val n = pts.length
    if (n <= 3) {
      val out = ArrayBuffer[Double]()
      pts.foreach { p => out += p._1; out += p._2 }
      if (n > 0) { out += pts(0)._1; out += pts(0)._2 }
      return out.toArray
    }

    @inline def pseudoAngle(dx: Double, dy: Double): Double = {
      if (dx == 0.0 && dy == 0.0) return 0.0
      val p = dx / (Math.abs(dx) + Math.abs(dy))
      if (dy < 0.0) 3.0 + p else 1.0 - p
    }

    def attempt(kTry: Int): Array[Double] = {
      if (kTry >= n) {
        // fall back to the convex hull (:206-213)
        val flat = new Array[Double](2 * n)
        var j = 0
        while (j < n) { flat(2 * j) = pts(j)._1; flat(2 * j + 1) = pts(j)._2; j += 1 }
        return Hull.quickHull(flat)
      }
      val kk = Math.max(kTry, 3)
      val alive = Array.fill(n)(true)
      // first coord: minimum y (strict <, first wins)
      var firstIdx = 0
      var j = 1
      while (j < n) { if (pts(j)._2 < pts(firstIdx)._2) firstIdx = j; j += 1 }
      val hull = ArrayBuffer[(Double, Double)](pts(firstIdx))
      alive(firstIdx) = false
      var current = pts(firstIdx)
      var prev = current
      var step = 2
      var aliveCount = n - 1
      var failed = false
      var closed = false
      while (!closed && !failed && aliveCount > 0) {
        if (step == 5) { alive(firstIdx) = true; aliveCount += 1 }
        // k nearest alive points (ties by index for determinism)
        val near = (0 until n).filter(alive)
          .sortBy(m => (Math.hypot(pts(m)._1 - current._1, pts(m)._2 - current._2), m))
          .take(kk)
        val baseAngle = pseudoAngle(prev._1 - current._1, prev._2 - current._2)
        val byAngle = near.sortBy { m =>
          var a = pseudoAngle(pts(m)._1 - current._1, pts(m)._2 - current._2) - baseAngle
          if (a < 0.0) a += 4.0
          -a // descending
        }
        val sel = byAngle.find { m =>
          val cand = pts(m)
          if (cand == hull.head) true // closing the ring is always allowed
          else {
            // the new edge must not intersect the existing hull chain
            // (excluding the edge's own start point, :291-305)
            var cross = false
            var h = 0
            while (h < hull.length - 2 && !cross) {
              if (SegIntersect.intersects(current._1, current._2, cand._1, cand._2,
                  hull(h)._1, hull(h)._2, hull(h + 1)._1, hull(h + 1)._2)) cross = true
              h += 1
            }
            !cross
          }
        }
        sel match {
          case Some(m) =>
            prev = current
            current = pts(m)
            hull += current
            alive(m) = false
            aliveCount -= 1
            step += 1
            if (current == hull.head && step > 2) closed = true
          case None => failed = true
        }
      }
      if (failed) return attempt(Math.max(kk + 1, (kk * 1.5).toInt))
      // close if the walk exhausted the points without reaching the start
      if (hull.last != hull.head) hull += hull.head
      // containment check: every original point inside or on the hull
      val flatHull = {
        val o = new Array[Double](hull.length * 2)
        var h = 0
        while (h < hull.length) { o(2 * h) = hull(h)._1; o(2 * h + 1) = hull(h)._2; h += 1 }
        o
      }
      val poly = graft.core.FlatGeom.polygon(flatHull)
      val allIn = pts.forall(p => Planar.coordPos(poly, p._1, p._2) != Planar.Outside)
      if (!allIn) attempt(Math.max(kk + 1, (kk * 1.5).toInt))
      else flatHull
    }
    attempt(Math.max(k, 3))
  }

  // ------------------------------------------- minimum rotated rect

  /** Minimum-area oriented bounding rectangle: rotating-calipers trial
    * of every convex-hull edge direction (minimum_rotated_rect.rs:30-45;
    * Toussaint 1983). Returns the 4 corners as a closed ring. */
  def minimumRotatedRect(coords: Array[Double]): Array[Double] = {
    val hull = Hull.quickHull(coords)
    val m = hull.length / 2 - 1 // closed ring
    if (m < 1) return hull
    var bestArea = Double.PositiveInfinity
    var best: Array[Double] = null
    var e = 0
    while (e < m) {
      val ex = hull(2 * (e + 1)) - hull(2 * e)
      val ey = hull(2 * (e + 1) + 1) - hull(2 * e + 1)
      val len = Math.hypot(ex, ey)
      if (len > 0) {
        val ux = ex / len
        val uy = ey / len
        // project all hull points on (ux,uy) and its normal
        var minU = Double.PositiveInfinity; var maxU = Double.NegativeInfinity
        var minV = Double.PositiveInfinity; var maxV = Double.NegativeInfinity
        var i = 0
        while (i < m) {
          val u = hull(2 * i) * ux + hull(2 * i + 1) * uy
          val v = -hull(2 * i) * uy + hull(2 * i + 1) * ux
          if (u < minU) minU = u
          if (u > maxU) maxU = u
          if (v < minV) minV = v
          if (v > maxV) maxV = v
          i += 1
        }
        val area = (maxU - minU) * (maxV - minV)
        if (area < bestArea) {
          bestArea = area
          @inline def pt(u: Double, v: Double): (Double, Double) =
            (u * ux - v * uy, u * uy + v * ux)
          val c1 = pt(minU, minV); val c2 = pt(maxU, minV)
          val c3 = pt(maxU, maxV); val c4 = pt(minU, maxV)
          best = Array(c1._1, c1._2, c2._1, c2._2, c3._1, c3._2, c4._1, c4._2, c1._1, c1._2)
        }
      }
      e += 1
    }
    if (best == null) hull else best
  }

  // ------------------------------------------------- triangulation

  /** Ear-clipping triangulation with HOLE support
    * (triangulate_earcut.rs:6 semantics) — delegates to the [[Earcut]]
    * kernel (linked-list ear clipping with hole bridging and
    * cure/split fallbacks). MultiPolygons triangulate per part.
    * Returns flat triangles, 6 doubles each. */
  def earcut(g: FlatGeom): Array[Array[Double]] = g.kind match {
    case GeomKind.Polygon =>
      Earcut.triangulate((0 until g.rings.length).map(r => ringPts(g, g.ringStart(r), g.ringEnd(r))))
    case GeomKind.MultiPolygon =>
      val out = ArrayBuffer[Array[Double]]()
      FlatGeom.foreachPart(g) { (_, r0, r1) =>
        out ++= Earcut.triangulate((r0 until r1).map(r => ringPts(g, g.ringStart(r), g.ringEnd(r))))
      }
      out.toArray
    case _ => Array.empty
  }

  /** Ring as an open vertex list (closing duplicate dropped). */
  private def ringPts(g: FlatGeom, s: Int, e: Int): Array[Double] = {
    var e2 = e
    if (e - s >= 2 && g.x(s) == g.x(e - 1) && g.y(s) == g.y(e - 1)) e2 = e - 1
    val out = new Array[Double]((e2 - s) * 2)
    var i = s
    while (i < e2) { out(2 * (i - s)) = g.x(i); out(2 * (i - s) + 1) = g.y(i); i += 1 }
    out
  }

  // ------------------------------------------------- segmentization

  /** Split the LineString into `n` pieces of equal length under the
    * chosen metric (0 = Euclidean, 1 = Haversine) —
    * linestring_segment.rs:20,39. Returns a MultiLineString. */
  def segmentize(g: FlatGeom, n: Int, metric: Int): FlatGeom = {
    require(n > 0)
    if (g.numPoints < 2) return FlatGeom.multiLineString(Seq(g.coords))
    @inline def dist(x1: Double, y1: Double, x2: Double, y2: Double): Double =
      if (metric == 1) Sphere.haversineDistance(x1, y1, x2, y2) else Math.hypot(x2 - x1, y2 - y1)
    @inline def interp(x1: Double, y1: Double, x2: Double, y2: Double, t: Double): (Double, Double) =
      if (metric == 1) { val p = Sphere.haversinePointAtRatio(x1, y1, x2, y2, t); (p(0), p(1)) }
      else (x1 + t * (x2 - x1), y1 + t * (y2 - y1))

    val total = {
      var sum = 0.0
      var i = 0
      while (i < g.numPoints - 1) { sum += dist(g.x(i), g.y(i), g.x(i + 1), g.y(i + 1)); i += 1 }
      sum
    }
    val target = total / n
    val pieces = ArrayBuffer[Array[Double]]()
    var cur = ArrayBuffer[Double](g.x(0), g.y(0))
    var acc = 0.0
    var i = 0
    var sx = g.x(0); var sy = g.y(0)
    while (i < g.numPoints - 1) {
      var ex = g.x(i + 1); val ey = g.y(i + 1)
      var segLen = dist(sx, sy, ex, ey)
      while (pieces.length < n - 1 && acc + segLen >= target && segLen > 0) {
        val t = (target - acc) / segLen
        val (mx, my) = interp(sx, sy, ex, ey, t)
        cur += mx; cur += my
        pieces += cur.toArray
        cur = ArrayBuffer[Double](mx, my)
        sx = mx; sy = my
        segLen = dist(sx, sy, ex, ey)
        acc = 0.0
      }
      acc += segLen
      cur += ex; cur += ey
      sx = ex; sy = ey
      i += 1
    }
    pieces += cur.toArray
    FlatGeom.multiLineString(pieces.toSeq)
  }

  // ------------------------------------------------------ dimensions

  /** OGC dimension: -1 empty, 0 puntal, 1 lineal, 2 polygonal
    * (dimensions.rs:36; degenerate lines/polygons collapse). */
  def dimension(g: FlatGeom): Int = {
    if (g.isEmpty) return -1
    g.kind match {
      case GeomKind.Point | GeomKind.MultiPoint => 0
      case GeomKind.LineString | GeomKind.MultiLineString =>
        // all coords equal → zero-dimensional degenerate
        var degenerate = true
        var i = 1
        while (i < g.numPoints && degenerate) {
          if (g.x(i) != g.x(0) || g.y(i) != g.y(0)) degenerate = false
          i += 1
        }
        if (degenerate) 0 else 1
      case _ =>
        if (Planar.unsignedArea(g) > 0.0) 2
        else if (Planar.perimeter(g) > 0.0) 1
        else 0
    }
  }

  // ------------------------------------- haversine closest point

  /** Nearest point of `g` to (px, py) along great-circle arcs
    * (haversine_closest_point.rs:36 semantics: per-segment cross-track
    * projection clamped to the segment). */
  def haversineClosestPoint(g: FlatGeom, px: Double, py: Double): Array[Double] = {
    if (g.isEmpty) return null
    if (g.kind == GeomKind.Point || g.kind == GeomKind.MultiPoint) {
      var best = Double.PositiveInfinity
      var bx = g.x(0); var by = g.y(0)
      var i = 0
      while (i < g.numPoints) {
        val d = Sphere.haversineDistance(g.x(i), g.y(i), px, py)
        if (d < best) { best = d; bx = g.x(i); by = g.y(i) }
        i += 1
      }
      return Array(bx, by)
    }
    var best = Double.PositiveInfinity
    var bx = g.x(0); var by = g.y(0)
    FlatGeom.foreachRing(g) { (s, e) =>
      var i = s
      while (i < e - 1) {
        val ax = g.x(i); val ay = g.y(i)
        val ex = g.x(i + 1); val ey = g.y(i + 1)
        // along-track projection of P on the great circle through A→B
        val d13 = Sphere.haversineDistance(ax, ay, px, py)
        val theta13 = Math.toRadians(Sphere.haversineBearing(ax, ay, px, py))
        val theta12 = Math.toRadians(Sphere.haversineBearing(ax, ay, ex, ey))
        val delta13 = d13 / Sphere.MeanEarthRadius
        val dxt = Math.asin(Math.sin(delta13) * Math.sin(theta13 - theta12))
        val dat = Math.acos(Math.cos(delta13) / Math.abs(Math.cos(dxt))) * Sphere.MeanEarthRadius
        val segLen = Sphere.haversineDistance(ax, ay, ex, ey)
        val cand: Array[Double] =
          if (Math.cos(theta12 - theta13) < 0 || dat.isNaN) Array(ax, ay) // behind A
          else if (dat >= segLen) Array(ex, ey) // beyond B
          else Sphere.haversineDestination(ax, ay, Math.toDegrees(theta12), dat)
        val d = Sphere.haversineDistance(cand(0), cand(1), px, py)
        if (d < best) { best = d; bx = cand(0); by = cand(1) }
        i += 1
      }
    }
    Array(bx, by)
  }

  // --------------------------------------------------- LOF outliers

  /** Local Outlier Factor scores (Breunig et al. 2000, SIGMOD;
    * outlier_detection.rs:23). Brute-force kNN — intended for per-group
    * application inside mapGroups. Returns one score per point. */
  def lofScores(coords: Array[Double], k: Int): Array[Double] = {
    val n = coords.length / 2
    if (n <= k) return Array.fill(n)(1.0)
    // kNN per point via partial insertion selection (k is small);
    // distances recomputed on demand — no O(n²) matrix allocation.
    // All comparisons happen in SQUARED distance (one double mul-add
    // chain, identical to what plain SQL computes) with ties broken by
    // index; sqrt is applied only at the reachability step. This makes
    // neighbour selection bit-reproducible against an independent SQL
    // oracle (hypot's ≤1-ulp slack could order exact-tie distances
    // differently than sqrt(dx*dx+dy*dy)).
    val knn = Array.ofDim[Int](n, k)
    val kdist = new Array[Double](n)
    @inline def dist(i: Int, j: Int): Double = {
      val dx = coords(2 * i) - coords(2 * j)
      val dy = coords(2 * i + 1) - coords(2 * j + 1)
      dx * dx + dy * dy
    }
    val bestD = new Array[Double](k)
    var i = 0
    while (i < n) {
      var filled = 0
      var j = 0
      while (j < n) {
        if (j != i) {
          val d = dist(i, j)
          if (filled < k) {
            // insertion into the sorted prefix
            var p = filled
            while (p > 0 && (bestD(p - 1) > d || (bestD(p - 1) == d && knn(i)(p - 1) > j))) {
              bestD(p) = bestD(p - 1); knn(i)(p) = knn(i)(p - 1); p -= 1
            }
            bestD(p) = d; knn(i)(p) = j
            filled += 1
          } else if (d < bestD(k - 1) || (d == bestD(k - 1) && j < knn(i)(k - 1))) {
            var p = k - 1
            while (p > 0 && (bestD(p - 1) > d || (bestD(p - 1) == d && knn(i)(p - 1) > j))) {
              bestD(p) = bestD(p - 1); knn(i)(p) = knn(i)(p - 1); p -= 1
            }
            bestD(p) = d; knn(i)(p) = j
          }
        }
        j += 1
      }
      kdist(i) = bestD(k - 1)
      i += 1
    }
    // reachability density
    val lrd = new Array[Double](n)
    i = 0
    while (i < n) {
      var sumReach = 0.0
      // reach = sqrt(max(kdist², d²)): max in squared space commutes
      // with the monotone sqrt, and applying sqrt once after the max
      // mirrors SQL's sqrt(greatest(...)) bit-for-bit
      knn(i).foreach { o => sumReach += Math.sqrt(Math.max(kdist(o), dist(i, o))) }
      lrd(i) = if (sumReach == 0.0) Double.PositiveInfinity else k / sumReach
      i += 1
    }
    val lof = new Array[Double](n)
    i = 0
    while (i < n) {
      var s = 0.0
      knn(i).foreach { o => s += lrd(o) }
      lof(i) = if (lrd(i).isInfinite) 1.0 else s / k / lrd(i)
      i += 1
    }
    lof
  }
}
