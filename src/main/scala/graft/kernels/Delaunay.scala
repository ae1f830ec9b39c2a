package graft.kernels

import graft.core.{FlatGeom, GeomKind}

import scala.collection.mutable.ArrayBuffer

/**
 * Delaunay triangulation — the engine analogue of the reference's
 * `TriangulateSpade` (geo/src/algorithm/triangulate_spade.rs:96, which
 * delegates to the spade crate):
 *
 *  - [[unconstrained]]: Bowyer-Watson incremental insertion over the
 *    DISTINCT points of any geometry (super-triangle start, cavity
 *    re-triangulation per insertion).
 *  - [[constrained]]: constrained Delaunay of a polygon (with holes):
 *    start from the robust ear-clipping triangulation ([[Earcut]]),
 *    then apply Lawson edge flips until every non-boundary edge
 *    satisfies the empty-circumcircle test. Lawson flipping inside a
 *    fixed domain converges to the constrained Delaunay triangulation;
 *    polygon edges are never flipped because boundary edges belong to
 *    a single triangle.
 *
 * Predicates: orientation uses the exact [[Robust.orient2d]]; incircle
 * is the standard 3×3 lifted determinant in doubles with a relative
 * error guard (ties count as "not violating", so flipping terminates).
 */
object Delaunay {

  /** In-circle test: > 0 when d is strictly inside the circumcircle of
    * CCW triangle (a,b,c). Plain double determinant with magnitude
    * guard: results within the error envelope are treated as 0. */
  def inCircle(ax: Double, ay: Double, bx: Double, by: Double,
      cx: Double, cy: Double, dx: Double, dy: Double): Double = {
    val adx = ax - dx; val ady = ay - dy
    val bdx = bx - dx; val bdy = by - dy
    val cdx = cx - dx; val cdy = cy - dy
    val ad = adx * adx + ady * ady
    val bd = bdx * bdx + bdy * bdy
    val cd = cdx * cdx + cdy * cdy
    val det = adx * (bdy * cd - bd * cdy) -
      ady * (bdx * cd - bd * cdx) +
      ad * (bdx * cdy - bdy * cdx)
    val mag = Math.abs(adx * bdy * cd) + Math.abs(adx * bd * cdy) +
      Math.abs(ady * bdx * cd) + Math.abs(ady * bd * cdx) +
      Math.abs(ad * bdx * cdy) + Math.abs(ad * bdy * cdx)
    if (Math.abs(det) <= 1e-12 * mag) 0.0 else det
  }

  /** Unconstrained Delaunay of the geometry's distinct points.
    * Returns flat triangles (6 doubles each), CCW. */
  def unconstrained(g: FlatGeom): Array[Array[Double]] = {
    val seen = scala.collection.mutable.LinkedHashSet[(Double, Double)]()
    var i = 0
    while (i < g.numPoints) { seen.add((g.x(i), g.y(i))); i += 1 }
    triangulatePoints(seen.toArray)
  }

  /** Bowyer-Watson over distinct points. */
  def triangulatePoints(pts: Array[(Double, Double)]): Array[Array[Double]] = {
    val n = pts.length
    if (n < 3) return Array.empty
    // super-triangle enclosing everything
    var minX = Double.PositiveInfinity; var maxX = Double.NegativeInfinity
    var minY = Double.PositiveInfinity; var maxY = Double.NegativeInfinity
    pts.foreach { case (x, y) =>
      if (x < minX) minX = x; if (x > maxX) maxX = x
      if (y < minY) minY = y; if (y > maxY) maxY = y
    }
    val d = Math.max(maxX - minX, maxY - minY) * 16 + 1.0
    val cx = (minX + maxX) / 2; val cy = (minY + maxY) / 2
    val sp = Array((cx - d, cy - d), (cx + d, cy - d), (cx, cy + d))
    val px = new ArrayBuffer[Double](n + 3)
    val py = new ArrayBuffer[Double](n + 3)
    sp.foreach { case (x, y) => px += x; py += y }
    pts.foreach { case (x, y) => px += x; py += y }

    // triangles as vertex-index triples (CCW)
    final case class Tri(a: Int, b: Int, c: Int)
    var tris = ArrayBuffer(Tri(0, 1, 2))
    var pi = 3
    while (pi < px.length) {
      val x = px(pi); val y = py(pi)
      // find triangles whose circumcircle contains the point
      val bad = tris.filter(t =>
        inCircle(px(t.a), py(t.a), px(t.b), py(t.b), px(t.c), py(t.c), x, y) > 0)
      if (bad.isEmpty) {
        // on/outside every circle (degenerate tie) — locate the
        // containing triangle and split it to keep coverage
        val cont = tris.find { t =>
          Robust.orient2d(px(t.a), py(t.a), px(t.b), py(t.b), x, y) >= 0 &&
          Robust.orient2d(px(t.b), py(t.b), px(t.c), py(t.c), x, y) >= 0 &&
          Robust.orient2d(px(t.c), py(t.c), px(t.a), py(t.a), x, y) >= 0
        }
        cont.foreach { t =>
          tris -= t
          tris += Tri(t.a, t.b, pi); tris += Tri(t.b, t.c, pi); tris += Tri(t.c, t.a, pi)
        }
      } else {
        // cavity boundary = edges appearing in exactly one bad triangle
        val edgeCount = scala.collection.mutable.Map[(Int, Int), Int]()
        def key(u: Int, v: Int) = if (u < v) (u, v) else (v, u)
        bad.foreach { t =>
          Seq((t.a, t.b), (t.b, t.c), (t.c, t.a)).foreach { case (u, v) =>
            edgeCount(key(u, v)) = edgeCount.getOrElse(key(u, v), 0) + 1
          }
        }
        val badSet = bad.toSet
        tris = tris.filterNot(badSet.contains)
        bad.foreach { t =>
          Seq((t.a, t.b), (t.b, t.c), (t.c, t.a)).foreach { case (u, v) =>
            if (edgeCount(key(u, v)) == 1) {
              // keep CCW: (u, v, pi) is CCW when pi is left of u→v
              if (Robust.orient2d(px(u), py(u), px(v), py(v), px(pi), py(pi)) > 0)
                tris += Tri(u, v, pi)
              else tris += Tri(v, u, pi)
            }
          }
        }
      }
      pi += 1
    }
    // drop triangles touching the super-triangle
    tris.filter(t => t.a >= 3 && t.b >= 3 && t.c >= 3)
      .map(t => Array(px(t.a), py(t.a), px(t.b), py(t.b), px(t.c), py(t.c)))
      .toArray
  }

  /** Constrained Delaunay of a polygon (with holes): ear-clipping
    * triangulation + Lawson flips on interior edges. */
  def constrained(g: FlatGeom): Array[Array[Double]] = {
    if (g.kind == GeomKind.MultiPolygon) {
      val out = ArrayBuffer[Array[Double]]()
      FlatGeom.foreachPart(g) { (p, _, _) =>
        out ++= constrained(FlatGeom.part(g, p))
      }
      return out.toArray
    }
    val base = Shapes.earcut(g)
    lawsonFlip(base)
  }

  /** Lawson flip loop over a triangle soup: interior edges (shared by
    * exactly two triangles) that fail the empty-circumcircle test are
    * flipped until none remain (capped to stay safe on degenerate
    * inputs). */
  def lawsonFlip(trisIn: Array[Array[Double]]): Array[Array[Double]] = {
    // triangles as point arrays; vertex interning for edge identity
    val tris = ArrayBuffer.from(trisIn.map(_.clone))
    val maxRounds = Math.max(16, tris.length * tris.length)
    var round = 0
    var flipped = true
    while (flipped && round < maxRounds) {
      flipped = false
      round += 1
      // index edges
      val edges = scala.collection.mutable.Map[((Double, Double), (Double, Double)), List[Int]]()
      def ekey(x1: Double, y1: Double, x2: Double, y2: Double) = {
        val p = (x1, y1); val q = (x2, y2)
        if (p._1 < q._1 || (p._1 == q._1 && p._2 <= q._2)) (p, q) else (q, p)
      }
      tris.indices.foreach { ti =>
        val t = tris(ti)
        var e = 0
        while (e < 3) {
          val k = ekey(t(2 * e), t(2 * e + 1), t((2 * e + 2) % 6), t((2 * e + 3) % 6))
          edges(k) = ti :: edges.getOrElse(k, Nil)
          e += 1
        }
      }
      val it = edges.iterator
      var done = false
      while (it.hasNext && !done) {
        val (k, owners) = it.next()
        if (owners.length == 2) {
          val (t1i, t2i) = (owners.head, owners(1))
          val t1 = tris(t1i); val t2 = tris(t2i)
          // opposite vertices
          def opposite(t: Array[Double]): Option[(Double, Double)] = {
            var e = 0
            while (e < 3) {
              val v = (t(2 * e), t(2 * e + 1))
              if (v != k._1 && v != k._2) return Some(v)
              e += 1
            }
            None
          }
          (opposite(t1), opposite(t2)) match {
            case (Some(p), Some(q)) if p != q =>
              // flip if q is inside circumcircle of t1 (oriented CCW)
              val (a, b, c) = ccw(t1)
              if (inCircle(a._1, a._2, b._1, b._2, c._1, c._2, q._1, q._2) > 0 &&
                  quadConvex(p, k._1, q, k._2)) {
                tris(t1i) = mkTri(p, k._1, q)
                tris(t2i) = mkTri(p, q, k._2)
                flipped = true
                done = true // edge map is stale — rebuild next round
              }
            case _ =>
          }
        }
      }
    }
    tris.toArray
  }

  private def ccw(t: Array[Double]): ((Double, Double), (Double, Double), (Double, Double)) = {
    val a = (t(0), t(1)); val b = (t(2), t(3)); val c = (t(4), t(5))
    if (Robust.orient2d(a._1, a._2, b._1, b._2, c._1, c._2) >= 0) (a, b, c) else (a, c, b)
  }

  private def mkTri(a: (Double, Double), b: (Double, Double), c: (Double, Double)): Array[Double] = {
    if (Robust.orient2d(a._1, a._2, b._1, b._2, c._1, c._2) >= 0)
      Array(a._1, a._2, b._1, b._2, c._1, c._2)
    else Array(a._1, a._2, c._1, c._2, b._1, b._2)
  }

  /** The quad p-u-q-v must be strictly convex for a flip to be legal. */
  private def quadConvex(p: (Double, Double), u: (Double, Double),
      q: (Double, Double), v: (Double, Double)): Boolean = {
    val o1 = Robust.orient2d(p._1, p._2, u._1, u._2, q._1, q._2)
    val o2 = Robust.orient2d(u._1, u._2, q._1, q._2, v._1, v._2)
    val o3 = Robust.orient2d(q._1, q._2, v._1, v._2, p._1, p._2)
    val o4 = Robust.orient2d(v._1, v._2, p._1, p._2, u._1, u._2)
    (o1 > 0 && o2 > 0 && o3 > 0 && o4 > 0) || (o1 < 0 && o2 < 0 && o3 < 0 && o4 < 0)
  }
}
