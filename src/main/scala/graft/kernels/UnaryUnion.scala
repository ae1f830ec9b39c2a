package graft.kernels

import graft.core.{FlatGeom, GeomKind}
import scala.collection.mutable.ArrayBuffer

/**
 * Unary union: dissolve a heterogeneous bag of geometry parts into
 * canonical disjoint components (the JTS `Geometry.union()` /
 * UnaryUnionOp semantics, re-derived for the flat model).
 *
 *  - polygons merge by repeated boolean union — fixed-precision via
 *    [[SnapRound]] when a grid scale is given (TestUnaryUnion.xml runs
 *    under `precisionModel scale=1.0`), floating via [[Overlay]];
 *    input-collapse linework from snap-rounding is dropped, as JTS
 *    does for union results;
 *  - linework is fully noded — split at every proper and improper
 *    crossing and at collinear-overlap endpoints, against the other
 *    lines AND the polygonal union's boundary — deduplicated, pieces
 *    covered by the polygonal union absorbed, survivors merged back
 *    into maximal chains at degree-2 nodes (the LineMerger shape);
 *  - points deduplicate and are absorbed by any higher-dimensional
 *    component.
 *
 * Reference scope note: the geo crate's BooleanOps is strictly binary
 * (geo/src/algorithm/bool_ops/mod.rs) and its runner never executes
 * TestUnaryUnion.xml; this operator extends the engine the way
 * JTS/GEOS users expect and is gated by that shipped-but-unrun corpus
 * (TestUnaryUnion.xml + TestUnaryUnionFloating.xml).
 */
object UnaryUnion {

  /** Canonical dissolved components. `polys` is a Polygon/MultiPolygon
    * (possibly empty), `lines` are merged chains (interleaved coords),
    * `points` are interleaved residual point coords. */
  final case class Result(polys: FlatGeom, lines: Seq[Array[Double]], points: Array[Double]) {
    def lineLength: Double = {
      var s = 0.0
      lines.foreach { l =>
        var i = 0
        while (i + 3 < l.length) {
          val dx = l(i + 2) - l(i); val dy = l(i + 3) - l(i + 1)
          s += Math.sqrt(dx * dx + dy * dy)
          i += 2
        }
      }
      s
    }

    /** Endpoint/vertex set of the dissolved linework. */
    def lineVertexSet: Set[(Double, Double)] = {
      val b = Set.newBuilder[(Double, Double)]
      lines.foreach { l =>
        var i = 0
        while (i + 1 < l.length) { b += ((l(i), l(i + 1))); i += 2 }
      }
      b.result()
    }

    /** Array-of-geometries form (for the `array<geom>` SQL surface):
      * the polygonal part, then one MultiLineString, then one
      * MultiPoint — empties omitted. */
    def toParts: Seq[FlatGeom] = {
      val out = new ArrayBuffer[FlatGeom](3)
      if (polys != null && !polys.isEmpty) out += polys
      if (lines.nonEmpty) out += FlatGeom.multiLineString(lines)
      if (points.nonEmpty) out += FlatGeom.multiPoint(points)
      out.toSeq
    }
  }

  def union(parts: Seq[FlatGeom], scale: Option[Double] = None): Result = {
    val snapped = scale match {
      case Some(s) => parts.map(g => SnapRound.snapGeom(g, s))
      case None => parts
    }
    val nonEmpty = snapped.filter(g => g != null && !g.isEmpty)

    // ---- polygonal union (fold single-polygon parts)
    val polyParts = nonEmpty.filter(g => Relate.dimClass(g) == 2)
      .flatMap(g => (0 until g.numParts).map(p => FlatGeom.part(g, p)))
      .filter(!_.isEmpty)
    val polyUnion: FlatGeom = polyParts.reduceOption { (a, b) =>
      scale match {
        case Some(s) => SnapRound.booleanOpFixed(a, b, Overlay.OpUnion, s).polys
        case None => Overlay.booleanOp(a, b, Overlay.OpUnion)
      }
    }.getOrElse(FlatGeom.polygon(Array.emptyDoubleArray))

    // ---- noded linework
    val lineParts = nonEmpty.filter(g => Relate.dimClass(g) == 1)
    val emit = new ArrayBuffer[Array[Double]]()  // (x1,y1,x2,y2) emitted
    lineParts.foreach { g =>
      FlatGeom.foreachRing(g) { (s, e) =>
        var i = s
        while (i < e - 1) {
          val seg = Array(g.x(i), g.y(i), g.x(i + 1), g.y(i + 1))
          if (seg(0) != seg(2) || seg(1) != seg(3)) emit += seg
          i += 1
        }
      }
    }
    // split-only segments: the polygon union's boundary
    val splitOnly = new ArrayBuffer[Array[Double]]()
    if (!polyUnion.isEmpty) FlatGeom.foreachRing(polyUnion) { (s, e) =>
      var i = s
      while (i < e - 1) {
        splitOnly += Array(polyUnion.x(i), polyUnion.y(i), polyUnion.x(i + 1), polyUnion.y(i + 1))
        i += 1
      }
    }
    val noded = nodeSegments(emit, splitOnly, scale)

    // absorption by the polygonal union: midpoint not strictly outside
    val kept = noded.filter { s =>
      polyUnion.isEmpty ||
        Planar.coordPos(polyUnion, (s(0) + s(2)) / 2, (s(1) + s(3)) / 2) == Planar.Outside
    }

    // ---- residual points
    val rawPts = new ArrayBuffer[(Double, Double)]()
    nonEmpty.filter(g => Relate.dimClass(g) == 0).foreach { g =>
      var i = 0
      while (i < g.numPoints) { rawPts += ((g.x(i), g.y(i))); i += 1 }
    }
    def onLinework(x: Double, y: Double): Boolean = noded.exists { s =>
      Math.min(s(0), s(2)) <= x && x <= Math.max(s(0), s(2)) &&
        Math.min(s(1), s(3)) <= y && y <= Math.max(s(1), s(3)) &&
        Robust.orient2d(s(0), s(1), s(2), s(3), x, y) == Robust.Collinear
    }
    val pts = rawPts.distinct.filter { case (x, y) =>
      (polyUnion.isEmpty || Planar.coordPos(polyUnion, x, y) == Planar.Outside) &&
        !onLinework(x, y)
    }

    Result(polyUnion, mergeChains(kept), pts.toArray.flatMap(p => Array(p._1, p._2)))
  }

  /** Node a segment set: split every emitted segment at its crossings
    * with every other segment (emitted or split-only), including
    * collinear-overlap endpoints, then deduplicate canonical pieces.
    * Iterates to a fixpoint because snapped split points can introduce
    * new crossings (MCIndexSnapRounder's loop, bounded). */
  private[kernels] def nodeSegments(emit: ArrayBuffer[Array[Double]],
      splitOnly: ArrayBuffer[Array[Double]],
      scale: Option[Double]): Seq[Array[Double]] = {
    // array-backed throughout: the pair loop below does indexed reads,
    // and a Seq that degrades to List would make them O(n) each
    // (measured O(n³) wall on GEOS-ticket linework before this)
    var cur: Array[Array[Double]] = emit.toArray
    var round = 0
    var changed = true
    while (changed && round < 4) {
      changed = false
      round += 1
      val cuts = Array.fill(cur.length)(new ArrayBuffer[(Double, Double)]())
      def addCut(i: Int, x: Double, y: Double): Unit = {
        val s = cur(i)
        val interior = !((x == s(0) && y == s(1)) || (x == s(2) && y == s(3)))
        if (interior &&
            Math.min(s(0), s(2)) <= x && x <= Math.max(s(0), s(2)) &&
            Math.min(s(1), s(3)) <= y && y <= Math.max(s(1), s(3))) {
          cuts(i) += ((x, y))
          changed = true
        }
      }
      def snapPt(x: Double, y: Double): (Double, Double) = scale match {
        case Some(sc) => (SnapRound.snap(x, sc), SnapRound.snap(y, sc))
        case None => (x, y)
      }
      val all: Array[Array[Double]] = cur ++ splitOnly
      val nCur = cur.length
      // x-sweep prune: visit pairs in min-x order and stop the inner
      // scan once the next candidate starts past this segment's max-x
      val order = all.indices.toArray.map(i =>
        (Math.min(all(i)(0), all(i)(2)), i)).sortBy(_._1).map(_._2)
      var oi = 0
      while (oi < order.length) {
        val i = order(oi)
        val a = all(i)
        val amaxx = Math.max(a(0), a(2))
        var oj = oi + 1
        var live = true
        while (oj < order.length && live) {
          val j = order(oj)
          val b = all(j)
          if (Math.min(b(0), b(2)) > amaxx) live = false
          else if (i < nCur || j < nCur) {
            val r = SegIntersect.intersection(a(0), a(1), a(2), a(3), b(0), b(1), b(2), b(3))
            if (r.kind == SegIntersect.SinglePointProper ||
                r.kind == SegIntersect.SinglePointImproper) {
              val (x, y) = snapPt(r.x0, r.y0)
              if (i < nCur) addCut(i, x, y)
              if (j < nCur) addCut(j, x, y)
            } else if (r.kind == SegIntersect.CollinearOverlap) {
              val (x0, y0) = snapPt(r.x0, r.y0)
              val (x1, y1) = snapPt(r.x1, r.y1)
              if (i < nCur) { addCut(i, x0, y0); addCut(i, x1, y1) }
              if (j < nCur) { addCut(j, x0, y0); addCut(j, x1, y1) }
            }
          }
          oj += 1
        }
        oi += 1
      }
      if (changed) {
        val next = new ArrayBuffer[Array[Double]]()
        var k = 0
        while (k < cur.length) {
          val s = cur(k)
          if (cuts(k).isEmpty) next += s
          else {
            // order cuts along the segment by the dominant axis
            val useX = Math.abs(s(2) - s(0)) >= Math.abs(s(3) - s(1))
            val asc = if (useX) s(2) >= s(0) else s(3) >= s(1)
            val ordered = cuts(k).distinct.sortBy { case (x, y) =>
              val v = if (useX) x else y
              if (asc) v else -v
            }
            var px = s(0); var py = s(1)
            (ordered :+ ((s(2), s(3)))).foreach { case (x, y) =>
              if (x != px || y != py) next += Array(px, py, x, y)
              px = x; py = y
            }
          }
          k += 1
        }
        cur = next.toArray
      }
    }
    // canonical dedupe (undirected)
    val seen = scala.collection.mutable.LinkedHashSet[(Double, Double, Double, Double)]()
    cur.foreach { s =>
      val k =
        if (s(0) < s(2) || (s(0) == s(2) && s(1) <= s(3))) (s(0), s(1), s(2), s(3))
        else (s(2), s(3), s(0), s(1))
      if (k._1 != k._3 || k._2 != k._4) seen += k
    }
    seen.toSeq.map(k => Array(k._1, k._2, k._3, k._4))
  }

  /** Merge noded segments into maximal chains, breaking at nodes of
    * degree != 2 (JTS LineMerger behaviour); leftover cycles emit as
    * closed chains. */
  private[kernels] def mergeChains(segs: Seq[Array[Double]]): Seq[Array[Double]] = {
    if (segs.isEmpty) return Nil
    val adj = scala.collection.mutable.LinkedHashMap[(Double, Double), ArrayBuffer[Int]]()
    segs.zipWithIndex.foreach { case (s, i) =>
      adj.getOrElseUpdate((s(0), s(1)), new ArrayBuffer[Int]()) += i
      adj.getOrElseUpdate((s(2), s(3)), new ArrayBuffer[Int]()) += i
    }
    val used = new Array[Boolean](segs.length)
    val out = new ArrayBuffer[Array[Double]]()
    def other(i: Int, p: (Double, Double)): (Double, Double) = {
      val s = segs(i)
      if (s(0) == p._1 && s(1) == p._2) (s(2), s(3)) else (s(0), s(1))
    }
    def walk(start: (Double, Double), first: Int): Unit = {
      val coords = new ArrayBuffer[Double]()
      coords += start._1 += start._2
      var prev = start
      var seg = first
      var cont = true
      while (cont) {
        used(seg) = true
        val nxt = other(seg, prev)
        coords += nxt._1 += nxt._2
        val inc = adj(nxt)
        if (inc.length == 2) {
          val n2 = inc.find(k => !used(k))
          if (n2.isDefined) { prev = nxt; seg = n2.get } else cont = false
        } else cont = false
      }
      out += coords.toArray
    }
    adj.foreach { case (p, inc) =>
      if (inc.length != 2) inc.foreach(i => if (!used(i)) walk(p, i))
    }
    // remaining pure cycles
    segs.indices.foreach { i =>
      if (!used(i)) walk((segs(i)(0), segs(i)(1)), i)
    }
    out.toSeq
  }
}
