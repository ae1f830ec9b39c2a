package graft.kernels

import graft.core.{FlatGeom, GeomKind}
import scala.collection.mutable.{ArrayBuffer, HashMap => MHashMap}

/**
 * Boolean operations on polygons — intersection / union / difference /
 * symmetric difference (the reference's BooleanOps,
 * geo/src/algorithm/bool_ops/mod.rs:34-196, which delegates to the
 * i_overlay crate). Re-derived from the classical planar-overlay
 * construction (Margalit & Knott 1989; Martinez-Rueda 2009 family):
 *
 *  1. orient rings interior-left (exterior CCW, holes CW);
 *  2. split every edge at every robust A×B intersection (each pair
 *     computed once, so cut points are bit-identical on both edges);
 *  3. classify each sub-edge midpoint In/On/Out of the other polygon;
 *     On-edges are matched with their partner to "shared same/opposite
 *     direction";
 *  4. select sub-edges per operation rule;
 *  5. trace faces by always taking the sharpest-left continuation
 *     (interior-left invariant), yielding CCW shells and CW holes;
 *  6. nest holes into shells by containment.
 */
object Overlay {

  final val OpIntersection = 0
  final val OpUnion = 1
  final val OpDifference = 2
  final val OpXor = 3

  private[graft] final case class Edge(
      x1: Double, y1: Double, x2: Double, y2: Double, source: Int)

  /** Tight tolerance: merges only ulp-twin nodes (the same junction
    * materialized by different intersection pairs differs by a few
    * ulps — ~1e-16 relative; 1e-13 leaves 3 decimal orders of head
    * room). Preserves genuine micro-slivers (robust/
    * TestRobustOverlayFloat expects an intersection whose shortest
    * side is 6.5e-5 on coordinates of magnitude 3e6 — 2.4e-11
    * relative, far below the coarse tolerance). */
  private final val EpsTight = 1e-13
  /** Coarse tolerance: absorbs NEAR-collinear shared runs (real-world
    * inputs are collinear only to ~1e-9 relative — GEOS ticket-275).
    * Only used when the tight pass signals a broken ring walk, the
    * same escalation shape as JTS OverlayNG's snapping fallback. */
  private final val EpsCoarse = 1e-9

  /** Boolean op over two polygonal geometries; returns a MultiPolygon
    * (possibly empty). */
  def booleanOp(a: FlatGeom, b: FlatGeom, op: Int): FlatGeom = op match {
    case OpXor =>
      // A△B = (A−B) ∪ (B−A) — bool_ops/mod.rs composes ops similarly
      val d1 = booleanOp(a, b, OpDifference)
      val d2 = booleanOp(b, a, OpDifference)
      if (d1.isEmpty) d2
      else if (d2.isEmpty) d1
      else booleanOp(d1, d2, OpUnion)
    case _ => overlay(a, b, op)
  }

  private def rings(g: FlatGeom): Seq[(Array[Double], Boolean)] = {
    // (ring coords, isExterior)
    val out = ArrayBuffer[(Array[Double], Boolean)]()
    g.kind match {
      case GeomKind.Polygon =>
        var r = 0
        while (r < g.rings.length) {
          out += ((sliceRing(g, r), r == 0))
          r += 1
        }
      case GeomKind.MultiPolygon =>
        var p = 0
        while (p < g.parts.length) {
          var r = g.partStart(p)
          while (r < g.partEnd(p)) {
            out += ((sliceRing(g, r), r == g.partStart(p)))
            r += 1
          }
          p += 1
        }
      case _ =>
    }
    out.toSeq
  }

  private def sliceRing(g: FlatGeom, r: Int): Array[Double] =
    java.util.Arrays.copyOfRange(g.coords, g.ringStart(r) * 2, g.ringEnd(r) * 2)

  private def reverseRing(cs: Array[Double]): Array[Double] = {
    val n = cs.length / 2
    val out = new Array[Double](cs.length)
    var i = 0
    while (i < n) { out(2 * i) = cs(2 * (n - 1 - i)); out(2 * i + 1) = cs(2 * (n - 1 - i) + 1); i += 1 }
    out
  }

  /** Directed edges with interior on the LEFT: exteriors CCW, holes CW. */
  private def orientedEdges(g: FlatGeom, source: Int): ArrayBuffer[Edge] = {
    val out = ArrayBuffer[Edge]()
    rings(g).foreach { case (ring0, isExt) =>
      if (ring0.length >= 8) {
        val w = Planar.ringWinding(ring0, 0, ring0.length / 2)
        val ring =
          if (isExt && w == Planar.CW) reverseRing(ring0)
          else if (!isExt && w == Planar.CCW) reverseRing(ring0)
          else ring0
        var i = 0
        val n = ring.length / 2
        while (i < n - 1) {
          if (ring(2 * i) != ring(2 * i + 2) || ring(2 * i + 1) != ring(2 * i + 3)) {
            out += Edge(ring(2 * i), ring(2 * i + 1), ring(2 * i + 2), ring(2 * i + 3), source)
          }
          i += 1
        }
      }
    }
    out
  }

  private def overlay(a0: FlatGeom, b0: FlatGeom, op: Int): FlatGeom = {
    if (a0.isEmpty) {
      return op match {
        case OpIntersection | OpDifference => emptyMp
        case _ => asMultiPolygon(b0)
      }
    }
    if (b0.isEmpty) {
      return op match {
        case OpIntersection => emptyMp
        case _ => asMultiPolygon(a0)
      }
    }
    // escalating-tolerance overlay (JTS OverlayNG's shape: exact first,
    // snap on failure): the tight pass preserves micro-slivers; if its
    // ring walk hits a dead end (unchainable node — the signature of a
    // junction the tight merge failed to unify), validate before
    // escalating to the coarse tolerance, which absorbs near-collinear
    // runs
    val (tightRes, dropped) = assemble(selectEdges(a0, b0, op, EpsTight))
    if (!dropped) return tightRes
    // Dead-ended fragments don't necessarily poison the assembled
    // rings: on nearly-identical inputs (GEOS pg-list) the tight pass
    // weaves the EXACT result and only spurious shared-run leftovers
    // dead-end, while the coarse pass smears the boundary by
    // eps·perimeter. Accept the tight result iff the inclusion-
    // exclusion identity holds against the tight complementary op
    // (u = a + b − i, d = a − i); a genuinely broken walk — e.g. a
    // union that lost a whole hole ring (GEOS ticket-275) — violates
    // it and still escalates.
    val aA = Planar.unsignedArea(a0)
    val aB = Planar.unsignedArea(b0)
    val slack = 1e-9 * (1.0 + aA + aB)
    val got = Planar.unsignedArea(tightRes)
    val expected = op match {
      case OpIntersection =>
        aA + aB - Planar.unsignedArea(assemble(selectEdges(a0, b0, OpUnion, EpsTight))._1)
      case OpUnion =>
        aA + aB - Planar.unsignedArea(assemble(selectEdges(a0, b0, OpIntersection, EpsTight))._1)
      case OpDifference =>
        aA - Planar.unsignedArea(assemble(selectEdges(a0, b0, OpIntersection, EpsTight))._1)
      case _ => Double.NaN
    }
    if (expected.isNaN) return assemble(selectEdges(a0, b0, op, EpsCoarse))._1
    val tightDisc = Math.abs(got - expected)
    if (tightDisc <= slack) return tightRes
    // both passes are imperfect here: the tight pass may have dropped
    // genuine sliver fragments (small discrepancy), the coarse pass
    // smears the boundary by eps·perimeter and can lose larger area
    // (GEOS-devel-2010 difference: tight off by 0.02, coarse by 1.01
    // of 18908). Keep whichever lands closer to the identity.
    val coarseRes = assemble(selectEdges(a0, b0, op, EpsCoarse))._1
    val coarseDisc = Math.abs(Planar.unsignedArea(coarseRes) - expected)
    if (tightDisc <= coarseDisc) tightRes else coarseRes
  }

  /** Steps 1-4 of the overlay construction (split + classify + select);
    * package-visible so tests can diagnose selection separately from
    * ring assembly. */
  private[graft] def selectEdges(a0: FlatGeom, b0: FlatGeom, op: Int,
      epsRel: Double = EpsCoarse): ArrayBuffer[Edge] = {
    val (subs, cls) = splitAndClassify(a0, b0, epsRel)
    repairBalance(subs, selectFrom(subs, cls, a0, b0, op, epsRel))
  }

  /** Post-selection boundary completion. A valid oriented boundary has
    * out-degree == in-degree at every node; when near-shared runs
    * weave between the two inputs, one copy's keep-decision can flip
    * mid-run and leave the selection one sub-edge short — the ring
    * walk then dead-ends and DROPS the whole ring (GEOS-ticket
    * pg-4538: union silently lost a 1853-area part; geos-737: union
    * lost the larger operand entirely). Repair by path-searching the
    * UNSELECTED sub-edges (real geometry only, nothing fabricated)
    * from each out-deficit node to an in-deficit node and adding the
    * path. Balanced selections return untouched. */
  private def repairBalance(subs: ArrayBuffer[Edge],
      selected: ArrayBuffer[Edge]): ArrayBuffer[Edge] = {
    val deg = MHashMap[(Double, Double), Int]() // out - in
    selected.foreach { e =>
      deg((e.x1, e.y1)) = deg.getOrElse((e.x1, e.y1), 0) + 1
      deg((e.x2, e.y2)) = deg.getOrElse((e.x2, e.y2), 0) - 1
    }
    var needOut = deg.iterator.filter(_._2 < 0).map(_._1).toList
    if (needOut.isEmpty) return selected
    if (deg.valuesIterator.map(Math.abs).sum > 32) return selected // too broken: give up
    val selKey = scala.collection.mutable.HashSet[(Double, Double, Double, Double)]()
    selected.foreach(e => selKey += ((e.x1, e.y1, e.x2, e.y2)))
    val byStart = MHashMap[(Double, Double), ArrayBuffer[Edge]]()
    subs.foreach { e =>
      if (!selKey((e.x1, e.y1, e.x2, e.y2)))
        byStart.getOrElseUpdate((e.x1, e.y1), ArrayBuffer()) += e
    }
    val usedRepair = scala.collection.mutable.HashSet[(Double, Double, Double, Double)]()
    needOut.foreach { q0 =>
      var deficit = -deg.getOrElse(q0, 0)
      while (deficit > 0) {
        // BFS (depth <= 6) over unselected sub-edges to an in-deficit node
        val prev = MHashMap[(Double, Double), Edge]()
        var frontier = List(q0)
        var found: Option[(Double, Double)] = None
        var depth = 0
        while (found.isEmpty && frontier.nonEmpty && depth < 6) {
          depth += 1
          val next = ArrayBuffer[(Double, Double)]()
          frontier.foreach { q =>
            byStart.getOrElse(q, ArrayBuffer()).foreach { e =>
              val k = (e.x1, e.y1, e.x2, e.y2)
              val to = (e.x2, e.y2)
              if (!usedRepair(k) && !prev.contains(to) && to != q0 && found.isEmpty) {
                prev(to) = e
                if (deg.getOrElse(to, 0) > 0) found = Some(to)
                else next += to
              }
            }
          }
          frontier = next.toList
        }
        found match {
          case Some(r) =>
            var cur = r
            while (cur != q0) {
              val e = prev(cur)
              selected += e
              usedRepair += ((e.x1, e.y1, e.x2, e.y2))
              cur = (e.x1, e.y1)
            }
            deg(q0) = deg.getOrElse(q0, 0) + 1
            deg(r) = deg.getOrElse(r, 0) - 1
            deficit -= 1
          case None => deficit = 0 // no repair path; leave as-is
        }
      }
    }
    selected
  }

  /** Steps 1-3: split at intersections, canonicalize nodes, classify
    * each sub-edge midpoint against the other polygon. */
  private[graft] def splitAndClassify(a0: FlatGeom, b0: FlatGeom,
      epsRel: Double = EpsCoarse): (ArrayBuffer[Edge], Array[Int]) = {
    val edgesA = orientedEdges(a0, 0)
    val edgesB = orientedEdges(b0, 1)
    val all = edgesA ++ edgesB

    // cut points per edge, carrying the EXACT intersection coordinates
    // (both edges must materialize bit-identical split points or ring
    // assembly cannot chain across the A/B boundary); every A×B pair is
    // evaluated once
    val cuts = Array.fill(all.length)(ArrayBuffer[(Double, Double, Double)]())
    var i = 0
    while (i < edgesA.length) {
      val e1 = all(i)
      var j = edgesA.length
      while (j < all.length) {
        val e2 = all(j)
        val r = SegIntersect.intersection(e1.x1, e1.y1, e1.x2, e1.y2, e2.x1, e2.y1, e2.x2, e2.y2)
        if (r.kind == SegIntersect.SinglePointProper || r.kind == SegIntersect.SinglePointImproper) {
          cuts(i) += ((param(e1, r.x0, r.y0), r.x0, r.y0))
          cuts(j) += ((param(e2, r.x0, r.y0), r.x0, r.y0))
        } else if (r.kind == SegIntersect.CollinearOverlap) {
          cuts(i) += ((param(e1, r.x0, r.y0), r.x0, r.y0))
          cuts(i) += ((param(e1, r.x1, r.y1), r.x1, r.y1))
          cuts(j) += ((param(e2, r.x0, r.y0), r.x0, r.y0))
          cuts(j) += ((param(e2, r.x1, r.y1), r.x1, r.y1))
        }
        // vertex-on-edge proximity noding: real-world inputs carry
        // NEAR-collinear shared runs (exactly collinear only to ~1e-9),
        // where robust intersection reports nothing but one segment's
        // endpoint lies epsilon-close to the other's interior. Cut
        // there, or the uncut edge classifies "on" as a whole and the
        // genuinely-boundary remainder is lost (GEOS ticket-275 hole).
        proximityCut(cuts(i), e1, e2.x1, e2.y1, epsRel)
        proximityCut(cuts(i), e1, e2.x2, e2.y2, epsRel)
        proximityCut(cuts(j), e2, e1.x1, e1.y1, epsRel)
        proximityCut(cuts(j), e2, e1.x2, e1.y2, epsRel)
        j += 1
      }
      i += 1
    }

    // split into sub-edges between consecutive exact cut points
    val subs0 = ArrayBuffer[Edge]()
    i = 0
    while (i < all.length) {
      val e = all(i)
      val pts = (cuts(i) ++ ArrayBuffer((0.0, e.x1, e.y1), (1.0, e.x2, e.y2)))
        .filter(c => c._1 >= 0.0 && c._1 <= 1.0)
        .sortBy(_._1)
        // dedupe identical coordinates (several pairs can cut at the
        // same point; parameters may differ in ulps)
        .foldLeft(ArrayBuffer[(Double, Double, Double)]()) { (acc, c) =>
          if (acc.nonEmpty && acc.last._2 == c._2 && acc.last._3 == c._3) acc
          else { acc += c; acc }
        }
      var k = 0
      while (k < pts.length - 1) {
        val (_, sx, sy) = pts(k)
        val (_, ex, ey) = pts(k + 1)
        if (sx != ex || sy != ey) subs0 += Edge(sx, sy, ex, ey, e.source)
        k += 1
      }
      i += 1
    }

    // canonicalize node coordinates: the same geometric junction can be
    // materialized by DIFFERENT intersection pairs at ulp-different
    // coordinates (e.g. a vertex of A lying on an edge of B cut by two
    // incident A-edges). Ring assembly chains nodes by EXACT doubles,
    // so ulp-twin nodes break the walk and silently drop rings (seen:
    // GEOS ticket-275 union losing its enclosed hole). Cluster all
    // endpoints within a relative epsilon and rewrite each sub-edge to
    // the cluster representative; collapsed edges vanish. Then re-split
    // every sub-edge at canonical nodes on its interior so both inputs
    // decompose shared runs identically (splitAtNodes doc).
    val subs = splitAtNodes(canonicalizeNodes(subs0, epsRel), epsRel)

    // classify each sub-edge against the OTHER polygon
    // 0=in, 1=on, 2=out
    val cls = new Array[Int](subs.length)
    i = 0
    while (i < subs.length) {
      val e = subs(i)
      val other = if (e.source == 0) b0 else a0
      val mx = (e.x1 + e.x2) / 2.0
      val my = (e.y1 + e.y2) / 2.0
      cls(i) = classify(other, mx, my, e, epsRel)
      i += 1
    }
    (subs, cls)
  }

  /** Step 4: the per-operation selection rule. */
  private def selectFrom(subs: ArrayBuffer[Edge], cls: Array[Int],
      a0: FlatGeom, b0: FlatGeom, op: Int, epsRel: Double): ArrayBuffer[Edge] = {
    var i = 0
    // shared-edge pairing: key by undirected endpoints
    val keyOf = (e: Edge) => {
      val k1 = (e.x1, e.y1); val k2 = (e.x2, e.y2)
      if (k1._1 < k2._1 || (k1._1 == k2._1 && k1._2 <= k2._2)) (k1, k2) else (k2, k1)
    }
    val onA = MHashMap[((Double, Double), (Double, Double)), Int]() // key -> index of A on-edge
    i = 0
    while (i < subs.length) {
      if (cls(i) == 1 && subs(i).source == 0) onA(keyOf(subs(i))) = i
      i += 1
    }

    // selection
    val selected = ArrayBuffer[Edge]()
    i = 0
    while (i < subs.length) {
      val e = subs(i)
      val c = cls(i)
      if (c == 1) {
        // handle shared edges from the A side only (keep one copy)
        if (e.source == 1) {
          onA.get(keyOf(e)) match {
            case Some(ai) =>
              val ae = subs(ai)
              val sameDir = (ae.x1 == e.x1 && ae.y1 == e.y1 && ae.x2 == e.x2 && ae.y2 == e.y2)
              val keep = op match {
                case OpIntersection => sameDir
                case OpUnion => sameDir
                case OpDifference => !sameDir
                case _ => false
              }
              if (keep) selected += ae
            case None =>
              // B-edge on A's boundary with no exact A partner (partial
              // overlap split differently) — treat by nudged midpoint
              val c2 = classifyNudged(if (e.source == 1) a0 else b0, e, epsRel)
              val keepB = op match {
                case OpIntersection => c2 == 0
                case OpUnion => c2 == 2
                case OpDifference => c2 == 0
                case _ => false
              }
              if (keepB) selected += (if (op == OpDifference) Edge(e.x2, e.y2, e.x1, e.y1, 1) else e)
          }
        } else if (!onA.contains(keyOf(e))) {
          // A-edge on B's boundary with no B partner. For union, keep
          // it unless it is strictly INSIDE B: a near-shared run whose
          // nudged probe still lands "on" is part of the union's
          // boundary, and dropping it gaps the ring walk / loses area
          // (GEOS-ticket pg-list: union of two nearly-identical
          // polygons). The B copy of such a run, if also unpaired,
          // stays subject to the strict c2 == 2 rule, so no branching.
          val c2 = classifyNudged(b0, e, epsRel)
          val keep = op match {
            case OpIntersection => c2 == 0
            case OpUnion => c2 != 0
            case OpDifference => c2 == 2
            case _ => false
          }
          if (keep) selected += e
        }
        // A-edges with B partners are emitted when scanning the B copy
      } else {
        val keep = (op, e.source, c) match {
          case (OpIntersection, 0, 0) => true // A-edge in B
          case (OpIntersection, 1, 0) => true // B-edge in A
          case (OpUnion, 0, 2) => true // A-edge out of B
          case (OpUnion, 1, 2) => true // B-edge out of A
          case (OpDifference, 0, 2) => true // A-edge out of B
          case (OpDifference, 1, 0) => true // B-edge in A (reversed)
          case _ => false
        }
        if (keep) {
          if (op == OpDifference && e.source == 1)
            selected += Edge(e.x2, e.y2, e.x1, e.y1, 1)
          else selected += e
        }
      }
      i += 1
    }

    selected
  }

  /** If point (px,py) lies within a relative epsilon of edge `e`'s
    * INTERIOR (not near either endpoint), record a cut at that point.
    * The cut carries the point's own coordinates; node
    * canonicalization merges the epsilon-twins afterwards. */
  @inline private def proximityCut(
      buf: ArrayBuffer[(Double, Double, Double)], e: Edge, px: Double, py: Double,
      epsRel: Double): Unit = {
    val eps = epsRel * (1.0 + Math.abs(px) + Math.abs(py))
    if ((Math.abs(px - e.x1) <= eps && Math.abs(py - e.y1) <= eps) ||
        (Math.abs(px - e.x2) <= eps && Math.abs(py - e.y2) <= eps)) return
    if (Planar.pointSegDistance(px, py, e.x1, e.y1, e.x2, e.y2) <= eps) {
      val t = param(e, px, py)
      if (t > 0.0 && t < 1.0) buf += ((t, px, py))
    }
  }

  /** Cluster sub-edge endpoints that are within a relative epsilon of
    * each other and rewrite every edge to its cluster representative.
    * Sweep over x-sorted distinct points; each point adopts the
    * representative of the first earlier point within eps in both
    * coordinates (transitive chains collapse to the earliest point).
    * Edges whose endpoints merge are dropped. */
  private def canonicalizeNodes(subs: ArrayBuffer[Edge], epsRel: Double): ArrayBuffer[Edge] = {
    if (subs.isEmpty) return subs
    val uniq = {
      val set = scala.collection.mutable.LinkedHashSet[(Double, Double)]()
      subs.foreach { e => set += ((e.x1, e.y1)); set += ((e.x2, e.y2)) }
      set.toArray.sortBy(p => (p._1, p._2))
    }
    val canon = MHashMap[(Double, Double), (Double, Double)]()
    var i = 0
    while (i < uniq.length) {
      val p = uniq(i)
      val eps = epsRel * (1.0 + Math.abs(p._1) + Math.abs(p._2))
      var j = i - 1
      var rep = p
      var found = false
      while (j >= 0 && !found && p._1 - uniq(j)._1 <= eps) {
        val q = uniq(j)
        if (Math.abs(q._2 - p._2) <= eps) { rep = canon(q); found = true }
        j -= 1
      }
      canon(p) = rep
      i += 1
    }
    val out = ArrayBuffer[Edge]()
    subs.foreach { e =>
      val a = canon((e.x1, e.y1))
      val b = canon((e.x2, e.y2))
      if (a != b) out += Edge(a._1, a._2, b._1, b._2, e.source)
    }
    out
  }

  /** Post-canonicalization re-noding: split every sub-edge at any
    * canonical node lying within the cluster epsilon of its INTERIOR.
    * When the two inputs split a (near-)shared run differently — A
    * into three pieces, B into one — the long piece has no exact-key
    * partner, the shared-edge pairing falls back to nudged
    * classification, and the selected edge set develops gaps that
    * dead-end the ring walk (GEOS-ticket corpus, pg-list: union of two
    * nearly-identical polygons returned EMPTY). Splitting both sides
    * at the same canonical nodes makes shared-run decompositions
    * identical, so pairing is exact again. */
  private def splitAtNodes(subs: ArrayBuffer[Edge], epsRel: Double): ArrayBuffer[Edge] = {
    if (subs.isEmpty) return subs
    val nodes = {
      val set = scala.collection.mutable.LinkedHashSet[(Double, Double)]()
      subs.foreach { e => set += ((e.x1, e.y1)); set += ((e.x2, e.y2)) }
      set.toArray.sortBy(_._1)
    }
    var maxAbs = 1.0
    nodes.foreach { n => maxAbs = Math.max(maxAbs, Math.abs(n._1) + Math.abs(n._2)) }
    val epsMax = epsRel * (1.0 + maxAbs)
    val xs = nodes.map(_._1)
    def lowerBound(v: Double): Int = {
      var lo = 0; var hi = xs.length
      while (lo < hi) { val m = (lo + hi) >>> 1; if (xs(m) < v) lo = m + 1 else hi = m }
      lo
    }
    val out = ArrayBuffer[Edge]()
    val cuts = ArrayBuffer[(Double, Double, Double)]() // (t, x, y)
    subs.foreach { e =>
      cuts.clear()
      val minx = Math.min(e.x1, e.x2) - epsMax
      val maxx = Math.max(e.x1, e.x2) + epsMax
      var k = lowerBound(minx)
      val dx = e.x2 - e.x1
      val dy = e.y2 - e.y1
      val len2 = dx * dx + dy * dy
      while (k < nodes.length && xs(k) <= maxx) {
        val (nx, ny) = nodes(k)
        if (!(nx == e.x1 && ny == e.y1) && !(nx == e.x2 && ny == e.y2) && len2 > 0) {
          val t = ((nx - e.x1) * dx + (ny - e.y1) * dy) / len2
          if (t > 0 && t < 1) {
            val px = e.x1 + t * dx
            val py = e.y1 + t * dy
            val ddx = nx - px
            val ddy = ny - py
            val eps = epsRel * (1.0 + Math.abs(nx) + Math.abs(ny))
            if (ddx * ddx + ddy * ddy <= eps * eps) cuts += ((t, nx, ny))
          }
        }
        k += 1
      }
      if (cuts.isEmpty) out += e
      else {
        val ordered = cuts.sortBy(_._1)
        var px = e.x1; var py = e.y1
        ordered.foreach { case (_, x, y) =>
          if (x != px || y != py) out += Edge(px, py, x, y, e.source)
          px = x; py = y
        }
        if (px != e.x2 || py != e.y2) out += Edge(px, py, e.x2, e.y2, e.source)
      }
    }
    out
  }

  private val emptyMp = FlatGeom.multiPolygon(Nil)

  private def asMultiPolygon(g: FlatGeom): FlatGeom = g.kind match {
    case GeomKind.MultiPolygon => g
    case GeomKind.Polygon => FlatGeom.multiPolygon(Seq(g))
    case _ => emptyMp
  }

  @inline private def param(e: Edge, px: Double, py: Double): Double = {
    val dx = e.x2 - e.x1; val dy = e.y2 - e.y1
    if (Math.abs(dx) >= Math.abs(dy)) { if (dx == 0.0) 0.0 else (px - e.x1) / dx }
    else (py - e.y1) / dy
  }

  @inline private def pointAt(e: Edge, t: Double): (Double, Double) = {
    if (t == 0.0) (e.x1, e.y1)
    else if (t == 1.0) (e.x2, e.y2)
    else (e.x1 + t * (e.x2 - e.x1), e.y1 + t * (e.y2 - e.y1))
  }

  /** 0=in 1=on 2=out, tolerant near the boundary. */
  private def classify(g: FlatGeom, x: Double, y: Double, e: Edge, epsRel: Double): Int = {
    val tol = epsRel * (1.0 + Math.abs(x) + Math.abs(y))
    var best = Double.PositiveInfinity
    FlatGeom.foreachRing(g) { (s, en) =>
      var i = s
      while (i < en - 1) {
        val d = Planar.pointSegDistance(x, y, g.x(i), g.y(i), g.x(i + 1), g.y(i + 1))
        if (d < best) best = d
        i += 1
      }
    }
    if (best <= tol) 1
    else Planar.coordPos(g, x, y) match {
      case Planar.Inside => 0
      case Planar.OnBoundary => 1
      case _ => 2
    }
  }

  /** For an on-boundary edge, nudge the midpoint to the edge's LEFT
    * (its interior side) and classify that — decides whether the
    * interiors locally agree. */
  private def classifyNudged(other: FlatGeom, e: Edge, epsRel: Double): Int = {
    val mx = (e.x1 + e.x2) / 2.0
    val my = (e.y1 + e.y2) / 2.0
    val len = Math.hypot(e.x2 - e.x1, e.y2 - e.y1)
    if (len == 0) return 2
    // nudge two decades past the pass's boundary fuzz: far enough to
    // clear it, close enough not to leap over sub-sliver features
    val eps = (epsRel * 100) * (1.0 + Math.abs(mx) + Math.abs(my))
    val nx = -(e.y2 - e.y1) / len * eps
    val ny = (e.x2 - e.x1) / len * eps
    Planar.coordPos(other, mx + nx, my + ny) match {
      case Planar.Inside => 0
      case Planar.OnBoundary => 1
      case _ => 2
    }
  }

  /** Trace faces from interior-left edges: at each node continue with
    * the sharpest-left outgoing edge; CCW rings = shells, CW = holes;
    * assign holes to containing shells. */
  /** Returns (result, dropped): `dropped` is true when any ring walk
    * dead-ended and its partial ring was discarded — the tight-pass
    * failure signal that triggers the coarse-tolerance retry. */
  private[graft] def assemble(edges: ArrayBuffer[Edge]): (FlatGeom, Boolean) = {
    var droppedAny = false
    if (edges.isEmpty) return (emptyMp, false)
    val used = new Array[Boolean](edges.length)
    val byStart = MHashMap[(Double, Double), ArrayBuffer[Int]]()
    var i = 0
    while (i < edges.length) {
      byStart.getOrElseUpdate((edges(i).x1, edges(i).y1), ArrayBuffer()) += i
      i += 1
    }

    val ringsOut = ArrayBuffer[Array[Double]]()
    i = 0
    while (i < edges.length) {
      if (!used(i)) {
        val ring = ArrayBuffer[Double]()
        var cur = i
        var guard = edges.length + 5
        var closed = false
        ring += edges(i).x1; ring += edges(i).y1
        while (!closed && guard > 0) {
          guard -= 1
          used(cur) = true
          val e = edges(cur)
          ring += e.x2; ring += e.y2
          if (e.x2 == edges(i).x1 && e.y2 == edges(i).y1 && ring.length >= 8) {
            closed = true
          } else {
            val outs = byStart.getOrElse((e.x2, e.y2), ArrayBuffer()).filter(k => !used(k))
            if (outs.isEmpty) {
              if (System.getenv("GRAFT_OVERLAY_DEBUG") != null)
                System.err.println(s"[assemble] dead end at (${e.x2},${e.y2}) ringLen=${ring.length / 2}")
              closed = true; ring.clear(); droppedAny = true
            } // dead end: drop
            else if (outs.length == 1) cur = outs(0)
            else {
              // sharpest left turn relative to incoming direction
              val inAng = Math.atan2(e.y2 - e.y1, e.x2 - e.x1)
              var bestK = outs(0)
              var bestTurn = Double.PositiveInfinity
              outs.foreach { k =>
                val o = edges(k)
                val outAng = Math.atan2(o.y2 - o.y1, o.x2 - o.x1)
                // turn angle measured clockwise from incoming dir, in (0, 2π]
                var turn = inAng + Math.PI - outAng
                while (turn <= 0) turn += 2 * Math.PI
                while (turn > 2 * Math.PI) turn -= 2 * Math.PI
                if (turn < bestTurn) { bestTurn = turn; bestK = k }
              }
              cur = bestK
            }
          }
        }
        if (ring.length >= 8) ringsOut += ring.toArray
      }
      i += 1
    }

    // filter degenerate (zero-area) rings
    val real = ringsOut.filter(r => Math.abs(Planar.twiceSignedRingArea(r, 0, r.length / 2)) > 0)
    if (real.isEmpty) return (emptyMp, droppedAny)
    val shells = ArrayBuffer[Array[Double]]()
    val holes = ArrayBuffer[Array[Double]]()
    real.foreach { r =>
      if (Planar.ringWinding(r, 0, r.length / 2) == Planar.CCW) shells += r else holes += r
    }
    if (shells.isEmpty) return (emptyMp, droppedAny)
    // Assign each hole to the smallest STRICTLY containing shell. A
    // hole may touch a candidate shell's boundary at shared nodes
    // (e.g. a shell nested inside the hole of a sibling part sharing a
    // vertex), so the test point must be a hole point that is NOT on
    // that shell's boundary: probe vertices then edge midpoints until
    // one classifies strictly Inside/Outside.
    val shellPolys = shells.map(s => FlatGeom.polygon(s))
    val holeAssign = Array.fill(shells.length)(ArrayBuffer[Array[Double]]())
    holes.foreach { h =>
      val n = h.length / 2
      def strictlyInside(shell: FlatGeom): Boolean = {
        var i = 0
        while (i < n) {
          Planar.coordPos(shell, h(2 * i), h(2 * i + 1)) match {
            case Planar.Inside => return true
            case Planar.Outside => return false
            case _ => ()
          }
          i += 1
        }
        i = 0
        while (i < n - 1) {
          val mx = (h(2 * i) + h(2 * i + 2)) / 2.0
          val my = (h(2 * i + 1) + h(2 * i + 3)) / 2.0
          Planar.coordPos(shell, mx, my) match {
            case Planar.Inside => return true
            case Planar.Outside => return false
            case _ => ()
          }
          i += 1
        }
        false // every probe on the boundary: hole coincides with shell
      }
      var best = -1
      var bestArea = Double.PositiveInfinity
      var s = 0
      while (s < shellPolys.length) {
        if (strictlyInside(shellPolys(s))) {
          val ar = Planar.unsignedArea(shellPolys(s))
          if (ar < bestArea) { bestArea = ar; best = s }
        }
        s += 1
      }
      if (best >= 0) holeAssign(best) += h
    }
    (FlatGeom.multiPolygon(shells.indices.map(s =>
      FlatGeom.polygon(shells(s), holeAssign(s).toSeq))), droppedAny)
  }

  // ------------------------------------------------------ line clip

  /** 1-D boolean: clip the line parts of `line` by polygon `poly`
    * (bool_ops/mod.rs:86-106 clip): invert=false keeps parts inside,
    * invert=true keeps parts outside. */
  def clip(poly: FlatGeom, line: FlatGeom, invert: Boolean): FlatGeom = {
    val pieces = ArrayBuffer[Array[Double]]()
    var cur = ArrayBuffer[Double]()
    def flush(): Unit = {
      if (cur.length >= 4) pieces += cur.toArray
      cur = ArrayBuffer[Double]()
    }
    FlatGeom.foreachRing(line) { (s, e) =>
      var i = s
      while (i < e - 1) {
        val x1 = line.x(i); val y1 = line.y(i); val x2 = line.x(i + 1); val y2 = line.y(i + 1)
        // split this segment at poly boundary crossings
        val ts = ArrayBuffer(0.0, 1.0)
        FlatGeom.foreachRing(poly) { (ps, pe) =>
          var j = ps
          while (j < pe - 1) {
            val r = SegIntersect.intersection(x1, y1, x2, y2,
              poly.x(j), poly.y(j), poly.x(j + 1), poly.y(j + 1))
            if (r.kind == SegIntersect.SinglePointProper || r.kind == SegIntersect.SinglePointImproper) {
              val dx = x2 - x1; val dy = y2 - y1
              val t = if (Math.abs(dx) >= Math.abs(dy)) { if (dx == 0) 0.0 else (r.x0 - x1) / dx }
                else (r.y0 - y1) / dy
              ts += t
            } else if (r.kind == SegIntersect.CollinearOverlap) {
              val dx = x2 - x1; val dy = y2 - y1
              def tOf(px: Double, py: Double) =
                if (Math.abs(dx) >= Math.abs(dy)) { if (dx == 0) 0.0 else (px - x1) / dx }
                else (py - y1) / dy
              ts += tOf(r.x0, r.y0); ts += tOf(r.x1, r.y1)
            }
            j += 1
          }
        }
        val sorted = ts.filter(t => t >= 0 && t <= 1).distinct.sorted
        var k = 0
        while (k < sorted.length - 1) {
          val t0 = sorted(k); val t1 = sorted(k + 1)
          val sx = x1 + t0 * (x2 - x1); val sy = y1 + t0 * (y2 - y1)
          val ex = x1 + t1 * (x2 - x1); val ey = y1 + t1 * (y2 - y1)
          val mx = (sx + ex) / 2.0; val my = (sy + ey) / 2.0
          val inside = Planar.coordPos(poly, mx, my) != Planar.Outside
          if (inside != invert) {
            if (cur.isEmpty || cur(cur.length - 2) != sx || cur(cur.length - 1) != sy) {
              flush()
              cur += sx; cur += sy
            }
            cur += ex; cur += ey
          } else flush()
          k += 1
        }
        i += 1
      }
      flush()
    }
    flush()
    // JTS/i_overlay semantics: the clipped linework is DEDUPLICATED —
    // a line that traverses the same span twice contributes it once.
    // Explode pieces into direction-normalized segments, drop exact
    // duplicates, and chain consecutive segments back into lines.
    val segSet = scala.collection.mutable.LinkedHashSet[(Double, Double, Double, Double)]()
    pieces.foreach { cs =>
      var k = 0
      while (k < cs.length - 2) {
        val (ax, ay, bx, by) = (cs(k), cs(k + 1), cs(k + 2), cs(k + 3))
        if (!(ax == bx && ay == by)) {
          segSet += (if (ax < bx || (ax == bx && ay <= by)) (ax, ay, bx, by)
                     else (bx, by, ax, ay))
        }
        k += 2
      }
    }
    // chain segments: walk from endpoints with degree 1, then leftovers
    val succ = scala.collection.mutable.Map[(Double, Double), ArrayBuffer[(Double, Double, Double, Double)]]()
    segSet.foreach { sgm =>
      succ.getOrElseUpdate((sgm._1, sgm._2), ArrayBuffer.empty) += sgm
      succ.getOrElseUpdate((sgm._3, sgm._4), ArrayBuffer.empty) += sgm
    }
    val used = scala.collection.mutable.HashSet[(Double, Double, Double, Double)]()
    val chains = ArrayBuffer[Array[Double]]()
    def walk(startSeg: (Double, Double, Double, Double), from: (Double, Double)): Unit = {
      val chain = ArrayBuffer[Double](from._1, from._2)
      var seg = startSeg
      var at = from
      var done = false
      while (!done) {
        used += seg
        val next = if ((seg._1, seg._2) == at) (seg._3, seg._4) else (seg._1, seg._2)
        chain += next._1; chain += next._2
        at = next
        succ(at).find(c => !used.contains(c)) match {
          case Some(c) => seg = c
          case None => done = true
        }
      }
      chains += chain.toArray
    }
    // prefer starting at odd-degree endpoints (open chain ends)
    segSet.foreach { sgm =>
      if (!used.contains(sgm)) {
        val d1 = succ((sgm._1, sgm._2)).count(c => !used.contains(c))
        val d2 = succ((sgm._3, sgm._4)).count(c => !used.contains(c))
        if (d1 == 1) walk(sgm, (sgm._1, sgm._2))
        else if (d2 == 1) walk(sgm, (sgm._3, sgm._4))
      }
    }
    segSet.foreach { sgm => if (!used.contains(sgm)) walk(sgm, (sgm._1, sgm._2)) }
    FlatGeom.multiLineString(chains.toSeq)
  }

  /** n-way union by left fold (the tree-aggregation shape used by the
    * distributed union aggregate; bool_ops/mod.rs:152 unary_union). */
  def unaryUnion(gs: Seq[FlatGeom]): FlatGeom =
    gs.filterNot(_.isEmpty).foldLeft(emptyMp)((acc, g) => booleanOp(acc, g, OpUnion))

  /** Balanced pairwise union (the CascadedPolygonUnion shape): depth
    * O(log n) instead of the linear fold's O(n), which keeps
    * intermediate results small and is the collapse step of the
    * distributed union aggregate. */
  def treeUnion(gs: Seq[FlatGeom]): FlatGeom = {
    var layer = gs.filterNot(_.isEmpty).toIndexedSeq
    if (layer.isEmpty) return emptyMp
    while (layer.length > 1) {
      layer = layer.grouped(2).map {
        case Seq(a, b) => booleanOp(a, b, OpUnion)
        case Seq(a)    => a
      }.toIndexedSeq
    }
    layer.head
  }
}
