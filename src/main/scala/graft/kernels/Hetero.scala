package graft.kernels

import graft.core.FlatGeom
import scala.collection.mutable.{ArrayBuffer, LinkedHashSet}

/**
 * Heterogeneous boolean operations: union / intersection / difference /
 * symmetric difference over operands of ANY dimension mix — points,
 * lines, polygons, and collections thereof — with dimension-separated
 * results (the JTS OverlayNG mixed-input semantics).
 *
 * BEYOND the reference: the geo crate's BooleanOps is polygon×polygon
 * plus a 1-D line clip only (geo/src/algorithm/bool_ops/mod.rs:86-106),
 * and its test runner rejects point/line-operand overlay outright
 * (jts-test-runner/src/input.rs:434-439). This kernel extends the
 * engine to the full OGC point-set semantics and is gated by the
 * shipped-but-unrun corpora (TestNGOverlayP/L, TestOverlayPP,
 * TestOverlayEmpty, TestNGOverlayEmpty, …).
 *
 * Construction (per op, all arithmetic shared with the homogeneous
 * kernels so results are consistent with them):
 *  - 2-D: fold each side's polygonal parts with [[Overlay]] (or
 *    [[SnapRound]] under a fixed grid), then apply the binary op;
 *  - 1-D: node each side's linework against the other side's linework
 *    AND both polygonal boundaries ([[UnaryUnion.nodeSegments]] — both
 *    sides then decompose shared runs identically), select noded
 *    pieces by midpoint classification, absorb pieces covered by the
 *    2-D result, merge survivors back into maximal chains;
 *  - 0-D: point-set membership against the other operand's closure,
 *    plus isolated proper/improper crossing points between the two
 *    sides' 1-D noded pools and polygon boundaries (intersection
 *    only), absorbed by any higher-dimensional result component.
 *
 * Union delegates to [[UnaryUnion]] (same semantics by definition);
 * symmetric difference composes the two differences and dissolves.
 */
object Hetero {

  import UnaryUnion.Result

  private def emptyPoly = FlatGeom.polygon(Array.emptyDoubleArray)
  private def emptyResult = Result(emptyPoly, Nil, Array.emptyDoubleArray)

  def booleanOp(aParts0: Seq[FlatGeom], bParts0: Seq[FlatGeom], op: Int,
      scale: Option[Double] = None): Result = {
    // fixed precision: only 0-D operands pre-snap — line and polygon
    // structure must reach the hot-pixel noders UNROUNDED (JTS
    // MCIndexSnapRounder nodes original coordinates against the pixel
    // set, then rounds; pre-snapping destroys near-miss crossings)
    def prep(ps: Seq[FlatGeom]): Seq[FlatGeom] = ps
      .filter(_ != null)
      .map { g =>
        scale match {
          case Some(s) if Relate.dimClass(g) == 0 => SnapRound.snapGeom(g, s)
          case _ => g
        }
      }
      .filter(g => g != null && !g.isEmpty)
    val aParts = prep(aParts0)
    val bParts = prep(bParts0)
    op match {
      case Overlay.OpUnion => dissolve(aParts ++ bParts, scale)
      case Overlay.OpXor =>
        // A△B = (A−B) ∪ (B−A), dissolved (JTS symDifference composition)
        val d1 = overlayCore(aParts, bParts, Overlay.OpDifference, scale)
        val d2 = overlayCore(bParts, aParts, Overlay.OpDifference, scale)
        dissolve(d1.toParts ++ d2.toParts, scale)
      case _ => overlayCore(aParts, bParts, op, scale)
    }
  }

  /** Union-dissolve. Fixed precision over pure 0/1-D inputs goes
    * through the segment snap-rounder (near-miss runs collapse onto
    * shared hot pixels — JTS PrecisionModel FIXED semantics); anything
    * else delegates to [[UnaryUnion]]. */
  private def dissolve(parts: Seq[FlatGeom], scale: Option[Double]): Result =
    scale match {
      case Some(s) if parts.nonEmpty && parts.forall(g => Relate.dimClass(g) <= 1) =>
        fixedLowDimUnion(segsOf(parts).toSeq,
          pointsOf(parts.filter(g => Relate.dimClass(g) == 0)), s, emptyPoly)
      case Some(s) if parts.nonEmpty =>
        // mixed with 2-D: fold polygonal parts through the fixed
        // overlay (collapse linework pooled as 1-D structure), then
        // dissolve the low-dimensional remainder and absorb what the
        // polygonal result covers
        val polyParts = parts.filter(g => Relate.dimClass(g) == 2)
          .flatMap(g => (0 until g.numParts).map(p => FlatGeom.part(g, p)))
          .filter(!_.isEmpty)
        val collapse = new ArrayBuffer[Array[Double]]()
        val rest = parts.filter(g => Relate.dimClass(g) <= 1)
        var cur = polyParts.head
        // single polygon: node against the 1-D parts' hot pixels, then
        // vertex-round (no collapse pass — JTS preserves the polygon
        // when no second area operand forces joint noding); multiple:
        // pairwise fixed folds pool their collapse linework
        if (polyParts.length == 1) {
          val lineGs = rest.filter(g => Relate.dimClass(g) == 1)
          val noded = if (lineGs.isEmpty) cur
            else SnapRound.hotPixelNode(cur,
              FlatGeom.multiLineString(chainsOf(lineGs)), s)._1
          val fr = SnapRound.reconstitute(
            SnapRound.postSnap(SnapRound.snapGeom(noded, s), s), s)
          cur = fr.polys; collapse ++= chainSegs(fr.allLines)
        } else polyParts.tail.foreach { q =>
          val fr = SnapRound.booleanOpFixed(cur, q, Overlay.OpUnion, s)
          cur = fr.polys; collapse ++= chainSegs(fr.allLines)
        }
        val sub = fixedLowDimUnion(
          (segsOf(rest.filter(g => Relate.dimClass(g) == 1)) ++ collapse).toSeq,
          pointsOf(rest.filter(g => Relate.dimClass(g) == 0)), s, cur)
        Result(cur, sub.lines, sub.points)
      case _ => UnaryUnion.union(parts, scale)
    }

  /** Fixed-precision dissolve of raw segments + points; pieces whose
    * midpoint lies strictly inside `absorb` (and points inside it or
    * on the surviving linework) are dropped. */
  private def fixedLowDimUnion(segs: Seq[Array[Double]], pts0: Seq[(Double, Double)],
      s: Double, absorb: FlatGeom): Result = {
    val pts = pts0.map { case (x, y) => (SnapRound.snap(x, s), SnapRound.snap(y, s)) }.distinct
    // node against the absorbing polygon's boundary so a piece crossing
    // it splits at the crossing — absorption is then per-piece exact
    val bsegs = if (absorb.isEmpty) Nil else chainSegs(chainsOf(Seq(absorb)))
    val noded = SnapRound.snapRoundSegments(segs, bsegs, pts, s)
    val uniq = LinkedHashSet[(Double, Double, Double, Double)]()
    noded.foreach(seg => uniq += key(seg))
    val kept = uniq.toSeq.map(k => Array(k._1, k._2, k._3, k._4)).filter { seg =>
      val mx = (seg(0) + seg(2)) / 2; val my = (seg(1) + seg(3)) / 2
      absorb.isEmpty || Planar.coordPos(absorb, mx, my) == Planar.Outside
    }
    val lines = UnaryUnion.mergeChains(kept)
    val outPts = pts.filterNot { case (x, y) =>
      (!absorb.isEmpty && Planar.coordPos(absorb, x, y) != Planar.Outside) ||
        onSegs(kept, x, y)
    }
    Result(absorb, lines, outPts.flatMap(p => Array(p._1, p._2)).toArray)
  }

  /** Convenience single-geometry surface (SQL st_overlay). */
  def booleanOp(a: FlatGeom, b: FlatGeom, op: Int): Result =
    booleanOp(Seq(a), Seq(b), op, None)

  // ------------------------------------------------ shared helpers

  private def segsOf(gs: Seq[FlatGeom]): ArrayBuffer[Array[Double]] = {
    val out = new ArrayBuffer[Array[Double]]()
    gs.foreach { g =>
      FlatGeom.foreachRing(g) { (s, e) =>
        var i = s
        while (i < e - 1) {
          if (g.x(i) != g.x(i + 1) || g.y(i) != g.y(i + 1))
            out += Array(g.x(i), g.y(i), g.x(i + 1), g.y(i + 1))
          i += 1
        }
      }
    }
    out
  }

  private def pointsOf(gs: Seq[FlatGeom]): Seq[(Double, Double)] =
    gs.flatMap(g => (0 until g.numPoints).map(i => (g.x(i), g.y(i)))).distinct

  private def key(s: Array[Double]): (Double, Double, Double, Double) =
    if (s(0) < s(2) || (s(0) == s(2) && s(1) <= s(3))) (s(0), s(1), s(2), s(3))
    else (s(2), s(3), s(0), s(1))

  @inline private def onSegs(segs: Iterable[Array[Double]], x: Double, y: Double): Boolean =
    segs.exists { s =>
      Math.min(s(0), s(2)) <= x && x <= Math.max(s(0), s(2)) &&
        Math.min(s(1), s(3)) <= y && y <= Math.max(s(1), s(3)) &&
        Robust.orient2d(s(0), s(1), s(2), s(3), x, y) == Robust.Collinear
    }

  /** Ring/chain slices of each geometry as interleaved coord arrays. */
  private def chainsOf(gs: Seq[FlatGeom]): Seq[Array[Double]] =
    gs.flatMap { g =>
      val out = new ArrayBuffer[Array[Double]]()
      FlatGeom.foreachRing(g) { (s, e) =>
        out += java.util.Arrays.copyOfRange(g.coords, s * 2, e * 2)
      }
      out
    }

  /** Split polyline chains (interleaved coords) into 4-coord segments. */
  private def chainSegs(chains: Seq[Array[Double]]): Seq[Array[Double]] =
    chains.flatMap { c =>
      (0 until c.length / 2 - 1).flatMap { i =>
        if (c(2 * i) != c(2 * i + 2) || c(2 * i + 1) != c(2 * i + 3))
          Some(Array(c(2 * i), c(2 * i + 1), c(2 * i + 2), c(2 * i + 3)))
        else None
      }
    }

  private def overlayCore(aParts: Seq[FlatGeom], bParts: Seq[FlatGeom], op: Int,
      scale: Option[Double]): Result = {
    if (aParts.isEmpty) return emptyResult
    if (bParts.isEmpty) {
      return if (op == Overlay.OpIntersection) emptyResult
      else dissolve(aParts, scale) // A − ∅ = dissolve(A)
    }
    def dims(ps: Seq[FlatGeom], d: Int) = ps.filter(g => Relate.dimClass(g) == d)
    val (a2, a1, a0) = (dims(aParts, 2), dims(aParts, 1), dims(aParts, 0))
    val (b2, b1, b0) = (dims(bParts, 2), dims(bParts, 1), dims(bParts, 0))

    def binop(x: FlatGeom, y: FlatGeom, o: Int): FlatGeom = scale match {
      case Some(s) => SnapRound.booleanOpFixed(x, y, o, s).polys
      case None => Overlay.booleanOp(x, y, o)
    }
    def foldPolys(ps: Seq[FlatGeom]): FlatGeom = {
      val parts = ps.flatMap(g => (0 until g.numParts).map(p => FlatGeom.part(g, p)))
        .filter(!_.isEmpty)
      parts.reduceOption((x, y) => binop(x, y, Overlay.OpUnion)).getOrElse(emptyPoly)
    }
    // Fixed precision model (JTS PrecisionModel FIXED / OverlayNG SR):
    //  - BOTH sides have area: node both sides' ORIGINAL rings jointly
    //    at the shared hot-pixel set, snap, extract each side's
    //    input-collapse linework (postSnap) into that side's 1-D
    //    structure, and run the area op on the surviving polygons —
    //    its own collapse (result slivers) is the op linework. Any
    //    pre-snapping destroys the near-miss structure this derives
    //    from.
    //  - ONE side has area: JTS nodes the polygon against the LINE's
    //    hot pixels (the rounded crossing becomes a polygon vertex —
    //    TestOverlayLAPrec "A and B simple") and vertex-rounds it;
    //    collapse extraction still applies, pooled as side structure.
    def toMulti(ps: Seq[FlatGeom]): FlatGeom =
      if (ps.length == 1) ps.head
      else FlatGeom.multiPolygon(ps.flatMap(g =>
        (0 until g.numParts).map(p => FlatGeom.part(g, p))).filter(!_.isEmpty))
    def snapSide(p: FlatGeom, otherLines: Seq[FlatGeom], s: Double)
        : (FlatGeom, Seq[Array[Double]]) = {
      if (p.isEmpty) return (p, Nil)
      val noded =
        if (otherLines.isEmpty) p
        else SnapRound.hotPixelNode(p,
          FlatGeom.multiLineString(chainsOf(otherLines)), s)._1
      val fr = SnapRound.reconstitute(
        SnapRound.postSnap(SnapRound.snapGeom(noded, s), s), s)
      (fr.polys, chainSegs(fr.allLines))
    }
    val (polyA, collA, polyB, collB, resPolys, opLines) = scale match {
      case Some(s) if a2.nonEmpty && b2.nonEmpty =>
        val (an, bn) = SnapRound.hotPixelNode(toMulti(a2), toMulti(b2), s)
        val ac = SnapRound.reconstitute(
          SnapRound.postSnap(SnapRound.snapGeom(an, s), s), s)
        val bc = SnapRound.reconstitute(
          SnapRound.postSnap(SnapRound.snapGeom(bn, s), s), s)
        val coreOp =
          if (op == Overlay.OpIntersection) Overlay.OpIntersection
          else Overlay.OpDifference
        val core =
          if (ac.polys.isEmpty || (bc.polys.isEmpty && coreOp == Overlay.OpIntersection))
            SnapRound.FixedResult(emptyPoly, Nil)
          else if (bc.polys.isEmpty) SnapRound.FixedResult(ac.polys, Nil)
          else SnapRound.reconstitute(SnapRound.postSnap(
            Overlay.booleanOp(ac.polys, bc.polys, coreOp), s), s)
        (ac.polys, chainSegs(ac.allLines), bc.polys, chainSegs(bc.allLines),
          core.polys, chainSegs(core.allLines))
      case Some(s) =>
        val (pA, cA) = snapSide(foldPolys(a2), b1, s)
        val (pB, cB) = snapSide(foldPolys(b2), a1, s)
        val res =
          if (op == Overlay.OpIntersection) emptyPoly // one side has no area
          else pA
        (pA, cA, pB, cB, res, Seq.empty[Array[Double]])
      case None =>
        val pA = foldPolys(a2)
        val pB = foldPolys(b2)
        val res = op match {
          case Overlay.OpIntersection =>
            if (pA.isEmpty || pB.isEmpty) emptyPoly
            else binop(pA, pB, Overlay.OpIntersection)
          case _ =>
            if (pA.isEmpty) emptyPoly
            else if (pB.isEmpty) pA
            else binop(pA, pB, Overlay.OpDifference)
        }
        (pA, Seq.empty[Array[Double]], pB, Seq.empty[Array[Double]], res,
          Seq.empty[Array[Double]])
    }

    // ---------------------------------------------------------- 1-D
    def boundSegs(poly: FlatGeom): ArrayBuffer[Array[Double]] = {
      val out = new ArrayBuffer[Array[Double]]()
      if (!poly.isEmpty) FlatGeom.foreachRing(poly) { (s, e) =>
        var i = s
        while (i < e - 1) {
          if (poly.x(i) != poly.x(i + 1) || poly.y(i) != poly.y(i + 1))
            out += Array(poly.x(i), poly.y(i), poly.x(i + 1), poly.y(i + 1))
          i += 1
        }
      }
      out
    }
    val segsA = segsOf(a1)
    val segsB = segsOf(b1)
    // input-collapse linework is side 1-D structure, classified by the
    // same rules as line operands
    segsA ++= collA
    segsB ++= collB
    val boundA = boundSegs(polyA)
    val boundB = boundSegs(polyB)
    val allPts = pointsOf(a0) ++ pointsOf(b0)
    // each side noded against the other side's linework and BOTH
    // boundaries: shared runs then decompose identically on both sides.
    // Fixed precision uses the segment snap-rounder (hot pixels from
    // both sides + point operands — near-miss runs collapse onto
    // shared pixels, JTS PrecisionModel FIXED semantics).
    def node(emit: ArrayBuffer[Array[Double]],
        other: ArrayBuffer[Array[Double]]): Seq[Array[Double]] = scale match {
      case Some(s) => SnapRound.snapRoundSegments(emit.toSeq,
        (other ++ boundA ++ boundB).toSeq, allPts, s)
      case None => UnaryUnion.nodeSegments(emit, other ++ boundA ++ boundB, scale)
    }
    val nodedA =
      if (segsA.isEmpty) Seq.empty[Array[Double]] else node(segsA, segsB)
    val nodedB =
      if (segsB.isEmpty) Seq.empty[Array[Double]] else node(segsB, segsA)
    val keysB = nodedB.map(key).toSet
    @inline def mid(s: Array[Double]): (Double, Double) =
      ((s(0) + s(2)) / 2, (s(1) + s(3)) / 2)
    @inline def inClosedPoly(poly: FlatGeom, x: Double, y: Double): Boolean =
      !poly.isEmpty && Planar.coordPos(poly, x, y) != Planar.Outside

    val rawLines: Seq[Array[Double]] = op match {
      case Overlay.OpIntersection =>
        val out = LinkedHashSet[(Double, Double, Double, Double)]()
        nodedA.foreach { s =>
          val (mx, my) = mid(s)
          if (keysB(key(s)) || inClosedPoly(polyB, mx, my)) out += key(s)
        }
        nodedB.foreach { s =>
          val (mx, my) = mid(s)
          if (inClosedPoly(polyA, mx, my)) out += key(s)
        }
        // polygon-boundary shared runs where the interiors do not
        // locally overlap (AA edge contact → LINESTRING in JTS): node
        // each boundary against the other and keep common pieces
        if (boundA.nonEmpty && boundB.nonEmpty) {
          val nbA = UnaryUnion.nodeSegments(boundA, boundB ++ segsA ++ segsB, scale)
          val nbB = UnaryUnion.nodeSegments(boundB, boundA ++ segsA ++ segsB, scale)
          val kb = nbB.map(key).toSet
          nbA.foreach(s => if (kb(key(s))) out += key(s))
        }
        out.toSeq.map(k => Array(k._1, k._2, k._3, k._4))
      case _ => // A − B: drop shared runs and pieces in closed B
        nodedA.filter { s =>
          val (mx, my) = mid(s)
          !keysB(key(s)) && !inClosedPoly(polyB, mx, my)
        }.toSeq
      }
    // absorb pieces covered by this op's own 2-D result; then append
    // the op's own collapse linework (already classified by the fixed
    // overlay engine — postSnap guarantees it is not interior to the
    // polygonal result, and boundary-contact pieces are legitimate)
    val absorbed = rawLines.filter { s =>
      val (mx, my) = mid(s)
      !inClosedPoly(resPolys, mx, my)
    }
    val resLines = {
      val seen = scala.collection.mutable.LinkedHashSet[(Double, Double, Double, Double)]()
      absorbed.foreach(s => seen += key(s))
      opLines.foreach(s => seen += key(s))
      seen.toSeq.map(k => Array(k._1, k._2, k._3, k._4))
    }

    // ---------------------------------------------------------- 0-D
    val ptsA = pointsOf(a0)
    val ptsB = pointsOf(b0)
    def inClosedOperand(x: Double, y: Double, poly: FlatGeom,
        segs: Iterable[Array[Double]], pts: Seq[(Double, Double)]): Boolean =
      inClosedPoly(poly, x, y) || onSegs(segs, x, y) || pts.contains((x, y))
    // fixed precision follows JTS OverlayMixedPoints: point operands are
    // rounded (prep), but their location is evaluated against the
    // ORIGINAL (unrounded) higher-dimensional operand — "the line is
    // not rounded"; only the OUTPUT rounds. Floating classifies against
    // the noded linework (same point set).
    val membSegsA: Iterable[Array[Double]] =
      if (scale.isDefined) segsA ++ boundA else nodedA ++ boundA
    val membSegsB: Iterable[Array[Double]] =
      if (scale.isDefined) segsB ++ boundB else nodedB ++ boundB

    val rawPts = LinkedHashSet[(Double, Double)]()
    op match {
      case Overlay.OpIntersection =>
        ptsA.foreach { case (x, y) =>
          if (inClosedOperand(x, y, polyB, membSegsB, ptsB)) rawPts += ((x, y))
        }
        ptsB.foreach { case (x, y) =>
          if (inClosedOperand(x, y, polyA, membSegsA, ptsA)) rawPts += ((x, y))
        }
        // isolated crossing/touch points between the two sides' 1-D
        // structure (linework and polygon boundaries)
        val sideA: Seq[Array[Double]] = nodedA ++ boundA
        val sideB: Seq[Array[Double]] = nodedB ++ boundB
        def snapPt(x: Double, y: Double): (Double, Double) = scale match {
          case Some(sc) => (SnapRound.snap(x, sc), SnapRound.snap(y, sc))
          case None => (x, y)
        }
        sideA.foreach { s =>
          sideB.foreach { t =>
            val r = SegIntersect.intersection(s(0), s(1), s(2), s(3), t(0), t(1), t(2), t(3))
            if (r.kind == SegIntersect.SinglePointProper ||
                r.kind == SegIntersect.SinglePointImproper) rawPts += snapPt(r.x0, r.y0)
            else if (r.kind == SegIntersect.CollinearOverlap &&
                r.x0 == r.x1 && r.y0 == r.y1) rawPts += snapPt(r.x0, r.y0)
          }
        }
      case _ => // A − B: points of A not in closed B
        ptsA.foreach { case (x, y) =>
          if (!inClosedOperand(x, y, polyB, membSegsB, ptsB)) rawPts += ((x, y))
        }
    }
    // absorb points covered by a higher-dimensional result component
    val resPts = rawPts.toSeq.filter { case (x, y) =>
      !inClosedPoly(resPolys, x, y) && !onSegs(resLines, x, y)
    }

    Result(resPolys, UnaryUnion.mergeChains(resLines),
      resPts.flatMap(p => Array(p._1, p._2)).toArray)
  }
}
