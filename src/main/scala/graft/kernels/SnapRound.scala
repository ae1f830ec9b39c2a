package graft.kernels

import graft.core.{FlatGeom, GeomKind}
import scala.collection.mutable.ArrayBuffer

/**
 * Fixed-precision (snap-rounded) overlay — BEYOND the reference: the
 * reference's own test runner marks boolean ops under a non-FLOATING
 * precision model unsupported and never executes JTS's `*Prec.xml`
 * overlay cases (jts-test-runner/src/runner.rs:515-523); this module
 * implements the semantics so those cases can be evaluated.
 *
 * Model (JTS `PrecisionModel` FIXED, scale s): every coordinate is
 * `round(v*s)/s`. The op runs as: snap both inputs to the grid →
 * exact floating overlay ([[Overlay.booleanOp]]) → snap the result
 * back to the grid. Snapping the result can collapse slivers: a ring
 * whose snapped (exact, lattice-integer) area is zero is not a
 * polygon any more — JTS reports such a collapsed intersection as
 * the 1-D piece it degenerates to (e.g. `TestOverlayAAPrec.xml`
 * case 1 expects `LINESTRING(90 10, 100 10)` from an AA
 * intersection). Collapsed rings are therefore extracted as their
 * 1-D support: the ring walk covers its support an even number of
 * times, so segments are merged per carrier line with an exact
 * lattice interval union.
 *
 * All post-snap arithmetic is on Long lattice coordinates (exact —
 * orientation/area/incidence decisions cannot suffer double
 * rounding; the reference gets the same guarantee in floating space
 * from Shewchuk predicates, kernels/Robust.scala).
 *
 * Scale-out note: this is a per-row kernel like every other overlay
 * entry point — it distributes with the geometry column and adds no
 * shuffle.
 */
object SnapRound {

  /** JTS PrecisionModel.makePrecise: round-half-up in scaled space. */
  def snap(v: Double, scale: Double): Double = Math.round(v * scale) / scale

  def snapGeom(g: FlatGeom, scale: Double): FlatGeom = {
    if (g.isEmpty) return g
    val cs = new Array[Double](g.coords.length)
    var i = 0
    while (i < cs.length) { cs(i) = snap(g.coords(i), scale); i += 1 }
    new FlatGeom(g.kind, cs, g.rings, g.parts)
  }

  /** Result of a fixed-precision op: surviving polygons plus the 1-D
    * support (merged segments, in grid space) of collapsed rings.
    * `lines` carries FULLY-collapsed rings (a whole input/result part
    * that snapped flat); `spikes` carries sliver tips shaved off rings
    * that SURVIVED. The split matters for OverlayNG's collapse rule:
    * a spike of a still-2-D operand is a result line only when covered
    * by the other operand's interior, while full-collapse linework
    * participates with its closure (TestNGOverlayAPrec "complete
    * collapse of A" keeps boundary-coincident runs). */
  final case class FixedResult(polys: FlatGeom, lines: Seq[Array[Double]],
      spikes: Seq[Array[Double]] = Nil) {
    def allLines: Seq[Array[Double]] = lines ++ spikes
    def lineLength: Double = {
      var s = 0.0
      allLines.foreach { l => s += Math.hypot(l(2) - l(0), l(3) - l(1)) }
      s
    }
  }

  /** Fixed-precision boolean op (polygonal × polygonal), including
    * OverlayNG's input-collapse semantics (the `*SR` corpus ops): an
    * input ring that collapses on the grid contributes its 1-D
    * support to the result — clipped INSIDE the other operand for
    * intersection, OUTSIDE the result area for union, OUTSIDE the
    * subtrahend for difference/xor (TestNGOverlayAPrec.xml:20-49). */
  def booleanOpFixed(a: FlatGeom, b: FlatGeom, op: Int, scale: Double): FixedResult = {
    // JTS order: node the ORIGINAL segments at hot pixels first, THEN
    // round — rounding first flattens sub-pixel edge paths before the
    // hot pixels they cross are known (MCIndexSnapRounder semantics)
    val (an, bn) = hotPixelNode(a, b, scale)
    val ac = reconstitute(postSnap(snapGeom(an, scale), scale), scale)
    val bc = reconstitute(postSnap(snapGeom(bn, scale), scale), scale)
    val core = reconstitute(
      postSnap(Overlay.booleanOp(ac.polys, bc.polys, op), scale), scale)

    def toSegs(ls: Seq[Array[Double]]): Seq[(Long, Long, Long, Long)] =
      ls.flatMap { l =>
        val x1 = Math.round(l(0) * scale); val y1 = Math.round(l(1) * scale)
        val x2 = Math.round(l(2) * scale); val y2 = Math.round(l(3) * scale)
        if (x1 == x2 && y1 == y2) None else Some((x1, y1, x2, y2))
      }
    // clip collapsed-input support against a polygonal operand
    def clipSegs(segs: Seq[Array[Double]], poly: FlatGeom,
        inside: Boolean): Seq[Array[Double]] =
      if (segs.isEmpty) Nil
      else if (poly.isEmpty) { if (inside) Nil else segs }
      else {
        val clipped = Overlay.clip(poly,
          FlatGeom.multiLineString(segs), invert = !inside)
        val out = ArrayBuffer[Array[Double]]()
        FlatGeom.foreachRing(clipped) { (s, e) =>
          var i = s
          while (i < e - 1) {
            out += Array(clipped.x(i), clipped.y(i), clipped.x(i + 1), clipped.y(i + 1))
            i += 1
          }
        }
        out.toSeq
      }
    // Collapse rule for SPIKES (sliver tips shaved off a ring that
    // SURVIVED): a spike whose support lies exactly on its ORIGINAL
    // (pre-snap) input boundary is genuine input linework — e.g. the
    // TestNGOverlayAPrec box-triangle overhang, where the input edge
    // really backtracks along y=1 — and participates with closure
    // semantics like any 1-D input. A spike created by hot-pixel
    // rounding (its support is NOT on the original boundary) is a
    // rounding artifact and becomes a result line only when covered
    // by the other operand's INTERIOR (OverlayNG's collapse rule):
    // robust/TestRobustOverlayFixed's artifact spike
    // (545,317)→(546,317) lies ON B's noded boundary and is dropped —
    // JTS keeps only the point contact, below the 1-D threshold.
    // FULLY-collapsed input parts always keep closure semantics.
    def onOriginalBoundary(mx: Double, my: Double, orig: FlatGeom): Boolean = {
      var found = false
      FlatGeom.foreachRing(orig) { (s, e) =>
        var i = s
        while (i < e - 1 && !found) {
          if (Planar.pointSegDistance(mx, my, orig.x(i), orig.y(i),
              orig.x(i + 1), orig.y(i + 1)) == 0.0) found = true
          i += 1
        }
      }
      found
    }
    def spikeFilter(segs: Seq[Array[Double]], other: FlatGeom,
        orig: FlatGeom): Seq[Array[Double]] =
      segs.filter { l =>
        val mx = (l(0) + l(2)) / 2; val my = (l(1) + l(3)) / 2
        Planar.coordPos(other, mx, my) match {
          case Planar.Inside => true
          case Planar.OnBoundary => onOriginalBoundary(mx, my, orig)
          case _ => false
        }
      }
    val lines = ArrayBuffer[Array[Double]]()
    lines ++= core.allLines
    op match {
      case Overlay.OpIntersection =>
        lines ++= clipSegs(ac.lines, bc.polys, inside = true)
        lines ++= clipSegs(bc.lines, ac.polys, inside = true)
        lines ++= spikeFilter(clipSegs(ac.spikes, bc.polys, inside = true), bc.polys, a)
        lines ++= spikeFilter(clipSegs(bc.spikes, ac.polys, inside = true), ac.polys, b)
        // line × line: both operands (partially) collapsed onto a
        // shared carrier intersect in the interval overlap
        lines ++= intersect1D(ac.allLines, bc.allLines, scale)
        // edge-touch linework: two snapped areas whose interiors miss
        // but whose boundaries share runs intersect in those runs
        // (TestNGOverlayAPrec "intersects in line")
        if (core.polys.isEmpty && !ac.polys.isEmpty && !bc.polys.isEmpty)
          lines ++= clipSegs(boundarySegs(ac.polys), bc.polys, inside = true)
      case Overlay.OpUnion =>
        lines ++= clipSegs(ac.allLines, core.polys, inside = false)
        lines ++= clipSegs(bc.allLines, core.polys, inside = false)
      case Overlay.OpDifference =>
        lines ++= clipSegs(ac.allLines, bc.polys, inside = false)
      case _ =>
        lines ++= clipSegs(ac.allLines, bc.polys, inside = false)
        lines ++= clipSegs(bc.allLines, ac.polys, inside = false)
    }
    FixedResult(core.polys, mergeSegments(toSegs(lines.toSeq), scale))
  }

  /** Fixed-precision clip (line × area intersection/difference):
    * snapped inputs, floating clip, snapped + 1-D-merged output. */
  def clipFixed(poly: FlatGeom, line: FlatGeom, invert: Boolean, scale: Double): FixedResult = {
    val res = Overlay.clip(snapGeom(poly, scale), snapGeom(line, scale), invert)
    // snap output vertices and merge the segment support exactly
    val segs = ArrayBuffer[(Long, Long, Long, Long)]()
    FlatGeom.foreachRing(res) { (s, e) =>
      var i = s
      while (i < e - 1) {
        val x1 = Math.round(res.x(i) * scale); val y1 = Math.round(res.y(i) * scale)
        val x2 = Math.round(res.x(i + 1) * scale); val y2 = Math.round(res.y(i + 1) * scale)
        if (x1 != x2 || y1 != y2) segs += ((x1, y1, x2, y2))
        i += 1
      }
    }
    FixedResult(FlatGeom.multiPolygon(Nil), mergeSegments(segs.toSeq, scale))
  }

  // ------------------------------------------------------------------
  // hot-pixel noding (JTS MCIndexSnapRounder semantics)

  private def boundarySegs(g: FlatGeom): Seq[Array[Double]] = {
    val out = ArrayBuffer[Array[Double]]()
    FlatGeom.foreachRing(g) { (s, e) =>
      var i = s
      while (i < e - 1) {
        out += Array(g.x(i), g.y(i), g.x(i + 1), g.y(i + 1))
        i += 1
      }
    }
    out.toSeq
  }

  /**
   * Node both (already vertex-snapped) inputs at every hot pixel: the
   * grid cell of every input vertex plus of every pairwise edge
   * intersection. An edge passing through a hot pixel's half-open
   * square ([c-½,c+½) per axis, JTS's closed-bottom-left convention)
   * gains a vertex at the pixel center; iterated to a fixpoint
   * (snapping an edge can drag it across another pixel). Brute-force
   * pair scan — corpus-scale inputs; the engine's scaled path for
   * bulk linework is the cell-partitioned B-O sweep (kernels/Sweep).
   */
  /** MCIndexSnapRounder-style noding of RAW segment lists (the 0/1-D
    * operand path of the heterogeneous fixed-precision ops,
    * kernels/Hetero): hot pixels are every rounded endpoint of `emit`
    * and `splitOnly`, every `extraPts` coordinate (input vertices —
    * point operands included, per the JTS rounder), and every rounded
    * pairwise intersection; each emit segment splits at every pixel it
    * passes through (half-open square crossing), iterated to a bounded
    * fixpoint, then all coordinates snap to the grid (collapsed pieces
    * dropped). Both sides noded with the SAME pixel set decompose
    * shared runs identically. */
  private[kernels] def snapRoundSegments(emit0: Seq[Array[Double]],
      splitOnly: Seq[Array[Double]], extraPts: Seq[(Double, Double)],
      scale: Double): Seq[Array[Double]] = {
    // SINGLE pass over the ORIGINAL segments (OverlayNG
    // SnapRoundingNoder): hot pixels come from the original geometry;
    // re-noding the bent sub-segments against the pixel set would
    // insert vertices JTS does not (a bent piece can graze a pixel the
    // original segment never crossed)
    var emit = emit0
    val others = splitOnly
    locally {
      val all = (emit ++ others).toArray
      val hot = scala.collection.mutable.LinkedHashSet[(Long, Long)]()
      extraPts.foreach { case (x, y) =>
        hot += ((Math.round(x * scale), Math.round(y * scale)))
      }
      all.foreach { s =>
        hot += ((Math.round(s(0) * scale), Math.round(s(1) * scale)))
        hot += ((Math.round(s(2) * scale), Math.round(s(3) * scale)))
      }
      var i = 0
      while (i < all.length) {
        var j = i + 1
        while (j < all.length) {
          val e1 = all(i); val e2 = all(j)
          val r = SegIntersect.intersection(
            e1(0) * scale, e1(1) * scale, e1(2) * scale, e1(3) * scale,
            e2(0) * scale, e2(1) * scale, e2(2) * scale, e2(3) * scale)
          if (r.kind != SegIntersect.None_) hot += ((Math.round(r.x0), Math.round(r.y0)))
          if (r.kind == SegIntersect.CollinearOverlap)
            hot += ((Math.round(r.x1), Math.round(r.y1)))
          j += 1
        }
        i += 1
      }
      val pixels = hot.toArray
      def nodeOne(s: Array[Double]): Seq[Array[Double]] = {
        val x1 = s(0) * scale; val y1 = s(1) * scale
        val x2 = s(2) * scale; val y2 = s(3) * scale
        val ex1 = Math.round(x1); val ey1 = Math.round(y1)
        val ex2 = Math.round(x2); val ey2 = Math.round(y2)
        val hits = ArrayBuffer[(Double, Long, Long)]()
        var k = 0
        while (k < pixels.length) {
          val (px, py) = pixels(k)
          if (!(px == ex1 && py == ey1) && !(px == ex2 && py == ey2))
            pixelCrossing(x1, y1, x2, y2, px, py).foreach(t => hits += ((t, px, py)))
          k += 1
        }
        if (hits.isEmpty) Seq(s)
        else {
          val chain = ArrayBuffer[(Double, Double)]((s(0), s(1)))
          hits.sortBy(_._1).foreach { case (_, px, py) =>
            val p = (px / scale, py / scale)
            if (chain.last != p) chain += p
          }
          if (chain.last != ((s(2), s(3)))) chain += ((s(2), s(3)))
          val out = ArrayBuffer[Array[Double]]()
          var ci = 0
          while (ci < chain.length - 1) {
            val (ax, ay) = chain(ci); val (bx, by) = chain(ci + 1)
            if (ax != bx || ay != by) out += Array(ax, ay, bx, by)
            ci += 1
          }
          out.toSeq
        }
      }
      emit = emit.flatMap(nodeOne)
    }
    // final grid snap + collapse drop (dedupe is the caller's concern)
    emit.flatMap { s =>
      val ax = snap(s(0), scale); val ay = snap(s(1), scale)
      val bx = snap(s(2), scale); val by = snap(s(3), scale)
      if (ax == bx && ay == by) None else Some(Array(ax, ay, bx, by))
    }
  }

  /** Does a scaled segment pass through the half-open unit square of
    * pixel (px, py)? Liang-Barsky clip, right/top boundaries excluded
    * (the JTS hot-pixel convention). Returns the crossing parameter. */
  private def pixelCrossing(x1: Double, y1: Double, x2: Double, y2: Double,
      px: Long, py: Long): Option[Double] = {
    var t0 = 0.0; var t1 = 1.0
    val dx = x2 - x1; val dy = y2 - y1
    def clip(p: Double, q: Double): Boolean = {
      if (p == 0.0) q >= 0.0
      else {
        val r = q / p
        if (p < 0) { if (r > t1) return false; if (r > t0) t0 = r }
        else { if (r < t0) return false; if (r < t1) t1 = r }
        true
      }
    }
    val lo = 0.5
    if (!clip(-dx, x1 - (px - lo)) || !clip(dx, (px + lo) - x1) ||
        !clip(-dy, y1 - (py - lo)) || !clip(dy, (py + lo) - y1)) return None
    if (t1 - t0 <= 1e-12) return None
    val tm = (t0 + t1) / 2
    val mx = x1 + tm * dx; val my = y1 + tm * dy
    if (mx >= px + lo - 1e-12 || my >= py + lo - 1e-12) None else Some(tm)
  }

  private[kernels] def hotPixelNode(a: FlatGeom, b: FlatGeom, scale: Double): (FlatGeom, FlatGeom) = {
    // scaled-integer vertex set
    val hot = scala.collection.mutable.LinkedHashSet[(Long, Long)]()
    def addVerts(g: FlatGeom): Unit = {
      var i = 0
      while (i < g.numPoints) {
        hot += ((Math.round(g.x(i) * scale), Math.round(g.y(i) * scale)))
        i += 1
      }
    }
    addVerts(a); addVerts(b)
    // pairwise edge intersections (within and across inputs)
    val edges = (boundarySegs(a) ++ boundarySegs(b)).toArray
    var i = 0
    while (i < edges.length) {
      var j = i + 1
      while (j < edges.length) {
        val e1 = edges(i); val e2 = edges(j)
        val r = SegIntersect.intersection(
          e1(0) * scale, e1(1) * scale, e1(2) * scale, e1(3) * scale,
          e2(0) * scale, e2(1) * scale, e2(2) * scale, e2(3) * scale)
        if (r.kind != SegIntersect.None_) hot += ((Math.round(r.x0), Math.round(r.y0)))
        if (r.kind == SegIntersect.CollinearOverlap) hot += ((Math.round(r.x1), Math.round(r.y1)))
        j += 1
      }
      i += 1
    }
    val pixels = hot.toArray

    def nodeGeom(g: FlatGeom): FlatGeom = {
      if (g.isEmpty) return g
      var changedAny = false
      val newCoords = ArrayBuffer[Double]()
      val newRings = ArrayBuffer[Int]()
      FlatGeom.foreachRing(g) { (s, e) =>
        var i = s
        while (i < e - 1) {
          val x1 = g.x(i) * scale; val y1 = g.y(i) * scale
          val x2 = g.x(i + 1) * scale; val y2 = g.y(i + 1) * scale
          newCoords += x1 / scale += y1 / scale
          val ex1 = Math.round(x1); val ey1 = Math.round(y1)
          val ex2 = Math.round(x2); val ey2 = Math.round(y2)
          val hits = ArrayBuffer[(Double, Long, Long)]()
          var k = 0
          while (k < pixels.length) {
            val (px, py) = pixels(k)
            if (!(px == ex1 && py == ey1) && !(px == ex2 && py == ey2)) {
              pixelCrossing(x1, y1, x2, y2, px, py).foreach(t => hits += ((t, px, py)))
            }
            k += 1
          }
          hits.sortBy(_._1).foreach { case (_, px, py) =>
            newCoords += px / scale += py / scale
            changedAny = true
          }
          i += 1
        }
        // closing vertex of the ring slice
        newCoords += g.x(e - 1) += g.y(e - 1)
        newRings += newCoords.length / 2
      }
      if (!changedAny) g
      else new FlatGeom(g.kind, newCoords.toArray, newRings.toArray, g.parts)
    }

    var an = a; var bn = b
    var pass = 0
    var changed = true
    while (changed && pass < 5) {
      val an2 = nodeGeom(an); val bn2 = nodeGeom(bn)
      changed = (an2 ne an) || (bn2 ne bn)
      an = an2; bn = bn2
      pass += 1
    }
    (an, bn)
  }

  // ------------------------------------------------------------------
  // result post-processing

  private def polygonParts(g: FlatGeom): Seq[Seq[Array[Double]]] = {
    def ringCoords(r: Int): Array[Double] =
      java.util.Arrays.copyOfRange(g.coords, g.ringStart(r) * 2, g.ringEnd(r) * 2)
    g.kind match {
      case GeomKind.Polygon =>
        Seq((0 until g.rings.length).map(ringCoords))
      case GeomKind.MultiPolygon =>
        (0 until g.parts.length).map { p =>
          (g.partStart(p) until g.partEnd(p)).map(ringCoords)
        }
      case _ => Nil
    }
  }

  private[kernels] def postSnap(mp: FlatGeom, scale: Double): FixedResult = {
    val keptPolys = ArrayBuffer[FlatGeom]()
    val collapsedSegs = ArrayBuffer[(Long, Long, Long, Long)]()
    val spikeSegs = ArrayBuffer[(Long, Long, Long, Long)]()

    polygonParts(mp).foreach { rings =>
      val cleaned = rings.map(r => cleanRing(r, scale))
      cleaned.headOption match {
        case Some((Some(ext), spikes)) =>
          val holes = cleaned.tail.flatMap(_._1)
          // collapsed holes vanish (their area contribution is 0),
          // but spikes shaved off ANY surviving ring are collapsed
          // 1-D support (a sliver tip that snapped flat) — tracked
          // separately from full-collapse linework (see FixedResult)
          spikeSegs ++= spikes
          cleaned.tail.foreach { case (r, sp) => if (r.isDefined) spikeSegs ++= sp }
          keptPolys += FlatGeom.polygon(ext, holes.toSeq)
        case Some((None, segs)) =>
          // exterior collapsed → the whole part is 1-D; its holes
          // (if any) are inside a zero-area region and are dropped
          collapsedSegs ++= segs
        case None =>
      }
    }
    val polys =
      if (keptPolys.isEmpty) FlatGeom.multiPolygon(Nil)
      else FlatGeom.multiPolygon(keptPolys.toSeq)
    FixedResult(polys, mergeSegments(collapsedSegs.toSeq, scale),
      mergeSegments(spikeSegs.toSeq, scale))
  }

  /** Re-derive each multi-ring part as shell − holes through the
    * exact overlay. After snap-rounding a hole can touch its shell
    * along a collinear run (a collapsed sliver); passing such a
    * pinched polygon onward confuses downstream edge selection,
    * while shell−holes fuses the pinch into the outer ring — the
    * same shape JTS produces (TestOverlayAAPrec "hole close to
    * shell, B coincident with A"). Hole-free parts pass through. */
  private[kernels] def reconstitute(fr: FixedResult, scale: Double): FixedResult = {
    val parts = polygonParts(fr.polys)
    if (parts.forall(_.length <= 1)) return fr
    val outPolys = ArrayBuffer[FlatGeom]()
    val lines = ArrayBuffer[Array[Double]]()
    val spikes = ArrayBuffer[Array[Double]]()
    lines ++= fr.lines
    spikes ++= fr.spikes
    parts.foreach { rings =>
      if (rings.length <= 1) outPolys += FlatGeom.polygon(rings.head)
      else {
        val shell = FlatGeom.polygon(rings.head)
        val holes = FlatGeom.multiPolygon(rings.tail.map(h => FlatGeom.polygon(h)).toSeq)
        val cleaned = postSnap(Overlay.booleanOp(shell, holes, Overlay.OpDifference), scale)
        polygonParts(cleaned.polys).foreach(rs =>
          outPolys += FlatGeom.polygon(rs.head, rs.tail.toSeq))
        lines ++= cleaned.lines
        spikes ++= cleaned.spikes
        // a hole edge run COINCIDENT with the shell is a zero-width
        // strip the exact difference cancels silently — that shared
        // run is exactly the part's collapsed linework
        lines ++= intersect1D(boundarySegs(shell), boundarySegs(holes), scale)
      }
    }
    FixedResult(
      if (outPolys.isEmpty) FlatGeom.multiPolygon(Nil)
      else FlatGeom.multiPolygon(outPolys.toSeq),
      lines.toSeq, spikes.toSeq)
  }

  /** Snap a result ring to the Long lattice; dedupe, de-spike, and
    * decide survival by EXACT lattice area. Returns (ring-or-None in
    * grid-double space, collapsed 1-D segments): a fully-collapsed
    * ring yields (None, its whole walk); a surviving ring yields the
    * spikes shaved off it (each a sliver that snapped flat — JTS's
    * collapsed linework). */
  private def cleanRing(ring: Array[Double], scale: Double)
      : (Option[Array[Double]], Seq[(Long, Long, Long, Long)]) = {
    val n0 = ring.length / 2
    var pts = ArrayBuffer[(Long, Long)]()
    var i = 0
    while (i < n0) {
      val p = (Math.round(ring(2 * i) * scale), Math.round(ring(2 * i + 1) * scale))
      if (pts.isEmpty || pts.last != p) pts += p
      i += 1
    }
    // drop the closing duplicate if present
    if (pts.length > 1 && pts.head == pts.last) pts = pts.dropRight(1)
    // collect the full walk BEFORE de-spiking (the spikes ARE the
    // collapsed support when the ring degenerates)
    val walk = ArrayBuffer[(Long, Long, Long, Long)]()
    i = 0
    while (i < pts.length) {
      val p = pts(i); val q = pts((i + 1) % pts.length)
      if (p != q) walk += ((p._1, p._2, q._1, q._2))
      i += 1
    }
    // iterative cyclic spike removal: prev == next ⇒ drop the apex,
    // KEEPING the spike's 1-D support (prev→apex) as collapsed
    // linework — a sliver tip that snapped flat is still part of the
    // snapped geometry's point set
    val spikes = ArrayBuffer[(Long, Long, Long, Long)]()
    var changed = true
    while (changed && pts.length >= 3) {
      changed = false
      var j = 0
      while (j < pts.length && pts.length >= 3) {
        val prev = pts((j - 1 + pts.length) % pts.length)
        val next = pts((j + 1) % pts.length)
        if (prev == next) {
          val apex = pts(j)
          if (apex != prev) spikes += ((prev._1, prev._2, apex._1, apex._2))
          pts.remove(j)
          // the duplicate neighbour collapses too
          val k = j % pts.length
          val kPrev = (k - 1 + pts.length) % pts.length
          if (pts.length > 1 && pts(k) == pts(kPrev)) pts.remove(k)
          changed = true
        } else j += 1
      }
    }
    if (pts.length < 3) return (None, walk.toSeq)
    // exact lattice shoelace (2×area; Long math — grid coords are
    // bounded by corpus magnitudes, no overflow at |v| < 2^30)
    var a2 = 0L
    i = 0
    while (i < pts.length) {
      val p = pts(i); val q = pts((i + 1) % pts.length)
      a2 += p._1 * q._2 - q._1 * p._2
      i += 1
    }
    if (a2 == 0L) (None, walk.toSeq)
    else {
      val out = new Array[Double](pts.length * 2)
      i = 0
      while (i < pts.length) {
        out(2 * i) = pts(i)._1 / scale
        out(2 * i + 1) = pts(i)._2 / scale
        i += 1
      }
      (Some(out), spikes.toSeq)
    }
  }

  private def gcd(a: Long, b: Long): Long = if (b == 0) Math.abs(a) else gcd(b, a % b)

  /** Reduced carrier line of a lattice segment: (a,b,c) with
    * a*x+b*y+c=0, gcd-reduced, sign-canonical. */
  private def carrierKey(x1: Long, y1: Long, x2: Long, y2: Long): (Long, Long, Long) = {
    var a = y2 - y1
    var b = x1 - x2
    var c = -(a * x1 + b * y1)
    val g = gcd(gcd(a, b), c)
    if (g != 0) { a /= g; b /= g; c /= g }
    if (a < 0 || (a == 0 && b < 0)) { a = -a; b = -b; c = -c }
    (a, b, c)
  }

  /** Exact 1-D intersection of two collapsed-line sets (lattice
    * interval intersection per shared carrier line) — the
    * line × line part of a fixed-precision AA intersection when both
    * operands (partially) collapse. */
  private def intersect1D(la: Seq[Array[Double]], lb: Seq[Array[Double]],
      scale: Double): Seq[Array[Double]] = {
    if (la.isEmpty || lb.isEmpty) return Nil
    def lat(l: Array[Double]): (Long, Long, Long, Long) =
      (Math.round(l(0) * scale), Math.round(l(1) * scale),
        Math.round(l(2) * scale), Math.round(l(3) * scale))
    val out = ArrayBuffer[(Long, Long, Long, Long)]()
    for (s1 <- la.map(lat); s2 <- lb.map(lat)) {
      val k1 = carrierKey(s1._1, s1._2, s1._3, s1._4)
      if (k1 == carrierKey(s2._1, s2._2, s2._3, s2._4)) {
        val useX = Math.abs(k1._2) >= Math.abs(k1._1)
        def t(x: Long, y: Long): Long = if (useX) x else y
        def pt(s: (Long, Long, Long, Long), w: Long): (Long, Long) =
          if (t(s._1, s._2) == w) (s._1, s._2) else (s._3, s._4)
        val lo1 = Math.min(t(s1._1, s1._2), t(s1._3, s1._4))
        val hi1 = Math.max(t(s1._1, s1._2), t(s1._3, s1._4))
        val lo2 = Math.min(t(s2._1, s2._2), t(s2._3, s2._4))
        val hi2 = Math.max(t(s2._1, s2._2), t(s2._3, s2._4))
        val lo = Math.max(lo1, lo2); val hi = Math.min(hi1, hi2)
        if (lo < hi) {
          val p1 = if (lo == lo1) pt(s1, lo1) else pt(s2, lo2)
          val p2 = if (hi == hi1) pt(s1, hi1) else pt(s2, hi2)
          out += ((p1._1, p1._2, p2._1, p2._2))
        }
      }
    }
    mergeSegments(out.toSeq, scale)
  }

  /** Exact 1-D union of lattice segments: group by reduced carrier
    * line (a,b,c) with a*x+b*y+c=0, project to the dominant axis,
    * merge intervals, emit maximal segments in grid-double space. */
  private def mergeSegments(segs: Seq[(Long, Long, Long, Long)],
      scale: Double): Seq[Array[Double]] = {
    if (segs.isEmpty) return Nil
    val byLine = segs.groupBy((carrierKey _).tupled)
    val out = ArrayBuffer[Array[Double]]()
    byLine.foreach { case ((a, b, _), ss) =>
      // param along the dominant axis (exact on the lattice)
      val useX = Math.abs(b) >= Math.abs(a) // not vertical-dominant ⇒ x varies
      def t(x: Long, y: Long): Long = if (useX) x else y
      val ivs = ss.map { case (x1, y1, x2, y2) =>
        val (t1, t2) = (t(x1, y1), t(x2, y2))
        if (t1 <= t2) ((t1, (x1, y1)), (t2, (x2, y2)))
        else ((t2, (x2, y2)), (t1, (x1, y1)))
      }.sortBy(_._1._1)
      var curLo = ivs.head._1
      var curHi = ivs.head._2
      def flush(): Unit =
        out += Array(curLo._2._1 / scale, curLo._2._2 / scale,
          curHi._2._1 / scale, curHi._2._2 / scale)
      ivs.tail.foreach { case (lo, hi) =>
        if (lo._1 <= curHi._1) { if (hi._1 > curHi._1) curHi = hi }
        else { flush(); curLo = lo; curHi = hi }
      }
      flush()
    }
    out.toSeq
  }
}
