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
    * support (merged segments, in grid space) of collapsed rings. */
  final case class FixedResult(polys: FlatGeom, lines: Seq[Array[Double]]) {
    def lineLength: Double = {
      var s = 0.0
      lines.foreach { l => s += Math.hypot(l(2) - l(0), l(3) - l(1)) }
      s
    }
  }

  /** Fixed-precision boolean op (polygonal × polygonal). */
  def booleanOpFixed(a: FlatGeom, b: FlatGeom, op: Int, scale: Double): FixedResult = {
    val res = Overlay.booleanOp(snapGeom(a, scale), snapGeom(b, scale), op)
    postSnap(res, scale)
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

  private def postSnap(mp: FlatGeom, scale: Double): FixedResult = {
    val keptPolys = ArrayBuffer[FlatGeom]()
    val collapsedSegs = ArrayBuffer[(Long, Long, Long, Long)]()

    polygonParts(mp).foreach { rings =>
      val cleaned = rings.map(r => cleanRing(r, scale))
      cleaned.headOption match {
        case Some(Right(ext)) =>
          val holes = cleaned.tail.collect { case Right(h) => h }
          // collapsed holes vanish (their area contribution is 0)
          keptPolys += FlatGeom.polygon(ext, holes.toSeq)
        case Some(Left(segs)) =>
          // exterior collapsed → the whole part is 1-D; its holes
          // (if any) are inside a zero-area region and are dropped
          collapsedSegs ++= segs
        case None =>
      }
    }
    val polys =
      if (keptPolys.isEmpty) Overlay.emptyMultiPolygon
      else FlatGeom.multiPolygon(keptPolys.toSeq)
    FixedResult(polys, mergeSegments(collapsedSegs.toSeq, scale))
  }

  /** Snap a result ring to the Long lattice; dedupe, de-spike, and
    * decide survival by EXACT lattice area. Left = collapsed (its
    * walk segments), Right = clean ring in grid-double space. */
  private def cleanRing(ring: Array[Double], scale: Double)
      : Either[Seq[(Long, Long, Long, Long)], Array[Double]] = {
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
    // iterative cyclic spike removal: prev == next ⇒ drop the apex
    var changed = true
    while (changed && pts.length >= 3) {
      changed = false
      var j = 0
      while (j < pts.length && pts.length >= 3) {
        val prev = pts((j - 1 + pts.length) % pts.length)
        val next = pts((j + 1) % pts.length)
        if (prev == next) {
          pts.remove(j)
          // the duplicate neighbour collapses too
          val k = j % pts.length
          val kPrev = (k - 1 + pts.length) % pts.length
          if (pts.length > 1 && pts(k) == pts(kPrev)) pts.remove(k)
          changed = true
        } else j += 1
      }
    }
    if (pts.length < 3) return Left(walk.toSeq)
    // exact lattice shoelace (2×area; Long math — grid coords are
    // bounded by corpus magnitudes, no overflow at |v| < 2^30)
    var a2 = 0L
    i = 0
    while (i < pts.length) {
      val p = pts(i); val q = pts((i + 1) % pts.length)
      a2 += p._1 * q._2 - q._1 * p._2
      i += 1
    }
    if (a2 == 0L) Left(walk.toSeq)
    else {
      val out = new Array[Double](pts.length * 2)
      i = 0
      while (i < pts.length) {
        out(2 * i) = pts(i)._1 / scale
        out(2 * i + 1) = pts(i)._2 / scale
        i += 1
      }
      Right(out)
    }
  }

  /** Exact 1-D union of lattice segments: group by reduced carrier
    * line (a,b,c) with a*x+b*y+c=0, project to the dominant axis,
    * merge intervals, emit maximal segments in grid-double space. */
  private def mergeSegments(segs: Seq[(Long, Long, Long, Long)],
      scale: Double): Seq[Array[Double]] = {
    if (segs.isEmpty) return Nil
    def gcd(a: Long, b: Long): Long = if (b == 0) Math.abs(a) else gcd(b, a % b)
    val byLine = segs.groupBy { case (x1, y1, x2, y2) =>
      var a = y2 - y1
      var b = x1 - x2
      var c = -(a * x1 + b * y1)
      val g = gcd(gcd(a, b), c)
      if (g != 0) { a /= g; b /= g; c /= g }
      // canonical sign: first nonzero of (a,b) positive
      if (a < 0 || (a == 0 && b < 0)) { a = -a; b = -b; c = -c }
      (a, b, c)
    }
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
