package graft.kernels

import graft.core.{FlatGeom, GeomKind}

import scala.collection.mutable.ArrayBuffer

/**
 * Monotone-polygon subdivision + O(log n) point-in-polygon — the
 * engine analogue of the reference's `MonotonicPolygons`
 * (geo/src/algorithm/monotone/mod.rs:17-21): a polygon (with holes)
 * is decomposed once into y-monotone pieces via the classic
 * make-monotone plane sweep (split/merge vertices receive diagonals
 * to their sweep helpers, de Berg et al. §3.2), the diagonal-augmented
 * edge set is walked into faces, and each CCW face stores its two
 * y-sorted chains. A point query binary-searches each chain — O(log n)
 * per piece versus the O(n) ray cast — with the same exact semantics:
 * side tests use [[Robust.orient2d]], and a point on an inserted
 * diagonal (polygon interior) reports Inside, only original boundary
 * edges report OnBoundary.
 */
object Monotone {

  /** One y-monotone piece: a CCW ring split at its top and bottom
    * vertices; segment k runs ring index k → k+1 (mod n) and
    * `origEdge(k)` marks original-polygon-boundary segments. */
  final class MonoPoly(val xs: Array[Double], val ys: Array[Double],
      val topIdx: Int, val botIdx: Int, val origEdge: Array[Boolean]) {

    val yMin: Double = ys(botIdx)
    val yMax: Double = ys(topIdx)

    /** Planar.Inside / OnBoundary / Outside for this piece.
      *
      * Chain A (topIdx→botIdx in ring order, y non-increasing) is the
      * piece's LEFT wall (CCW ⇒ interior on the left of downward
      * travel = the +x side); chain B (botIdx→topIdx, y non-decreasing)
      * is the RIGHT wall. A query either hits a segment strictly
      * between its endpoint ys (side = exact orientation) or sits at a
      * vertex level, where the wall's x-extent is a set of exact
      * vertex coordinates (side = exact coordinate compare). */
    def classify(px: Double, py: Double): Int = {
      if (py < yMin || py > yMax) return Planar.Outside
      val n = xs.length
      var onOrig = false
      var onDiag = false
      var c = 0
      while (c < 2) {
        val start = if (c == 0) topIdx else botIdx
        val len = if (c == 0) (botIdx - topIdx + n) % n else (topIdx - botIdx + n) % n
        @inline def vIdx(pos: Int): Int = (start + pos) % n
        @inline def yAt(pos: Int): Double = ys(vIdx(pos))
        @inline def xAt(pos: Int): Double = xs(vIdx(pos))
        // first chain position whose segment [pos, pos+1] spans py
        var lo = 0
        var hi = len - 1
        while (lo < hi) {
          val mid = (lo + hi) / 2
          val yNext = yAt(mid + 1)
          val covered = if (c == 0) yNext <= py else yNext >= py
          if (covered) hi = mid else lo = mid + 1
        }
        // expand the run over a plateau at py
        var runEnd = lo
        while (runEnd + 1 < len && yAt(runEnd + 1) == py) runEnd += 1
        var strictSide = 0 // -1 outside, +1 inside, 0 undecided
        var vLo = Double.PositiveInfinity
        var vHi = Double.NegativeInfinity
        var pos = lo
        while (pos <= runEnd) {
          val i1 = vIdx(pos); val i2 = vIdx(pos + 1)
          if ((px == xs(i1) && py == ys(i1)) || (px == xs(i2) && py == ys(i2)))
            return Planar.OnBoundary // subdivision vertices are original
          val spans =
            if (c == 0) ys(i1) >= py && py >= ys(i2)
            else ys(i1) <= py && py <= ys(i2)
          if (spans) {
            val o = Robust.orient2d(xs(i1), ys(i1), xs(i2), ys(i2), px, py)
            if (o == 0) {
              if (Math.min(xs(i1), xs(i2)) <= px && px <= Math.max(xs(i1), xs(i2))) {
                if (origEdge(i1)) onOrig = true else onDiag = true
              }
            } else if (ys(i1) != py && ys(i2) != py) {
              // strictly spanning segment decides the side exactly:
              // interior is on the LEFT (o > 0) of the ring direction
              strictSide = if (o > 0) 1 else -1
            } else {
              // vertex-level contact: record the wall's exact x-extent
              if (ys(i1) == py) { vLo = Math.min(vLo, xs(i1)); vHi = Math.max(vHi, xs(i1)) }
              if (ys(i2) == py) { vLo = Math.min(vLo, xs(i2)); vHi = Math.max(vHi, xs(i2)) }
            }
          }
          pos += 1
        }
        if (onOrig || onDiag) { /* boundary handled after both chains */ }
        else if (strictSide == -1) return Planar.Outside
        else if (strictSide == 0 && vLo <= vHi) {
          // side by exact coordinate compare against the wall extent
          val insideHere = if (c == 0) px > vHi else px < vLo
          if (!insideHere) return Planar.Outside
        } else if (strictSide == 0 && vLo > vHi) {
          return Planar.Outside // no contact found (defensive)
        }
        c += 1
      }
      if (onOrig) Planar.OnBoundary
      else Planar.Inside // strictly interior, or on an inserted diagonal
    }
  }

  /** Prepared polygon: the monotone pieces of every part. */
  final class Prepared(val pieces: Array[MonoPoly]) {
    /** Same contract as [[Planar.coordPos]] on the source geometry. */
    def coordPos(x: Double, y: Double): Int = {
      var i = 0
      var any = false
      while (i < pieces.length) {
        pieces(i).classify(x, y) match {
          case Planar.OnBoundary => return Planar.OnBoundary
          case Planar.Inside => any = true
          case _ =>
        }
        i += 1
      }
      if (any) Planar.Inside else Planar.Outside
    }
  }

  /** Build the prepared subdivision; null for non-areal input or if a
    * degeneracy defeats the sweep (callers fall back to the ray
    * cast). */
  def prepare(g: FlatGeom): Prepared = {
    try {
      val pieces = g.kind match {
        case GeomKind.Polygon => subdividePoly(g, 0, g.rings.length)
        case GeomKind.MultiPolygon =>
          val out = ArrayBuffer[MonoPoly]()
          FlatGeom.foreachPart(g)((_, r0, r1) => out ++= subdividePoly(g, r0, r1))
          out.toSeq
        case _ => return null
      }
      if (pieces.isEmpty) null else new Prepared(pieces.toArray)
    } catch {
      case e: Exception =>
        if (sys.env.contains("GRAFT_MONO_DEBUG")) e.printStackTrace()
        null
    }
  }

  /** Diagnostic entry (tests only): pieces + diagnostic counts. */
  def debugSubdivide(g: FlatGeom): (Seq[MonoPoly], Int) = {
    val pieces = subdividePoly(g, 0, g.rings.length)
    (pieces, pieces.map(_.xs.length).sum)
  }

  // ------------------------------------------------- make-monotone sweep

  private final val Start = 0
  private final val End = 1
  private final val Split = 2
  private final val Merge = 3
  private final val Regular = 4

  private def subdividePoly(g: FlatGeom, r0: Int, r1: Int): Seq[MonoPoly] = {
    // vertex soup of all rings (open), exterior CCW and holes CW
    val vx = ArrayBuffer[Double]()
    val vy = ArrayBuffer[Double]()
    val nextV = ArrayBuffer[Int]()
    val prevV = ArrayBuffer[Int]()
    var r = r0
    while (r < r1) {
      val s = g.ringStart(r); val e = g.ringEnd(r)
      var e2 = e
      if (e - s >= 2 && g.x(s) == g.x(e - 1) && g.y(s) == g.y(e - 1)) e2 = e - 1
      val cnt = e2 - s
      if (cnt >= 3) {
        val base = vx.length
        val ccw = Planar.ringWinding(g.coords, s, e) == Planar.CCW
        val wantCcw = r == r0
        var k = 0
        while (k < cnt) {
          val i = if (ccw == wantCcw) s + k else s + (cnt - 1 - k)
          vx += g.x(i); vy += g.y(i)
          k += 1
        }
        k = 0
        while (k < cnt) {
          nextV += base + (k + 1) % cnt
          prevV += base + (k + cnt - 1) % cnt
          k += 1
        }
      }
      r += 1
    }
    val n = vx.length
    if (n < 3) return Nil

    // sweep order: descending y, ties by ascending x
    @inline def below(a: Int, b: Int): Boolean =
      vy(a) < vy(b) || (vy(a) == vy(b) && vx(a) > vx(b))
    val vt = new Array[Int](n)
    var v = 0
    while (v < n) {
      val p = prevV(v); val q = nextV(v)
      val pBelow = below(p, v)
      val qBelow = below(q, v)
      val o = Robust.orient2d(vx(p), vy(p), vx(v), vy(v), vx(q), vy(q))
      vt(v) =
        if (pBelow && qBelow) { if (o > 0) Start else Split }
        else if (!pBelow && !qBelow) { if (o > 0) End else Merge }
        else Regular
      v += 1
    }

    val diagonals = scala.collection.mutable.LinkedHashSet[(Int, Int)]()
    def addDiag(a: Int, b: Int): Unit =
      if (a != b && nextV(a) != b && nextV(b) != a)
        diagonals += (if (a < b) (a, b) else (b, a))

    // status of sweep-crossing edges (edge id = origin vertex);
    // linear-scan status — build is one-off per prepared polygon
    val status = ArrayBuffer[Int]()
    val helper = new Array[Int](n)

    def edgeXat(e: Int, yq: Double): Double = {
      val a = e; val b = nextV(e)
      val y1 = vy(a); val y2 = vy(b)
      if (y1 == y2) Math.min(vx(a), vx(b))
      else vx(a) + (vx(b) - vx(a)) * (yq - y1) / (y2 - y1)
    }
    def leftEdgeOf(q: Int): Int = {
      var best = -1
      var bestX = Double.NegativeInfinity
      status.foreach { e =>
        val x = edgeXat(e, vy(q))
        if (x <= vx(q) && x > bestX) { bestX = x; best = e }
      }
      best
    }

    (0 until n).sortWith((a, b) => below(b, a)).foreach { vtx =>
      vt(vtx) match {
        case Start =>
          status += vtx; helper(vtx) = vtx
        case End =>
          val ep = prevV(vtx)
          if (status.contains(ep)) {
            if (vt(helper(ep)) == Merge) addDiag(vtx, helper(ep))
            status -= ep
          }
        case Split =>
          val ej = leftEdgeOf(vtx)
          if (ej >= 0) { addDiag(vtx, helper(ej)); helper(ej) = vtx }
          status += vtx; helper(vtx) = vtx
        case Merge =>
          val ep = prevV(vtx)
          if (status.contains(ep)) {
            if (vt(helper(ep)) == Merge) addDiag(vtx, helper(ep))
            status -= ep
          }
          val ej = leftEdgeOf(vtx)
          if (ej >= 0) {
            if (vt(helper(ej)) == Merge) addDiag(vtx, helper(ej))
            helper(ej) = vtx
          }
        case Regular =>
          if (below(nextV(vtx), vtx)) { // interior right of v: boundary descends
            val ep = prevV(vtx)
            if (status.contains(ep)) {
              if (vt(helper(ep)) == Merge) addDiag(vtx, helper(ep))
              status -= ep
            }
            status += vtx; helper(vtx) = vtx
          } else {
            val ej = leftEdgeOf(vtx)
            if (ej >= 0) {
              if (vt(helper(ej)) == Merge) addDiag(vtx, helper(ej))
              helper(ej) = vtx
            }
          }
      }
    }

    extractFaces(vx.toArray, vy.toArray, nextV.toArray, diagonals.toSeq)
  }

  // --------------------------------------------------- face extraction

  /** Faces of the diagonal-augmented subdivision: directed edges =
    * ring edges (orig) + both directions of every diagonal; the
    * successor of (u→v) is v's outgoing edge immediately CLOCKWISE of
    * the reversed incoming direction — faces traverse with interior on
    * the left, so the bounded (monotone) faces come out CCW. */
  private def extractFaces(vx: Array[Double], vy: Array[Double],
      nextV: Array[Int], diagonals: Seq[(Int, Int)]): Seq[MonoPoly] = {
    val n = vx.length
    final case class DirEdge(from: Int, to: Int, orig: Boolean) {
      val angle: Double = Math.atan2(vy(to) - vy(from), vx(to) - vx(from))
    }
    val edges = ArrayBuffer[DirEdge]()
    var i = 0
    while (i < n) { edges += DirEdge(i, nextV(i), orig = true); i += 1 }
    diagonals.foreach { case (a, b) =>
      edges += DirEdge(a, b, orig = false)
      edges += DirEdge(b, a, orig = false)
    }
    // outgoing edges per vertex sorted by angle (ascending)
    val outAt = Array.fill(n)(ArrayBuffer[Int]())
    edges.indices.foreach(ei => outAt(edges(ei).from) += ei)
    outAt.foreach(_.sortInPlaceBy(ei => edges(ei).angle))

    def successor(ei: Int): Int = {
      val e = edges(ei)
      val list = outAt(e.to)
      val revAngle = Math.atan2(vy(e.from) - vy(e.to), vx(e.from) - vx(e.to))
      // largest angle strictly below revAngle, cyclic wrap; skip the
      // exact reverse edge unless it is the only option
      var best = -1
      var bestAngle = Double.NegativeInfinity
      var wrap = -1
      var wrapAngle = Double.NegativeInfinity
      list.foreach { ci =>
        val cand = edges(ci)
        val isReverse = cand.to == e.from && cand.angle == revAngle
        if (!isReverse) {
          if (cand.angle < revAngle && cand.angle > bestAngle) { bestAngle = cand.angle; best = ci }
          if (cand.angle > wrapAngle) { wrapAngle = cand.angle; wrap = ci }
        }
      }
      if (best >= 0) best
      else if (wrap >= 0) wrap
      else list.head // only the reverse edge exists (degenerate)
    }

    val visited = new Array[Boolean](edges.length)
    val faces = ArrayBuffer[MonoPoly]()
    edges.indices.foreach { startEi =>
      if (!visited(startEi)) {
        val ringV = ArrayBuffer[Int]()
        val ringOrig = ArrayBuffer[Boolean]()
        var ei = startEi
        var guard = edges.length + 4
        while (!visited(ei) && guard > 0) {
          guard -= 1
          visited(ei) = true
          ringV += edges(ei).from
          ringOrig += edges(ei).orig
          ei = successor(ei)
        }
        if (ringV.length >= 3 && ei == startEi) {
          val fxs = ringV.map(vx).toArray
          val fys = ringV.map(vy).toArray
          var a2 = 0.0
          var k = 0
          while (k < fxs.length) {
            val k2 = (k + 1) % fxs.length
            a2 += fxs(k) * fys(k2) - fxs(k2) * fys(k)
            k += 1
          }
          if (a2 > 0) { // CCW bounded face = monotone piece
            var top = 0; var bot = 0
            k = 1
            while (k < fys.length) {
              if (fys(k) > fys(top) || (fys(k) == fys(top) && fxs(k) < fxs(top))) top = k
              if (fys(k) < fys(bot) || (fys(k) == fys(bot) && fxs(k) > fxs(bot))) bot = k
              k += 1
            }
            faces += new MonoPoly(fxs, fys, top, bot, ringOrig.toArray)
          }
        }
      }
    }
    faces.toSeq
  }
}
