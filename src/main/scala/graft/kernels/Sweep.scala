package graft.kernels

import scala.collection.mutable.ArrayBuffer

/**
 * All-pairs segment intersections via an x-sweep with active-set
 * pruning (the Shamos-Hoey / Bentley-Ottmann family — the reference's
 * `Intersections` sweep iterator, geo/src/algorithm/sweep/iter.rs:141,
 * promises O((n+k) log n); this sweep gives the same output with
 * O(n log n + n·w) where w is the active-window width — equivalent in
 * the distributed setting where inputs are already cell-partitioned
 * and windows are small).
 *
 * Input: interleaved segments (x1,y1,x2,y2) with ids.
 * Output: (idA, idB, Result) for every intersecting pair, idA < idB.
 */
object Sweep {

  final case class Hit(a: Int, b: Int, result: SegIntersect.Result)

  /** Above this many segments, [[intersections]] switches from the
    * x-sweep (O(n·w) candidate tests — fine while cell partitioning
    * bounds the window, degenerate for many long co-located segments)
    * to the event-queue Bentley-Ottmann sweep [[intersectionsBO]]
    * (O((n+k) log n): only status-ADJACENT pieces are ever tested, so
    * n parallel long diagonals cost n log n, not n²). */
  final val BoThreshold = 512

  /** All intersecting pairs: x-sweep for small inputs, Bentley-Ottmann
    * above [[BoThreshold]]. Both report identical pairs (differential-
    * tested); the reported Result always comes from the ORIGINAL
    * segment pair, so the discovery strategy cannot affect values. */
  def intersections(segs: Array[Double], ids: Array[Int]): ArrayBuffer[Hit] =
    if (ids.length > BoThreshold) intersectionsBO(segs, ids)
    else intersectionsXSweep(segs, ids)

  def intersectionsXSweep(segs: Array[Double], ids: Array[Int]): ArrayBuffer[Hit] = {
    val n = ids.length
    val out = ArrayBuffer[Hit]()
    if (n < 2) return out
    // order by minX
    val order = Array.range(0, n).sortBy(i => Math.min(segs(4 * i), segs(4 * i + 2)))
    // active set as a simple buffer pruned by maxX
    val active = ArrayBuffer[Int]()
    var oi = 0
    while (oi < n) {
      val i = order(oi)
      val iMinX = Math.min(segs(4 * i), segs(4 * i + 2))
      // evict segments that ended before this one starts
      var k = active.length - 1
      while (k >= 0) {
        val j = active(k)
        if (Math.max(segs(4 * j), segs(4 * j + 2)) < iMinX) active.remove(k)
        k -= 1
      }
      // candidate tests against the live window
      val iMinY = Math.min(segs(4 * i + 1), segs(4 * i + 3))
      val iMaxY = Math.max(segs(4 * i + 1), segs(4 * i + 3))
      k = 0
      while (k < active.length) {
        val j = active(k)
        val jMinY = Math.min(segs(4 * j + 1), segs(4 * j + 3))
        val jMaxY = Math.max(segs(4 * j + 1), segs(4 * j + 3))
        if (jMaxY >= iMinY && jMinY <= iMaxY) {
          val r = SegIntersect.intersection(
            segs(4 * i), segs(4 * i + 1), segs(4 * i + 2), segs(4 * i + 3),
            segs(4 * j), segs(4 * j + 1), segs(4 * j + 2), segs(4 * j + 3))
          if (r.kind != SegIntersect.None_) {
            val (a, b) = if (ids(i) < ids(j)) (ids(i), ids(j)) else (ids(j), ids(i))
            out += Hit(a, b, r)
          }
        }
        k += 1
      }
      active += i
      oi += 1
    }
    out
  }

  /**
   * Event-queue Bentley-Ottmann (the reference's sweep module shape,
   * geo/src/algorithm/sweep/iter.rs:57-63), with the segment-SPLITTING
   * robustness strategy: when two status-adjacent pieces' parents
   * intersect at a point q ahead of the sweep, the pair is reported
   * (with the exact parent-pair SegIntersect result) and each piece
   * whose interior contains q is split there — q becomes an ordinary
   * endpoint event, so the status never holds an interior crossing and
   * all order comparisons stay endpoint-exact (robust orient2d, no
   * y-at-x arithmetic).
   *
   * Events: lexicographic (x, y) points with start/end piece lists.
   * Status: pieces ordered bottom-to-top along the sweep line;
   * position found by exact orient2d of the event point against piece
   * endpoints; pieces through the event point tie-ordered by outgoing
   * slope. Only pieces that BECOME adjacent are tested, so n parallel
   * long segments cost O(n log n) — the x-sweep's degenerate case.
   */
  def intersectionsBO(segs: Array[Double], ids: Array[Int]): ArrayBuffer[Hit] = {
    val out = ArrayBuffer[Hit]()
    val n = ids.length
    if (n < 2) return out

    // piece store (lex-ordered endpoints: left <= right)
    val px1 = ArrayBuffer[Double](); val py1 = ArrayBuffer[Double]()
    val px2 = ArrayBuffer[Double](); val py2 = ArrayBuffer[Double]()
    val parent = ArrayBuffer[Int]()

    val events = new java.util.TreeMap[(Double, Double), (ArrayBuffer[Int], ArrayBuffer[Int])](
      (a: (Double, Double), b: (Double, Double)) => {
        val c = java.lang.Double.compare(a._1, b._1)
        if (c != 0) c else java.lang.Double.compare(a._2, b._2)
      })
    @inline def eventAt(p: (Double, Double)): (ArrayBuffer[Int], ArrayBuffer[Int]) = {
      var v = events.get(p)
      if (v == null) { v = (ArrayBuffer[Int](), ArrayBuffer[Int]()); events.put(p, v) }
      v
    }
    @inline def lexLess(ax: Double, ay: Double, bx: Double, by: Double): Boolean =
      ax < bx || (ax == bx && ay < by)

    def addPiece(x1: Double, y1: Double, x2: Double, y2: Double, par: Int): Int = {
      // degenerate (zero-length) pieces carry no sweep information
      if (x1 == x2 && y1 == y2) return -1
      val (lx, ly, rx, ry) = if (lexLess(x1, y1, x2, y2)) (x1, y1, x2, y2) else (x2, y2, x1, y1)
      val id = parent.length
      px1 += lx; py1 += ly; px2 += rx; py2 += ry; parent += par
      eventAt((lx, ly))._1 += id
      eventAt((rx, ry))._2 += id
      id
    }
    val seen = new java.util.HashSet[Long]()
    @inline def report(ia: Int, ib: Int, r: SegIntersect.Result): Unit = {
      val (a, b) = if (ids(ia) < ids(ib)) (ids(ia), ids(ib)) else (ids(ib), ids(ia))
      if (seen.add((a.toLong << 32) | (b & 0xffffffffL))) out += Hit(a, b, r)
    }

    var i = 0
    while (i < n) {
      addPiece(segs(4 * i), segs(4 * i + 1), segs(4 * i + 2), segs(4 * i + 3), i)
      i += 1
    }

    // zero-length inputs carry no sweep extent — test them directly
    // against every other segment (rare; exactness over speed)
    i = 0
    while (i < n) {
      if (segs(4 * i) == segs(4 * i + 2) && segs(4 * i + 1) == segs(4 * i + 3)) {
        var j = 0
        while (j < n) {
          if (j != i) {
            val r = SegIntersect.intersection(
              segs(4 * i), segs(4 * i + 1), segs(4 * i + 2), segs(4 * i + 3),
              segs(4 * j), segs(4 * j + 1), segs(4 * j + 2), segs(4 * j + 3))
            if (r.kind != SegIntersect.None_) report(i, j, r)
          }
          j += 1
        }
      }
      i += 1
    }

    // status: piece ids ordered bottom-to-top at the sweep position
    val status = ArrayBuffer[Int]()
    // -1: piece below p, 0: p on the piece's supporting line within its
    // x-span (the zero-run), +1: piece above p
    @inline def cmpVsPoint(pc: Int, px: Double, py: Double): Int = {
      val o = Robust.orient2d(px1(pc), py1(pc), px2(pc), py2(pc), px, py)
      if (o == Robust.CounterClockwise) -1      // p left of l->r = above piece
      else if (o == Robust.Clockwise) 1
      else 0
    }
    // ascending outgoing-slope order for pieces through the same point
    @inline def slopeCmp(a: Int, b: Int): Int = {
      val dax = px2(a) - px1(a); val day = py2(a) - py1(a)
      val dbx = px2(b) - px1(b); val dby = py2(b) - py1(b)
      val o = Robust.orient2d(0, 0, dax, day, dbx, dby)
      if (o == Robust.CounterClockwise) -1      // b steeper than a
      else if (o == Robust.Clockwise) 1
      else java.lang.Integer.compare(parent(a), parent(b))
    }
    @inline def lowerBound(px: Double, py: Double): Int = {
      var lo = 0; var hi = status.length
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (cmpVsPoint(status(mid), px, py) < 0) lo = mid + 1 else hi = mid
      }
      lo
    }
    @inline def upperBound(px: Double, py: Double, from: Int): Int = {
      var k = from
      while (k < status.length && cmpVsPoint(status(k), px, py) == 0) k += 1
      k
    }

    // a pair can surface at several events (both endpoints of both
    // segments, and via tolerant throughs); the SegIntersect result is
    // cached per parent pair so retests cost a hash lookup — but the
    // SPLIT is re-applied on the CURRENT pieces every time (a pair's
    // first test may run through pieces that do not contain the
    // crossing yet; suppressing later split attempts loses rings)
    val resultCache = new java.util.HashMap[Long, SegIntersect.Result]()
    // test a status-adjacent piece pair; on a forward crossing, split
    // the pieces whose interiors contain it
    def testPair(pa: Int, pb: Int, sx: Double, sy: Double): Unit = {
      if (pa < 0 || pb < 0 || parent(pa) == parent(pb)) return
      val ia = parent(pa); val ib = parent(pb)
      val tkey = if (ia < ib) (ia.toLong << 32) | (ib & 0xffffffffL)
                 else (ib.toLong << 32) | (ia & 0xffffffffL)
      var r = resultCache.get(tkey)
      if (r == null) {
        r = SegIntersect.intersection(
          segs(4 * ia), segs(4 * ia + 1), segs(4 * ia + 2), segs(4 * ia + 3),
          segs(4 * ib), segs(4 * ib + 1), segs(4 * ib + 2), segs(4 * ib + 3))
        resultCache.put(tkey, r)
        if (r.kind != SegIntersect.None_) report(ia, ib, r)
      }
      if (r.kind == SegIntersect.SinglePointProper || r.kind == SegIntersect.SinglePointImproper) {
        // split pieces at a crossing strictly ahead of the sweep
        if (lexLess(sx, sy, r.x0, r.y0)) {
          splitAt(pa, r.x0, r.y0)
          splitAt(pb, r.x0, r.y0)
        }
      }
    }
    // truncate piece pc at interior point q; the tail [q, right]
    // becomes a new piece starting at q
    def splitAt(pc: Int, qx: Double, qy: Double): Unit = {
      if (!(lexLess(px1(pc), py1(pc), qx, qy) && lexLess(qx, qy, px2(pc), py2(pc)))) return
      val rx = px2(pc); val ry = py2(pc)
      // move the old end event to q
      val endEv = events.get((rx, ry))
      if (endEv != null) { val ix = endEv._2.indexOf(pc); if (ix >= 0) endEv._2.remove(ix) }
      px2(pc) = qx; py2(pc) = qy
      eventAt((qx, qy))._2 += pc
      addPiece(qx, qy, rx, ry, parent(pc))
    }

    while (!events.isEmpty) {
      val entry = events.pollFirstEntry()
      val (pxv, pyv) = entry.getKey
      val (starts, ends0) = entry.getValue
      // every piece incident to p (ending, starting, or split here);
      // all their parents meet at p, so all pairs among them intersect
      // and must be reported — adjacency alone misses shared-endpoint
      // and multi-crossing pairs
      val incident = ArrayBuffer[Int]()
      // 1) remove pieces ending here (their positions are in the
      //    zero-run; binary search finds its bounds)
      var lo = lowerBound(pxv, pyv)
      var hi = upperBound(pxv, pyv, lo)
      // tolerant run expansion: computed crossing points are rounded
      // off the true supporting lines by ulps, so a piece genuinely
      // passing through p can fail the EXACT orient test and sit just
      // outside the zero-run (seen: a duplicate segment's unsplit twin
      // missing every later adjacency). Pull in neighbours within a
      // relative epsilon of p; they are split at p like exact ones.
      val runEps = 1e-9 * (1.0 + Math.abs(pxv) + Math.abs(pyv))
      @inline def distTo(pc: Int): Double =
        Planar.pointSegDistance(pxv, pyv, px1(pc), py1(pc), px2(pc), py2(pc))
      while (lo - 1 >= 0 && distTo(status(lo - 1)) <= runEps) lo -= 1
      while (hi < status.length && distTo(status(hi)) <= runEps) hi += 1
      // ending pieces MUST leave the status even if roundoff disordered
      // it and they sit outside the run (a stale piece is split again
      // at every later event on its line — an effectively infinite
      // ulp-cascade); fall back to a linear scan when the run misses
      ends0.foreach { e =>
        var idx = -1
        var k = lo
        while (k < hi && idx < 0) { if (status(k) == e) idx = k; k += 1 }
        if (idx < 0) idx = status.indexOf(e)
        if (idx >= 0) {
          status.remove(idx)
          if (idx < lo) { lo -= 1; hi -= 1 }
          else if (idx < hi) hi -= 1
          incident += e
        }
      }
      // 2) pieces remaining in the run pass (within eps) THROUGH p.
      //    They are NOT split — splitting every through piece at every
      //    event turns n collinear overlapping segments into an n³
      //    cascade. Instead their post-p order is restored directly:
      //    pieces through one point order by outgoing slope after it.
      val throughs = new Array[Int](hi - lo)
      var k = lo
      while (k < hi) { throughs(k - lo) = status(k); k += 1 }
      if (throughs.length > 1) {
        val sorted = throughs.clone()
        // insertion sort by slopeCmp (runs are tiny except collinear
        // families, where all compare equal)
        var a = 1
        while (a < sorted.length) {
          val v = sorted(a)
          var b = a - 1
          while (b >= 0 && slopeCmp(sorted(b), v) > 0) { sorted(b + 1) = sorted(b); b -= 1 }
          sorted(b + 1) = v
          a += 1
        }
        k = lo
        while (k < hi) { status(k) = sorted(k - lo); k += 1 }
        System.arraycopy(sorted, 0, throughs, 0, sorted.length)
      }
      // 3) insert pieces starting here, slope-ordered within the run
      var si = 0
      while (si < starts.length) {
        val pc = starts(si)
        if (pc >= 0) {
          var pos = lo
          while (pos < hi && slopeCmp(status(pos), pc) < 0) pos += 1
          status.insert(pos, pc)
          hi += 1
          incident += pc
        }
        si += 1
      }
      // 4) report pairs meeting at p:
      //    - endpoint-incident × endpoint-incident (both end/start
      //      here);
      //    - through × endpoint-incident (through contains p, the
      //      other has an endpoint here);
      //    - NON-PARALLEL through × through: their crossing is ~p, and
      //      with collinear duplicates in the status the classic
      //      became-adjacent-before-crossing invariant fails (twins
      //      block adjacency) — so crossing through pairs must be
      //      tested here. PARALLEL through pairs are skipped: distinct
      //      parallels never intersect, and collinear overlaps are
      //      always discovered at an endpoint event of one of the two
      //      (every overlap has an endpoint of one inside or at the
      //      other) — retesting n collinear throughs pairwise at every
      //      shared event would be n³.
      var t1 = 0
      while (t1 < incident.length) {
        var t2 = t1 + 1
        while (t2 < incident.length) {
          testPair(incident(t1), incident(t2), pxv, pyv)
          t2 += 1
        }
        var t3 = 0
        while (t3 < throughs.length) {
          testPair(incident(t1), throughs(t3), pxv, pyv)
          t3 += 1
        }
        t1 += 1
      }
      var u = 0
      while (u < throughs.length) {
        var v = u + 1
        while (v < throughs.length) {
          val a = throughs(u); val b = throughs(v)
          val para = Robust.orient2d(0, 0, px2(a) - px1(a), py2(a) - py1(a),
            px2(b) - px1(b), py2(b) - py1(b)) == Robust.Collinear
          if (!para) testPair(a, b, pxv, pyv)
          v += 1
        }
        u += 1
      }
      // 5) new adjacencies at the run borders (or across the gap)
      if (lo - 1 >= 0 && lo < status.length) testPair(status(lo - 1), status(lo), pxv, pyv)
      if (hi < status.length && hi - 1 >= 0) testPair(status(hi - 1), status(hi), pxv, pyv)
      // splits AT p (step 2) re-register tail starts under the
      // already-polled key; drop any such entry or p would process
      // twice and duplicate pieces into the status (testPair splits
      // are strictly ahead of p, so nothing legitimate is lost)
      events.remove((pxv, pyv))
    }
    out
  }
}
