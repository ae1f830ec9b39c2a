package graft.kernels

import graft.core.{FlatGeom, GeomKind}
import scala.collection.mutable.ArrayBuffer

/**
 * DE-9IM intersection matrix (the reference's `Relate` trait,
 * geo/src/algorithm/relate/mod.rs:57, and `IntersectionMatrix`
 * predicate surface, relate/geomgraph/intersection_matrix.rs:269-607).
 *
 * Engine: boundary-subdivision classification rather than a geomgraph
 * port — each geometry's boundary segments are split at every robust
 * intersection with the other geometry's segments, then each
 * sub-segment midpoint and vertex is classified In/On/Out against the
 * other geometry. Interior/exterior entries follow from openness of
 * interiors (a boundary point of A strictly inside B implies nearby
 * interior of A is inside B). Sound for valid OGC-SFA inputs; the same
 * observable semantics as the reference's RelateOperation for the
 * supported corpus.
 */
object Relate {

  final val F = -1 // empty
  // dims: 0, 1, 2 as ints

  /** 3×3 matrix flattened row-major:
    * [II IB IE, BI BB BE, EI EB EE], values in {-1,0,1,2}. */
  def relate(a: FlatGeom, b: FlatGeom): Array[Int] = {
    val m = Array.fill(9)(F)
    m(8) = 2 // EE
    if (a.isEmpty && b.isEmpty) return m
    if (a.isEmpty) {
      // A empty: only E row can intersect B
      m(6) = interiorDim(b); m(7) = boundaryDim(b)
      return m
    }
    if (b.isEmpty) {
      m(2) = interiorDim(a); m(5) = boundaryDim(a)
      return m
    }

    val a1 = collapseDegenerateLines(a)
    val b1 = collapseDegenerateLines(b)
    val da = dimClass(a1)
    val db = dimClass(b1)
    (da, db) match {
      case (0, 0) => relatePP(a1, b1, m)
      case (0, 1) => relatePL(a1, b1, m, flip = false)
      case (1, 0) => relatePL(b1, a1, m, flip = true)
      case (0, 2) => relatePA(a1, b1, m, flip = false)
      case (2, 0) => relatePA(b1, a1, m, flip = true)
      case (1, 1) => relateLL(a1, b1, m)
      case (1, 2) => relateLA(a1, b1, m, flip = false)
      case (2, 1) => relateLA(b1, a1, m, flip = true)
      case _ => relateAA(a1, b1, m)
    }
    m
  }

  /** JTS semantics for degenerate lineal input: a lineal geometry whose
    * every component is zero-length (all points identical, e.g.
    * LINESTRING(a a)) is topologically a point set — its interior has
    * dimension 0 and it has no boundary (validate TestRelatePL
    * "zero-length line" cases). Collapse it so relate dispatches on
    * the effective dimension. */
  private def collapseDegenerateLines(g: FlatGeom): FlatGeom = {
    if (dimClass(g) != 1) return g
    var allDegenerate = true
    FlatGeom.foreachRing(g) { (s, e) =>
      var i = s
      while (i < e) {
        if (g.x(i) != g.x(s) || g.y(i) != g.y(s)) allDegenerate = false
        i += 1
      }
    }
    if (!allDegenerate) g
    else {
      val buf = scala.collection.mutable.ArrayBuffer[Double]()
      FlatGeom.foreachRing(g) { (s, e) =>
        if (e > s) { buf += g.x(s); buf += g.y(s) }
      }
      FlatGeom.multiPoint(buf.toArray)
    }
  }

  def matrixString(m: Array[Int]): String =
    m.map {
      case F => 'F'
      case 0 => '0'
      case 1 => '1'
      case 2 => '2'
    }.mkString

  /** `matches` pattern DSL: T = any non-empty, F = empty, * = anything,
    * 0/1/2 exact dims (intersection_matrix.rs matches()). */
  def matches(m: Array[Int], pattern: String): Boolean = {
    require(pattern.length == 9, "DE-9IM pattern must have 9 chars")
    (0 until 9).forall { i =>
      pattern.charAt(i) match {
        case 'T' | 't' => m(i) != F
        case 'F' | 'f' => m(i) == F
        case '*' => true
        case '0' => m(i) == 0
        case '1' => m(i) == 1
        case '2' => m(i) == 2
        case c => throw new IllegalArgumentException(s"bad DE-9IM pattern char $c")
      }
    }
  }

  // predicate surface (intersection_matrix.rs:269-607)
  def isDisjoint(m: Array[Int]): Boolean =
    m(0) == F && m(1) == F && m(3) == F && m(4) == F
  def isIntersects(m: Array[Int]): Boolean = !isDisjoint(m)
  def isWithin(m: Array[Int]): Boolean = m(0) != F && m(2) == F && m(5) == F
  def isContains(m: Array[Int]): Boolean = m(0) != F && m(6) == F && m(7) == F
  /** Any two EMPTY geometries are topologically equal (the all-F
    * "empty disjoint" matrix — intersection_matrix.rs:316-320). */
  def isEqualTopo(m: Array[Int]): Boolean =
    (0 to 7).forall(m(_) == F) ||
      (m(0) != F && m(2) == F && m(5) == F && m(6) == F && m(7) == F)
  def isCoveredBy(m: Array[Int]): Boolean =
    (m(0) != F || m(1) != F || m(3) != F || m(4) != F) && m(2) == F && m(5) == F
  def isCovers(m: Array[Int]): Boolean =
    (m(0) != F || m(1) != F || m(3) != F || m(4) != F) && m(6) == F && m(7) == F
  def isTouches(m: Array[Int]): Boolean =
    m(0) == F && (m(1) != F || m(3) != F || m(4) != F)
  def isCrosses(m: Array[Int], dimA: Int, dimB: Int): Boolean = {
    if (dimA < dimB) m(0) != F && m(2) != F
    else if (dimA > dimB) m(0) != F && m(6) != F
    else if (dimA == 1 && dimB == 1) m(0) == 0
    else false
  }
  def isOverlaps(m: Array[Int], dimA: Int, dimB: Int): Boolean = {
    if (dimA == dimB) {
      if (dimA == 1) m(0) == 1 && m(2) != F && m(6) != F
      else m(0) != F && m(2) != F && m(6) != F
    } else false
  }

  // --------------------------------------------------------- helpers

  def dimClass(g: FlatGeom): Int = g.kind match {
    case GeomKind.Point | GeomKind.MultiPoint => 0
    case GeomKind.LineString | GeomKind.MultiLineString => 1
    case _ => 2
  }

  private def interiorDim(g: FlatGeom): Int = dimClass(g)
  private def boundaryDim(g: FlatGeom): Int = dimClass(g) match {
    case 0 => F
    case 1 => if (lineBoundaryPoints(g).isEmpty) F else 0
    case _ => 1
  }

  /** Boundary points of lineal geometries (mod-2 rule: endpoint of an
    * odd number of component lines). */
  def lineBoundaryPoints(g: FlatGeom): Set[(Double, Double)] = {
    val counts = scala.collection.mutable.Map[(Double, Double), Int]()
    FlatGeom.foreachRing(g) { (s, e) =>
      if (e - s >= 2) {
        val closed = g.x(s) == g.x(e - 1) && g.y(s) == g.y(e - 1)
        if (!closed) {
          counts((g.x(s), g.y(s))) = counts.getOrElse((g.x(s), g.y(s)), 0) + 1
          counts((g.x(e - 1), g.y(e - 1))) = counts.getOrElse((g.x(e - 1), g.y(e - 1)), 0) + 1
        }
      }
    }
    counts.filter(_._2 % 2 == 1).keySet.toSet
  }

  /** Split every segment of `g` at its intersections with segments of
    * `other`; returns sub-segments as (x1,y1,x2,y2). */
  /** A boundary sub-segment between consecutive cut points; `on` marks
    * sub-segments covered by a collinear-overlap interval with the
    * OTHER geometry's boundary — decided exactly in parameter space,
    * so arbitrarily thin slivers never fold into the boundary the way
    * a distance tolerance would (TestRelateAA-big's 1e15-long skinny
    * triangle). */
  final case class SubSeg(x1: Double, y1: Double, x2: Double, y2: Double, on: Boolean)

  /** Above this many segments on the scanned side, index it with an
    * STR-tree and query by segment bbox instead of scanning all pairs
    * (the reference's segment R*-tree, geometry_graph.rs:49). Exact:
    * disjoint-bbox segment pairs can never intersect or overlap, so
    * pruning cannot change the subdivision. */
  private final val SubdivideIndexThreshold = 64

  private def subdivide(g: FlatGeom, other: FlatGeom): Array[SubSeg] = {
    val out = ArrayBuffer[SubSeg]()
    val otherSegs = other.numPoints - other.rings.length
    val indexed =
      if (otherSegs >= SubdivideIndexThreshold) graft.index.STRtree.ofSegments(other) else null
    FlatGeom.foreachRing(g) { (s, e) =>
      var i = s
      while (i < e - 1) {
        val x1 = g.x(i); val y1 = g.y(i); val x2 = g.x(i + 1); val y2 = g.y(i + 1)
        // collect cut parameters t along this segment, plus the
        // collinear-overlap coverage intervals
        val ts = ArrayBuffer[Double](0.0, 1.0)
        val onIv = ArrayBuffer[(Double, Double)]()
        @inline def cutAgainst(ox1: Double, oy1: Double, ox2: Double, oy2: Double): Unit = {
          val r = SegIntersect.intersection(x1, y1, x2, y2, ox1, oy1, ox2, oy2)
          if (r.kind == SegIntersect.SinglePointProper || r.kind == SegIntersect.SinglePointImproper) {
            ts += paramOn(x1, y1, x2, y2, r.x0, r.y0)
          } else if (r.kind == SegIntersect.CollinearOverlap) {
            val ta = paramOn(x1, y1, x2, y2, r.x0, r.y0)
            val tb = paramOn(x1, y1, x2, y2, r.x1, r.y1)
            ts += ta; ts += tb
            onIv += ((Math.min(ta, tb), Math.max(ta, tb)))
          }
        }
        if (indexed != null) {
          val (tree, ox1, oy1, ox2, oy2) = indexed
          val hits = tree.query(Math.min(x1, x2), Math.min(y1, y2),
            Math.max(x1, x2), Math.max(y1, y2))
          var h = 0
          while (h < hits.length) {
            val k = hits(h)
            cutAgainst(ox1(k), oy1(k), ox2(k), oy2(k))
            h += 1
          }
        } else {
          FlatGeom.foreachRing(other) { (os, oe) =>
            var j = os
            while (j < oe - 1) {
              cutAgainst(other.x(j), other.y(j), other.x(j + 1), other.y(j + 1))
              j += 1
            }
          }
        }
        val sorted = ts.filter(t => t >= 0.0 && t <= 1.0).distinct.sorted
        var k = 0
        while (k < sorted.length - 1) {
          val t0 = sorted(k); val t1 = sorted(k + 1)
          if (t1 > t0) {
            val tm = (t0 + t1) / 2.0
            val on = onIv.exists(iv => iv._1 <= tm && tm <= iv._2)
            out += SubSeg(x1 + t0 * (x2 - x1), y1 + t0 * (y2 - y1),
              x1 + t1 * (x2 - x1), y1 + t1 * (y2 - y1), on)
          }
          k += 1
        }
        i += 1
      }
    }
    out.toArray
  }

  @inline private def paramOn(x1: Double, y1: Double, x2: Double, y2: Double,
      px: Double, py: Double): Double = {
    val dx = x2 - x1; val dy = y2 - y1
    if (Math.abs(dx) >= Math.abs(dy)) { if (dx == 0.0) 0.0 else (px - x1) / dx }
    else (py - y1) / dy
  }

  @inline private def maxDim(cur: Int, d: Int): Int = Math.max(cur, d)

  /** 0-dim intersection points between two geometries' segments that
    * are NOT in `exclude` (used for point-crossings of lines/rings). */
  private def pointIntersections(a: FlatGeom, b: FlatGeom,
      exclude: Set[(Double, Double)]): Boolean = {
    var found = false
    FlatGeom.foreachRing(a) { (s, e) =>
      var i = s
      while (i < e - 1 && !found) {
        FlatGeom.foreachRing(b) { (bs, be) =>
          var j = bs
          while (j < be - 1 && !found) {
            val r = SegIntersect.intersection(a.x(i), a.y(i), a.x(i + 1), a.y(i + 1),
              b.x(j), b.y(j), b.x(j + 1), b.y(j + 1))
            if ((r.kind == SegIntersect.SinglePointProper ||
                r.kind == SegIntersect.SinglePointImproper) &&
                !exclude.contains((r.x0, r.y0))) found = true
            j += 1
          }
        }
        i += 1
      }
    }
    found
  }

  // ------------------------------------------------------ point pairs

  private def relatePP(a: FlatGeom, b: FlatGeom, m: Array[Int]): Unit = {
    val as = (0 until a.numPoints).map(i => (a.x(i), a.y(i))).toSet
    val bs = (0 until b.numPoints).map(i => (b.x(i), b.y(i))).toSet
    if ((as & bs).nonEmpty) m(0) = 0
    if ((as -- bs).nonEmpty) m(2) = 0
    if ((bs -- as).nonEmpty) m(6) = 0
  }

  // ------------------------------------------------------ point-line

  private def relatePL(p: FlatGeom, l: FlatGeom, m: Array[Int], flip: Boolean): Unit = {
    val bpts = lineBoundaryPoints(l)
    var ii = F; var ib = F; var ie = F
    var i = 0
    while (i < p.numPoints) {
      val x = p.x(i); val y = p.y(i)
      if (bpts.contains((x, y))) ib = 0
      else if (Planar.coordPos(l, x, y) != Planar.Outside) ii = 0
      else ie = 0
      i += 1
    }
    // does the line's interior/boundary extend beyond the points? lines
    // always have 1-dim interior not coverable by points
    val out = m
    if (!flip) {
      out(0) = ii; out(1) = ib; out(2) = ie
      out(3) = F; out(4) = F; out(5) = F // points have no boundary
      out(6) = 1 // line interior minus finitely many points is 1-dim
      out(7) = if (bpts.isEmpty) F else 0
    } else {
      out(0) = ii; out(3) = ib; out(6) = ie
      out(1) = F; out(4) = F; out(7) = F
      out(2) = 1
      out(5) = if (bpts.isEmpty) F else 0
    }
    // refine EB: if every boundary point of l coincides with a point of p
    if (bpts.nonEmpty) {
      val ps = (0 until p.numPoints).map(i2 => (p.x(i2), p.y(i2))).toSet
      val uncovered = bpts -- ps
      val v = if (uncovered.nonEmpty) 0 else F
      if (!flip) out(7) = v else out(5) = v
    }
  }

  // ------------------------------------------------------ point-area

  private def relatePA(p: FlatGeom, a: FlatGeom, m: Array[Int], flip: Boolean): Unit = {
    var ii = F; var ib = F; var ie = F
    var i = 0
    while (i < p.numPoints) {
      Planar.coordPos(a, p.x(i), p.y(i)) match {
        case Planar.Inside => ii = 0
        case Planar.OnBoundary => ib = 0
        case _ => ie = 0
      }
      i += 1
    }
    if (!flip) {
      m(0) = ii; m(1) = ib; m(2) = ie
      m(3) = F; m(4) = F; m(5) = F
      m(6) = 2; m(7) = 1 // area interior/boundary never covered by points
    } else {
      m(0) = ii; m(3) = ib; m(6) = ie
      m(1) = F; m(4) = F; m(7) = F
      m(2) = 2; m(5) = 1
    }
  }

  // ------------------------------------------------------- line-line

  private def relateLL(a: FlatGeom, b: FlatGeom, m: Array[Int]): Unit = {
    val aB = lineBoundaryPoints(a)
    val bB = lineBoundaryPoints(b)
    val subsA = subdivide(a, b)
    val subsB = subdivide(b, a)

    // classify sub-segments of A against B (exact: collinear-overlap
    // coverage is carried by the subdivision itself)
    var ii = F; var ie = F
    subsA.foreach { sub => if (sub.on) ii = 1 else ie = 1 }
    var ei = F
    subsB.foreach { sub => if (!sub.on) ei = 1 }
    // 0-dim interior-interior crossings: intersection points that are
    // not on collinear overlaps and not boundary points of either
    if (ii == F) {
      var found = false
      FlatGeom.foreachRing(a) { (s, e) =>
        var i = s
        while (i < e - 1 && !found) {
          FlatGeom.foreachRing(b) { (bs, be) =>
            var j = bs
            while (j < be - 1 && !found) {
              val r = SegIntersect.intersection(a.x(i), a.y(i), a.x(i + 1), a.y(i + 1),
                b.x(j), b.y(j), b.x(j + 1), b.y(j + 1))
              if (r.kind == SegIntersect.SinglePointProper ||
                  r.kind == SegIntersect.SinglePointImproper) {
                val pt = (r.x0, r.y0)
                if (!aB.contains(pt) && !bB.contains(pt)) found = true
              }
              j += 1
            }
          }
          i += 1
        }
      }
      if (found) ii = 0
    }
    m(0) = ii; m(2) = ie; m(6) = ei
    // boundary rows/cols
    m(3) = if (aB.exists(p => !bB.contains(p) && Planar.coordPos(b, p._1, p._2) != Planar.Outside)) 0 else F
    m(4) = if ((aB & bB).nonEmpty) 0 else F
    m(5) = if (aB.exists(p => !bB.contains(p) && Planar.coordPos(b, p._1, p._2) == Planar.Outside)) 0 else F
    m(1) = if (bB.exists(p => !aB.contains(p) && Planar.coordPos(a, p._1, p._2) != Planar.Outside)) 0 else F
    m(7) = if (bB.exists(p => !aB.contains(p) && Planar.coordPos(a, p._1, p._2) == Planar.Outside)) 0 else F
  }

  // ------------------------------------------------------- line-area

  private def relateLA(l: FlatGeom, a: FlatGeom, m: Array[Int], flip: Boolean): Unit = {
    val lB = lineBoundaryPoints(l)
    val subs = subdivide(l, a)
    var ii = F; var ib = F; var ie = F
    subs.foreach { sub =>
      if (sub.on) ib = 1
      else {
        val mx = (sub.x1 + sub.x2) / 2.0; val my = (sub.y1 + sub.y2) / 2.0
        Planar.coordPos(a, mx, my) match {
          case Planar.Inside => ii = 1
          case Planar.OnBoundary => ib = 1 // midpoint ulp-on-ring
          case _ => ie = 1
        }
      }
    }
    // 0-dim ring crossings: the line's interior meets the area's
    // boundary at isolated points (not along it, not at line endpoints)
    if (ib == F && pointIntersections(l, a, lB)) ib = 0
    var bi = F; var bb = F; var be = F
    lB.foreach { p =>
      Planar.coordPos(a, p._1, p._2) match {
        case Planar.Inside => bi = 0
        case Planar.OnBoundary => bb = 0
        case _ => be = 0
      }
    }
    // area side: interior always 2-dim beyond a line; boundary of the
    // area not coverable by the line except along collinear overlap
    val boundaryCovered = false // a 1-dim line can never cover the full ring set? it can lie ON it though
    // EB: does the area's boundary extend beyond the line? classify the
    // area's boundary sub-segments against the line
    val areaBoundarySubs = subdivide(a, l)
    var ebDim = F
    areaBoundarySubs.foreach { sub => if (!sub.on) ebDim = 1 }
    if (!flip) {
      m(0) = ii; m(1) = ib; m(2) = ie
      m(3) = bi; m(4) = bb; m(5) = be
      m(6) = 2; m(7) = ebDim
    } else {
      m(0) = ii; m(3) = ib; m(6) = ie
      m(1) = bi; m(4) = bb; m(7) = be
      m(2) = 2; m(5) = ebDim
    }
  }

  // ------------------------------------------------------- area-area

  private def relateAA(a: FlatGeom, b: FlatGeom, m: Array[Int]): Unit = {
    val subsA = subdivide(a, b)
    val subsB = subdivide(b, a)

    var aBinB = false // some A-boundary strictly inside B
    var aBonB = false // collinear boundary overlap
    var aBoutB = false
    subsA.foreach { sub =>
      if (sub.on) aBonB = true
      else {
        val mx = (sub.x1 + sub.x2) / 2.0; val my = (sub.y1 + sub.y2) / 2.0
        Planar.coordPos(b, mx, my) match {
          case Planar.Inside => aBinB = true
          case Planar.OnBoundary => aBonB = true // midpoint ulp-on-ring
          case _ => aBoutB = true
        }
      }
    }
    var bBinA = false
    var bBonA = false
    var bBoutA = false
    subsB.foreach { sub =>
      if (sub.on) bBonA = true
      else {
        val mx = (sub.x1 + sub.x2) / 2.0; val my = (sub.y1 + sub.y2) / 2.0
        Planar.coordPos(a, mx, my) match {
          case Planar.Inside => bBinA = true
          case Planar.OnBoundary => bBonA = true
          case _ => bBoutA = true
        }
      }
    }
    val repA = Topo.representativePoint(a)
    val repB = Topo.representativePoint(b)
    val aInB = repA != null && Planar.coordPos(b, repA(0), repA(1)) == Planar.Inside
    val bInA = repB != null && Planar.coordPos(a, repB(0), repB(1)) == Planar.Inside

    // II: interiors meet iff a boundary of one passes through the
    // interior of the other (openness ⇒ 2-dim overlap nearby), or a
    // representative interior point lies strictly inside the other
    // (containment / equality cases)
    m(0) = if (aBinB || bBinA || aInB || bInA) 2 else F
    // IB: B's boundary through A's interior
    m(1) = if (bBinA) 1 else F
    // IE: A's interior beyond B — boundary of A outside B, or B's
    // boundary inside A (both sides of that boundary are in A's
    // interior and one side is B's exterior, e.g. A covering a hole
    // of an annular B), or A's boundary lying entirely ON B's boundary
    // while A's interior is NOT in B (A exactly filling a hole of B:
    // no sub-segment is strictly in/out, but the representative
    // interior point lands in B's exterior)
    m(2) = if (aBoutB || bBinA || (aBonB && !aBinB && !aInB)) 2 else F
    // BI
    m(3) = if (aBinB) 1 else F
    // BB: 1-dim along collinear overlaps, else 0-dim point contacts
    m(4) = if (aBonB) 1 else if (boundariesTouch(a, b)) 0 else F
    // BE
    m(5) = if (aBoutB) 1 else F
    // EI: B's interior beyond A (symmetric reasoning, incl. B exactly
    // filling a hole of A)
    m(6) = if (bBoutA || aBinB || (bBonA && !bBinA && !bInA)) 2 else F
    // EB
    m(7) = if (bBoutA) 1 else F
  }

  private def boundariesTouch(a: FlatGeom, b: FlatGeom): Boolean = {
    var found = false
    FlatGeom.foreachRing(a) { (s, e) =>
      var i = s
      while (i < e - 1 && !found) {
        FlatGeom.foreachRing(b) { (bs, be) =>
          var j = bs
          while (j < be - 1 && !found) {
            if (SegIntersect.intersects(a.x(i), a.y(i), a.x(i + 1), a.y(i + 1),
              b.x(j), b.y(j), b.x(j + 1), b.y(j + 1))) found = true
            j += 1
          }
        }
        i += 1
      }
    }
    found
  }
}
