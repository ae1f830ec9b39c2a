package graft.kernels

/**
 * Robust segment-segment intersection, re-derived from the reference's
 * `line_intersection` (geo/src/algorithm/line_intersection.rs:66-290),
 * itself modeled on JTS's RobustLineIntersector: bbox pretest, robust
 * orient2d filters, exact endpoint duplication, homogeneous-coordinate
 * proper intersection conditioned by midpoint shift, and the
 * nearest-endpoint fallback when conditioning fails.
 */
object SegIntersect {

  final val None_ = 0
  final val SinglePointProper = 1
  final val SinglePointImproper = 2
  final val CollinearOverlap = 3

  /** Result: kind + up to 2 coords (x0,y0,x1,y1; single-point fills x0,y0). */
  final case class Result(kind: Int, x0: Double, y0: Double, x1: Double, y1: Double)

  private val NoResult = Result(None_, Double.NaN, Double.NaN, Double.NaN, Double.NaN)

  @inline private def bboxOverlap(
      ax1: Double, ay1: Double, ax2: Double, ay2: Double,
      bx1: Double, by1: Double, bx2: Double, by2: Double): Boolean = {
    Math.min(ax1, ax2) <= Math.max(bx1, bx2) && Math.max(ax1, ax2) >= Math.min(bx1, bx2) &&
      Math.min(ay1, ay2) <= Math.max(by1, by2) && Math.max(ay1, ay2) >= Math.min(by1, by2)
  }

  @inline private def inBbox(x1: Double, y1: Double, x2: Double, y2: Double, px: Double, py: Double): Boolean =
    Math.min(x1, x2) <= px && px <= Math.max(x1, x2) && Math.min(y1, y2) <= py && py <= Math.max(y1, y2)

  /** Boolean "do these segments intersect at all" (cheap predicate). */
  def intersects(px1: Double, py1: Double, px2: Double, py2: Double,
      qx1: Double, qy1: Double, qx2: Double, qy2: Double): Boolean = {
    if (!bboxOverlap(px1, py1, px2, py2, qx1, qy1, qx2, qy2)) return false
    val pq1 = Robust.orient2d(px1, py1, px2, py2, qx1, qy1)
    val pq2 = Robust.orient2d(px1, py1, px2, py2, qx2, qy2)
    if ((pq1 == Robust.Clockwise && pq2 == Robust.Clockwise) ||
        (pq1 == Robust.CounterClockwise && pq2 == Robust.CounterClockwise)) return false
    val qp1 = Robust.orient2d(qx1, qy1, qx2, qy2, px1, py1)
    val qp2 = Robust.orient2d(qx1, qy1, qx2, qy2, px2, py2)
    if ((qp1 == Robust.Clockwise && qp2 == Robust.Clockwise) ||
        (qp1 == Robust.CounterClockwise && qp2 == Robust.CounterClockwise)) return false
    true // bbox overlap + no separating side ⇒ intersection (incl. collinear)
  }

  /** True when the interiors properly cross (strict crossing). */
  def properlyCross(px1: Double, py1: Double, px2: Double, py2: Double,
      qx1: Double, qy1: Double, qx2: Double, qy2: Double): Boolean = {
    val pq1 = Robust.orient2d(px1, py1, px2, py2, qx1, qy1)
    val pq2 = Robust.orient2d(px1, py1, px2, py2, qx2, qy2)
    if (pq1 * pq2 >= 0) return false
    val qp1 = Robust.orient2d(qx1, qy1, qx2, qy2, px1, py1)
    val qp2 = Robust.orient2d(qx1, qy1, qx2, qy2, px2, py2)
    qp1 * qp2 < 0
  }

  /** Full JTS-style intersection (line_intersection.rs:66-148). */
  def intersection(px1: Double, py1: Double, px2: Double, py2: Double,
      qx1: Double, qy1: Double, qx2: Double, qy2: Double): Result = {
    if (!bboxOverlap(px1, py1, px2, py2, qx1, qy1, qx2, qy2)) return NoResult

    val pq1 = Robust.orient2d(px1, py1, px2, py2, qx1, qy1)
    val pq2 = Robust.orient2d(px1, py1, px2, py2, qx2, qy2)
    if ((pq1 == Robust.Clockwise && pq2 == Robust.Clockwise) ||
        (pq1 == Robust.CounterClockwise && pq2 == Robust.CounterClockwise)) return NoResult

    val qp1 = Robust.orient2d(qx1, qy1, qx2, qy2, px1, py1)
    val qp2 = Robust.orient2d(qx1, qy1, qx2, qy2, px2, py2)
    if ((qp1 == Robust.Clockwise && qp2 == Robust.Clockwise) ||
        (qp1 == Robust.CounterClockwise && qp2 == Robust.CounterClockwise)) return NoResult

    if (pq1 == Robust.Collinear && pq2 == Robust.Collinear &&
        qp1 == Robust.Collinear && qp2 == Robust.Collinear)
      return collinearIntersection(px1, py1, px2, py2, qx1, qy1, qx2, qy2)

    if (pq1 == Robust.Collinear || pq2 == Robust.Collinear ||
        qp1 == Robust.Collinear || qp2 == Robust.Collinear) {
      // endpoint-exact duplication for robustness (line_intersection.rs:100-130)
      var ix = 0.0; var iy = 0.0
      if ((px1 == qx1 && py1 == qy1) || (px1 == qx2 && py1 == qy2)) { ix = px1; iy = py1 }
      else if ((px2 == qx1 && py2 == qy1) || (px2 == qx2 && py2 == qy2)) { ix = px2; iy = py2 }
      else if (pq1 == Robust.Collinear) { ix = qx1; iy = qy1 }
      else if (pq2 == Robust.Collinear) { ix = qx2; iy = qy2 }
      else if (qp1 == Robust.Collinear) { ix = px1; iy = py1 }
      else { ix = px2; iy = py2 }
      Result(SinglePointImproper, ix, iy, Double.NaN, Double.NaN)
    } else {
      val p = properIntersection(px1, py1, px2, py2, qx1, qy1, qx2, qy2)
      Result(SinglePointProper, p(0), p(1), Double.NaN, Double.NaN)
    }
  }

  /** line_intersection.rs:151-186. */
  private def collinearIntersection(px1: Double, py1: Double, px2: Double, py2: Double,
      qx1: Double, qy1: Double, qx2: Double, qy2: Double): Result = {
    val q1inP = inBbox(px1, py1, px2, py2, qx1, qy1)
    val q2inP = inBbox(px1, py1, px2, py2, qx2, qy2)
    val p1inQ = inBbox(qx1, qy1, qx2, qy2, px1, py1)
    val p2inQ = inBbox(qx1, qy1, qx2, qy2, px2, py2)

    @inline def coll(x1: Double, y1: Double, x2: Double, y2: Double) =
      Result(CollinearOverlap, x1, y1, x2, y2)
    @inline def improper(x: Double, y: Double) =
      Result(SinglePointImproper, x, y, Double.NaN, Double.NaN)

    if (q1inP && q2inP) coll(qx1, qy1, qx2, qy2)
    else if (p1inQ && p2inQ) coll(px1, py1, px2, py2)
    else if (q1inP && p1inQ && qx1 == px1 && qy1 == py1 && !q2inP && !p2inQ) improper(qx1, qy1)
    else if (q1inP && p1inQ) coll(qx1, qy1, px1, py1)
    else if (q1inP && p2inQ && qx1 == px2 && qy1 == py2 && !q2inP && !p1inQ) improper(qx1, qy1)
    else if (q1inP && p2inQ) coll(qx1, qy1, px2, py2)
    else if (q2inP && p1inQ && qx2 == px1 && qy2 == py1 && !q1inP && !p2inQ) improper(qx2, qy2)
    else if (q2inP && p1inQ) coll(qx2, qy2, px1, py1)
    else if (q2inP && p2inQ && qx2 == px2 && qy2 == py2 && !q1inP && !p1inQ) improper(qx2, qy2)
    else if (q2inP && p2inQ) coll(qx2, qy2, px2, py2)
    else NoResult
  }

  /** line_intersection.rs:217-290: conditioned homogeneous intersection
    * with nearest-endpoint fallback. */
  def properIntersection(px1: Double, py1: Double, px2: Double, py2: Double,
      qx1: Double, qy1: Double, qx2: Double, qy2: Double): Array[Double] = {
    val raw = rawIntersection(px1, py1, px2, py2, qx1, qy1, qx2, qy2)
    var ix = 0.0; var iy = 0.0
    if (raw == null) {
      val ne = nearestEndpoint(px1, py1, px2, py2, qx1, qy1, qx2, qy2)
      ix = ne(0); iy = ne(1)
    } else { ix = raw(0); iy = raw(1) }
    if (!(inBbox(px1, py1, px2, py2, ix, iy) && inBbox(qx1, qy1, qx2, qy2, ix, iy))) {
      val ne = nearestEndpoint(px1, py1, px2, py2, qx1, qy1, qx2, qy2)
      ix = ne(0); iy = ne(1)
    }
    Array(ix, iy)
  }

  private def rawIntersection(px1: Double, py1: Double, px2: Double, py2: Double,
      qx1: Double, qy1: Double, qx2: Double, qy2: Double): Array[Double] = {
    val pMinX = Math.min(px1, px2); val pMaxX = Math.max(px1, px2)
    val pMinY = Math.min(py1, py2); val pMaxY = Math.max(py1, py2)
    val qMinX = Math.min(qx1, qx2); val qMaxX = Math.max(qx1, qx2)
    val qMinY = Math.min(qy1, qy2); val qMaxY = Math.max(qy1, qy2)
    val midX = (Math.max(pMinX, qMinX) + Math.min(pMaxX, qMaxX)) / 2.0
    val midY = (Math.max(pMinY, qMinY) + Math.min(pMaxY, qMaxY)) / 2.0

    val p1x = px1 - midX; val p1y = py1 - midY
    val p2x = px2 - midX; val p2y = py2 - midY
    val q1x = qx1 - midX; val q1y = qy1 - midY
    val q2x = qx2 - midX; val q2y = qy2 - midY

    val ppx = p1y - p2y
    val ppy = p2x - p1x
    val pw = p1x * p2y - p2x * p1y
    val qqx = q1y - q2y
    val qqy = q2x - q1x
    val qw = q1x * q2y - q2x * q1y

    val xw = ppy * qw - qqy * pw
    val yw = qqx * pw - ppx * qw
    val w = ppx * qqy - qqx * ppy
    val xInt = xw / w
    val yInt = yw / w
    if (xInt.isNaN || xInt.isInfinite || yInt.isNaN || yInt.isInfinite) null
    else Array(xInt + midX, yInt + midY)
  }

  private def nearestEndpoint(px1: Double, py1: Double, px2: Double, py2: Double,
      qx1: Double, qy1: Double, qx2: Double, qy2: Double): Array[Double] = {
    var nx = px1; var ny = py1
    var minDist = Planar.pointSegDistance(px1, py1, qx1, qy1, qx2, qy2)
    var d = Planar.pointSegDistance(px2, py2, qx1, qy1, qx2, qy2)
    if (d < minDist) { minDist = d; nx = px2; ny = py2 }
    d = Planar.pointSegDistance(qx1, qy1, px1, py1, px2, py2)
    if (d < minDist) { minDist = d; nx = qx1; ny = qy1 }
    d = Planar.pointSegDistance(qx2, qy2, px1, py1, px2, py2)
    if (d < minDist) { nx = qx2; ny = qy2 }
    Array(nx, ny)
  }
}
