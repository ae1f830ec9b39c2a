package graft.kernels

/**
 * Robust geometric predicates — a from-scratch Scala implementation of
 * Shewchuk's adaptive-precision floating-point predicates
 * ("Adaptive Precision Floating-Point Arithmetic and Fast Robust
 * Geometric Predicates", Discrete & Computational Geometry 18, 1997).
 *
 * Matches the semantics of the reference's `RobustKernel::orient2d`
 * (geo/src/algorithm/kernels/robust.rs:15-43, which delegates to the
 * `robust` crate, itself a port of the same published predicates).
 * The adaptive stages guarantee the SIGN of the determinant
 *   | ax-cx  ay-cy |
 *   | bx-cx  by-cy |
 * is exact for all finite double inputs.
 */
object Robust {

  final val Clockwise = -1
  final val Collinear = 0
  final val CounterClockwise = 1

  private final val Epsilon = 1.1102230246251565e-16 // 2^-53
  private final val Splitter = 134217729.0 // 2^27 + 1
  private final val ResultErrBound = (3.0 + 8.0 * Epsilon) * Epsilon
  private final val CcwErrBoundA = (3.0 + 16.0 * Epsilon) * Epsilon
  private final val CcwErrBoundB = (2.0 + 12.0 * Epsilon) * Epsilon
  private final val CcwErrBoundC = (9.0 + 64.0 * Epsilon) * Epsilon * Epsilon

  /** Sign of orientation of (p,q,r): >0 CCW, <0 CW, ==0 collinear.
    * Note argument order matches geo's `orient2d(p, q, r)`. */
  def orient2d(px: Double, py: Double, qx: Double, qy: Double, rx: Double, ry: Double): Int = {
    val d = orient2dDet(px, py, qx, qy, rx, ry)
    if (d > 0.0) CounterClockwise else if (d < 0.0) Clockwise else Collinear
  }

  /** The (sign-exact) determinant value. */
  def orient2dDet(ax: Double, ay: Double, bx: Double, by: Double, cx: Double, cy: Double): Double = {
    val detleft = (ax - cx) * (by - cy)
    val detright = (ay - cy) * (bx - cx)
    val det = detleft - detright

    var detsum = 0.0
    if (detleft > 0.0) {
      if (detright <= 0.0) return det
      detsum = detleft + detright
    } else if (detleft < 0.0) {
      if (detright >= 0.0) return det
      detsum = -detleft - detright
    } else {
      return det
    }
    val errbound = CcwErrBoundA * detsum
    if (det >= errbound || -det >= errbound) det
    else orient2dAdapt(ax, ay, bx, by, cx, cy, detsum)
  }

  // ---- error-free transformations -------------------------------------

  // returns (hi, lo) packed: we use small arrays to avoid tuple boxing in
  // the adaptive path (cold path; clarity over micro-optimization).

  @inline private def fastTwoSumTail(a: Double, b: Double, x: Double): Double = b - (x - a)
  @inline private def twoSumTail(a: Double, b: Double, x: Double): Double = {
    val bvirt = x - a
    val avirt = x - bvirt
    val bround = b - bvirt
    val around = a - avirt
    around + bround
  }
  @inline private def twoDiffTail(a: Double, b: Double, x: Double): Double = {
    val bvirt = a - x
    val avirt = x + bvirt
    val bround = bvirt - b
    val around = a - avirt
    around + bround
  }
  @inline private def twoProductTail(a: Double, b: Double, x: Double): Double = {
    val c = Splitter * a
    val abig = c - a
    val ahi = c - abig
    val alo = a - ahi
    val d = Splitter * b
    val bbig = d - b
    val bhi = d - bbig
    val blo = b - bhi
    val err1 = x - ahi * bhi
    val err2 = err1 - alo * bhi
    val err3 = err2 - ahi * blo
    alo * blo - err3
  }

  /** Sum two expansions, eliminating zero components
    * (Shewchuk's FAST-EXPANSION-SUM-ZEROELIM). e (len elen) and f (len
    * flen) must be nonoverlapping & nonadjacent, sorted ascending. */
  private def fastExpansionSumZeroElim(
      elen: Int, e: Array[Double], flen: Int, f: Array[Double], h: Array[Double]): Int = {
    var enow = e(0)
    var fnow = f(0)
    var eindex = 0
    var findex = 0
    var q = 0.0
    if ((fnow > enow) == (fnow > -enow)) {
      q = enow
      eindex += 1
      if (eindex < elen) enow = e(eindex)
    } else {
      q = fnow
      findex += 1
      if (findex < flen) fnow = f(findex)
    }
    var hindex = 0
    var qnew = 0.0
    var hh = 0.0
    if (eindex < elen && findex < flen) {
      if ((fnow > enow) == (fnow > -enow)) {
        qnew = enow + q
        hh = fastTwoSumTail(enow, q, qnew)
        eindex += 1
        if (eindex < elen) enow = e(eindex)
      } else {
        qnew = fnow + q
        hh = fastTwoSumTail(fnow, q, qnew)
        findex += 1
        if (findex < flen) fnow = f(findex)
      }
      q = qnew
      if (hh != 0.0) { h(hindex) = hh; hindex += 1 }
      while (eindex < elen && findex < flen) {
        if ((fnow > enow) == (fnow > -enow)) {
          qnew = q + enow
          hh = twoSumTail(q, enow, qnew)
          eindex += 1
          if (eindex < elen) enow = e(eindex)
        } else {
          qnew = q + fnow
          hh = twoSumTail(q, fnow, qnew)
          findex += 1
          if (findex < flen) fnow = f(findex)
        }
        q = qnew
        if (hh != 0.0) { h(hindex) = hh; hindex += 1 }
      }
    }
    while (eindex < elen) {
      val qnew2 = q + enow
      hh = twoSumTail(q, enow, qnew2)
      eindex += 1
      if (eindex < elen) enow = e(eindex)
      q = qnew2
      if (hh != 0.0) { h(hindex) = hh; hindex += 1 }
    }
    while (findex < flen) {
      val qnew2 = q + fnow
      hh = twoSumTail(q, fnow, qnew2)
      findex += 1
      if (findex < flen) fnow = f(findex)
      q = qnew2
      if (hh != 0.0) { h(hindex) = hh; hindex += 1 }
    }
    if (q != 0.0 || hindex == 0) { h(hindex) = q; hindex += 1 }
    hindex
  }

  @inline private def estimate(len: Int, e: Array[Double]): Double = {
    var q = e(0)
    var i = 1
    while (i < len) { q += e(i); i += 1 }
    q
  }

  private def orient2dAdapt(
      ax: Double, ay: Double, bx: Double, by: Double,
      cx: Double, cy: Double, detsum: Double): Double = {
    val acx = ax - cx
    val bcx = bx - cx
    val acy = ay - cy
    val bcy = by - cy

    val detleft = acx * bcy
    val detlefttail = twoProductTail(acx, bcy, detleft)
    val detright = acy * bcx
    val detrighttail = twoProductTail(acy, bcx, detright)

    // B = Two_Two_Diff(detleft, detlefttail, detright, detrighttail):
    //   Two_One_Diff(a1, a0, b0) -> (_j, _0, x0)
    //   Two_One_Diff(_j, _0, b1) -> (x3, x2, x1)
    val B = new Array[Double](4)
    locally {
      // Two_One_Diff(a1=detleft, a0=detlefttail, b=detrighttail):
      //   Two_Diff(a0, b, _i, x0); Two_Sum(a1, _i, _j, _0)
      val _i = detlefttail - detrighttail
      val x0 = twoDiffTail(detlefttail, detrighttail, _i)
      val _j = detleft + _i
      val _0 = twoSumTail(detleft, _i, _j)
      // Two_One_Diff(a1=_j, a0=_0, b=detright):
      val _i2 = _0 - detright
      val x1 = twoDiffTail(_0, detright, _i2)
      val x3 = _j + _i2
      val x2 = twoSumTail(_j, _i2, x3)
      B(0) = x0; B(1) = x1; B(2) = x2; B(3) = x3
    }

    var det = estimate(4, B)
    var errbound = CcwErrBoundB * detsum
    if (det >= errbound || -det >= errbound) return det

    val acxtail = twoDiffTail(ax, cx, acx)
    val bcxtail = twoDiffTail(bx, cx, bcx)
    val acytail = twoDiffTail(ay, cy, acy)
    val bcytail = twoDiffTail(by, cy, bcy)

    if (acxtail == 0.0 && acytail == 0.0 && bcxtail == 0.0 && bcytail == 0.0) return det

    errbound = CcwErrBoundC * detsum + ResultErrBound * Math.abs(det)
    det += (acx * bcytail + bcy * acxtail) - (acy * bcxtail + bcx * acytail)
    if (det >= errbound || -det >= errbound) return det

    val u = new Array[Double](4)
    @inline def twoTwoDiffInto(a1: Double, a0: Double, b1: Double, b0: Double, out: Array[Double]): Unit = {
      val _i = a0 - b0
      val x0 = twoDiffTail(a0, b0, _i)
      val _j = a1 + _i
      val _0 = twoSumTail(a1, _i, _j)
      val _i2 = _0 - b1
      val x1 = twoDiffTail(_0, b1, _i2)
      val x3 = _j + _i2
      val x2 = twoSumTail(_j, _i2, x3)
      out(0) = x0; out(1) = x1; out(2) = x2; out(3) = x3
    }

    val C1 = new Array[Double](8)
    val C2 = new Array[Double](12)
    val D = new Array[Double](16)

    var s1 = acxtail * bcy
    var s0 = twoProductTail(acxtail, bcy, s1)
    var t1 = acytail * bcx
    var t0 = twoProductTail(acytail, bcx, t1)
    twoTwoDiffInto(s1, s0, t1, t0, u)
    val c1len = fastExpansionSumZeroElim(4, B, 4, u, C1)

    s1 = acx * bcytail
    s0 = twoProductTail(acx, bcytail, s1)
    t1 = acy * bcxtail
    t0 = twoProductTail(acy, bcxtail, t1)
    twoTwoDiffInto(s1, s0, t1, t0, u)
    val c2len = fastExpansionSumZeroElim(c1len, C1, 4, u, C2)

    s1 = acxtail * bcytail
    s0 = twoProductTail(acxtail, bcytail, s1)
    t1 = acytail * bcxtail
    t0 = twoProductTail(acytail, bcxtail, t1)
    twoTwoDiffInto(s1, s0, t1, t0, u)
    val dlen = fastExpansionSumZeroElim(c2len, C2, 4, u, D)

    D(dlen - 1)
  }
}
