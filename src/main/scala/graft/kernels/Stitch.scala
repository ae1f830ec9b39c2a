package graft.kernels

import graft.core.FlatGeom

import scala.collection.mutable.{ArrayBuffer, HashMap}

/**
 * Stitch a triangle soup back into polygons — the engine analogue of
 * the reference's `StitchTriangles` (geo/src/algorithm/stitch.rs:28):
 * interior edges (shared by two triangles, traversed in opposite
 * directions once all triangles are oriented CCW) cancel; the
 * remaining directed boundary edges are walked into rings (taking the
 * sharpest clockwise turn at pinch vertices so rings stay simple);
 * CCW rings become exteriors, CW rings become holes assigned to the
 * smallest containing exterior.
 */
object Stitch {

  /** @param tris flat CCW-or-any triangles, 6 doubles each
    * @return MultiPolygon of the union boundary */
  def stitchTriangles(tris: Seq[Array[Double]]): FlatGeom = {
    if (tris.isEmpty) return FlatGeom.multiPolygon(Nil)
    type P = (Double, Double)
    // orient all CCW, emit directed edges, cancel opposite pairs
    val edgeCount = HashMap[(P, P), Int]()
    tris.foreach { t =>
      var a = (t(0), t(1)); var b = (t(2), t(3)); var c = (t(4), t(5))
      if (Robust.orient2d(a._1, a._2, b._1, b._2, c._1, c._2) < 0) {
        val tmp = b; b = c; c = tmp
      }
      Seq((a, b), (b, c), (c, a)).foreach { e =>
        val rev = (e._2, e._1)
        if (edgeCount.getOrElse(rev, 0) > 0) {
          val n = edgeCount(rev) - 1
          if (n == 0) edgeCount.remove(rev) else edgeCount(rev) = n
        } else edgeCount(e) = edgeCount.getOrElse(e, 0) + 1
      }
    }
    // outgoing adjacency of the boundary edges
    val out = HashMap[P, ArrayBuffer[P]]()
    edgeCount.foreach { case ((u, v), n) =>
      var i = 0
      while (i < n) { out.getOrElseUpdate(u, ArrayBuffer[P]()) += v; i += 1 }
    }
    // walk rings: at a branch vertex take the most-clockwise turn
    // relative to the incoming direction (keeps each ring simple)
    val rings = ArrayBuffer[Array[Double]]()
    while (out.nonEmpty) {
      val (start, _) = out.head
      val ring = ArrayBuffer[P](start)
      var prev: P = null
      var cur = start
      var ok = true
      var guard = edgeCount.size * 2 + 8
      var done = false
      while (!done && ok && guard > 0) {
        guard -= 1
        val nexts = out.getOrElse(cur, ArrayBuffer.empty[P])
        if (nexts.isEmpty) { ok = false }
        else {
          val nxt =
            if (nexts.length == 1 || prev == null) nexts.head
            else {
              // most clockwise: maximize the right-turn from (prev→cur)
              nexts.minBy(n => turnAngle(prev, cur, n))
            }
          nexts -= nxt
          if (nexts.isEmpty) out.remove(cur)
          prev = cur
          cur = nxt
          if (cur == start) done = true else ring += cur
        }
      }
      if (ok && done && ring.length >= 3) {
        val cs = new Array[Double]((ring.length + 1) * 2)
        ring.indices.foreach { i => cs(2 * i) = ring(i)._1; cs(2 * i + 1) = ring(i)._2 }
        cs(2 * ring.length) = ring.head._1; cs(2 * ring.length + 1) = ring.head._2
        rings += cs
      }
      if (!ok) {
        // inconsistent input (overlapping triangles): drop dangling edges
        out.remove(cur)
      }
    }
    assemble(rings.toSeq)
  }

  /** CCW turn angle of prev→cur→next in (0, 2π]; smaller = sharper
    * clockwise turn. */
  private def turnAngle(prev: (Double, Double), cur: (Double, Double),
      next: (Double, Double)): Double = {
    val inA = Math.atan2(cur._2 - prev._2, cur._1 - prev._1)
    val outA = Math.atan2(next._2 - cur._2, next._1 - cur._1)
    var d = outA - inA + Math.PI // relative to the reversed incoming dir
    while (d <= 0) d += 2 * Math.PI
    while (d > 2 * Math.PI) d -= 2 * Math.PI
    d
  }

  /** Exteriors = CCW rings; holes = CW rings nested in the smallest
    * containing exterior. */
  private def assemble(rings: Seq[Array[Double]]): FlatGeom = {
    val (outers, holes) = rings.partition(r => Planar.ringWinding(r, 0, r.length / 2) == Planar.CCW)
    if (outers.isEmpty) return FlatGeom.multiPolygon(Nil)
    val outerGeoms = outers.map(o => FlatGeom.polygon(o))
    val holeAssign = Array.fill(outers.length)(ArrayBuffer[Array[Double]]())
    holes.foreach { h =>
      // representative vertex of the hole
      val hx = h(0); val hy = h(1)
      var best = -1
      var bestArea = Double.PositiveInfinity
      outers.indices.foreach { i =>
        if (Planar.coordPos(outerGeoms(i), hx, hy) != Planar.Outside) {
          val a = Math.abs(Planar.signedArea(outerGeoms(i)))
          if (a < bestArea) { bestArea = a; best = i }
        }
      }
      if (best >= 0) holeAssign(best) += h
    }
    FlatGeom.multiPolygon(outers.indices.map { i =>
      FlatGeom.polygon(outers(i), holeAssign(i).toSeq)
    })
  }
}
