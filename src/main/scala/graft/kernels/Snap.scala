package graft.kernels

import graft.core.FlatGeom
import scala.collection.mutable.ArrayBuffer

/**
 * Vertex snapping (JTS GeometrySnapper.snapTo semantics, an operator
 * the reference lacks): every vertex of the input within `tol` of a
 * reference vertex moves onto it (nearest wins), and reference
 * vertices lying within `tol` of an input segment's interior are
 * inserted into it, in order along the segment. Structure-preserving:
 * rings stay rings (the moved closing vertex moves with its twin),
 * part/ring topology is untouched. Collapsed consecutive duplicates
 * created by snapping are removed.
 */
object Snap {

  def snapTo(input: FlatGeom, reference: FlatGeom, tol: Double): FlatGeom = {
    if (input == null || input.isEmpty || reference == null || reference.isEmpty ||
        !(tol > 0)) return input
    val nr = reference.numPoints
    val rx = new Array[Double](nr); val ry = new Array[Double](nr)
    var i = 0
    while (i < nr) { rx(i) = reference.x(i); ry(i) = reference.y(i); i += 1 }

    @inline def nearestSnap(px: Double, py: Double): Int = {
      var best = tol; var bi = -1
      var k = 0
      while (k < nr) {
        val d = Math.hypot(px - rx(k), py - ry(k))
        if (d < best) { best = d; bi = k }
        k += 1
      }
      bi
    }

    // point kinds have no ring structure: snap each coordinate
    if (input.rings.isEmpty) {
      val out = input.coords.clone()
      var j = 0
      while (j < input.numPoints) {
        val bi = nearestSnap(out(2 * j), out(2 * j + 1))
        if (bi >= 0) { out(2 * j) = rx(bi); out(2 * j + 1) = ry(bi) }
        j += 1
      }
      return new FlatGeom(input.kind, out, input.rings, input.parts)
    }

    // transform each ring slice independently, preserving structure
    val newCoords = new ArrayBuffer[Double](input.coords.length)
    val newRingEnds = new ArrayBuffer[Int]
    FlatGeom.foreachRing(input) { (s, e) =>
      val ring = new ArrayBuffer[Double](2 * (e - s))
      // 1. snap vertices
      var j = s
      while (j < e) {
        val bi = nearestSnap(input.x(j), input.y(j))
        if (bi >= 0) { ring += rx(bi); ring += ry(bi) }
        else { ring += input.x(j); ring += input.y(j) }
        j += 1
      }
      // 2. insert reference vertices near segment interiors
      val withIns = new ArrayBuffer[Double](ring.length)
      val m = ring.length >> 1
      var k = 0
      while (k < m) {
        withIns += ring(2 * k); withIns += ring(2 * k + 1)
        if (k < m - 1) {
          val x1 = ring(2 * k); val y1 = ring(2 * k + 1)
          val x2 = ring(2 * k + 2); val y2 = ring(2 * k + 3)
          val dx = x2 - x1; val dy = y2 - y1
          val l2 = dx * dx + dy * dy
          if (l2 > 0) {
            // candidates strictly interior to the segment, ordered by t
            val cands = new ArrayBuffer[(Double, Int)]
            var q = 0
            while (q < nr) {
              val t = ((rx(q) - x1) * dx + (ry(q) - y1) * dy) / l2
              if (t > 0 && t < 1) {
                val d = Math.hypot(rx(q) - (x1 + t * dx), ry(q) - (y1 + t * dy))
                if (d < tol &&
                    !(rx(q) == x1 && ry(q) == y1) && !(rx(q) == x2 && ry(q) == y2))
                  cands += ((t, q))
              }
              q += 1
            }
            cands.sortBy(_._1).foreach { case (_, q) => withIns += rx(q); withIns += ry(q) }
          }
        }
        k += 1
      }
      // 3. drop consecutive duplicates from collapses
      val dd = new ArrayBuffer[Double](withIns.length)
      var p = 0
      val mm = withIns.length >> 1
      while (p < mm) {
        val l = dd.length
        if (l == 0 || dd(l - 2) != withIns(2 * p) || dd(l - 1) != withIns(2 * p + 1)) {
          dd += withIns(2 * p); dd += withIns(2 * p + 1)
        }
        p += 1
      }
      // a ring that lost its closing duplicate to dedupe stays closed
      // by construction (first==last snapped identically)
      newCoords ++= dd
      newRingEnds += newCoords.length >> 1
    }
    new FlatGeom(input.kind, newCoords.toArray,
      if (input.rings.isEmpty) Array.emptyIntArray else newRingEnds.toArray,
      input.parts.clone())
  }
}
