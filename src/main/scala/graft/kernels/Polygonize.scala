package graft.kernels

import graft.core.{FlatGeom, GeomKind}
import scala.collection.mutable.{ArrayBuffer, LinkedHashMap}

/**
 * Line polygonizer (the JTS Polygonizer shape, re-derived): form the
 * maximal set of polygons from a bag of linework.
 *
 *  1. deduplicate the input segments AS GIVEN (the JTS pre-noded
 *     input contract — see the step-1 comment in `polygonize`);
 *  2. iteratively delete dangles (chains ending at a degree-1 node);
 *  3. walk the planar subdivision's faces over directed half-edges
 *     (at each node take the first outgoing edge counterclockwise
 *     from the reversed incoming direction) — every half-edge lies on
 *     exactly one face;
 *  4. faces traced with NEGATIVE signed area are the bounded minimal
 *     faces → shells (emitted CCW); POSITIVE faces are component
 *     outer walks → each one strictly contained in a shell becomes
 *     that shell's hole (smallest containing shell), the rest is the
 *     unbounded face and is dropped. Degenerate orbits that traverse
 *     some undirected edge twice (cut edges / bridges) never form
 *     shells.
 *
 * The geo crate has no polygonizer; this is gated by the JTS
 * general/TestPolygonize.xml corpus the reference ships but never
 * runs, and complements `SpatialJoins.polygonizeGrid` (raster side).
 */
object Polygonize {

  /** Polygonize the linework of `parts` (rings of areal parts count as
    * linework; points ignored). Returns the formed polygons. */
  def polygonize(parts: Seq[FlatGeom]): Seq[FlatGeom] = {
    val raw = new ArrayBuffer[Array[Double]]()
    parts.filter(g => g != null && !g.isEmpty).foreach { g =>
      if (Relate.dimClass(g) >= 1) {
        FlatGeom.foreachRing(g) { (s, e) =>
          var i = s
          while (i < e - 1) {
            if (g.x(i) != g.x(i + 1) || g.y(i) != g.y(i + 1))
              raw += Array(g.x(i), g.y(i), g.x(i + 1), g.y(i + 1))
            i += 1
          }
        }
      }
    }
    if (raw.isEmpty) return Nil

    // 1. canonical dedupe only — the polygonizer, like JTS's, takes
    // the linework AS GIVEN (pre-noded input contract): noding here
    // would weld dangles whose endpoints lie on another segment's
    // interior into the graph and change the formed faces (the JTS
    // corpus's "4 polygons, one with hole" case proves it). Callers
    // with raw crossing linework should st_unary_union first.
    val seen = scala.collection.mutable.LinkedHashSet[(Double, Double, Double, Double)]()
    raw.foreach { s =>
      val k =
        if (s(0) < s(2) || (s(0) == s(2) && s(1) <= s(3))) (s(0), s(1), s(2), s(3))
        else (s(2), s(3), s(0), s(1))
      seen += k
    }
    var segs: Seq[Array[Double]] = seen.toSeq.map(k => Array(k._1, k._2, k._3, k._4))

    // 2. iterative dangle removal
    var changed = true
    while (changed) {
      val deg = LinkedHashMap[(Double, Double), Int]()
      segs.foreach { s =>
        deg((s(0), s(1))) = deg.getOrElse((s(0), s(1)), 0) + 1
        deg((s(2), s(3))) = deg.getOrElse((s(2), s(3)), 0) + 1
      }
      val next = segs.filter(s => deg((s(0), s(1))) > 1 && deg((s(2), s(3))) > 1)
      changed = next.length != segs.length
      segs = next
    }
    if (segs.isEmpty) return Nil

    // 3. face walk over directed half-edges
    val out = LinkedHashMap[(Double, Double), ArrayBuffer[(Double, Double)]]()
    segs.foreach { s =>
      out.getOrElseUpdate((s(0), s(1)), new ArrayBuffer) += ((s(2), s(3)))
      out.getOrElseUpdate((s(2), s(3)), new ArrayBuffer) += ((s(0), s(1)))
    }
    val used = scala.collection.mutable.HashSet[((Double, Double), (Double, Double))]()
    def ang(from: (Double, Double), to: (Double, Double)): Double =
      Math.atan2(to._2 - from._2, to._1 - from._1)
    val twoPi = 2 * Math.PI

    final case class Face(ring: Array[Double], area: Double, degenerate: Boolean)
    val faces = new ArrayBuffer[Face]()

    segs.foreach { s0 =>
      Seq(((s0(0), s0(1)), (s0(2), s0(3))), ((s0(2), s0(3)), (s0(0), s0(1)))).foreach {
        case (a0, b0) =>
          if (!used((a0, b0))) {
            val coords = new ArrayBuffer[Double]()
            val edgeSet = scala.collection.mutable.HashSet[((Double, Double), (Double, Double))]()
            var degenerate = false
            var a = a0; var b = b0
            coords += a._1 += a._2
            var guard = 0
            val limit = 4 * segs.length + 8
            var open = true
            while (open && guard < limit) {
              guard += 1
              used.add((a, b))
              val ek = if (a._1 < b._1 || (a._1 == b._1 && a._2 <= b._2)) (a, b) else (b, a)
              if (!edgeSet.add(ek)) degenerate = true
              coords += b._1 += b._2
              // pick the first outgoing edge CCW from the reversed
              // incoming direction; the face closes when the next
              // half-edge would be the starting one again
              val back = ang(b, a)
              var best: (Double, Double) = null
              var bestD = Double.MaxValue
              out(b).foreach { c =>
                val d0 = {
                  val d = (ang(b, c) - back) % twoPi
                  val dd = if (d <= 0) d + twoPi else d
                  dd
                }
                // the pure reverse edge gets delta == 2π (u-turn last)
                val dd = if (c == a) twoPi else d0
                if (dd < bestD) { bestD = dd; best = c }
              }
              val c = best
              if (c == null) { degenerate = true; open = false }
              else {
                a = b; b = c
                if ((a, b) == (a0, b0)) open = false
                else if (used((a, b))) { degenerate = true; open = false }
              }
            }
            if (guard >= limit) degenerate = true
            // signed area of the traced ring
            var s2 = 0.0
            var i = 0
            val n = coords.length / 2
            while (i < n - 1) {
              s2 += coords(2 * i) * coords(2 * i + 3) - coords(2 * i + 2) * coords(2 * i + 1)
              i += 1
            }
            faces += Face(coords.toArray, s2 / 2, degenerate)
          }
      }
    }

    // 4. shells (negative trace → reverse to CCW) and holes
    def reversed(r: Array[Double]): Array[Double] = {
      val n = r.length / 2
      val o = new Array[Double](r.length)
      var i = 0
      while (i < n) { o(2 * i) = r(2 * (n - 1 - i)); o(2 * i + 1) = r(2 * (n - 1 - i) + 1); i += 1 }
      o
    }
    val shells = faces.filter(f => !f.degenerate && f.area < 0).map(f => reversed(f.ring))
    val holes = faces.filter(f => !f.degenerate && f.area > 0).map(_.ring)
    val shellGeoms = shells.map(r => FlatGeom.polygon(r))
    val shellArea = shellGeoms.map(Planar.unsignedArea)
    val assigned = Array.fill(shells.length)(new ArrayBuffer[Array[Double]]())
    holes.foreach { h =>
      // a containing shell must strictly contain the hole's vertices
      var bestI = -1
      var bestA = Double.MaxValue
      var i = 0
      while (i < shells.length) {
        if (Planar.coordPos(shellGeoms(i), h(0), h(1)) == Planar.Inside &&
            shellArea(i) < bestA) { bestI = i; bestA = shellArea(i) }
        i += 1
      }
      if (bestI >= 0) assigned(bestI) += reversed(h) // store holes CW
    }
    shells.indices.map(i => FlatGeom.polygon(shells(i), assigned(i).toSeq))
  }
}
