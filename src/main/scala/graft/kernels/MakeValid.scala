package graft.kernels

import graft.core.{FlatGeom, GeomKind}
import scala.collection.mutable.ArrayBuffer

/**
 * Repair invalid polygonal geometry (the PostGIS ST_MakeValid role —
 * the reference documents OGC validity but never enforces or repairs
 * it, geo-types polygon.rs:23-40). Strategy — the GEOS "linework"
 * method with the EVEN-ODD fill rule, stated explicitly because
 * repair semantics are a choice:
 *
 *   1. fully node the geometry's ring linework (crossings and
 *      collinear overlaps split, duplicates dissolved),
 *   2. polygonize the faces of the noded arrangement,
 *   3. keep each face whose interior point has ODD ray-crossing
 *      parity over the original ring multiset (a bowtie keeps both
 *      lobes; a doubly-wound region is excluded),
 *   4. dissolve kept faces back together (shared edges merge,
 *      even-parity enclaves become holes).
 *
 * Valid input is returned unchanged. 0/1-D input is returned
 * unchanged (points and lines are valid by construction here; JTS
 * GeometryFixer semantics for those are identity up to degenerate
 * element removal, which the WKT/constructor layer already does).
 */
object MakeValid {

  def makeValid(g: FlatGeom): FlatGeom = {
    if (g == null || g.isEmpty) return g
    if (Relate.dimClass(g) != 2) return g
    if (Validation.invalidReason(g).isEmpty) return g
    // 1. node the ring linework
    val segs = new ArrayBuffer[Array[Double]]
    FlatGeom.foreachRing(g) { (s, e) =>
      var i = s
      while (i < e - 1) {
        if (g.x(i) != g.x(i + 1) || g.y(i) != g.y(i + 1))
          segs += Array(g.x(i), g.y(i), g.x(i + 1), g.y(i + 1))
        i += 1
      }
    }
    if (segs.isEmpty) return FlatGeom.polygon(Array.emptyDoubleArray)
    val noded = UnaryUnion.nodeSegments(segs, new ArrayBuffer[Array[Double]], None)
    // 2. polygonize the faces
    val faces = Polygonize.polygonize(Seq(FlatGeom.multiLineString(
      noded.map(s => Array(s(0), s(1), s(2), s(3))))))
    if (faces.isEmpty) return FlatGeom.polygon(Array.emptyDoubleArray)
    // 3. even-odd selection by each face's interior point
    val kept = faces.filter { f =>
      val ip = Topo.interiorPointApprox(f)
      ip != null && oddCrossings(g, ip(0), ip(1))
    }
    if (kept.isEmpty) return FlatGeom.polygon(Array.emptyDoubleArray)
    // 4. dissolve; faces may share edges, the union merges them and
    // turns even-parity enclaves into holes
    Overlay.treeUnion(kept)
  }

  /** Even-odd rule: parity of upward/downward edge crossings of the
    * ray x > px over ALL rings of g (the crossing-number test, not the
    * winding number — a doubly-wound region counts even). */
  private def oddCrossings(g: FlatGeom, px: Double, py: Double): Boolean = {
    var crossings = 0
    FlatGeom.foreachRing(g) { (s, e) =>
      var i = s
      while (i < e - 1) {
        val x1 = g.x(i); val y1 = g.y(i)
        val x2 = g.x(i + 1); val y2 = g.y(i + 1)
        if ((y1 <= py && y2 > py) || (y2 <= py && y1 > py)) {
          val t = (py - y1) / (y2 - y1)
          if (x1 + t * (x2 - x1) > px) crossings += 1
        }
        i += 1
      }
    }
    (crossings & 1) == 1
  }
}
