package graft.kernels

import graft.core.{FlatGeom, GeomKind}
import scala.collection.mutable.ArrayBuffer

/**
 * Split a geometry by a blade (the PostGIS ST_Split surface, absent
 * from the reference):
 *
 *  - line split by points: cut at each blade point lying on the line;
 *  - line split by lines: cut at every robust crossing with the blade
 *    (collinear-overlap endpoints included), walking the ORIGINAL
 *    path so piece order and direction follow the input;
 *  - polygon split by lines: polygonize the arrangement of the
 *    polygon's rings with the blade and keep the faces interior to
 *    the original (even-parity enclaves — the holes — stay out).
 *
 * Returns the pieces in deterministic order; an unsplit input comes
 * back as its single piece.
 */
object Split {

  def split(g: FlatGeom, blade: FlatGeom): Array[FlatGeom] = {
    if (g == null || g.isEmpty) return Array.empty
    if (blade == null || blade.isEmpty) return Array(g)
    Relate.dimClass(g) match {
      case 1 => splitLine(g, blade)
      case 2 => splitPolygon(g, blade)
      case _ => Array(g) // points are not splittable
    }
  }

  private def splitLine(g: FlatGeom, blade: FlatGeom): Array[FlatGeom] = {
    // blade cut sites: points, and crossings with blade segments
    val bladePts = new ArrayBuffer[(Double, Double)]
    if (blade.kind == GeomKind.Point || blade.kind == GeomKind.MultiPoint) {
      var i = 0
      while (i < blade.numPoints) { bladePts += ((blade.x(i), blade.y(i))); i += 1 }
    }
    val bladeSegs = new ArrayBuffer[Array[Double]]
    if (Relate.dimClass(blade) >= 1) {
      val src = if (Relate.dimClass(blade) == 2) Topo.boundary(blade) else blade
      FlatGeom.foreachRing(src) { (s, e) =>
        var i = s
        while (i < e - 1) {
          bladeSegs += Array(src.x(i), src.y(i), src.x(i + 1), src.y(i + 1))
          i += 1
        }
      }
    }
    val out = new ArrayBuffer[Array[Double]]
    FlatGeom.foreachRing(g) { (s, e) =>
      val piece = new ArrayBuffer[Double]
      @inline def flush(cx: Double, cy: Double): Unit = {
        // end the current piece at the cut and start the next one there
        val n = piece.length
        if (n == 0 || piece(n - 2) != cx || piece(n - 1) != cy) { piece += cx; piece += cy }
        if (piece.length >= 4) out += piece.toArray
        piece.clear()
        piece += cx; piece += cy
      }
      var i = s
      piece += g.x(i); piece += g.y(i)
      while (i < e - 1) {
        val x1 = g.x(i); val y1 = g.y(i)
        val x2 = g.x(i + 1); val y2 = g.y(i + 1)
        // cut sites on this segment ordered by parameter t
        val cuts = new ArrayBuffer[(Double, Double, Double)] // (t, x, y)
        val dx = x2 - x1; val dy = y2 - y1
        val l2 = dx * dx + dy * dy
        @inline def tOf(px: Double, py: Double): Double =
          if (l2 == 0) 0.0 else ((px - x1) * dx + (py - y1) * dy) / l2
        bladePts.foreach { case (px, py) =>
          if (px == x1 && py == y1 && i > s) {
            // blade point at an interior vertex of the path
            flush(x1, y1)
          } else {
            val t = tOf(px, py)
            if (t > 0 && t < 1 &&
                Planar.pointSegDistance(px, py, x1, y1, x2, y2) == 0.0)
              cuts += ((t, px, py))
          }
        }
        bladeSegs.foreach { bs =>
          val r = SegIntersect.intersection(x1, y1, x2, y2, bs(0), bs(1), bs(2), bs(3))
          if (r.kind == SegIntersect.SinglePointProper ||
              r.kind == SegIntersect.SinglePointImproper) {
            val t = tOf(r.x0, r.y0)
            if (t > 0 && t < 1) cuts += ((t, r.x0, r.y0))
            else if (t == 0.0 && i > s && r.x0 == x1 && r.y0 == y1) {
              // blade touches the shared vertex between two input
              // segments: cut there (handled once, at segment start)
              flush(x1, y1)
            }
          } else if (r.kind == SegIntersect.CollinearOverlap) {
            for ((px, py) <- Seq((r.x0, r.y0), (r.x1, r.y1))) {
              val t = tOf(px, py)
              if (t > 0 && t < 1) cuts += ((t, px, py))
            }
          }
        }
        cuts.sortBy(_._1).foreach { case (_, cx, cy) => flush(cx, cy) }
        val n = piece.length
        if (n == 0 || piece(n - 2) != x2 || piece(n - 1) != y2) { piece += x2; piece += y2 }
        i += 1
      }
      if (piece.length >= 4) out += piece.toArray
    }
    val dedup = out.distinctBy(_.toSeq)
    dedup.map(FlatGeom.lineString).toArray
  }

  private def splitPolygon(g: FlatGeom, blade: FlatGeom): Array[FlatGeom] = {
    if (Relate.dimClass(blade) < 1) return Array(g)
    val bladeSrc = if (Relate.dimClass(blade) == 2) Topo.boundary(blade) else blade
    val segs = new ArrayBuffer[Array[Double]]
    def addSegs(src: FlatGeom): Unit = FlatGeom.foreachRing(src) { (s, e) =>
      var i = s
      while (i < e - 1) {
        if (src.x(i) != src.x(i + 1) || src.y(i) != src.y(i + 1))
          segs += Array(src.x(i), src.y(i), src.x(i + 1), src.y(i + 1))
        i += 1
      }
    }
    addSegs(g)
    addSegs(bladeSrc)
    val noded = UnaryUnion.nodeSegments(segs, new ArrayBuffer[Array[Double]], None)
    val faces = Polygonize.polygonize(Seq(FlatGeom.multiLineString(
      noded.map(s => Array(s(0), s(1), s(2), s(3))))))
    val kept = faces.filter { f =>
      val ip = Topo.interiorPointApprox(f)
      ip != null && Planar.coordPos(g, ip(0), ip(1)) == Planar.Inside
    }
    if (kept.isEmpty) Array(g) else kept.toArray
  }
}
