package graft.kernels

import graft.core.{FlatGeom, GeomKind}
import scala.collection.mutable.ArrayBuffer

/**
 * Polygon subdivision for scale (the PostGIS ST_Subdivide role): cut
 * an areal geometry into pieces of at most `maxVertices` ring
 * vertices by recursive halving of the envelope along its longer
 * axis, clipping with the engine's own overlay. The reference has no
 * such operator (the geo crate is single-geometry algebra); in this
 * engine it is the preprocessing step that makes country-sized
 * polygons broadcastable: a spatial join against one 100k-vertex
 * polygon becomes a join against ~100k/maxV small pieces whose
 * coverings are tight and whose refine step is O(maxV), instead of
 * one task owning the entire ring.
 *
 * Deterministic: splits always land on the envelope midpoint of the
 * longer axis (ties split vertically), so the decomposition is
 * translation-invariant and reproducible across runs/executors.
 */
object Subdivide {
  /** Floor consistent with PostGIS (which requires maxVertices >= 5). */
  final val MinMaxVertices = 5

  def subdivide(g: FlatGeom, maxVertices: Int): Array[FlatGeom] = {
    if (g == null || g.isEmpty || Relate.dimClass(g) != 2) return Array.empty
    val maxV = Math.max(MinMaxVertices, maxVertices)
    val out = new ArrayBuffer[FlatGeom]
    // per-part: multipolygon parts subdivide independently
    var p = 0
    while (p < g.numParts) {
      rec(FlatGeom.part(g, p), maxV, 0, out)
      p += 1
    }
    out.toArray
  }

  /** Ring vertices of a polygon, counting each ring's closing
    * duplicate once (the WKT form PostGIS counts). */
  private def ringVerts(g: FlatGeom): Int = g.numPoints

  private def rec(g: FlatGeom, maxV: Int, depth: Int, out: ArrayBuffer[FlatGeom]): Unit = {
    if (g.isEmpty) return
    if (ringVerts(g) <= maxV || depth >= 64) {
      if (Planar.unsignedArea(g) > 0.0) out += g
      return
    }
    var minX = Double.PositiveInfinity; var maxX = Double.NegativeInfinity
    var minY = Double.PositiveInfinity; var maxY = Double.NegativeInfinity
    var i = 0
    while (i < g.numPoints) {
      val x = g.x(i); val y = g.y(i)
      if (x < minX) minX = x; if (x > maxX) maxX = x
      if (y < minY) minY = y; if (y > maxY) maxY = y
      i += 1
    }
    // split at the median vertex ordinate of the longer axis (vertex
    // counts strictly drop on both sides), falling back to the
    // envelope midpoint when the median degenerates onto the envelope
    // edge (mass piled at one end)
    val splitX = maxX - minX >= maxY - minY
    val ords = new Array[Double](g.numPoints)
    i = 0
    while (i < g.numPoints) { ords(i) = if (splitX) g.x(i) else g.y(i); i += 1 }
    java.util.Arrays.sort(ords)
    var pivot = ords(ords.length / 2)
    val (lo, hi) = if (splitX) (minX, maxX) else (minY, maxY)
    if (pivot <= lo || pivot >= hi) pivot = (lo + hi) / 2
    val (l, r) =
      if (splitX)
        (FlatGeom.rect(minX, minY, pivot, maxY), FlatGeom.rect(pivot, minY, maxX, maxY))
      else
        (FlatGeom.rect(minX, minY, maxX, pivot), FlatGeom.rect(minX, pivot, maxX, maxY))
    for (half <- Seq(l, r)) {
      val piece = Overlay.booleanOp(g, half, Overlay.OpIntersection)
      if (!piece.isEmpty) {
        // intersection can return a multipolygon: recurse per part
        var p = 0
        while (p < piece.numParts) {
          rec(FlatGeom.part(piece, p), maxV, depth + 1, out)
          p += 1
        }
      }
    }
  }
}
