package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core.Wkt
import graft.kernels.Mvt

/** Vector-tile surface: ST_TileEnvelope vs the published PostGIS
  * vector, ST_AsMVTGeom transform/snap/clip/winding first-principles,
  * ST_SquareGrid index math. */
class MvtSpec extends AnyFunSuite {

  private val Half = 6378137.0 * math.Pi // 20037508.342789244

  test("tileEnvelope matches the published PostGIS vector for (2,1,1)") {
    // SELECT ST_AsText(ST_TileEnvelope(2, 1, 1)) →
    // POLYGON((-10018754.1713945 0, ... 0 10018754.1713945 ...))
    val g = Mvt.tileEnvelope(2, 1, 1, 0.0)
    val b = graft.kernels.Planar.boundingRect(g)
    assert(b(0) == -Half / 2 && b(1) == 0.0 && b(2) == 0.0 && b(3) == Half / 2)
    assert(math.abs(b(0) - -10018754.171394622) < 1e-6)
  }

  test("tileEnvelope world tile and margin expansion") {
    val w = graft.kernels.Planar.boundingRect(Mvt.tileEnvelope(0, 0, 0, 0.0))
    assert(w.sameElements(Array(-Half, -Half, Half, Half)))
    // margin m expands by m·size on each side
    val m = graft.kernels.Planar.boundingRect(Mvt.tileEnvelope(2, 1, 1, 0.125))
    val size = Half / 2
    assert(m(0) == -size - 0.125 * size && m(2) == 0.0 + 0.125 * size)
  }

  test("tileEnvelope out-of-range is null, never an exception") {
    assert(Mvt.tileEnvelope(-1, 0, 0, 0.0) == null)
    assert(Mvt.tileEnvelope(2, 4, 0, 0.0) == null) // x >= 2^z
    assert(Mvt.tileEnvelope(2, 0, -1, 0.0) == null)
    assert(Mvt.tileEnvelope(32, 0, 0, 0.0) == null)
  }

  test("asMvtGeom: west half of the world tile is the exact integer rect") {
    val west = graft.core.FlatGeom.rect(-Half, -Half, 0.0, Half)
    val out = Mvt.asMvtGeom(west, 0, 0, 0, 4096, 256, true)
    val b = graft.kernels.Planar.boundingRect(out)
    assert(b.sameElements(Array(0.0, 0.0, 2048.0, 4096.0)), b.mkString(","))
    // every coordinate an exact integer
    assert(out.coords.forall(c => c == math.floor(c)))
    // MVT winding: shell positive shoelace on stored (y-down) coords
    val a2 = graft.kernels.Planar.twiceSignedRingArea(
      out.coords, 0, out.coords.length >> 1)
    assert(a2 > 0, s"shell must be screen-CW, got 2A=$a2")
  }

  test("asMvtGeom: y axis flips (north edge maps to ty=0)") {
    val p = graft.core.FlatGeom.point(0.0, Half) // north pole edge, center lon
    val out = Mvt.asMvtGeom(p, 0, 0, 0, 4096, 256, true)
    assert(out.x(0) == 2048.0 && out.y(0) == 0.0)
    val c = graft.core.FlatGeom.point(0.0, 0.0)
    val oc = Mvt.asMvtGeom(c, 0, 0, 0, 4096, 256, true)
    assert(oc.x(0) == 2048.0 && oc.y(0) == 2048.0)
  }

  test("asMvtGeom: clip to the buffered square, outside-point null") {
    // tile (1,0,0) = NW quadrant; a point in the SE quadrant is outside
    val se = graft.core.FlatGeom.point(Half / 2, -Half / 2)
    assert(Mvt.asMvtGeom(se, 1, 0, 0, 4096, 256, true) == null)
    // a polygon spanning both west tiles clips at extent+buffer
    val band = graft.core.FlatGeom.rect(-Half / 2, 0.0, Half / 2, Half / 4)
    val out = Mvt.asMvtGeom(band, 1, 0, 0, 4096, 64, true)
    val b = graft.kernels.Planar.boundingRect(out)
    assert(b(2) == 4096.0 + 64.0, b.mkString(","))  // clipped at the buffer
    assert(b(0) == 2048.0 && b(1) == 3072.0 && b(3) == 4096.0)
  }

  test("asMvtGeom: unclipped keeps coordinates outside the tile") {
    val se = graft.core.FlatGeom.point(Half / 2, -Half / 2)
    val out = Mvt.asMvtGeom(se, 1, 0, 0, 4096, 256, false)
    assert(out.x(0) == 6144.0 && out.y(0) == 6144.0)
  }

  test("asMvtGeom: sub-half-pixel slivers collapse to null") {
    val pixel = 2 * Half / 4096
    val sliver = graft.core.FlatGeom.rect(0.0, 0.0, pixel * 0.2, pixel * 0.2)
    assert(Mvt.asMvtGeom(sliver, 0, 0, 0, 4096, 256, true) == null)
    val shortLine = Wkt.read(s"LINESTRING(0 0, ${pixel * 0.2} 0)")
    assert(Mvt.asMvtGeom(shortLine, 0, 0, 0, 4096, 256, true) == null)
  }

  test("asMvtGeom: line crossing the tile edge snaps crossings to integers") {
    // diagonal from inside tile (1,0,0) heading SE out of it
    val line = Wkt.read(s"LINESTRING(${-Half / 4} ${Half / 2}, ${Half / 4} ${-Half / 8})")
    val out = Mvt.asMvtGeom(line, 1, 0, 0, 4096, 0, true)
    assert(out != null && out.coords.forall(c => c == math.floor(c)))
    val b = graft.kernels.Planar.boundingRect(out)
    assert(b(2) <= 4096.0 && b(3) <= 4096.0 && b(0) >= 0.0 && b(1) >= 0.0)
  }

  test("asMvtGeom: donut keeps its hole with opposite winding") {
    val poly = Wkt.read(
      s"POLYGON((${-Half / 2} ${-Half / 2}, ${Half / 2} ${-Half / 2}, " +
        s"${Half / 2} ${Half / 2}, ${-Half / 2} ${Half / 2}, ${-Half / 2} ${-Half / 2})," +
        s"(${-Half / 4} ${-Half / 4}, ${-Half / 4} ${Half / 4}, " +
        s"${Half / 4} ${Half / 4}, ${Half / 4} ${-Half / 4}, ${-Half / 4} ${-Half / 4}))")
    val out = Mvt.asMvtGeom(poly, 0, 0, 0, 4096, 256, true)
    assert(out != null && out.rings.length == 2)
    val shell2 = graft.kernels.Planar.twiceSignedRingArea(
      out.coords, 0, out.ringEnd(0))
    val holeStart = out.ringStart(1)
    val hole = java.util.Arrays.copyOfRange(
      out.coords, holeStart * 2, out.ringEnd(1) * 2)
    val hole2 = graft.kernels.Planar.twiceSignedRingArea(hole, 0, hole.length >> 1)
    assert(shell2 > 0 && hole2 < 0, s"shell 2A=$shell2 hole 2A=$hole2")
  }

  test("squareGrid: exact index range and cell polygons") {
    val g = graft.core.FlatGeom.rect(0.5, 0.5, 2.5, 1.5)
    val cells = Mvt.squareGrid(g, 1.0)
    assert(cells.length == 6)
    val set = cells.map(c => (c(0), c(1))).toSet
    assert(set == Set((0L, 0L), (1L, 0L), (2L, 0L), (0L, 1L), (1L, 1L), (2L, 1L)))
    val cell = Mvt.gridCell(2, 1, 1.0)
    val b = graft.kernels.Planar.boundingRect(cell)
    assert(b.sameElements(Array(2.0, 1.0, 3.0, 2.0)))
  }

  test("squareGrid: negative coordinates floor correctly; cap is typed null") {
    val g = graft.core.FlatGeom.rect(-1.5, -0.5, -0.5, 0.5)
    val set = Mvt.squareGrid(g, 1.0).map(c => (c(0), c(1))).toSet
    assert(set == Set((-2L, -1L), (-1L, -1L), (-2L, 0L), (-1L, 0L)))
    val world = graft.core.FlatGeom.rect(-Half, -Half, Half, Half)
    assert(Mvt.squareGrid(world, 0.001) == null) // > MaxGridCells
    assert(Mvt.squareGrid(world, 0.0) == null)
    assert(Mvt.squareGrid(world, -1.0) == null)
  }
}
