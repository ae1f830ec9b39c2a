package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core.{FlatGeom, GeomKind, Wkt}
import graft.kernels.{Lines, Planar}

class LinesSpec extends AnyFunSuite {

  private def g(w: String): FlatGeom = Wkt.readOpt(w).get
  private def lineCount(m: FlatGeom): Int =
    if (m.isEmpty) 0 else if (m.kind == GeomKind.LineString) 1 else m.rings.length
  private def totalLen(m: FlatGeom): Double = Planar.euclideanLength(m)

  test("merge a path split into mixed-direction pieces") {
    val merged = Lines.lineMerge(g(
      "MULTILINESTRING((10 0,20 0),(0 0,10 0),(30 0,20 0))"))
    assert(lineCount(merged) == 1)
    assert(math.abs(totalLen(merged) - 30.0) < 1e-12)
    assert(merged.numPoints == 4)
  }

  test("never merges through a junction (degree 3)") {
    val merged = Lines.lineMerge(g(
      "MULTILINESTRING((0 0,10 0),(10 0,20 0),(10 0,10 10))"))
    assert(lineCount(merged) == 3)
  }

  test("closed chain of pieces becomes one ring-shaped line") {
    val merged = Lines.lineMerge(g(
      "MULTILINESTRING((0 0,4 0),(4 0,4 4),(4 4,0 4),(0 4,0 0))"))
    assert(lineCount(merged) == 1)
    assert(merged.x(0) == merged.x(merged.numPoints - 1) &&
      merged.y(0) == merged.y(merged.numPoints - 1))
  }

  test("matches JTS LineMerger on a tangled fixture") {
    val w = "MULTILINESTRING((0 0,5 5),(5 5,10 0),(10 0,15 5),(20 20,25 25)," +
      "(25 25,30 20),(5 5,5 10),(40 0,41 0),(41 0,42 0),(42 0,43 0))"
    val ours = Lines.lineMerge(g(w))
    val merger = new org.locationtech.jts.operation.linemerge.LineMerger()
    merger.add(new org.locationtech.jts.io.WKTReader().read(w))
    val jts = merger.getMergedLineStrings
    assert(lineCount(ours) == jts.size, s"ours=${lineCount(ours)} jts=${jts.size}")
    // same multiset of (length, numPoints) per merged line
    def sig(len: Double, pts: Int) = (math.rint(len * 1e9), pts)
    val oursSig = (0 until lineCount(ours)).map { i =>
      val part = FlatGeom.part(ours, i)
      sig(Planar.euclideanLength(part), part.numPoints)
    }.sorted
    import scala.jdk.CollectionConverters._
    val jtsSig = jts.asScala.toSeq.map { o =>
      val l = o.asInstanceOf[org.locationtech.jts.geom.LineString]
      sig(l.getLength, l.getNumPoints)
    }.sorted
    assert(oursSig == jtsSig)
  }

  test("node an X crossing into four arcs") {
    val noded = Lines.node(g("MULTILINESTRING((0 0,10 10),(0 10,10 0))"))
    assert(lineCount(noded) == 4)
    assert(math.abs(totalLen(noded) - 2 * math.hypot(10, 10)) < 1e-9)
  }

  test("node dissolves exact duplicates and collinear overlaps") {
    val noded = Lines.node(g("MULTILINESTRING((0 0,10 0),(0 0,10 0),(5 0,15 0))"))
    // pieces (0,0)-(5,0)-(10,0)-(15,0) re-chain into one arc
    assert(lineCount(noded) == 1)
    assert(math.abs(totalLen(noded) - 15.0) < 1e-12)
  }

  test("degenerate inputs") {
    assert(Lines.lineMerge(g("LINESTRING EMPTY")).isEmpty)
    assert(Lines.lineMerge(g("POINT(1 1)")).isEmpty)
    assert(Lines.lineMerge(null).isEmpty)
    assert(Lines.node(g("MULTIPOINT(0 0,1 1)")).isEmpty)
    // areal input nodes its boundary
    val nb = Lines.node(g("POLYGON((0 0,4 0,4 4,0 4,0 0))"))
    assert(math.abs(totalLen(nb) - 16.0) < 1e-12)
  }

  test("line substring: fractions, vertex preservation, degenerate") {
    import graft.kernels.Lines
    val l = g("LINESTRING(0 0,10 0,10 10)")
    val mid = Lines.lineSubstring(l, 0.25, 0.75)
    // total length 20: substring from 5 to 15 -> (5 0,10 0,10 5)
    assert(mid.numPoints == 3)
    assert(mid.x(0) == 5.0 && mid.y(0) == 0.0)
    assert(mid.x(1) == 10.0 && mid.y(1) == 0.0)
    assert(mid.x(2) == 10.0 && mid.y(2) == 5.0)
    assert(math.abs(Planar.euclideanLength(mid) - 10.0) < 1e-12)
    // identity and prefix
    assert(Lines.lineSubstring(l, 0.0, 1.0).numPoints == 3)
    assert(math.abs(Planar.euclideanLength(Lines.lineSubstring(l, 0.0, 0.5)) - 10.0) < 1e-12)
    // degenerate: t0 == t1 -> zero-length line at the point
    val pt = Lines.lineSubstring(l, 0.5, 0.5)
    assert(pt.numPoints == 2 && pt.x(0) == 10.0 && pt.y(0) == 0.0)
    // invalid ranges / non-line -> null
    assert(Lines.lineSubstring(l, -0.1, 0.5) == null)
    assert(Lines.lineSubstring(l, 0.6, 0.5) == null)
    assert(Lines.lineSubstring(g("POINT(0 0)"), 0.0, 1.0) == null)
  }

  test("reverse keeps structure and flips order") {
    import graft.kernels.Lines
    val l = Lines.reverse(g("LINESTRING(0 0,1 0,2 5)"))
    assert(l.x(0) == 2.0 && l.y(0) == 5.0 && l.x(2) == 0.0)
    val p = Lines.reverse(g("POLYGON((0 0,4 0,4 4,0 4,0 0))"))
    assert(math.abs(Planar.unsignedArea(p) - 16.0) < 1e-12)
    assert(p.x(0) == p.x(p.numPoints - 1)) // still closed
    assert(Lines.reverse(g("POINT(3 4)")).x(0) == 3.0)
  }
}
