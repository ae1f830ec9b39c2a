package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core.{FlatGeom, Wkt}
import graft.kernels.{Overlay, Planar, Subdivide}

class SubdivideSpec extends AnyFunSuite {

  /** Rectangle [0,w]x[0,h] densified to unit steps along the boundary
    * (2(w+h) distinct vertices + closure). */
  private def denseRect(w: Int, h: Int, dx: Double = 0, dy: Double = 0): FlatGeom = {
    val pts = new scala.collection.mutable.ArrayBuffer[Double]
    for (x <- 0 until w) { pts += dx + x; pts += dy + 0 }
    for (y <- 0 until h) { pts += dx + w; pts += dy + y }
    for (x <- w until 0 by -1) { pts += dx + x; pts += dy + h }
    for (y <- h until 0 by -1) { pts += dx + 0; pts += dy + y }
    FlatGeom.polygon(pts.toArray)
  }

  private def invariants(g: FlatGeom, maxV: Int): (Int, Double, Double, Double) = {
    val pieces = Subdivide.subdivide(g, maxV)
    assert(pieces.nonEmpty)
    pieces.foreach(p => assert(p.numPoints <= maxV, s"piece has ${p.numPoints} > $maxV"))
    val areas = pieces.map(Planar.unsignedArea)
    // pieces re-union to the original exactly (areal identity)
    val u = Overlay.treeUnion(pieces.toSeq)
    val xor = Planar.unsignedArea(Overlay.booleanOp(u, g, Overlay.OpXor))
    assert(xor < 1e-9, s"union-vs-original xor area $xor")
    (pieces.length, areas.sum, areas.min, areas.max)
  }

  test("densified 16x4 rectangle at maxV=20: exact area, bounded pieces") {
    val g = denseRect(16, 4)
    assert(g.numPoints == 41)
    val (n, sum, amin, amax) = invariants(g, 20)
    assert(math.abs(sum - 64.0) < 1e-9)
    info(s"pieces=$n minArea=$amin maxArea=$amax")
    // translation invariance: identical decomposition counts and areas
    val (n2, sum2, amin2, amax2) = invariants(denseRect(16, 4, 230.0, 115.0), 20)
    assert(n2 == n && math.abs(sum2 - sum) < 1e-9 &&
      math.abs(amin2 - amin) < 1e-12 && math.abs(amax2 - amax) < 1e-12)
  }

  test("square with a hole subdivides and re-unions exactly") {
    val g = Wkt.readOpt(
      "POLYGON((0 0,12 0,12 12,0 12,0 0),(4 4,8 4,8 8,4 8,4 4))").get
    val (_, sum, _, _) = invariants(g, 10)
    assert(math.abs(sum - (144.0 - 16.0)) < 1e-9)
  }

  test("multipolygon parts subdivide independently; small input passes through") {
    val g = Wkt.readOpt(
      "MULTIPOLYGON(((0 0,4 0,4 4,0 4,0 0)),((10 0,14 0,14 4,10 4,10 0)))").get
    val pieces = Subdivide.subdivide(g, 8)
    assert(pieces.length == 2) // both already within the cap
    assert(math.abs(pieces.map(Planar.unsignedArea).sum - 32.0) < 1e-12)
  }

  test("degenerate inputs") {
    assert(Subdivide.subdivide(Wkt.readOpt("POLYGON EMPTY").get, 10).isEmpty)
    assert(Subdivide.subdivide(Wkt.readOpt("POINT(1 2)").get, 10).isEmpty)
    assert(Subdivide.subdivide(Wkt.readOpt("LINESTRING(0 0,1 1)").get, 10).isEmpty)
    assert(Subdivide.subdivide(null, 10).isEmpty)
    // maxVertices clamps up to 5: a triangle survives even at maxV=1
    val t = Wkt.readOpt("POLYGON((0 0,8 0,0 8,0 0))").get
    val pieces = Subdivide.subdivide(t, 1)
    assert(pieces.map(Planar.unsignedArea).sum > 0)
    pieces.foreach(p => assert(p.numPoints <= Subdivide.MinMaxVertices + 2))
  }

  test("star polygon: area preserved under subdivision") {
    // 16-armed integer star around (100, 100)
    val pts = new scala.collection.mutable.ArrayBuffer[Double]
    for (k <- 0 until 32) {
      val r = if (k % 2 == 0) 50.0 else 20.0
      val a = k * math.Pi / 16
      pts += 100.0 + math.rint(r * math.cos(a))
      pts += 100.0 + math.rint(r * math.sin(a))
    }
    val star = FlatGeom.polygon(pts.toArray)
    val (n, sum, _, _) = invariants(star, 12)
    assert(n >= 4)
    assert(math.abs(sum - Planar.unsignedArea(star)) < 1e-9)
  }
}
