package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core.{FlatGeom, Wkt}
import graft.kernels.{Delaunay, Planar, Relate, Shapes, Stitch}

/**
 * Delaunay (TriangulateSpade analogue) + Stitch (StitchTriangles
 * analogue) kernels: Euler counts, empty-circumcircle legality,
 * JTS DelaunayTriangulationBuilder as independent oracle, and
 * stitch∘triangulate as an identity up to topology.
 */
class DelaunayStitchSpec extends AnyFunSuite {

  private def triArea(t: Array[Double]): Double =
    Math.abs((t(2) - t(0)) * (t(5) - t(1)) - (t(4) - t(0)) * (t(3) - t(1))) / 2

  private def gridPoints(n: Int): Array[(Double, Double)] =
    (0 until n).map { i =>
      (((i * 7919) % 97).toDouble, ((i * 104729) % 89).toDouble)
    }.distinct.toArray

  test("unconstrained delaunay: Euler count and hull-area coverage vs JTS") {
    import org.locationtech.jts.geom.{Coordinate, GeometryFactory}
    import org.locationtech.jts.triangulate.DelaunayTriangulationBuilder
    val pts = gridPoints(60)
    val tris = Delaunay.triangulatePoints(pts)
    val builder = new DelaunayTriangulationBuilder
    val gf = new GeometryFactory()
    builder.setSites(gf.createMultiPointFromCoords(
      pts.map(p => new Coordinate(p._1, p._2))))
    val jts = builder.getTriangles(gf)
    assert(tris.length == jts.getNumGeometries,
      s"count ${tris.length} vs JTS ${jts.getNumGeometries}")
    val myArea = tris.map(triArea).sum
    assert(Math.abs(myArea - jts.getArea) < 1e-6, s"area $myArea vs ${jts.getArea}")
  }

  test("unconstrained delaunay: no point strictly inside any circumcircle") {
    val pts = gridPoints(40)
    val tris = Delaunay.triangulatePoints(pts)
    tris.foreach { t =>
      pts.foreach { case (px, py) =>
        val ic = Delaunay.inCircle(t(0), t(1), t(2), t(3), t(4), t(5), px, py)
        // triangles are CCW; positive = strictly inside
        assert(ic <= 0, s"point ($px,$py) inside circumcircle of ${t.mkString(",")}")
      }
    }
  }

  test("constrained delaunay covers the polygon exactly and is flip-legal") {
    val star = Wkt.read(Queries.starWkt(0))
    val tris = Delaunay.constrained(star)
    assert(tris.length == 6) // n-2 for 8 distinct vertices, no Steiner points
    assert(Math.abs(tris.map(triArea).sum - Planar.unsignedArea(star)) < 1e-9)
    val donut = Wkt.read("POLYGON((0 0,10 0,10 10,0 10,0 0),(3 3,3 7,7 7,7 3,3 3))")
    val dt = Delaunay.constrained(donut)
    assert(Math.abs(dt.map(triArea).sum - 84.0) < 1e-9)
  }

  test("stitch inverts triangulation up to topology") {
    val star = Wkt.read(Queries.starWkt(3))
    val stitched = Stitch.stitchTriangles(Shapes.earcut(star).toSeq)
    assert(Math.abs(Planar.unsignedArea(stitched) - Planar.unsignedArea(star)) < 1e-9)
    assert(Relate.isEqualTopo(Relate.relate(stitched, star)), "stitched != original star")
    // donut: hole must come back as a hole
    val donut = Wkt.read("POLYGON((0 0,10 0,10 10,0 10,0 0),(3 3,3 7,7 7,7 3,3 3))")
    val sd = Stitch.stitchTriangles(Shapes.earcut(donut).toSeq)
    assert(Math.abs(Planar.unsignedArea(sd) - 84.0) < 1e-9)
    assert(Relate.isEqualTopo(Relate.relate(sd, donut)), "stitched != donut")
    // two disjoint squares stitch to a 2-part multipolygon
    val twoTris = Shapes.earcut(Wkt.read("POLYGON((0 0,1 0,1 1,0 1,0 0))")) ++
      Shapes.earcut(Wkt.read("POLYGON((5 5,6 5,6 6,5 6,5 5))"))
    val mp = Stitch.stitchTriangles(twoTris.toSeq)
    assert(mp.parts.length == 2, s"parts ${mp.parts.length}")
    assert(Math.abs(Planar.unsignedArea(mp) - 2.0) < 1e-9)
  }

  test("delaunay of collinear / tiny inputs degrades gracefully") {
    assert(Delaunay.triangulatePoints(Array((0.0, 0.0), (1.0, 1.0))).isEmpty)
    assert(Delaunay.triangulatePoints(
      Array((0.0, 0.0), (1.0, 1.0), (2.0, 2.0), (3.0, 3.0))).isEmpty)
  }
}
