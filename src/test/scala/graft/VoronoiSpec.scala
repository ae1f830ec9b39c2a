package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core.{FlatGeom, Wkt}
import graft.kernels.{Overlay, Planar, Voronoi}

/**
 * Voronoi kernel: closed-form cells, partition-of-the-plane
 * properties on deterministic pseudo-random sites, degeneracies, and
 * a live JTS VoronoiDiagramBuilder oracle (test-only use of the jts
 * jar; the engine never touches it).
 */
class VoronoiSpec extends AnyFunSuite {

  private def area(ring: Array[Double]): Double =
    if (ring.isEmpty) 0.0 else Planar.unsignedArea(FlatGeom.polygon(ring))

  test("4 corners + center of a square: closed-form cells") {
    val sites = Array[Double](0, 0, 4, 0, 0, 4, 4, 4, 2, 2)
    val cells = Voronoi.cells(sites, 0, 0, 4, 4)
    assert(cells.length == 5)
    // corner cells are the triangles cut by x+y=2 etc., area 2 each
    for (i <- 0 until 4) assert(math.abs(area(cells(i)) - 2.0) < 1e-12, s"cell $i")
    // the center cell is the diamond (2,0)(4,2)(2,4)(0,2), area 8
    assert(math.abs(area(cells(4)) - 8.0) < 1e-12)
    assert(cells(4).length == 10) // 4 distinct vertices + closure
    // partition: areas sum to the clip rectangle
    assert(math.abs(cells.map(area).sum - 16.0) < 1e-12)
  }

  test("one site owns the whole clip rectangle; empty input is empty") {
    val one = Voronoi.cells(Array[Double](7, 7), 0, 0, 10, 5)
    assert(one.length == 1 && math.abs(area(one(0)) - 50.0) < 1e-12)
    assert(Voronoi.cells(Array.emptyDoubleArray, 0, 0, 1, 1).isEmpty)
    // degenerate clip window
    val deg = Voronoi.cells(Array[Double](0, 0, 1, 1), 2, 2, 2, 5)
    assert(deg.forall(_.isEmpty))
  }

  test("collinear sites: parallel strips") {
    val sites = Array[Double](1, 0, 3, 0, 5, 0)
    val cells = Voronoi.cells(sites, 0, -1, 6, 1)
    assert(math.abs(area(cells(0)) - 4.0) < 1e-12) // x in [0,2]
    assert(math.abs(area(cells(1)) - 4.0) < 1e-12) // x in [2,4]
    assert(math.abs(area(cells(2)) - 4.0) < 1e-12) // x in [4,6]
  }

  test("partition properties on deterministic pseudo-random sites") {
    // xorshift-style deterministic site generator (no Random seed API
    // drift across scala versions)
    def gen(n: Int, salt: Long): Array[Double] = {
      val out = new Array[Double](2 * n)
      var s = salt
      var i = 0
      while (i < 2 * n) {
        s ^= s << 13; s ^= s >>> 7; s ^= s << 17
        out(i) = math.abs(s % 1000L) / 10.0
        i += 1
      }
      out
    }
    for (salt <- Seq(1L, 42L, 9001L)) {
      val raw = gen(40, salt)
      val sites = Voronoi.distinctSites(FlatGeom.multiPoint(raw))
      val n = sites.length >> 1
      val cells = Voronoi.cells(sites, -10, -10, 110, 110)
      assert(cells.length == n)
      // cells tile the window
      assert(math.abs(cells.map(area).sum - 120.0 * 120.0) < 1e-6)
      // every site strictly inside (or on the boundary of) its own cell
      var i = 0
      while (i < n) {
        val pos = Planar.coordPos(FlatGeom.polygon(cells(i)), sites(2 * i), sites(2 * i + 1))
        assert(pos != Planar.Outside, s"site $i outside its own cell (salt=$salt)")
        // and nearer to its own site than any other at the centroid
        i += 1
      }
    }
  }

  test("matches JTS VoronoiDiagramBuilder cell-for-cell") {
    def gen(n: Int, salt: Long): Array[Double] = {
      val out = new Array[Double](2 * n)
      var s = salt
      var i = 0
      while (i < 2 * n) {
        s ^= s << 13; s ^= s >>> 7; s ^= s << 17
        out(i) = math.abs(s % 97L).toDouble
        i += 1
      }
      out
    }
    val gfac = new org.locationtech.jts.geom.GeometryFactory()
    for (salt <- Seq(3L, 77L)) {
      val sites = Voronoi.distinctSites(FlatGeom.multiPoint(gen(25, salt)))
      val n = sites.length >> 1
      val (minX, minY, maxX, maxY) = (-50.0, -50.0, 150.0, 150.0)
      val ours = Voronoi.cells(sites, minX, minY, maxX, maxY)
      val b = new org.locationtech.jts.triangulate.VoronoiDiagramBuilder()
      val coords = (0 until n).map(i =>
        new org.locationtech.jts.geom.Coordinate(sites(2 * i), sites(2 * i + 1)))
      b.setSites(java.util.Arrays.asList(coords: _*))
      val env = new org.locationtech.jts.geom.Envelope(minX, maxX, minY, maxY)
      b.setClipEnvelope(env)
      val diagram = b.getDiagram(gfac)
      // associate each JTS cell to its site via the embedded user data
      // coordinate (JTS stores the site as the cell's userData)
      val jtsBySite = (0 until diagram.getNumGeometries).map { k =>
        val cell = diagram.getGeometryN(k)
        val site = cell.getUserData.asInstanceOf[org.locationtech.jts.geom.Coordinate]
        ((site.x, site.y), cell)
      }.toMap
      var i = 0
      while (i < n) {
        val key = (sites(2 * i), sites(2 * i + 1))
        val jcell = jtsBySite.getOrElse(key, fail(s"JTS lost site $key"))
        val oursG = Wkt.readOpt(
          new org.locationtech.jts.io.WKTWriter().write(jcell)).map { jts =>
          val mine = FlatGeom.polygon(ours(i))
          Planar.unsignedArea(Overlay.booleanOp(mine, jts, Overlay.OpXor))
        }.getOrElse(fail("unparsable JTS cell"))
        assert(oursG < 1e-6, s"cell $i symdiff=$oursG (salt=$salt)")
        i += 1
      }
    }
  }
}
