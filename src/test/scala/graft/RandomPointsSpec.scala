package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core.{FlatGeom, GeomKind, Wkt}
import graft.kernels.{RandomPoints, Topo}

/** Seeded uniform point generation: determinism, containment,
  * coverage balance, typed nulls. */
class RandomPointsSpec extends AnyFunSuite {

  private val donut = Wkt.read(
    "POLYGON((0 0,40 0,40 40,0 40,0 0),(15 15,15 25,25 25,25 15,15 15))")

  test("deterministic per seed; different seeds differ") {
    val a = RandomPoints.generatePoints(donut, 200, 42L)
    val b = RandomPoints.generatePoints(donut, 200, 42L)
    val c = RandomPoints.generatePoints(donut, 200, 43L)
    assert(a.coords.toSeq == b.coords.toSeq)
    assert(a.coords.toSeq != c.coords.toSeq)
    assert(a.kind == GeomKind.MultiPoint && a.coords.length == 400)
  }

  test("every point falls inside the polygon (hole excluded)") {
    val pts = RandomPoints.generatePoints(donut, 500, 7L)
    var i = 0
    while (i < pts.coords.length) {
      val p = FlatGeom.point(pts.coords(i), pts.coords(i + 1))
      assert(Topo.contains(donut, p) || Topo.intersects(donut, p),
        s"point ${pts.coords(i)},${pts.coords(i + 1)} escaped")
      i += 2
    }
  }

  test("area-proportional coverage across a split square") {
    // unit square: each quadrant should catch ~25% of 4000 draws
    val sq = Wkt.read("POLYGON((0 0,1 0,1 1,0 1,0 0))")
    val pts = RandomPoints.generatePoints(sq, 4000, 99L)
    var q = Array(0, 0, 0, 0)
    var i = 0
    while (i < pts.coords.length) {
      val k = (if (pts.coords(i) >= 0.5) 1 else 0) +
        (if (pts.coords(i + 1) >= 0.5) 2 else 0)
      q(k) += 1; i += 2
    }
    q.foreach(n => assert(n > 800 && n < 1200, q.mkString(",")))
  }

  test("multipolygon: both parts get points, pro-rata by area") {
    val mp = Wkt.read(
      "MULTIPOLYGON(((0 0,30 0,30 30,0 30,0 0)),((100 0,110 0,110 10,100 10,100 0)))")
    val pts = RandomPoints.generatePoints(mp, 1000, 5L)
    var big = 0; var small = 0
    var i = 0
    while (i < pts.coords.length) {
      if (pts.coords(i) < 50) big += 1 else small += 1
      i += 2
    }
    // areas 900 vs 100 -> expect ~900/~100
    assert(big > 820 && small > 50, s"big=$big small=$small")
  }

  test("typed nulls: non-areal, n<=0, over cap") {
    assert(RandomPoints.generatePoints(Wkt.read("LINESTRING(0 0,1 1)"), 5, 1L) == null)
    assert(RandomPoints.generatePoints(donut, 0, 1L) == null)
    assert(RandomPoints.generatePoints(donut, RandomPoints.MaxPoints + 1, 1L) == null)
    assert(RandomPoints.generatePoints(Wkt.read("POLYGON EMPTY"), 5, 1L) == null)
  }
}
