package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core.{FlatGeom, Wkt}
import graft.kernels._

/** Property-style randomized tests mirroring the reference's Arbitrary
  * instances (geo-types/src/arbitrary.rs) with the JTS jar as a
  * TEST-ONLY oracle (never the engine). A seeded LCG replaces the
  * scalacheck harness (only the raw scalacheck jar is cached here) so
  * every run checks the identical 200 cases. */
class PropertySpec extends AnyFunSuite {

  private final class Rng(seed0: Long) {
    private var s = seed0
    def nextLong(): Long = { s = s * 6364136223846793005L + 1442695040888963407L; s }
    def double(lo: Double, hi: Double): Double = {
      val u = ((nextLong() >>> 11).toDouble / (1L << 53).toDouble)
      lo + u * (hi - lo)
    }
    def int(lo: Int, hi: Int): Int = lo + (nextLong() >>> 33).toInt.abs % (hi - lo + 1)
  }

  private def forAllSeeded(cases: Int = 200)(body: Rng => Unit): Unit = {
    var i = 0
    while (i < cases) { body(new Rng(0x9E3779B97F4A7C15L + i * 0x632BE59BD9B4E019L)); i += 1 }
  }

  private def coord(r: Rng): Double = Math.rint(r.double(-100, 100) * 16) / 16.0
  private def points(r: Rng): Array[Double] = {
    val n = r.int(3, 24)
    Array.fill(2 * n)(coord(r))
  }

  private def toJts(g: FlatGeom): org.locationtech.jts.geom.Geometry =
    new org.locationtech.jts.io.WKTReader().read(Wkt.write(g))

  test("property: convex hull contains every input point") {
    forAllSeeded() { r =>
      val pts = points(r)
      val hull = Hull.quickHull(pts)
      if (hull.length >= 8) {
        val hp = FlatGeom.polygon(hull)
        (0 until pts.length / 2).foreach { i =>
          assert(Planar.coordPos(hp, pts(2 * i), pts(2 * i + 1)) != Planar.Outside,
            s"(${pts(2 * i)}, ${pts(2 * i + 1)}) outside hull ${Wkt.write(hp)}")
        }
      }
    }
  }

  test("property: hull matches JTS hull area") {
    forAllSeeded() { r =>
      val pts = points(r)
      val hull = Hull.quickHull(pts)
      if (hull.length >= 8) {
        val ours = Math.abs(Planar.twiceSignedRingArea(hull, 0, hull.length / 2)) / 2
        val mp = FlatGeom.multiPoint(pts)
        val jts = toJts(mp).convexHull().getArea
        assert(Math.abs(ours - jts) <= 1e-9 * Math.max(1.0, jts), s"ours=$ours jts=$jts")
      }
    }
  }

  test("property: RDP output is a subsequence and keeps endpoints") {
    forAllSeeded() { r =>
      val cs = Array.fill(2 * r.int(2, 30))(coord(r))
      val eps = r.double(0.1, 10.0)
      val line = FlatGeom.lineString(cs)
      val out = Simplify.rdp(line, eps)
      // endpoints preserved
      assert(out.x(0) == line.x(0) && out.y(0) == line.y(0))
      assert(out.x(out.numPoints - 1) == line.x(line.numPoints - 1))
      // subsequence of input points
      val inPts = (0 until line.numPoints).map(i => (line.x(i), line.y(i)))
      var searchFrom = 0
      (0 until out.numPoints).foreach { i =>
        val idx = inPts.indexOf((out.x(i), out.y(i)), searchFrom)
        assert(idx >= 0, s"point ${out.x(i)},${out.y(i)} not in input order")
        searchFrom = idx
      }
    }
  }

  test("property: PIP agrees with the JTS oracle") {
    forAllSeeded(400) { r =>
      val n = r.int(3, 10)
      val cx = coord(r); val cy = coord(r)
      val ring = (0 until n).flatMap { i =>
        val ang = 2 * Math.PI * i / n
        val rad = r.double(1.0, 30.0)
        Seq(cx + Math.rint(rad * Math.cos(ang) * 16) / 16, cy + Math.rint(rad * Math.sin(ang) * 16) / 16)
      }.toArray
      val px = coord(r); val py = coord(r)
      val poly = FlatGeom.polygon(ring)
      if (Planar.unsignedArea(poly) > 1e-9) {
        val jts = toJts(poly)
        if (jts.isValid) {
          val pt = new org.locationtech.jts.geom.GeometryFactory()
            .createPoint(new org.locationtech.jts.geom.Coordinate(px, py))
          val ours = Planar.coordPos(poly, px, py)
          val oursIn = ours == Planar.Inside
          val oursOn = ours == Planar.OnBoundary
          assert(oursIn == jts.contains(pt),
            s"contains mismatch at ($px,$py) on ${Wkt.write(poly)}: ours=$ours")
          assert((oursIn || oursOn) == jts.intersects(pt),
            s"intersects mismatch at ($px,$py) on ${Wkt.write(poly)}")
        }
      }
    }
  }

  test("property: overlay areas satisfy inclusion-exclusion vs JTS") {
    forAllSeeded() { r =>
      def box(): FlatGeom = {
        val x = coord(r); val y = coord(r)
        FlatGeom.rect(x, y, x + Math.rint(r.double(1, 40) * 16) / 16, y + Math.rint(r.double(1, 40) * 16) / 16)
      }
      val a = box(); val b = box()
      val inter = Planar.unsignedArea(Overlay.booleanOp(a, b, Overlay.OpIntersection))
      val union = Planar.unsignedArea(Overlay.booleanOp(a, b, Overlay.OpUnion))
      val aArea = Planar.unsignedArea(a)
      val bArea = Planar.unsignedArea(b)
      assert(Math.abs(union + inter - aArea - bArea) < 1e-6,
        s"incl-excl: u=$union i=$inter a=$aArea b=$bArea")
      val jtsInter = toJts(a).intersection(toJts(b)).getArea
      assert(Math.abs(inter - jtsInter) < 1e-6, s"ours=$inter jts=$jtsInter")
    }
  }

  test("property: cell covering covers the geometry bbox") {
    forAllSeeded() { r =>
      val pts = points(r)
      val level = r.int(4, 10)
      val line = FlatGeom.lineString(pts)
      val cells = graft.index.CellId.coveringForGeom(level, line)
      assert(cells.nonEmpty)
      // every input point's cell is in the covering
      (0 until line.numPoints).foreach { i =>
        val c = graft.index.CellId.cellId(level, line.x(i), line.y(i))
        assert(cells.contains(c), s"point cell missing at level $level")
      }
    }
  }

  test("property: geojson roundtrip is exact and normalize is idempotent") {
    import graft.core.GeoJson
    forAllSeeded() { r =>
      // random multi-kind geometries: point / line / hull polygon /
      // multipoint / two-part multilinestring built from the lattice.
      // -0.0 canonicalizes to +0.0 up front: the shared WKT/GeoJSON
      // formatter prints integral values sign-collapsed ("0"), so a
      // -0.0 input cannot roundtrip BITWISE (it roundtrips by value)
      val pts = points(r).map(v => if (v == 0.0) 0.0 else v)
      val gs = Seq[FlatGeom](
        FlatGeom.point(pts(0), pts(1)),
        FlatGeom.lineString(pts),
        FlatGeom.polygon(Hull.quickHull(pts)),
        FlatGeom.multiPoint(pts),
        FlatGeom.multiLineString(Seq(
          java.util.Arrays.copyOfRange(pts, 0, pts.length / 2 * 2 / 2 * 2),
          java.util.Arrays.copyOfRange(pts, 2, pts.length))))
      gs.foreach { g =>
        // GeoJSON write → read is structurally exact
        assert(GeoJson.read(GeoJson.write(g)) == g,
          s"geojson roundtrip ${Wkt.write(g).take(80)}")
        // normalize twice = normalize once, and equalsNorm is
        // reflexive under part/direction permutations
        val n1 = Normalize.normalize(g)
        assert(Normalize.normalize(n1) == n1,
          s"normalize not idempotent on ${Wkt.write(g).take(80)}")
        assert(Normalize.equalsNorm(g, n1))
      }
      // a reversed linestring is equalsNorm to the original
      val line = FlatGeom.lineString(pts)
      val rev = Lines.reverse(line)
      assert(Normalize.equalsNorm(line, rev))
    }
  }
}
