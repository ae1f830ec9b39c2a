package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core.Wkt
import graft.kernels.{Monotone, Planar}

/**
 * Monotone subdivision PIP must agree with the exact ray cast
 * everywhere — including ON boundaries and on inserted diagonals.
 */
class MonotoneSpec extends AnyFunSuite {

  private def crossCheck(wkt: String, label: String): Unit = {
    val g = Wkt.read(wkt)
    val prep = Monotone.prepare(g)
    assert(prep != null, s"$label: prepare failed")
    val bb = Planar.boundingRect(g)
    var checked = 0
    var mismatches = 0
    var firstBad = ""
    val nx = 41; val ny = 41
    (0 until nx).foreach { ix =>
      (0 until ny).foreach { iy =>
        val x = bb(0) - 1 + (bb(2) - bb(0) + 2) * ix / (nx - 1.0)
        val y = bb(1) - 1 + (bb(3) - bb(1) + 2) * iy / (ny - 1.0)
        val want = Planar.coordPos(g, x, y)
        val got = prep.coordPos(x, y)
        checked += 1
        if (got != want && mismatches == 0)
          firstBad = s"($x,$y) got=$got want=$want"
        if (got != want) mismatches += 1
      }
    }
    assert(mismatches == 0, s"$label: $mismatches/$checked mismatches, first: $firstBad")
    // also probe the vertices themselves (must all be OnBoundary)
    var i = 0
    while (i < g.numPoints) {
      assert(prep.coordPos(g.x(i), g.y(i)) == Planar.OnBoundary,
        s"$label vertex $i not OnBoundary")
      i += 1
    }
  }

  test("monotone PIP matches ray cast on all star polygons") {
    (0 until 25).foreach(i => crossCheck(Queries.starWkt(i), s"star $i"))
  }

  test("monotone PIP matches ray cast on donut / U-shape / two-hole") {
    crossCheck("POLYGON((0 0,10 0,10 10,0 10,0 0),(3 3,3 7,7 7,7 3,3 3))", "donut")
    crossCheck("POLYGON((0 0,10 0,10 10,6 10,6 4,4 4,4 10,0 10,0 0),(1 1,1 2,2 2,2 1,1 1))", "ushape")
    crossCheck("POLYGON((0 0,12 0,12 12,0 12,0 0),(1 1,1 3,3 3,3 1,1 1),(8 8,10 8,10 10,8 10,8 8))", "twoHole")
  }

  test("monotone PIP matches ray cast on the louisiana fixture") {
    val src = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream("/fixtures/louisiana.wkt"))
    val wkt = try src.mkString.trim finally src.close()
    // the fixture is stored as a closed LINESTRING — wrap it as a ring
    val line = Wkt.read(wkt)
    val g = graft.core.FlatGeom.polygon(line.coords)
    val prep = Monotone.prepare(g)
    assert(prep != null, "louisiana prepare failed")
    assert(prep.pieces.length > 1)
    // deterministic probe grid over the bbox
    val bb = Planar.boundingRect(g)
    var mismatches = 0
    (0 until 60).foreach { ix =>
      (0 until 60).foreach { iy =>
        val x = bb(0) + (bb(2) - bb(0)) * ix / 59.0
        val y = bb(1) + (bb(3) - bb(1)) * iy / 59.0
        if (prep.coordPos(x, y) != Planar.coordPos(g, x, y)) mismatches += 1
      }
    }
    assert(mismatches == 0, s"$mismatches mismatches on louisiana")
    assert(prep.coordPos(-91.147385, 30.471165) == Planar.Inside)
  }
}
