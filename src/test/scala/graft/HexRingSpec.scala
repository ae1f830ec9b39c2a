package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.index.HexGrid

/** Hex-grid topology: ring walk = distance-k set, distance norm. */
class HexRingSpec extends AnyFunSuite {

  test("hexRing(k) is exactly the set of cells at distance k") {
    for (k <- 1 to 4; (q, r) <- Seq((0L, 0L), (3L, -2L), (-7L, 5L))) {
      val ring = HexGrid.hexRing(q, r, k).map(c => (c(0), c(1)))
      assert(ring.length == 6 * k)
      assert(ring.distinct.length == ring.length, "no duplicates")
      val want = (for {
        dq <- -k.toLong to k; dr <- -k.toLong to k
        if (math.abs(dq) + math.abs(dr) + math.abs(dq + dr)) / 2 == k
      } yield (q + dq, r + dr)).toSet
      assert(ring.toSet == want, s"k=$k at ($q,$r)")
    }
  }

  test("k=0 is the cell itself; negative k null") {
    assert(HexGrid.hexRing(2, 3, 0).map(_.toSeq).toSeq == Seq(Seq(2L, 3L)))
    assert(HexGrid.hexRing(0, 0, -1) == null)
  }

  test("distance: symmetry, triangle inequality, adjacency = 1") {
    val cells = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, -1L), (4L, -2L), (-3L, 7L))
    for (a <- cells; b <- cells; c <- cells) {
      val ab = HexGrid.hexDistance(a._1, a._2, b._1, b._2)
      assert(ab == HexGrid.hexDistance(b._1, b._2, a._1, a._2))
      assert(ab <= HexGrid.hexDistance(a._1, a._2, c._1, c._2) +
        HexGrid.hexDistance(c._1, c._2, b._1, b._2))
      assert((ab == 0) == (a == b))
    }
    assert(HexGrid.hexDistance(0, 0, 1, 0) == 1)
    assert(HexGrid.hexDistance(0, 0, 1, -1) == 1)
    assert(HexGrid.hexDistance(0, 0, 2, -1) == 2)
  }
}

/** Bing quadkeys: published vector, roundtrip, malformed rejection. */
class QuadkeySpec extends AnyFunSuite {
  import graft.kernels.Mvt

  test("published Bing example: tile (3, 5) at level 3 is '213'") {
    assert(Mvt.quadkey(3, 3, 5) == "213")
    assert(Mvt.quadkeyDecode("213").toSeq == Seq(3L, 3L, 5L))
  }

  test("roundtrip over a tile pyramid") {
    for (z <- 0 to 6; x <- 0L until (1L << z) by math.max(1, (1L << z) / 5);
         y <- 0L until (1L << z) by math.max(1, (1L << z) / 5)) {
      val qk = Mvt.quadkey(z, x, y)
      assert(qk.length == z)
      assert(Mvt.quadkeyDecode(qk).toSeq == Seq(z.toLong, x, y), s"($z,$x,$y)")
    }
  }

  test("nulls: out-of-range tiles, bad characters, overlong keys") {
    assert(Mvt.quadkey(2, 4, 0) == null)
    assert(Mvt.quadkey(-1, 0, 0) == null)
    assert(Mvt.quadkeyDecode("0123x") == null)
    assert(Mvt.quadkeyDecode("4") == null)
    assert(Mvt.quadkeyDecode("0" * 32) == null)
    assert(Mvt.quadkeyDecode("").toSeq == Seq(0L, 0L, 0L)) // root tile
  }
}
