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
