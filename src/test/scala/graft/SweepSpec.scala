package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.kernels.{SegIntersect, Sweep}

/**
 * Differential gate for the event-queue Bentley-Ottmann sweep: on every
 * input family it must report exactly the pair set of the x-sweep
 * (whose own output is hash-gated by q_segjoin's DuckDB oracle).
 * Results come from the same parent-pair SegIntersect call, so pair-set
 * equality implies full output equality.
 */
class SweepSpec extends AnyFunSuite {

  private def pairSet(hits: Seq[Sweep.Hit]): Set[(Int, Int, Int)] =
    hits.map(h => (h.a, h.b, h.result.kind)).toSet

  private def differential(segs: Array[Double], label: String): Unit = {
    val ids = Array.range(0, segs.length / 4)
    val xs = pairSet(Sweep.intersectionsXSweep(segs, ids).toSeq)
    val bo = pairSet(Sweep.intersectionsBO(segs, ids).toSeq)
    val missing = xs -- bo
    val extra = bo -- xs
    assert(missing.isEmpty && extra.isEmpty,
      s"$label: missing=${missing.take(8)} extra=${extra.take(8)} (xs=${xs.size} bo=${bo.size})")
  }

  test("BO differential: deterministic pseudo-random lattice batches (degeneracy-rich)") {
    // small integer lattice => shared endpoints, collinear overlaps,
    // verticals, horizontals, duplicates, T-junctions, zero-length
    var seed = 12345L
    def nextInt(bound: Int): Int = {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      (Math.floorMod(seed >>> 17, bound.toLong)).toInt
    }
    for (trial <- 0 until 120) {
      val n = 8 + nextInt(40)
      val span = 2 + nextInt(12)
      val segs = new Array[Double](4 * n)
      var i = 0
      while (i < n) {
        segs(4 * i) = nextInt(span); segs(4 * i + 1) = nextInt(span)
        segs(4 * i + 2) = nextInt(span); segs(4 * i + 3) = nextInt(span)
        i += 1
      }
      differential(segs, s"lattice trial $trial (n=$n span=$span)")
    }
  }

  test("BO differential: continuous random batches") {
    var seed = 987654321L
    def nextDouble(): Double = {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      (seed >>> 11).toDouble / (1L << 53).toDouble * 100.0
    }
    for (trial <- 0 until 60) {
      val n = 20 + (trial % 30)
      val segs = Array.fill(4 * n)(nextDouble())
      differential(segs, s"continuous trial $trial")
    }
  }

  test("BO differential: the q_segjoin supplier lattice") {
    val n = 600
    val segs = new Array[Double](4 * n)
    for (s <- 1 to n) {
      val i = s - 1
      segs(4 * i) = (s * 37 % 100) / 4.0
      segs(4 * i + 1) = (s * 53 % 100) / 4.0
      segs(4 * i + 2) = (s * 37 % 100 + s * 29 % 21 - 10) / 4.0
      segs(4 * i + 3) = (s * 53 % 100 + s * 73 % 21 - 10) / 4.0
    }
    differential(segs, "segjoin lattice")
  }

  test("BO differential: crossing grid (every h-v pair intersects)") {
    // 40 horizontals x 40 verticals -> 1600 proper crossings plus
    // collinear families at shared rows/columns
    val segs = scala.collection.mutable.ArrayBuffer[Double]()
    for (r <- 0 until 40) { segs += 0.0; segs += r.toDouble; segs += 39.0; segs += r.toDouble }
    for (c <- 0 until 40) { segs += c.toDouble; segs += 0.0; segs += c.toDouble; segs += 39.0 }
    differential(segs.toArray, "crossing grid")
  }

  test("BO kills the x-sweep's degenerate case: parallel long diagonals") {
    // n parallel diagonals: every bbox pair overlaps (x-sweep does
    // O(n^2) candidate tests) but nothing intersects; BO only ever
    // tests status-adjacent pieces -> O(n log n)
    val n = 4000
    val segs = new Array[Double](4 * n)
    var i = 0
    while (i < n) {
      val off = i * 1e-3
      segs(4 * i) = off; segs(4 * i + 1) = 1000.0
      segs(4 * i + 2) = 1000.0 + off; segs(4 * i + 3) = 2000.0
      i += 1
    }
    val ids = Array.range(0, n)
    // wall-clock comparison: warm both paths once (JIT), then take the
    // best of 3 — the suite runs in parallel with Spark suites, so a
    // single sample is hostage to scheduler noise
    assert(Sweep.intersectionsBO(segs, ids).isEmpty)
    assert(Sweep.intersectionsXSweep(segs, ids).isEmpty)
    def best(run: () => Unit): Double =
      (0 until 3).map { _ =>
        val t0 = System.nanoTime(); run(); (System.nanoTime() - t0) / 1e6
      }.min
    val tBo = best(() => assert(Sweep.intersectionsBO(segs, ids).isEmpty))
    val tXs = best(() => assert(Sweep.intersectionsXSweep(segs, ids).isEmpty))
    info(f"parallel diagonals n=$n: BO $tBo%.1f ms vs x-sweep $tXs%.1f ms (best of 3)")
    // the BO must be decisively sub-quadratic here
    assert(tBo < tXs, s"BO ($tBo ms) not faster than x-sweep ($tXs ms)")
  }

  test("BO survives a large collinear overlap family (all pairs overlap)") {
    // n staggered segments on one line: every pair overlaps (k = n²/2);
    // the through×through skip keeps BO at O(k), where naive
    // through-splitting was n³ (observed hang before the fix)
    val n = 1000
    val segs = new Array[Double](4 * n)
    var i = 0
    while (i < n) {
      segs(4 * i) = i * 0.5; segs(4 * i + 1) = i * 0.5
      segs(4 * i + 2) = i * 0.5 + 600.0; segs(4 * i + 3) = i * 0.5 + 600.0
      i += 1
    }
    val ids = Array.range(0, n)
    val t0 = System.nanoTime()
    val bo = pairSet(Sweep.intersectionsBO(segs, ids).toSeq)
    val tBo = (System.nanoTime() - t0) / 1e6
    val xs = pairSet(Sweep.intersectionsXSweep(segs, ids).toSeq)
    assert(bo == xs, s"missing=${(xs -- bo).take(5)} extra=${(bo -- xs).take(5)}")
    assert(bo.size == n * (n - 1) / 2, s"expected all pairs, got ${bo.size}")
    info(f"collinear family n=$n: ${bo.size} overlap pairs, BO $tBo%.1f ms")
  }

  test("BO differential: star bursts (many segments through one point)") {
    val segs = scala.collection.mutable.ArrayBuffer[Double]()
    for (k <- 0 until 24) {
      val ang = k * Math.PI / 12.0
      segs += 50.0; segs += 50.0
      segs += 50.0 + 40.0 * Math.cos(ang); segs += 50.0 + 40.0 * Math.sin(ang)
    }
    // plus chords crossing the bundle
    for (k <- 0 until 10) {
      segs += 10.0 + k; segs += 95.0; segs += 90.0 - k; segs += 5.0
    }
    differential(segs.toArray, "star burst")
  }
}
