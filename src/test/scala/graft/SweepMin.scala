package graft

import graft.kernels.Sweep

/** Minimizer: find the smallest lattice instance where BO != x-sweep. */
object SweepMin {
  def main(args: Array[String]): Unit = {
    var seed = if (args.nonEmpty) args(0).toLong else 1L
    def nextInt(bound: Int): Int = {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      Math.floorMod(seed >>> 17, bound.toLong).toInt
    }
    def pairSet(segs: Array[Double]): (Set[(Int, Int, Int)], Set[(Int, Int, Int)]) = {
      val ids = Array.range(0, segs.length / 4)
      (Sweep.intersectionsXSweep(segs, ids).map(h => (h.a, h.b, h.result.kind)).toSet,
        Sweep.intersectionsBO(segs, ids).map(h => (h.a, h.b, h.result.kind)).toSet)
    }
    var found: Array[Double] = null
    var trial = 0
    while (found == null && trial < 30000) {
      val n = 3 + nextInt(60)
      val span = 2 + nextInt(10)
      val segs = Array.fill(4 * n)(nextInt(span).toDouble)
      val (xs, bo) = pairSet(segs)
      if (xs != bo) found = segs
      trial += 1
    }
    if (found == null) { println("no small failure found"); return }
    // shrink: drop segments while still failing
    var cur = found
    var improved = true
    while (improved) {
      improved = false
      val m = cur.length / 4
      var k = 0
      while (k < m && !improved) {
        val cand = (0 until m).filter(_ != k).flatMap(i =>
          Seq(cur(4 * i), cur(4 * i + 1), cur(4 * i + 2), cur(4 * i + 3))).toArray
        val (xs2, bo2) = pairSet(cand)
        if (xs2 != bo2) { cur = cand; improved = true }
        k += 1
      }
    }
    found = cur
    println(s"found at trial $trial (shrunk to ${found.length / 4} segs):")
    for (i <- 0 until found.length / 4)
      println(s"  seg $i: (${found(4*i)},${found(4*i+1)}) -> (${found(4*i+2)},${found(4*i+3)})")
    val (xs, bo) = pairSet(found)
    println(s"xs=$xs")
    println(s"bo=$bo")
    println(s"missing=${xs -- bo}  extra=${bo -- xs}")
  }
}
