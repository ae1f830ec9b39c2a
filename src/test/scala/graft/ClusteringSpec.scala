package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Clustering
import graft.sql.{functions => gf}

/** Distributed clustering vs driver-side brute-force references:
  * DBSCAN (Ester et al. semantics, PostGIS include-self minPts),
  * single-linkage ClusterWithin, deterministic Lloyd k-means, and
  * ClusterIntersecting — plus parallelism-invariance (the labels must
  * be bit-identical at any partitioning). */
class ClusteringSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  /** Deterministic point set on a 1/20 lattice: three dense blobs,
    * one sparse chain, and isolated noise points. */
  private val pts: Seq[(Long, Double, Double)] = {
    def blob(base: Long, cx: Double, cy: Double, n: Int): Seq[(Long, Double, Double)] =
      (0 until n).map { i =>
        (base + i, cx + ((i * 7) % 5) / 20.0, cy + ((i * 11) % 5) / 20.0)
      }
    blob(0L, 10.0, 10.0, 12) ++ blob(100L, 20.0, -5.0, 9) ++ blob(200L, -30.0, 40.0, 7) ++
      // chain with 0.4-degree gaps: single-linked at eps=0.5, split at 0.3
      (0 until 6).map(i => (300L + i, 50.0 + i * 0.4, 0.0)) ++
      Seq((400L, 120.0, 70.0), (401L, -150.0, -60.0))
  }

  private def df = {
    import spark.implicits._
    pts.toDF("k", "x", "y")
  }

  private def d2(a: (Long, Double, Double), b: (Long, Double, Double)): Double = {
    val dx = a._2 - b._2; val dy = a._3 - b._3
    dx * dx + dy * dy
  }

  /** Brute-force reference DBSCAN with min-key labels. */
  private def refDbscan(eps: Double, minPts: Int): Map[Long, (Option[Long], Boolean)] = {
    val nbrs = pts.map(p => p._1 ->
      pts.filter(q => q._1 != p._1 && d2(p, q) <= eps * eps).map(_._1).toSet).toMap
    val core = pts.map(_._1).filter(k => nbrs(k).size + 1 >= minPts).toSet
    // union-find over core-core eps edges
    val parent = collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    for (c <- core; n <- nbrs(c) if core(n)) {
      val (ra, rb) = (find(c), find(n))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val label = core.map(c => c -> core.filter(o => find(o) == find(c)).min).toMap
    pts.map { p =>
      val k = p._1
      if (core(k)) k -> (Some(label(k)), true)
      else {
        val adjCores = nbrs(k).filter(core)
        if (adjCores.nonEmpty) k -> (Some(adjCores.map(label).min), false)
        else k -> (None, false)
      }
    }.toMap
  }

  private def runDbscan(eps: Double, minPts: Int): Map[Long, (Option[Long], Boolean)] =
    Clustering.dbscan(df, "k", "x", "y", eps, minPts, level = 8)
      .collect()
      .map(r => r.getLong(0) ->
        ((if (r.isNullAt(1)) None else Some(r.getLong(1))), r.getBoolean(2)))
      .toMap

  test("dbscan matches the brute-force reference (several parameterizations)") {
    for ((eps, minPts) <- Seq((0.5, 3), (0.5, 5), (0.3, 2), (0.25, 4))) {
      assert(runDbscan(eps, minPts) === refDbscan(eps, minPts),
        s"eps=$eps minPts=$minPts")
    }
  }

  test("dbscan is parallelism-invariant") {
    val base = runDbscan(0.5, 3)
    val re = Clustering.dbscan(df.repartition(13), "k", "x", "y", 0.5, 3, level = 8)
      .collect()
      .map(r => r.getLong(0) ->
        ((if (r.isNullAt(1)) None else Some(r.getLong(1))), r.getBoolean(2)))
      .toMap
    assert(re === base)
  }

  test("clusterWithin is single-linkage transitive closure") {
    // eps=0.5 keeps the 0.4-gap chain connected; 0.3 shatters it
    def ref(eps: Double): Map[Long, Long] = {
      val parent = collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        val p = parent.getOrElse(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      for (a <- pts; b <- pts if a._1 < b._1 && d2(a, b) <= eps * eps) {
        val (ra, rb) = (find(a._1), find(b._1))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      pts.map(p => p._1 -> find(p._1)).toMap
    }
    for (eps <- Seq(0.5, 0.3)) {
      val got = Clustering.clusterWithin(df, "k", "x", "y", eps, level = 8)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === ref(eps), s"eps=$eps")
    }
    // the chain: one cluster at 0.5, six singletons at 0.3
    val at05 = Clustering.clusterWithin(df, "k", "x", "y", 0.5, level = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((300L to 305L).map(at05).toSet.size === 1)
    val at03 = Clustering.clusterWithin(df, "k", "x", "y", 0.3, level = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((300L to 305L).map(at03).toSet.size === 6)
  }

  /** Driver-side reference Lloyd with the exact same determinism
    * rules: smallest-key seeds, scaled-integer means, lowest-index
    * tie-break. */
  private def refKMeans(k: Int, iterations: Int, scale: Double): Map[Long, Int] = {
    var cents = pts.sortBy(_._1).take(k).zipWithIndex
      .map { case (p, i) => (i, p._2, p._3) }.toArray
    def assign(): Map[Long, Int] = pts.map { p =>
      p._1 -> cents.minBy(c => {
        val dx = p._2 - c._2; val dy = p._3 - c._3
        (dx * dx + dy * dy, c._1)
      })._1
    }.toMap
    for (_ <- 0 until iterations) {
      val a = assign()
      val groups = pts.groupBy(p => a(p._1))
      cents = cents.map { case c @ (i, _, _) =>
        groups.get(i) match {
          case Some(ms) =>
            val sx = ms.map(m => math.round(m._2 * scale)).sum
            val sy = ms.map(m => math.round(m._3 * scale)).sum
            (i, sx.toDouble / ms.size.toDouble / scale,
              sy.toDouble / ms.size.toDouble / scale)
          case None => c
        }
      }
    }
    assign()
  }

  test("kmeans matches the driver-side reference and is parallelism-invariant") {
    for ((k, it) <- Seq((3, 0), (3, 2), (5, 4))) {
      val got = Clustering.clusterKMeans(df, "k", "x", "y", k, it)
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(got === refKMeans(k, it, 20.0), s"k=$k it=$it")
      val re = Clustering.clusterKMeans(df.repartition(17), "k", "x", "y", k, it)
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(re === got, s"parallelism variance at k=$k it=$it")
    }
  }

  test("clusterIntersecting merges chained geometries exactly once") {
    import spark.implicits._
    // A-B-C overlap chain, D touches C at a corner (still intersects),
    // E isolated; a far pair F-G overlapping across a cell boundary
    val boxes = Seq(
      (1L, "POLYGON((0 0,4 0,4 4,0 4,0 0))"),
      (2L, "POLYGON((3 3,7 3,7 7,3 7,3 3))"),
      (3L, "POLYGON((6 6,10 6,10 10,6 10,6 6))"),
      (4L, "POLYGON((10 10,12 10,12 12,10 12,10 10))"),
      (5L, "POLYGON((20 20,21 20,21 21,20 21,20 20))"),
      (6L, "POLYGON((-50 -50,-44.9 -50,-44.9 -40,-50 -40,-50 -50))"),
      (7L, "POLYGON((-45 -45,-30 -45,-30 -44,-45 -44,-45 -45))"))
      .toDF("k", "wkt")
      .withColumn("g", gf.st_geomfromtext(col("wkt")))
    val got = Clustering.clusterIntersecting(boxes, "k", "g", level = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 5L,
      6L -> 6L, 7L -> 6L))
  }
}
