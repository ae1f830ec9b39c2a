package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.index.Quadtree
import graft.kernels.Sphere

/** Quadtree kNN vs brute force (pure), and the quadtree-refined kNN
  * join vs the broadcast/window join (Spark). */
class QuadtreeSpec extends AnyFunSuite {

  /** Deterministic pseudo-random point cloud (no RNG). */
  private def cloud(n: Int, seed: Long): Array[(Double, Double, Long)] =
    (0 until n).map { i =>
      var h = seed + i * 2654435761L
      h ^= h >>> 33; h *= -49064778989728563L; h ^= h >>> 33
      val lon = ((h % 3600000L) / 10000.0) // [-360, 360] -> wraps below
      h ^= h >>> 29; h *= -4265267296055464877L; h ^= h >>> 32
      val lat = ((h % 890000L) / 10000.0)
      (Sphere.normalizeLongitude(lon), Math.max(-89.0, Math.min(89.0, lat)), i.toLong)
    }.toArray

  private def bruteKnn(pts: Array[(Double, Double, Long)],
      qLon: Double, qLat: Double, k: Int): Seq[(Long, Double)] =
    pts.map { case (lon, lat, key) => (key, Sphere.haversineDistance(qLon, qLat, lon, lat)) }
      .sortBy { case (key, d) => (d, key) }.take(k).toSeq

  test("quadtree kNN matches brute force on a global cloud") {
    val pts = cloud(500, 42L)
    val qt = Quadtree.build(pts)
    assert(qt.size == 500)
    val queries = Seq((0.0, 0.0), (-179.95, 0.1), (179.9, -0.2), (12.3, 88.9),
      (-45.0, -88.5), (100.0, 45.0), (-91.1, 30.4))
    for ((qLon, qLat) <- queries; k <- Seq(1, 5, 17)) {
      val got = qt.knn(qLon, qLat, k).map(h => (h.key, h.dist)).toSeq
      val want = bruteKnn(pts, qLon, qLat, k)
      assert(got == want, s"q=($qLon,$qLat) k=$k")
    }
  }

  test("quadtree handles duplicate coordinates past the depth cap") {
    // 100 coincident points + a few distinct: forces the leaf-growth path
    val dup = Array.fill(100)((10.0, 10.0, 0L)).zipWithIndex
      .map { case ((lon, lat, _), i) => (lon, lat, i.toLong) }
    val pts = dup ++ Array((11.0, 10.0, 200L), (10.0, 11.0, 201L))
    val qt = Quadtree.build(pts, leafCap = 4)
    val got = qt.knn(10.0001, 10.0, 3).map(_.key).toSeq
    assert(got == Seq(0L, 1L, 2L)) // equal dists -> key ascending
  }

  test("quadtree kNN prunes correctly across the antimeridian") {
    val pts = Array((179.99, 0.0, 1L), (-179.98, 0.0, 2L), (0.0, 0.0, 3L), (90.0, 45.0, 4L))
    val qt = Quadtree.build(pts)
    val got = qt.knn(-179.99, 0.0, 2).map(_.key).toSeq
    assert(got == Seq(2L, 1L)) // both sides of the seam, nearest first
    assert(qt.knn(179.995, 0.0, 1).map(_.key).toSeq == Seq(1L))
  }

  test("knnJoinQuadtree matches the broadcast/window kNN join") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val pts = spark.read.parquet(s"$sf/customer.parquet")
      .select(col("c_custkey"),
        (pmod(col("c_custkey") * 37.77, lit(360.0)) - 180.0).as("px"),
        (pmod(col("c_custkey") * 19.31, lit(170.0)) - 85.0).as("py"))
    val centers = spark.read.parquet(s"$sf/nation.parquet")
      .select(col("n_nationkey"),
        (pmod(col("n_nationkey") * 41.3, lit(360.0)) - 180.0).as("cx"),
        (pmod(col("n_nationkey") * 23.9, lit(170.0)) - 85.0).as("cy"))
    val fast = operators.SpatialJoins.knnJoinQuadtree(
        pts, "px", "py", "c_custkey", centers, "cx", "cy", "n_nationkey",
        k = 3, level = 3, maxRing = 1)
      .select("c_custkey", "n_nationkey", "__rank")
      .as[(Long, Long, Int)].collect().toSet
    val brute = operators.SpatialJoins.knnJoinBroadcast(
        pts, "px", "py", "c_custkey", centers, "cx", "cy", k = 3)
      .select(col("c_custkey"), col("n_nationkey"), col("__rank").cast("int"))
      .as[(Long, Long, Int)].collect().toSet
    assert(fast.nonEmpty && fast.map(_._1) == brute.map(_._1))
    // distances are continuous doubles -> no ties; ranked sets must agree
    assert(fast == brute,
      s"diff fast-brute=${(fast -- brute).take(5)} brute-fast=${(brute -- fast).take(5)}")
  }

  test("knnJoinQuadtree coarsens for probes whose rings are empty") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val targets = Seq((1L, 10.0, 10.0), (2L, -120.0, 40.0), (3L, 100.0, -30.0))
      .toDF("tid", "tlon", "tlat")
    val points = Seq((100L, 10.4, 10.4), (101L, -119.0, 41.0), (102L, 179.9, 0.0))
      .toDF("pid", "plon", "plat")
    val res = operators.SpatialJoins.knnJoinQuadtree(points, "plon", "plat", "pid",
      targets, "tlon", "tlat", "tid", k = 2, level = 10, maxRing = 1)
    val counts = res.groupBy("pid").count().as[(Long, Long)].collect().toMap
    assert(counts.size == 3 && counts.values.forall(_ == 2L), s"got $counts")
    val top1 = res.filter(col("__rank") === 1)
      .select("pid", "tid").as[(Long, Long)].collect().toMap
    assert(top1(100L) == 1L && top1(101L) == 2L && top1(102L) == 2L, s"got $top1")
  }
}
