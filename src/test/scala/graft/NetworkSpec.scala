package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Network

/** Frontier Bellman-Ford shortest paths vs a driver-side Dijkstra
  * oracle; determinism across parallelism; multi-source nearest-source
  * labels; unreachable handling. */
class NetworkSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Driver-side Dijkstra with (dist, src) lexicographic labels. */
  private def dijkstra(edges: Seq[(Long, Long, Double)], sources: Seq[Long],
      directed: Boolean): Map[Long, (Double, Long)] = {
    val adj = collection.mutable.Map.empty[Long, List[(Long, Double)]]
    def add(a: Long, b: Long, w: Double): Unit =
      if (a != b) adj(a) = (b, w) :: adj.getOrElse(a, Nil)
    edges.foreach { case (a, b, w) => add(a, b, w); if (!directed) add(b, a, w) }
    val best = collection.mutable.Map.empty[Long, (Double, Long)]
    val pq = collection.mutable.PriorityQueue.empty[(Double, Long, Long)](
      Ordering.by[(Double, Long, Long), (Double, Long)](t => (-t._1, -t._2)))
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).toSet
    sources.filter(nodes.contains).foreach(s => pq.enqueue((0.0, s, s)))
    while (pq.nonEmpty) {
      val (d, src, n) = pq.dequeue()
      val cur = best.get(n)
      if (cur.isEmpty || Ordering.Tuple2[Double, Long].lt((d, src), cur.get)) {
        best(n) = (d, src)
        adj.getOrElse(n, Nil).foreach { case (m, w) => pq.enqueue((d + w, src, m)) }
      }
    }
    best.toMap
  }

  private def run(edges: Seq[(Long, Long, Double)], sources: Seq[Long],
      directed: Boolean = false): Map[Long, Option[(Double, Long)]] = {
    val df = edges.toDF("a", "b", "w")
    Network.shortestPaths(df, "a", "b", "w", sources.toDF("node"), directed)
      .collect().map { r =>
        r.getLong(0) -> (if (r.isNullAt(1)) None
          else Some((r.getDouble(1), r.getLong(2))))
      }.toMap
  }

  test("path graph closed form") {
    val edges = (1L until 6L).map(i => (i, i + 1, 2.0))
    val got = run(edges, Seq(1L))
    assert(got == Map(1L -> Some((0.0, 1L)), 2L -> Some((2.0, 1L)),
      3L -> Some((4.0, 1L)), 4L -> Some((6.0, 1L)), 5L -> Some((8.0, 1L)),
      6L -> Some((10.0, 1L))))
  }

  test("matches Dijkstra on a deterministic random graph, multi-source") {
    val edges = (0 until 500).map { i =>
      var h = 13L + i * 2654435761L
      h ^= h >>> 33; h *= -49064778989728563L; h ^= h >>> 33
      val a = math.abs(h % 120)
      h *= -4265267296055464877L; h ^= h >>> 32
      val b = math.abs(h % 120)
      (a, b, (1 + math.abs(h % 9)).toDouble)
    }
    val sources = Seq(3L, 77L, 115L)
    val want = dijkstra(edges, sources, directed = false)
    val got = run(edges, sources)
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    nodes.foreach { n =>
      assert(got(n) == want.get(n), s"node $n: got ${got(n)} want ${want.get(n)}")
    }
  }

  test("directed edges are not traversed backwards; unreachable is null") {
    val edges = Seq((1L, 2L, 1.0), (2L, 3L, 1.0), (5L, 4L, 1.0))
    val got = run(edges, Seq(1L), directed = true)
    assert(got(1L) == Some((0.0, 1L)) && got(2L) == Some((1.0, 1L)) &&
      got(3L) == Some((2.0, 1L)))
    assert(got(4L).isEmpty && got(5L).isEmpty)
  }

  test("nearest-source ties break to the smallest source id") {
    // node 2 is at distance 1 from both sources 1 and 3
    val edges = Seq((1L, 2L, 1.0), (3L, 2L, 1.0))
    val got = run(edges, Seq(3L, 1L))
    assert(got(2L) == Some((1.0, 1L)))
  }

  test("identical labels at 1 and 7 input partitions") {
    val edges = (0 until 300).map { i =>
      var h = 99L + i * 2654435761L
      h ^= h >>> 33; h *= -49064778989728563L; h ^= h >>> 33
      val a = math.abs(h % 80)
      h *= -4265267296055464877L; h ^= h >>> 32
      (a, math.abs(h % 80), (1 + math.abs(h % 5)).toDouble)
    }
    def at(parts: Int) = Network.shortestPaths(
        edges.toDF("a", "b", "w").repartition(parts), "a", "b", "w",
        Seq(0L, 40L).toDF("node"))
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) null else (r.getDouble(1), r.getLong(2)))).toSet
    assert(at(1) == at(7))
  }

  test("isochrone: in-loop pruning equals post-hoc filter of full SSSP") {
    val edges = (0 until 400).map { i =>
      var h = 55L + i * 2654435761L
      h ^= h >>> 33; h *= -49064778989728563L; h ^= h >>> 33
      val a = math.abs(h % 90)
      h *= -4265267296055464877L; h ^= h >>> 32
      (a, math.abs(h % 90), (1 + math.abs(h % 7)).toDouble)
    }
    val full = run(edges, Seq(5L, 60L))
      .collect { case (n, Some((dd, ss))) if dd <= 9.0 => (n, dd, ss) }.toSet
    val iso = Network.reachableWithin(edges.toDF("a", "b", "w"), "a", "b", "w",
        Seq(5L, 60L).toDF("node"), maxCost = 9.0)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSet
    assert(iso == full && iso.nonEmpty)
  }

  test("edgesFromSegments: quantized snapping connects noisy linework") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    import graft.sql.{functions => gf}
    import org.apache.spark.sql.functions.col
    // two streets meeting at (1, 0) — one endpoint off by 1e-9, well
    // under the quantum, plus a 3-vertex polyline
    val segs = Seq(
      "LINESTRING(0 0,1 0)",
      "LINESTRING(1.000000001 0.000000001,1 1)",
      "LINESTRING(1 1,2 1,2 3)").toDF("wkt")
      .withColumn("geom", gf.st_geomfromtext(col("wkt")))
    val edges = Network.edgesFromSegments(segs, "geom", quantum = 1e-6)
    val e = edges.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(e.length == 4)
    // all connected: SSSP from the (0,0) node reaches the far end with
    // dist 1 + 1 + 1 + 2 = 5
    val origin = edges.select(col("src")).orderBy(col("src")).limit(1)
    val labels = Network.shortestPaths(edges, "src", "dst", "w", origin)
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1.0 else r.getDouble(1)))
    assert(labels.length == 5) // 5 distinct nodes after snapping
    // weights keep ORIGINAL coordinates (only node identity snaps), so
    // the noisy endpoint shortens its segment by ~1e-9
    assert(math.abs(labels.map(_._2).max - 5.0) < 1e-8)
    assert(!labels.exists(_._2 < 0), "all nodes reachable")
  }

  test("delta-stepping equals plain SSSP at several bucket widths") {
    val edges = (0 until 500).map { i =>
      var h = 29L + i * 2654435761L
      h ^= h >>> 33; h *= -49064778989728563L; h ^= h >>> 33
      val a = math.abs(h % 110)
      h *= -4265267296055464877L; h ^= h >>> 32
      (a, math.abs(h % 110), (1 + math.abs(h % 9)).toDouble)
    }
    val want = run(edges, Seq(2L, 55L, 108L))
    for (delta <- Seq(1.5, 4.0, 100.0)) {
      val got = Network.shortestPathsDelta(edges.toDF("a", "b", "w"),
          "a", "b", "w", Seq(2L, 55L, 108L).toDF("node"), delta = delta)
        .collect().map { r =>
          r.getLong(0) -> (if (r.isNullAt(1)) None
            else Some((r.getDouble(1), r.getLong(2))))
        }.toMap
      assert(got == want, s"delta $delta")
    }
  }

  test("delta-stepping converges on a pure-light high-diameter chain") {
    val edges = (0L until 150L).map(i => (i, i + 1, 1.0))
    val got = Network.shortestPathsDelta(edges.toDF("a", "b", "w"),
        "a", "b", "w", Seq(0L).toDF("node"), delta = 25.0)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(got(150L) == 150.0 && got(75L) == 75.0)
  }

  test("high-diameter chain converges (frontier rounds = hop depth)") {
    val edges = (0L until 120L).map(i => (i, i + 1, 1.0))
    val got = run(edges, Seq(0L))
    assert(got(120L) == Some((120.0, 0L)))
  }

  test("chain contraction: 3000-hop chain converges within default maxRounds") {
    // without contraction this needs 3000 frontier rounds (> the 500
    // default); with it, contraction + SSSP + expansion is O(log n)
    val edges = (0L until 3000L).map(i => (i, i + 1, 1.0 + (i % 3)))
    val got = run(edges, Seq(0L))
    val want = edges.scanLeft(0.0)((acc, e) => acc + e._3)
    assert(got(3000L) == Some((want.last, 0L)))
    assert(got(1500L) == Some((want(1500), 0L)))
    assert(got.size == 3001)
  }

  test("contracted equals uncontracted on the random multi-source graph") {
    val edges = (0 until 500).map { i =>
      var h = 41L + i * 2654435761L
      h ^= h >>> 33; h *= -49064778989728563L; h ^= h >>> 33
      val a = math.abs(h % 130)
      h *= -4265267296055464877L; h ^= h >>> 32
      (a, math.abs(h % 130), (1 + math.abs(h % 9)).toDouble)
    }
    def go(contract: Boolean) = Network.shortestPaths(
        edges.toDF("a", "b", "w"), "a", "b", "w",
        Seq(7L, 64L).toDF("node"), contract = contract)
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) null else (r.getDouble(1), r.getLong(2)))).toSet
    assert(go(true) == go(false))
  }

  test("pure degree-2 cycle with no source contracts to unreachable nulls") {
    // component A: source chain; component B: a 6-cycle, all degree 2,
    // no source — contraction erases it entirely; labels must be null
    val chain = (0L until 4L).map(i => (i, i + 1, 1.0))
    val cycle = (10L until 16L).map(i => (i, if (i == 15L) 10L else i + 1, 1.0))
    val got = run(chain ++ cycle, Seq(0L))
    (10L until 16L).foreach(n => assert(got(n).isEmpty, s"cycle node $n"))
    assert(got(4L) == Some((4.0, 0L)))
    assert(got.size == 11)
  }

  test("contraction equals Dijkstra on randomized road-like graphs (chains + cycles)") {
    // the operator's home terrain: sparse skeletons whose edges are
    // subdivided into long degree-2 chains, plus floating pure cycles
    for (seed <- Seq(7L, 19L, 31L)) {
      var h = seed
      def rnd(n: Int): Int = {
        h ^= h >>> 33; h *= -49064778989728563L; h ^= h >>> 33
        math.abs(h % n).toInt
      }
      val edges = scala.collection.mutable.ArrayBuffer[(Long, Long, Double)]()
      var nextId = 100L
      // skeleton: 12 junction nodes, ~18 random skeleton links, each
      // subdivided into a chain of 1..12 segments with varied weights
      for (_ <- 0 until 18) {
        val a = rnd(12).toLong
        val b = rnd(12).toLong
        if (a != b) {
          val hops = 1 + rnd(12)
          var prev = a
          for (k <- 1 until hops) {
            val mid = nextId; nextId += 1
            edges += ((prev, mid, (1 + rnd(5)).toDouble)); prev = mid
          }
          edges += ((prev, b, (1 + rnd(5)).toDouble))
        }
      }
      // one floating pure cycle (all degree-2, unreachable)
      val c0 = nextId; nextId += 6
      for (k <- 0 until 6)
        edges += ((c0 + k, c0 + (k + 1) % 6, 1.0))
      val sources = Seq(0L, 5L)
      val want = dijkstra(edges.toSeq, sources, directed = false)
      val got = run(edges.toSeq, sources)
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
      nodes.foreach { n =>
        assert(got(n) == want.get(n), s"seed $seed node $n: got ${got(n)} want ${want.get(n)}")
      }
    }
  }

  test("lollipop: cycle attached at one articulation node expands correctly") {
    // stick 0-1-2, cycle 2-3-4-5-2: nodes 3,4,5 are chain-interior with
    // both frame endpoints eventually equal (node 2)
    val edges = Seq((0L, 1L, 1.0), (1L, 2L, 1.0),
      (2L, 3L, 1.0), (3L, 4L, 1.0), (4L, 5L, 1.0), (5L, 2L, 1.0))
    val want = dijkstra(edges, Seq(0L), directed = false)
    val got = run(edges, Seq(0L))
    want.foreach { case (n, l) => assert(got(n) == Some(l), s"node $n") }
  }
}
