package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Components

/** Connected components (alternating star algorithm) vs a driver-side
  * union-find oracle; convergence depth on a high-diameter path. */
class ComponentsSpec extends AnyFunSuite {

  private def unionFind(n: Long, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val keys = edges.flatMap(e => Seq(e._1, e._2)).distinct
    keys.map(k => k -> find(k)).toMap
  }

  private def ccMap(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val spark = SparkTestSession.spark
    import spark.implicits._
    Components.connectedComponents(edges.toDF("a", "b"), "a", "b")
      .as[(Long, Long)].collect().toMap
  }

  test("matches union-find on a deterministic random graph") {
    // multiplicative-hash edge generator: mixes chains, triangles,
    // repeated and reversed edges, self-loops
    val edges = (0 until 400).map { i =>
      var h = 77L + i * 2654435761L
      h ^= h >>> 33; h *= -49064778989728563L; h ^= h >>> 33
      val a = math.abs(h % 300)
      h *= -4265267296055464877L; h ^= h >>> 32
      val b = math.abs(h % 300)
      (a, b)
    }
    val got = ccMap(edges)
    val want = unionFind(300, edges)
    assert(got == want)
    // labels are component minima
    assert(got.forall { case (n, c) => c <= n })
  }

  test("high-diameter path collapses in logarithmic rounds") {
    // a 2000-link chain: min-label propagation would need 2000 rounds;
    // the alternating algorithm must fit well inside maxRounds = 15
    val edges = (1L until 2000L).map(i => (i - 1, i))
    val spark = SparkTestSession.spark
    import spark.implicits._
    val out = Components.connectedComponents(edges.toDF("a", "b"), "a", "b", maxRounds = 15)
      .as[(Long, Long)].collect()
    assert(out.length == 2000 && out.forall(_._2 == 0L))
  }

  test("self-loops and isolated pairs keep their nodes; empty input is empty") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val got = ccMap(Seq((7L, 7L), (3L, 4L)))
    assert(got == Map(7L -> 7L, 3L -> 3L, 4L -> 3L))
    val empty = Components.connectedComponents(
      Seq.empty[(Long, Long)].toDF("a", "b"), "a", "b")
    assert(empty.count() == 0)
  }

  test("nearDupClusters groups exact duplicates and keeps singletons") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val doubled = docs.union(docs.select(col("doc_id") + 1000000L, col("text")))
    val cl = Components.nearDupClusters(doubled, "doc_id", "text", threshold = 0.9)
      .as[(Long, Long, Boolean)].collect()
    val n = docs.count()
    assert(cl.length == 2 * n)
    val byDoc = cl.map(r => r._1 -> r._2).toMap
    // every doc is in the same cluster as its +1M duplicate
    assert((0L until n).forall(i => byDoc(i) == byDoc(i + 1000000L)))
    // exactly one canonical per cluster, and it IS the cluster label
    val canon = cl.filter(_._3)
    assert(canon.length == cl.map(_._2).distinct.length)
    assert(canon.forall(r => r._1 == r._2))
  }
}
