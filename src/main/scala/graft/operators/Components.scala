package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Distributed connected components over an undirected edge list — the
 * step that turns near-duplicate PAIRS (minhash/simhash/Jaccard joins,
 * `TrainingData.*Pairs`) into dedup CLUSTERS: at web scale a duplicate
 * group is discovered as a chain of pairwise hits, and "keep one copy
 * per group" needs the transitive closure, not the pairs.
 *
 * Algorithm: alternating large-star / small-star (Kiveris, Lattanzi,
 * Mirrokni, Rastogi, Vassilvitskii, "Connected Components in MapReduce
 * and Beyond", SoCC 2014). Each round is two groupBy-min shuffles over
 * the CURRENT edge set (which only shrinks toward stars), converging in
 * O(log^2 n) rounds regardless of component diameter — unlike naive
 * min-label propagation, whose round count is the graph diameter (a
 * 1M-link chain of near-dup pages would take 1M rounds there; ~15
 * here, see the path-graph test). No vertex ever holds more state than
 * one (node, min) pair, so the memory profile is a plain aggregation's.
 *
 * Each round's edge set is lazily `localCheckpoint`ed and materialized
 * by the round's single action (the star-forest fixpoint test), so a
 * round costs ONE Spark job and the logical plan is truncated at every
 * round boundary — an iterative plan that merely caches would still
 * nest each round's plan inside the next and pay quadratically growing
 * analysis/canonicalization work. On a production cluster use a
 * reliable checkpoint directory (`pipeline/Checkpoint.scala`) where a
 * lost executor must not fail the job.
 *
 * Output: one row per distinct node appearing in `edges` (self-loops
 * count as node appearances) with its component label = the MINIMUM
 * node id in the component — deterministic, so downstream "canonical
 * representative = label" is stable across runs and parallelism.
 */
object Components {

  /** Connected components of the undirected graph given by (srcCol,
    * dstCol) pairs (need not be deduped, directed consistently, or
    * self-loop-free; keys must cast to long). Returns (node, comp).
    * Fails if `maxRounds` is exceeded (the bound is ~log^2 of the
    * largest component size; 50 covers anything representable). */
  def connectedComponents(edges: DataFrame, srcCol: String, dstCol: String,
      maxRounds: Int = 50): DataFrame = {
    // cache the raw pairs: `nodes` and the initial edge set would both
    // re-execute the (possibly expensive) upstream pair computation
    val raw = edges.select(col(srcCol).cast("long").as("u"), col(dstCol).cast("long").as("v"))
      .filter(col("u").isNotNull && col("v").isNotNull)
      .persist()
    // node set is checkpointed, not merely cached: the final labeling
    // join evaluates AFTER this function returns, when an unpersisted
    // cache would silently recompute the whole upstream pair job
    val nodes = raw.select(col("u")).union(raw.select(col("v").as("u")))
      .distinct().localCheckpoint(false)
    val nNodes = nodes.count() // materialize raw's cache + the node checkpoint

    // Size the loop's shuffles from the DATA, not the session config:
    // after LSH the edge set is usually orders of magnitude smaller
    // than the corpus, and an iterative loop pays its per-task fixed
    // cost (scheduling + codegen dispatch) on EVERY shuffle of EVERY
    // round — at the default 32-200 partitions that overhead dwarfs
    // the actual work on small working sets (measured 15.9s → 4.8s on
    // a 6k-edge set just by right-sizing). Every groupBy/join below is
    // fed by an explicit repartition(p, u) so Catalyst reuses the one
    // exchange per phase (HashPartitioning(u) satisfies the agg's and
    // join's required distribution) instead of inserting session-sized
    // exchanges. Grows to thousands of partitions at billions of
    // nodes; collapses to 1 on test-sized graphs.
    val p = math.max(1L, math.min(nNodes / 200000L + 1L, 20000L)).toInt

    // Fixpoint test: a canonical (u > v) edge set is LS/SS-stable iff
    // it is a star forest whose centres are the component minima —
    // equivalently (i) no node appears as both a leaf (a u) and a
    // centre (a v), and (ii) every leaf has exactly ONE centre. One
    // role-tagged union + one aggregation checks both (leafCnt = how
    // often n appears as a leaf, all − leafCnt = how often as a
    // centre), so the test is ONE shuffle per round — and it doubles
    // as the job that materializes the round's lazy localCheckpoint.
    def isStarForest(e: DataFrame): Boolean = {
      val roles = e.select(col("u").as("n"), col("v"))
        .union(e.select(col("v").as("n"), lit(null).cast("long").as("v")))
      roles.repartition(p, col("n")).groupBy("n")
        .agg(count(col("v")).as("leafCnt"), count(lit(1)).as("all"))
        .filter(col("leafCnt") > 1 ||
          (col("leafCnt") > 0 && col("all") > col("leafCnt")))
        .isEmpty
    }

    // canonical working set: larger endpoint first, no self-loops;
    // partitioned by u so dropDuplicates needs no second exchange
    // (hash(u) clusters every (u,v) duplicate together)
    var cur = raw.filter(col("u") =!= col("v"))
      .select(greatest(col("u"), col("v")).as("u"), least(col("u"), col("v")).as("v"))
      .repartition(p, col("u")).dropDuplicates("u", "v").localCheckpoint(false)
    var round = 0
    var stable = isStarForest(cur) // materializes the checkpoint
    raw.unpersist()
    while (!stable && round < maxRounds) {
      // LARGE-STAR: for every node u (edges viewed both ways), connect
      // each strictly-larger neighbour v to m = min(N(u) ∪ {u}). Edges
      // to smaller neighbours are re-emitted from the other endpoint's
      // group, so connectivity is preserved (Kiveris et al., lemma 1).
      // The one repartition feeds both the min-agg and the join
      // exchange-free; duplicates in ls are tolerated (min-aggs ignore
      // them, the SS dropDuplicates removes them) to save a shuffle.
      val bi = cur.union(cur.select(col("v").as("u"), col("u").as("v")))
        .repartition(p, col("u"))
      val lm = bi.groupBy("u").agg(min(col("v")).as("mv"))
        .select(col("u"), least(col("u"), col("mv")).as("m"))
      val ls = bi.join(lm, "u").filter(col("v") > col("u"))
        .filter(col("v") =!= col("m"))
        .select(col("v").as("u"), col("m").as("v")) // v > u >= m: canonical
        .repartition(p, col("u"))
      // SMALL-STAR: orient larger→smaller, group on the larger
      // endpoint u; connect u and every neighbour to m = min(N(u)).
      val sm = ls.groupBy("u").agg(min(col("v")).as("m"))
      // statsBarrier: the round references `cur` twice and its
      // derivative `ls` twice more, so propagated checkpoint stats
      // would compound as size^4 per round — by ~15 rounds Catalyst
      // multiplies billion-bit BigIntegers before planning a job
      // (see PlanBridge; observed on the SSSP contraction loop)
      val ss = org.apache.spark.sql.graft.PlanBridge.statsBarrier(ls.join(sm, "u")
        .select(col("v").as("n"), col("m"))
        .union(sm.select(col("u").as("n"), col("m")))
        .filter(col("n") =!= col("m"))
        .select(col("n").as("u"), col("m").as("v")) // n > m always: canonical
        .repartition(p, col("u")).dropDuplicates("u", "v")
        .localCheckpoint(false))
      stable = isStarForest(ss) // materializes ss's checkpoint
      cur = ss
      round += 1
    }
    require(stable, s"connectedComponents did not converge in $maxRounds rounds")
    nodes.join(cur.select(col("u").as("node"), col("v").as("cmp")),
        nodes("u") === col("node"), "left")
      .select(nodes("u").as("node"), coalesce(col("cmp"), nodes("u")).as("comp"))
  }

  /**
   * Near-duplicate clustering of a document table: MinHash-LSH
   * candidate pairs re-ranked by EXACT shingle Jaccard (see
   * [[TrainingData.minhashLshPairsExact]]), closed transitively into
   * components, singletons kept. `cluster` is the minimum doc key of
   * the group; `is_canonical` marks the one row per cluster a dedup
   * pipeline keeps. Output is pair-scheme-independent (the exact
   * re-rank makes the pair set signature-free), hence oracle-checkable
   * from first principles.
   */
  def nearDupClusters(docs: DataFrame, keyCol: String, textCol: String,
      threshold: Double): DataFrame = {
    val pairs = TrainingData.minhashLshPairsExact(docs, keyCol, textCol, threshold = threshold)
    val cc = connectedComponents(pairs, "a", "b")
    docs.select(col(keyCol).cast("long").as(keyCol))
      .join(cc, col(keyCol) === cc("node"), "left")
      .select(col(keyCol),
        coalesce(col("comp"), col(keyCol)).as("cluster"))
      .withColumn("is_canonical", col(keyCol) === col("cluster"))
  }
}
