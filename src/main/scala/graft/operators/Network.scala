package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Distributed shortest paths over a road-network-style edge list —
 * the graph face of the spatial engine: once `st_node` / the segment
 * join has turned linework into (src, dst, weight) arcs, reachability
 * and distance-to-nearest-facility queries are graph problems, not
 * geometry problems.
 *
 * Algorithm: frontier-based parallel Bellman-Ford (the Pregel SSSP
 * formulation, Malewicz et al. SIGMOD 2010) generalized to MULTIPLE
 * sources: each label is the lexicographic minimum (dist, src) pair,
 * so every node converges to its distance to the NEAREST source, ties
 * broken by the smallest source id — deterministic at any parallelism.
 * Each round relaxes only the FRONTIER (nodes improved last round):
 * round cost is proportional to the frontier's out-degree sum, not the
 * graph size, and the label table is touched by one co-partitioned
 * join. Round count equals the hop depth of the shortest-path forest —
 * the standard distributed trade-off (GraphX ShortestPaths makes the
 * same one); for planet-scale road graphs a Δ-stepping bucket schedule
 * bolts onto the same frontier loop by relaxing only labels below the
 * current bucket bound.
 *
 * Scale shape: every per-round join/aggregate is fed by an explicit
 * `repartition(p, node)` sized from the data (see Components.scala for
 * the measured rationale); each round's label table is lazily
 * `localCheckpoint`ed so the iterative lineage is truncated — and the
 * convergence probe (`isEmpty` on the frontier) is the round's single
 * materializing action. No driver-side graph state: the driver holds
 * one boolean per round.
 */
object Network {

  /**
   * Multi-source shortest paths. `edges` rows are (srcCol, dstCol,
   * weightCol) arcs with non-negative weights (cast to double;
   * integer-valued weights stay exact — double sums of longs below
   * 2^53 are exact). `sources` is a one-column DataFrame of starting
   * node ids. Returns one row per node appearing in the edge set:
   * (node, dist, src) where (dist, src) is the lexicographically
   * smallest (distance, source-id) pair — unreachable nodes carry
   * null dist/src.
   */
  def shortestPaths(edges: DataFrame, srcCol: String, dstCol: String,
      weightCol: String, sources: DataFrame, directed: Boolean = false,
      maxRounds: Int = 500, maxCost: Double = Double.PositiveInfinity,
      contract: Boolean = true): DataFrame = {
    val raw0 = edges.select(
      col(srcCol).cast("long").as("u"), col(dstCol).cast("long").as("v"),
      col(weightCol).cast("double").as("w"))
      .filter(col("u").isNotNull && col("v").isNotNull && col("w").isNotNull)
    val raw = (if (directed) raw0
      else raw0.union(raw0.select(col("v").as("u"), col("u").as("v"), col("w"))))
      .filter(col("u") =!= col("v"))
      .persist()

    val nodes = raw.select(col("u")).union(raw.select(col("v").as("u")))
      .distinct().localCheckpoint(false)
    val nNodes = nodes.count()
    val p = math.max(1L, math.min(nNodes / 200000L + 1L, 20000L)).toInt

    val srcIds = sources.select(sources.columns.head).na.drop()
      .select(col(sources.columns.head).cast("long").as("node")).distinct()
      // only sources that are actually graph nodes get a label row
      .join(nodes.select(col("u").as("node")), Seq("node"))
      .localCheckpoint(false)

    // ---- degree-2 chain contraction (undirected only): road linework
    // is degree-2 chains by construction (edgesFromSegments emits one
    // arc per digitized vertex pair), so frontier rounds = hop depth =
    // O(vertices) without this. Contracting chain-interior nodes into
    // weighted super-edges first makes the BSP round count track the
    // INTERSECTION graph's diameter instead of the digitization
    // density; interior labels are recovered afterwards in the same
    // O(log n) number of rounds. See [[contractChains]].
    val (graph, provenance) =
      if (contract && !directed) contractChains(raw, srcIds, p)
      else (raw, Nil)

    var labels = srcIds
      .select(col("node"), lit(0.0).as("dist"), col("node").as("src"))
      .repartition(p, col("node")).localCheckpoint(false)
    var frontier = labels
    var round = 0
    var done = frontier.isEmpty // materializes the label checkpoint
    while (!done && round < maxRounds) {
      // relax every frontier label along its out-edges; keep the best
      // (dist, src) candidate per reached node in ONE map-side-combined
      // aggregation before it ever meets the label table
      val cand = frontier.join(graph, frontier("node") === graph("u"))
        .select(graph("v").as("node"),
          (frontier("dist") + graph("w")).as("dist"), frontier("src").as("src"))
        .repartition(p, col("node"))
        .groupBy("node").agg(min(struct(col("dist"), col("src"))).as("m"))
        .select(col("node"), col("m.dist").as("dist"), col("m.src").as("src"))
      val improved = cand
        .filter(col("dist") <= maxCost) // isochrone budget prunes the frontier IN-loop
        .join(labels.select(col("node"), col("dist").as("odist"), col("src").as("osrc")),
          Seq("node"), "left")
        .filter(col("odist").isNull ||
          struct(col("dist"), col("src")) < struct(col("odist"), col("osrc")))
        .select(col("node"), col("dist"), col("src"))
        .repartition(p, col("node")).localCheckpoint(false)
      done = improved.isEmpty // the round's one action
      if (!done) {
        labels = labels.join(improved, Seq("node"), "left_anti")
          .union(improved)
          .repartition(p, col("node")).localCheckpoint(false)
        frontier = improved
        round += 1
      }
    }
    require(done, s"shortestPaths did not converge in $maxRounds rounds " +
      "(hop depth exceeds maxRounds)")

    // ---- expansion: contracted interior nodes take the lexicographic
    // minimum over their two chain directions. Reverse round order
    // guarantees a referenced neighbor contracted in a LATER round is
    // already labeled; every chain-interior shortest path must enter
    // via one of the two frame endpoints (interior nodes have degree
    // 2 and are never sources), so the two candidates are exhaustive.
    provenance.reverse.foreach { prov =>
      val la = labels.select(col("node").as("a"),
        col("dist").as("la_dist"), col("src").as("la_src"))
      val lb = labels.select(col("node").as("b"),
        col("dist").as("lb_dist"), col("src").as("lb_src"))
      val candA = when(col("la_dist").isNotNull,
        struct((col("la_dist") + col("da")).as("dist"), col("la_src").as("src")))
      val candB = when(col("lb_dist").isNotNull,
        struct((col("lb_dist") + col("db")).as("dist"), col("lb_src").as("src")))
      val best = least(candA, candB) // least skips nulls; null iff both are
      val expanded = prov.join(la, Seq("a"), "left").join(lb, Seq("b"), "left")
        .select(col("node"), best.as("m"))
        .filter(col("m").isNotNull && col("m.dist") <= maxCost)
        .select(col("node"), col("m.dist").as("dist"), col("m.src").as("src"))
      // statsBarrier: each round references `labels` three times (the
      // union and both direction joins), so propagated checkpoint
      // stats would otherwise compound as size^3 per round (see
      // PlanBridge — Catalyst ends up multiplying billion-bit
      // BigIntegers before planning a single job)
      labels = org.apache.spark.sql.graft.PlanBridge.statsBarrier(
        labels.union(expanded)
          .repartition(p, col("node")).localCheckpoint(false))
    }

    raw.unpersist()
    nodes.join(labels, nodes("u") === labels("node"), "left")
      .select(nodes("u").as("node"), col("dist"), col("src"))
  }

  /**
   * Contract maximal degree-2 chains of an undirected, symmetrized,
   * self-loop-free edge list into weighted super-edges, in O(log n)
   * BSP rounds. Per round a deterministic independent set of chain-
   * interior nodes (degree exactly 2, not protected) is erased: node
   * u is selected when its salted hash `xxhash64(u, round)` beats
   * both interior neighbors' (ties broken by id — adjacent nodes are
   * never both selected), which removes an expected ≥¼ of the
   * remaining interior nodes per round regardless of chain layout
   * (the per-round re-salt defeats the sorted-chain worst case that
   * pins a fixed hash to one removal per round). Each erased node's
   * two incident arcs (u–a, w_a) and (u–b, w_b) are replaced by the
   * super-edge (a, b, w_a + w_b), and a provenance row
   * (node, a, da, b, db) is kept per round so labels expand back.
   * Pure cycles with no protected node contract down to nothing —
   * their nodes are unreachable by construction (a source would have
   * been protected) and correctly surface as null labels.
   *
   * Returns the contracted symmetric edge list plus the per-round
   * provenance frames in contraction order. Every per-round frame is
   * lazily localCheckpoint'ed; the selection probe is the round's one
   * materializing action.
   */
  private def contractChains(edges0: DataFrame, protectedNodes: DataFrame,
      p: Int, maxRounds: Int = 64): (DataFrame, List[DataFrame]) = {
    var es = edges0
    val provenance = scala.collection.mutable.ListBuffer.empty[DataFrame]
    var round = 0
    var stalled = false
    while (!stalled && round < maxRounds) {
      // the two half-edges of every degree-2 node in one map-side-
      // combined pass: min/max over struct(v, w) separates them (equal
      // only for identical parallel arcs, where either works)
      val cand = es.groupBy("u")
        .agg(count(lit(1)).as("c"),
          min(struct(col("v"), col("w"))).as("e1"),
          max(struct(col("v"), col("w"))).as("e2"))
        .filter(col("c") === 2)
        .join(protectedNodes.select(col("node").as("u")), Seq("u"), "left_anti")
        .select(col("u"), col("e1"), col("e2"),
          xxhash64(col("u"), lit(round)).as("h"))
        .repartition(p, col("u")).localCheckpoint(false)
      // statsBarrier before the triple self-reference below — without
      // it the propagated checkpoint stats compound as size^3 per
      // round (see PlanBridge)
      val candB = org.apache.spark.sql.graft.PlanBridge.statsBarrier(cand)
      val nb1 = candB.select(col("u").as("n1"), col("h").as("h1"))
      val nb2 = candB.select(col("u").as("n2"), col("h").as("h2"))
      val sel = candB
        .join(nb1, candB("e1.v") === nb1("n1"), "left")
        .join(nb2, candB("e2.v") === nb2("n2"), "left")
        .filter((col("n1").isNull || struct(col("h"), col("u")) > struct(col("h1"), col("n1")))
          && (col("n2").isNull || struct(col("h"), col("u")) > struct(col("h2"), col("n2"))))
        .select(col("u"), col("e1.v").as("a"), col("e1.w").as("da"),
          col("e2.v").as("b"), col("e2.w").as("db"))
        .localCheckpoint(false)
      stalled = sel.isEmpty // the round's one action
      if (!stalled) {
        provenance += sel.select(col("u").as("node"),
          col("a"), col("da"), col("b"), col("db")).localCheckpoint(false)
        val selNodes = sel.select(col("u").as("s"))
        val bridges = sel.filter(col("a") =!= col("b"))
          .select(col("a").as("u"), col("b").as("v"), (col("da") + col("db")).as("w"))
        es = org.apache.spark.sql.graft.PlanBridge.statsBarrier(es
          .join(selNodes, es("u") === selNodes("s"), "left_anti")
          .join(selNodes, es("v") === selNodes("s"), "left_anti")
          .union(bridges)
          .union(bridges.select(col("v").as("u"), col("u").as("v"), col("w")))
          .repartition(p, col("u")).localCheckpoint(false))
        round += 1
      }
    }
    (es, provenance.toList)
  }

  /**
   * Δ-stepping shortest paths (Meyer & Sanders 2003, bucketed BSP
   * form) — the round-count fix for HIGH-DIAMETER graphs where plain
   * frontier Bellman-Ford needs one round per hop: labels settle in
   * distance buckets of width `delta`. Within the current bucket only
   * LIGHT edges (w < delta) re-relax to a fixpoint — a light chain
   * can't leave the bucket more than once per improvement — then
   * HEAVY edges relax once and the bucket boundary advances. Round
   * count ≈ (longest shortest-path cost)/delta plus the in-bucket
   * light iterations, instead of the hop depth; with delta ≈ the
   * typical edge weight a country-scale road graph settles in
   * hundreds of rounds instead of tens of thousands. Labels,
   * tie-breaking, and output schema are identical to
   * [[shortestPaths]] (equality-tested); same per-round
   * localCheckpoint + data-sized repartition discipline.
   */
  def shortestPathsDelta(edges: DataFrame, srcCol: String, dstCol: String,
      weightCol: String, sources: DataFrame, delta: Double,
      directed: Boolean = false, maxRounds: Int = 100000): DataFrame = {
    require(delta > 0)
    val raw0 = edges.select(
      col(srcCol).cast("long").as("u"), col(dstCol).cast("long").as("v"),
      col(weightCol).cast("double").as("w"))
      .filter(col("u").isNotNull && col("v").isNotNull && col("w").isNotNull)
    val raw = (if (directed) raw0
      else raw0.union(raw0.select(col("v").as("u"), col("u").as("v"), col("w"))))
      .filter(col("u") =!= col("v"))
      .persist()
    val light = raw.filter(col("w") < delta).persist()
    val heavy = raw.filter(col("w") >= delta).persist()
    val nodes = raw.select(col("u")).union(raw.select(col("v").as("u")))
      .distinct().localCheckpoint(false)
    val nNodes = nodes.count()
    val p = math.max(1L, math.min(nNodes / 200000L + 1L, 20000L)).toInt

    val srcIds = sources.select(sources.columns.head).na.drop()
      .select(col(sources.columns.head).cast("long").as("node")).distinct()
      .join(nodes.select(col("u").as("node")), Seq("node"))
    var labels = srcIds
      .select(col("node"), lit(0.0).as("dist"), col("node").as("src"))
      .repartition(p, col("node")).localCheckpoint(false)

    def relax(frontier: DataFrame, es: DataFrame): DataFrame = {
      val cand = frontier.join(es, frontier("node") === es("u"))
        .select(es("v").as("node"),
          (frontier("dist") + es("w")).as("dist"), frontier("src").as("src"))
        .repartition(p, col("node"))
        .groupBy("node").agg(min(struct(col("dist"), col("src"))).as("m"))
        .select(col("node"), col("m.dist").as("dist"), col("m.src").as("src"))
      cand.join(labels.select(col("node"), col("dist").as("odist"), col("src").as("osrc")),
          Seq("node"), "left")
        .filter(col("odist").isNull ||
          struct(col("dist"), col("src")) < struct(col("odist"), col("osrc")))
        .select(col("node"), col("dist"), col("src"))
        .repartition(p, col("node")).localCheckpoint(false)
    }
    def merge(improved: DataFrame): Unit =
      // statsBarrier: `improved` is itself a labels-derived join, so
      // each merge would compound the propagated checkpoint stats as
      // size^2 (see PlanBridge) across the many light-fixpoint rounds
      labels = org.apache.spark.sql.graft.PlanBridge.statsBarrier(
        labels.join(improved, Seq("node"), "left_anti").union(improved)
          .repartition(p, col("node")).localCheckpoint(false))

    var bound = delta
    var round = 0
    var exhausted = labels.isEmpty
    while (!exhausted && round < maxRounds) {
      // settle the current bucket: light-edge fixpoint below `bound`
      var frontier = labels.filter(col("dist") < bound && col("dist") >= bound - delta)
      var quiet = frontier.isEmpty
      while (!quiet && round < maxRounds) {
        // improvements BEYOND the bucket still merge (they settle in
        // their own bucket later); only in-bucket ones re-relax now
        val improved = relax(frontier, light)
        quiet = improved.isEmpty
        if (!quiet) {
          merge(improved)
          frontier = improved.filter(col("dist") < bound)
          quiet = frontier.isEmpty
        }
        round += 1
      }
      // one heavy relaxation from the settled bucket (targets beyond it)
      val bucket = labels.filter(col("dist") < bound && col("dist") >= bound - delta)
      if (!bucket.isEmpty) {
        val improved = relax(bucket, heavy)
        if (!improved.isEmpty) merge(improved)
        round += 1
      }
      // advance: done when no tentative label at or beyond the bound
      exhausted = labels.filter(col("dist") >= bound).isEmpty
      bound += delta
    }
    require(exhausted || round < maxRounds,
      s"shortestPathsDelta did not converge in $maxRounds rounds")
    raw.unpersist(); light.unpersist(); heavy.unpersist()
    nodes.join(labels, nodes("u") === labels("node"), "left")
      .select(nodes("u").as("node"), col("dist"), col("src"))
  }

  /**
   * Isochrone / service-area reachability: the nodes within `maxCost`
   * of any source, with their cost and nearest source. The cost
   * budget prunes the frontier INSIDE the Bellman-Ford loop, so the
   * traversal never expands past the isochrone boundary — on a
   * planet-scale road graph the touched subgraph is the service area,
   * not the graph. (Turning the node set into a polygon is the
   * existing surface: st_concavehull / st_convexhull_agg over the
   * node coordinates.)
   */
  def reachableWithin(edges: DataFrame, srcCol: String, dstCol: String,
      weightCol: String, sources: DataFrame, maxCost: Double,
      directed: Boolean = false): DataFrame =
    // contract = false: chain contraction is a linear pass over the
    // WHOLE edge list, which would break this operator's contract that
    // the touched subgraph is the service area, not the graph; within
    // the budget the frontier's hop count is bounded by the isochrone
    // itself, so the plain loop is already round-bounded here
    shortestPaths(edges, srcCol, dstCol, weightCol, sources, directed,
      maxCost = maxCost, contract = false)
      .filter(col("dist").isNotNull && col("dist") <= maxCost)

  /**
   * Build a routable edge list from road linework: every consecutive
   * vertex pair of every linestring becomes one weighted arc whose
   * endpoints are QUANTIZED node ids — endpoints within `quantum`/2
   * of the same grid point snap to the same node (pick `quantum`
   * comfortably above the digitization noise: two endpoints merely
   * within `quantum` of EACH OTHER can still straddle a grid
   * boundary), so independently digitized segments that meet at
   * (within float noise of) an intersection connect without any
   * join. Node id packs the quantized grid
   * coordinates ((x/q + 2^29) · 2^31 + (y/q + 2^29), collision-free
   * for |coord/q| < 2^29); weight = planar length, or haversine
   * meters with `sphere = true`. All in-row column work (dump points
   * → index explode) — no shuffle at all; feed the result to
   * [[shortestPaths]] / [[reachableWithin]].
   */
  def edgesFromSegments(segs: DataFrame, geomCol: String,
      quantum: Double, sphere: Boolean = false): DataFrame = {
    import graft.sql.{functions => gf}
    require(quantum > 0)
    val pts = gf.st_dumppoints(col(geomCol))
    val withArrays = segs
      .withColumn("__xs", transform(pts, p => gf.st_x(p)))
      .withColumn("__ys", transform(pts, p => gf.st_y(p)))
      .withColumn("__i", explode(sequence(lit(1), size(col("__xs")) - 1)))
      .select(
        element_at(col("__xs"), col("__i")).as("x1"),
        element_at(col("__ys"), col("__i")).as("y1"),
        element_at(col("__xs"), col("__i") + 1).as("x2"),
        element_at(col("__ys"), col("__i") + 1).as("y2"))
    def nodeId(x: Column, y: Column): Column =
      (floor(x / quantum + 0.5).cast("long") + 536870912L) * 2147483648L +
        (floor(y / quantum + 0.5).cast("long") + 536870912L)
    val w =
      if (sphere) gf.st_distance_sphere(gf.st_point(col("x1"), col("y1")),
        gf.st_point(col("x2"), col("y2")))
      else sqrt((col("x2") - col("x1")) * (col("x2") - col("x1"))
        + (col("y2") - col("y1")) * (col("y2") - col("y1")))
    withArrays
      .select(nodeId(col("x1"), col("y1")).as("src"),
        nodeId(col("x2"), col("y2")).as("dst"), w.as("w"))
      .filter(col("src") =!= col("dst")) // sub-quantum segments collapse
  }

  /** Convenience overload: sources as literal ids. */
  def shortestPaths(edges: DataFrame, srcCol: String, dstCol: String,
      weightCol: String, sourceIds: Seq[Long]): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    shortestPaths(edges, srcCol, dstCol, weightCol, sourceIds.toDF("node"))
  }
}
