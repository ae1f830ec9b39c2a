package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.sql.functions._

/** Typed row shapes for [[SpatialJoins.knnJoinQuadtree]]'s cogroup. */
private[operators] case class KeyedPt(key: Long, lon: Double, lat: Double)
private[operators] case class KeyedPoint(key: Long, lon: Double, lat: Double, cell: Long)
private[operators] case class KnnHit(pkey: Long, tkey: Long, tlon: Double, tlat: Double,
    dist: Double, rank: Int)

/**
 * Spatial joins as explicit DataFrame programs (SURVEY.md §2.6, §4):
 * the plan-level analogue of the reference's in-memory R*-tree queries.
 * Staying on declarative joins keeps Catalyst in charge of physical
 * strategy (BroadcastHashJoin for small dims, SortMergeJoin + AQE for
 * large sides) — no custom SparkStrategy needed.
 *
 * Scale design:
 *  - the build side is exploded to its cell covering ONCE (cells are
 *    disjoint, so a point lands in exactly one cell → cell equi-join
 *    produces each candidate pair at most once; no dedupe shuffle).
 *  - the refine predicate (`st_contains_xy`) runs inside whole-stage
 *    codegen after a BroadcastHashJoin — the same
 *    filter-after-prefilter shape as the reference's bbox pretest
 *    (relate_operation.rs:63-76), but distributed.
 *  - for skew, `saltHotCells` computes per-cell counts (pass 1) and
 *    derives a deterministic salt domain (no RNG: salt =
 *    pmod(hash(rowkey), k)) — BASELINE requires exact-match rows and
 *    workflow determinism.
 */
object SpatialJoins {

  /**
   * Broadcast point-in-polygon join.
   *
   * @param points df with columns (..., lonCol, latCol)
   * @param polys  df with columns (..., geomCol) — small enough to broadcast
   * @param level  cell level for the prefilter grid
   * @return points' columns + polys' columns for each (point ∈ polygon)
   */
  def broadcastPipJoin(points: DataFrame, lonCol: String, latCol: String,
      polys: DataFrame, geomCol: String, level: Int): DataFrame = {
    val polyCells = polys
      .withColumn("__cell", explode(st_covering(lit(level), col(geomCol))))
    val pts = points.withColumn("__cell", st_cellid(lit(level), col(lonCol), col(latCol)))
    pts.join(broadcast(polyCells), Seq("__cell"), "inner")
      .filter(st_contains_xy(col(geomCol), col(lonCol), col(latCol)))
      .drop("__cell")
  }

  /**
   * Persist a point table BUCKETED by its cell key (hive-style
   * bucketing): repeated cell-keyed joins and aggregations against a
   * table written this way read pre-partitioned, pre-sorted buckets
   * and skip the exchange entirely — the storage-level answer to "this
   * dimension is joined on its cell every day". Pair two tables
   * written with the SAME level and bucket count and the cell
   * equi-join plans with NO shuffle on either side (asserted in the
   * spec). Bucket count is a real knob at scale: one bucket ≈ one
   * task's worth of the table.
   */
  def writeBucketedByCell(df: DataFrame, lonCol: String, latCol: String,
      level: Int, buckets: Int, tableName: String): Unit =
    df.withColumn("__cell", st_cellid(lit(level), col(lonCol), col(latCol)))
      .write.mode("overwrite").format("parquet")
      .bucketBy(buckets, "__cell").sortBy("__cell")
      .saveAsTable(tableName)

  /**
   * Density-adaptive cell partitioning — the data-driven answer to
   * spatial skew (salting treats the symptom per-join; this derives a
   * BALANCED partition geometry from the data itself, the
   * quadtree-partitioner idea of spatial engines). The result is the
   * unique disjoint mixed-level cell set where every cell holds ≤
   * `targetPerCell` points, except unsplittable `maxLevel` leaves.
   *
   * Closed-form in TWO aggregations, no iteration and no driver-side
   * tree build: leaf counts at `maxLevel` (bounded by OCCUPIED leaves,
   * not points), then ancestor-exploded counts at every level, then
   * the local rule
   *     cell ∈ P  ⇔  cnt(cell) ≤ T < cnt(parent(cell))
   *                  ∨ (level 0 ∧ cnt ≤ T)
   *                  ∨ (level maxLevel ∧ cnt > T)
   * Counts shrink with depth along any ancestor chain, so exactly one
   * P-cell covers every occupied leaf — disjointness and coverage hold
   * by construction (asserted in the spec).
   *
   * Returns (cell, cnt) — keep it distributed; broadcast it into
   * [[assignAdaptiveCells]] when small.
   */
  def adaptiveCells(points: DataFrame, lonCol: String, latCol: String,
      maxLevel: Int, targetPerCell: Long): DataFrame = {
    val leaf = points
      .groupBy(st_cellid(lit(maxLevel), col(lonCol), col(latCol)).as("__leaf"))
      .agg(count(lit(1)).as("__n"))
    val perLevel = leaf
      .select(explode(transform(sequence(lit(0), lit(maxLevel)),
        l => st_cell_parent(col("__leaf"), l))).as("cell"), col("__n"))
      .groupBy("cell").agg(sum(col("__n")).as("cnt"))
    val withParent = perLevel
      .withColumn("__lvl", st_cell_level(col("cell")))
      .withColumn("__parent",
        when(col("__lvl") > 0, st_cell_parent(col("cell"), col("__lvl") - 1)))
    val parentCnt = perLevel.select(col("cell").as("__parent"), col("cnt").as("__pcnt"))
    withParent.join(parentCnt, Seq("__parent"), "left")
      .filter(
        (col("cnt") <= targetPerCell &&
          (col("__lvl") === 0 || col("__pcnt") > targetPerCell)) ||
        (col("__lvl") === maxLevel && col("cnt") > targetPerCell))
      .select(col("cell"), col("cnt"))
  }

  /** Assign every point its unique adaptive cell: the point's ancestor
    * chain (maxLevel+1 in-row values) joins the partition set — each
    * point matches exactly one cell by the set's disjoint coverage. */
  def assignAdaptiveCells(points: DataFrame, lonCol: String, latCol: String,
      cells: DataFrame, maxLevel: Int): DataFrame = {
    val anc = explode(transform(sequence(lit(0), lit(maxLevel)),
      l => st_cellid(l, col(lonCol), col(latCol))))
    points.withColumn("__cell", anc)
      .join(broadcast(cells.select(col("cell").as("__cell"))), Seq("__cell"))
  }

  /**
   * Broadcast PIP join over a COMPACTED covering (the S2 "ancestor
   * join"): the polygon side covers at `level` then collapses complete
   * quads into parents (`st_cell_compact`), so a continent-sized
   * polygon at a fine level broadcasts thousands of mixed-level cells
   * instead of millions of leaves; the point side probes with its
   * ancestor chain (its cell at every level 0..`level` — level+1 in-row
   * values, exploded inside the broadcast join where no shuffle
   * exists). Compacted cells are disjoint, so a point matches at most
   * ONE covering cell per polygon — each candidate pair still meets
   * exactly once and no dedupe follows. Same output as
   * [[broadcastPipJoin]]; choose this one when coverings are large
   * (fine level × big geometries).
   */
  def broadcastPipJoinCompact(points: DataFrame, lonCol: String, latCol: String,
      polys: DataFrame, geomCol: String, level: Int): DataFrame = {
    val polyCells = polys.withColumn("__cell",
      explode(st_cell_compact(st_covering(lit(level), col(geomCol)))))
    val ancestors = transform(sequence(lit(0), lit(level)),
      l => st_cellid(l, col(lonCol), col(latCol)))
    val pts = points.withColumn("__cell", explode(ancestors))
    pts.join(broadcast(polyCells), Seq("__cell"), "inner")
      .filter(st_contains_xy(col(geomCol), col(lonCol), col(latCol)))
      .drop("__cell")
  }

  /**
   * Partitioned spatial join for two large geometry tables: explode
   * both sides to coverings at `level`, equi-join on cell (shuffle is
   * partitioned by cell — the north rule's "geometry bucketed into
   * cells as the partitioning key"), refine exactly, then de-duplicate
   * pairs that met in several cells WITHOUT a distinct-shuffle: a pair
   * is kept only in the lexicographically-first shared cell
   * (the standard "reference point" / reporting-cell trick).
   */
  def partitionedSpatialJoin(a: DataFrame, aGeom: String, b: DataFrame, bGeom: String,
      level: Int, predicate: (Column, Column) => Column = st_intersects): DataFrame = {
    val ae = a.withColumn("__cells_a", st_covering(lit(level), col(aGeom)))
      .withColumn("__cell", explode(col("__cells_a")))
    val be = b.withColumn("__cells_b", st_covering(lit(level), col(bGeom)))
      .withColumn("__cell", explode(col("__cells_b")))
    ae.join(be, Seq("__cell"), "inner")
      .filter(predicate(col(aGeom), col(bGeom)))
      // reporting-cell dedupe: keep the pair only where the join cell is
      // the smallest cell present in BOTH coverings
      .filter(col("__cell") === array_min(array_intersect(col("__cells_a"), col("__cells_b"))))
      .drop("__cell", "__cells_a", "__cells_b")
  }

  /**
   * k-nearest-neighbour join: for every point in `points`, the k
   * nearest rows of `targets` (small side, broadcast) by haversine
   * distance. Exact: brute-force over the broadcast side + window
   * top-k — right for dimension-table-sized `targets`. For large
   * targets use `knnJoinCells`.
   */
  def knnJoinBroadcast(points: DataFrame, lonCol: String, latCol: String, pointKey: String,
      targets: DataFrame, tLonCol: String, tLatCol: String, k: Int): DataFrame = {
    val joined = points.crossJoin(broadcast(targets))
      .withColumn("__dist",
        st_distance_sphere(st_point(col(lonCol), col(latCol)), st_point(col(tLonCol), col(tLatCol))))
    val w = Window.partitionBy(col(pointKey)).orderBy(col("__dist").asc, col(tLonCol), col(tLatCol))
    joined.withColumn("__rank", row_number().over(w))
      .filter(col("__rank") <= k)
  }

  /**
   * Scalable kNN join via cell rings: candidates from the target's
   * cell + rings at increasing radius (precomputed to `maxRing`), then
   * exact top-k. Candidate generation is an equi-join on cell —
   * shuffle-partitioned, no broadcast of the big side. `maxRing` must
   * be chosen so k neighbours fall within the ring radius (callers
   * size it from target density; correctness fallback: rows with fewer
   * than k candidates should be re-run at a coarser level).
   */
  /**
   * Distance-within join (the ST_DWithin join shape): every pair
   * (a, b) with planar lon/lat distance <= `radius` degrees.
   *
   * Shape: B replicates to the 3×3 cell neighbourhood at `level`
   * (longitude wraps across the antimeridian, latitude clamps at the
   * poles); A maps to its single cell — the equi-join shuffle is
   * partitioned by cell and every qualifying pair meets EXACTLY once
   * (A's cell is unique; B's replica cells are deduplicated), so no
   * distinct shuffle follows. The refine (`st_distance <= radius`)
   * runs inside whole-stage codegen after the join. Requires the cell
   * edge at `level` to be >= radius so one neighbour ring covers the
   * radius — at higher density raise `level` only while that guard
   * holds.
   */
  def withinDistanceJoin(a: DataFrame, lonA: String, latA: String,
      b: DataFrame, lonB: String, latB: String,
      radius: Double, level: Int): DataFrame = {
    val cellsPerAxis = math.pow(2.0, level)
    val lonStep = 360.0 / cellsPerAxis
    val latStep = 180.0 / cellsPerAxis
    require(radius > 0 && radius <= math.min(lonStep, latStep),
      s"radius $radius must be in (0, cell edge at level $level = ${math.min(lonStep, latStep)}]")
    // the <=9 neighbour cells materialize as one in-row duplicate-free
    // array (integer index arithmetic on b's own cell — antimeridian
    // wrap, pole-row drop; never re-encoded offset coordinates, which
    // can floor into the wrong cell within one ulp of a cell edge) —
    // no dropDuplicates shuffle, the only exchange is the cell equi-join
    val bNbr = b.withColumn("__cell",
      explode(st_cell_neighborhood(lit(level), col(lonB), col(latB), lit(1))))
    a.withColumn("__cell", st_cellid(lit(level), col(lonA), col(latA)))
      .join(bNbr, Seq("__cell"))
      .withColumn("__dist",
        st_distance(st_point(col(lonA), col(latA)), st_point(col(lonB), col(latB))))
      .filter(col("__dist") <= radius)
      .drop("__cell")
  }

  /**
   * Map-matching: snap each GPS fix to its nearest road segment within
   * `maxDist` (planar units) — the nearest-SEGMENT join the point-kNN
   * family can't express. EXACT at any level: every segment replicates
   * in-row to the cell covering of its maxDist-EXPANDED envelope, so
   * any segment within maxDist of a fix is guaranteed to share the
   * fix's cell; a covering is a set and a fix has ONE cell, so each
   * (fix, segment) pair meets exactly once — no post-join dedupe. The
   * refine is the exact point-to-linestring distance in codegen, and
   * the per-fix argmin is ONE map-side-combinable min(struct(dist,
   * segId)) — deterministic ties to the smallest segment id. Fixes
   * with no segment within maxDist drop out (left-join the result to
   * keep them). Pick `level` so a cell is within ~an order of
   * magnitude of typical segment length + maxDist: replication cost
   * is the covering size, candidate count is segments-per-cell.
   */
  def matchToSegments(points: DataFrame, idCol: String, lonCol: String,
      latCol: String, segs: DataFrame, segIdCol: String, geomCol: String,
      maxDist: Double, level: Int): DataFrame = {
    require(maxDist > 0, s"maxDist $maxDist must be positive")
    val s2 = segs.select(col(segIdCol).as("__sid"), col(geomCol).as("__sg"))
      .withColumn("__cell",
        explode(st_covering(lit(level), st_expand(col("__sg"), lit(maxDist)))))
    val p2 = points.select(col(idCol), col(lonCol), col(latCol))
      .withColumn("__cell", st_cellid(lit(level), col(lonCol), col(latCol)))
    p2.join(s2, Seq("__cell"))
      .withColumn("__dist",
        st_distance(st_point(col(lonCol), col(latCol)), col("__sg")))
      .filter(col("__dist") <= maxDist)
      .groupBy(col(idCol))
      .agg(min(struct(col("__dist").as("d"), col("__sid").as("s"))).as("__m"))
      .select(col(idCol), col("__m.s").as("seg_id"), col("__m.d").as("dist"))
  }

  def knnJoinCells(points: DataFrame, lonCol: String, latCol: String, pointKey: String,
      targets: DataFrame, tLonCol: String, tLatCol: String,
      k: Int, level: Int, maxRing: Int): DataFrame = {
    /** One ring pass at `lvl`: every point key gets its in-ring top-k
      * (possibly fewer than k when the rings are under-populated). */
    def ringTopK(pts: DataFrame, lvl: Int): DataFrame = {
      // neighbourhood cells as ONE in-row duplicate-free array per
      // target (integer index arithmetic: antimeridian wrap, pole-row
      // drop) exploded in place — no crossJoin with an offset table and
      // no full-width dropDuplicates shuffle per ring pass; the only
      // exchange left in the candidate plan is the cell equi-join
      val tNbr = targets.withColumn("__cell",
        explode(st_cell_neighborhood(lit(lvl), col(tLonCol), col(tLatCol), lit(maxRing))))
      val pc = pts.withColumn("__cell", st_cellid(lit(lvl), col(lonCol), col(latCol)))
      val cand = pc.join(tNbr, Seq("__cell"), "inner")
        .withColumn("__dist",
          st_distance_sphere(st_point(col(lonCol), col(latCol)), st_point(col(tLonCol), col(tLatCol))))
      val w = Window.partitionBy(col(pointKey)).orderBy(col("__dist").asc, col(tLonCol), col(tLatCol))
      cand.withColumn("__rank", row_number().over(w))
        .filter(col("__rank") <= k)
        .drop("__cell")
    }

    // Automated under-k fallback: point keys whose rings held fewer
    // than k candidates are re-run at successively coarser levels
    // (level-2 each round quadruples the ring area); level 0 is a
    // single global cell, so termination with max(k, |targets|)
    // candidates is guaranteed. Driver-side work per round is a
    // boolean isEmpty probe — the data never leaves the cluster.
    var lvl = level
    var pending = points
    var acc: List[DataFrame] = Nil
    var done = false
    while (!done) {
      val topk = ringTopK(pending, lvl).persist()
      val full = topk.groupBy(col(pointKey).as("__pk"))
        .agg(count(lit(1)).as("__cnt")).filter(col("__cnt") >= k)
        .select("__pk")
      if (lvl <= 0) { acc ::= topk; done = true }
      else {
        // `full` is pointKey-sized — join it by shuffle (same pk
        // partitioning the window already produced), never broadcast.
        // Zero-candidate points are absent from topk entirely, so
        // pending is derived by anti-join against the FULL set (not by
        // filtering counts < k, which would miss them).
        acc ::= topk.join(full, topk(pointKey) === full("__pk"), "left_semi")
        pending = pending.join(full, pending(pointKey) === full("__pk"), "left_anti")
        if (pending.isEmpty) done = true else lvl = math.max(0, lvl - 2)
      }
    }
    acc.reduce(_ unionByName _)
  }

  /**
   * GUARANTEED-EXACT kNN join with LOCAL QUADTREE REFINE (the north
   * rule's "kNN via S2 cell covering + local quadtree refine").
   *
   * Same cell-ring covering as [[knnJoinCells]], different refine: the
   * candidate cross product is NEVER materialized. A typed `cogroup`
   * co-partitions probes (one cell each) with ring-replicated targets
   * on the cell key, builds a per-cell [[graft.index.Quadtree]] over
   * the group's targets, and answers each probe's exact top-k locally
   * in O(log n) best-first descent — versus the window variant's
   * |probes_in_cell| x |targets_in_ring| candidate rows shuffled and
   * sorted per probe key.
   *
   * Exactness: unlike [[knnJoinCells]] (whose contract asks the CALLER
   * to size `maxRing` so k neighbours fall inside the ring), a probe's
   * result here is accepted only when its k-th distance is strictly
   * below the ring's provable coverage radius — the minimum great-
   * circle distance to any point OUTSIDE the covered lat/lon rows
   * (latitude margin: d >= R*|dPhi|; longitude margin: d >=
   * 2R*asin(cos(phiMax)*sin(dLambda/2)), both sharp; poles/wrap make a
   * side unbounded or zero conservatively). Probes that fail coarsen
   * by two levels (ring area x16) until level 0 — one global cell — so
   * the answer is ALWAYS the true kNN, at any `level`/`maxRing`.
   *
   * Scale: the only exchanges are one hash partition of the probes
   * (each row once) and one of the targets (each row <= (2r+1)^2 ring
   * replicas, deduped locally during generation — integer cell
   * arithmetic, so replica and probe cells agree exactly); per-task
   * state is one cell-neighbourhood's targets (the same bound as a
   * join partition's build side). Under skew, raise `level` — the
   * guarantee keeps results exact while the ring population shrinks.
   *
   * Determinism: ties broken by (haversine meters asc, target key asc)
   * — the same haversine kernel as `st_distance_sphere`, so ordering
   * is bit-identical to the window joins.
   *
   * Keys must be castable to long; `pointKey` and `targetKey` must
   * differ. Output: (pointKey, targetKey, tLonCol, tLatCol, __dist,
   * __rank).
   */
  def knnJoinQuadtree(points: DataFrame, lonCol: String, latCol: String, pointKey: String,
      targets: DataFrame, tLonCol: String, tLatCol: String, targetKey: String,
      k: Int, level: Int, maxRing: Int): DataFrame = {
    require(pointKey != targetKey, "pointKey and targetKey must differ")
    require(maxRing >= 1, "maxRing must be >= 1")
    val sp = points.sparkSession
    import sp.implicits._
    import graft.index.CellId

    /** Lower bound (meters) on the distance from a probe to anything
      * outside its ring coverage at `lvl` — 0 when nothing is provable
      * (e.g. the lat band touches a pole while longitude is bounded:
      * an over-the-pole neighbour can evade the lon margin). */
    def coverageGuarantee(lon: Double, lat: Double, lvl: Int): Double = {
      val n = CellId.cellsPerAxis(lvl)
      val latStep = 180.0 / n
      val lonStep = 360.0 / n
      val cx = CellId.cellX(lvl, lon)
      val cy = CellId.cellY(lvl, lat)
      val rowMin = cy - maxRing // row 0 = north pole edge
      val rowMax = cy + maxRing
      val covLatMax = if (rowMin <= 0) 90.0 else 90.0 - rowMin * latStep
      val covLatMin = if (rowMax >= n - 1) -90.0 else 90.0 - (rowMax + 1) * latStep
      val north = if (rowMin <= 0) Double.PositiveInfinity
        else Math.toRadians(covLatMax - lat) * graft.kernels.Sphere.MeanEarthRadius
      val south = if (rowMax >= n - 1) Double.PositiveInfinity
        else Math.toRadians(lat - covLatMin) * graft.kernels.Sphere.MeanEarthRadius
      val lonBound =
        if (2L * maxRing + 1L >= n) Double.PositiveInfinity // fully wrapped
        else {
          val covLonMin = -180.0 + (cx - maxRing) * lonStep
          val covLonMax = -180.0 + (cx + maxRing + 1) * lonStep
          val mDeg = Math.max(0.0, Math.min(lon - covLonMin, covLonMax - lon))
          val phiMax = Math.max(Math.abs(covLatMin), Math.abs(covLatMax))
          2.0 * graft.kernels.Sphere.MeanEarthRadius *
            Math.asin(Math.cos(Math.toRadians(phiMax)) *
              Math.sin(Math.toRadians(Math.min(mDeg, 180.0)) / 2.0))
        }
      Math.min(Math.min(north, south), lonBound) * (1.0 - 1e-9) // rounding slack
    }

    def ringTopK(pts: DataFrame, lvl: Int, isFinal: Boolean): DataFrame = {
      val n = CellId.cellsPerAxis(lvl)
      // ring replicas by INTEGER cell arithmetic: columns wrap mod n
      // (antimeridian), rows outside [0, n) are dropped (nothing lies
      // past a pole); coincident wrapped replicas dedupe locally — the
      // only exchange is the cogroup's hash partition on cell
      val tgt = targets.select(
        col(targetKey).cast("long").as("key"),
        col(tLonCol).cast("double").as("lon"),
        col(tLatCol).cast("double").as("lat")).as[KeyedPt]
        .flatMap { t =>
          val cx = CellId.cellX(lvl, t.lon)
          val cy = CellId.cellY(lvl, t.lat)
          val out = collection.mutable.ArrayBuffer.empty[KeyedPoint]
          val seen = collection.mutable.HashSet.empty[Long]
          var dy = -maxRing
          while (dy <= maxRing) {
            val yy = cy + dy
            if (yy >= 0 && yy < n) {
              var dx = -maxRing
              while (dx <= maxRing) {
                val xx = ((cx + dx) % n + n) % n
                val cell = CellId.pack(lvl, xx, yy)
                if (seen.add(cell)) out += KeyedPoint(t.key, t.lon, t.lat, cell)
                dx += 1
              }
            }
            dy += 1
          }
          out
        }
      val prb = pts.select(
        col(pointKey).cast("long").as("key"),
        col(lonCol).cast("double").as("lon"),
        col(latCol).cast("double").as("lat")).as[KeyedPt]
        .map(p => KeyedPoint(p.key, p.lon, p.lat, CellId.cellId(lvl, p.lon, p.lat)))
      prb.groupByKey(_.cell).cogroup(tgt.groupByKey(_.cell)) { (_, ps, ts) =>
        val tBuf = collection.mutable.ArrayBuffer.empty[(Double, Double, Long)]
        ts.foreach(t => tBuf += ((t.lon, t.lat, t.key)))
        if (tBuf.isEmpty) Iterator.empty
        else {
          val qt = graft.index.Quadtree.build(tBuf)
          ps.flatMap { p =>
            val hits = qt.knn(p.lon, p.lat, k)
            val exact = isFinal ||
              (hits.length >= k && hits(hits.length - 1).dist < coverageGuarantee(p.lon, p.lat, lvl))
            if (!exact) Iterator.empty
            else {
              val out = new Array[KnnHit](hits.length)
              var i = 0
              while (i < hits.length) {
                val h = hits(i)
                out(i) = KnnHit(p.key, h.key, h.lon, h.lat, h.dist, i + 1)
                i += 1
              }
              out.iterator
            }
          }
        }
      }.toDF()
    }

    // coarsening loop: probes without an accepted exact result emit
    // nothing and re-run at level-2 (ring area x16); level 0 is one
    // global cell — every target in one group — so termination with
    // the true kNN is guaranteed
    var lvl = level
    var pending = points
    var acc: List[DataFrame] = Nil
    var done = false
    while (!done) {
      val isFinal = lvl <= 0
      val topk = ringTopK(pending, lvl, isFinal).persist()
      if (isFinal) { acc ::= topk; done = true }
      else {
        acc ::= topk
        val full = topk.select(col("pkey").as("__fk")).distinct()
        pending = pending.join(full,
          pending(pointKey).cast("long") === full("__fk"), "left_anti")
        if (pending.isEmpty) done = true else lvl = math.max(0, lvl - 2)
      }
    }
    acc.reduce(_ unionByName _).select(
      col("pkey").as(pointKey), col("tkey").as(targetKey),
      col("tlon").as(tLonCol), col("tlat").as(tLatCol),
      col("dist").as("__dist"), col("rank").as("__rank"))
  }

  // -------------------------------------------------------------- skew

  /**
   * Deterministic hot-cell salting (north rule: "salting hot cells").
   * Pass 1 computes per-cell counts on the probe side; cells above
   * `threshold` get a salt domain of ceil(count/target). The build
   * side replicates rows across salts; the probe side picks
   * pmod(hash(probeKey), k) — pure column arithmetic, no RNG, so runs
   * are exactly reproducible.
   *
   * Returns (probeWithSaltedCell, buildWithSaltedCell) joined on
   * "__scell".
   */
  def saltedCellJoin(probe: DataFrame, probeCell: Column, probeKey: Column,
      build: DataFrame, buildCell: Column,
      threshold: Long, targetPerSalt: Long): (DataFrame, DataFrame) = {
    val p = probe.withColumn("__cell", probeCell)
    val b = build.withColumn("__cell", buildCell)
    val stats = p.groupBy("__cell").count()
      .filter(col("count") > threshold)
      .withColumn("__salts", ceil(col("count") / lit(targetPerSalt.toDouble)).cast("int"))
      .select(col("__cell"), col("__salts"))
    val ps = p.join(broadcast(stats), Seq("__cell"), "left")
      .withColumn("__salt",
        when(col("__salts").isNull, lit(0))
          .otherwise(pmod(hash(probeKey), col("__salts"))))
      .withColumn("__scell", concat_ws(":", col("__cell"), col("__salt")))
      .drop("__salts", "__salt")
    val bs = b.join(broadcast(stats), Seq("__cell"), "left")
      .withColumn("__saltArr",
        when(col("__salts").isNull, array(lit(0)))
          .otherwise(sequence(lit(0), col("__salts") - 1)))
      .withColumn("__salt", explode(col("__saltArr")))
      .withColumn("__scell", concat_ws(":", col("__cell"), col("__salt")))
      .drop("__salts", "__saltArr", "__salt")
    (ps, bs)
  }

  // ------------------------------------------------------------ tiling

  /** Tile assignment: every geometry → its covering cells at `level`
    * (one row per (row, cell)) — the north rule's tiling output. */
  /**
   * Deterministic grid-thinning pre-pass for whole-group geometry
   * aggregates (concave hull, collect): keep at most `maxPerCell`
   * points per level-`level` cell within each group, chosen by a
   * stable hash order (no RNG — identical at any parallelism). Bounds
   * the per-group collected state at 100× density to
   * O(cells_covered · maxPerCell) instead of O(points), at the cost of
   * a bounded geometric perturbation: every dropped point lies within
   * one cell diagonal of a kept point, so a concave hull computed on
   * the thinned set deviates from the full-set hull by at most one
   * cell diagonal anywhere along its boundary. When the cell size is
   * below the data's minimum point spacing the pass is the identity.
   * The extra shuffle is a hash-partitioned window on (group, cell) —
   * scale-safe.
   */
  def thinPoints(pts: DataFrame, groupCol: String, xCol: String, yCol: String,
      level: Int = 12, maxPerCell: Int = 8): DataFrame = {
    val cell = st_cellid(lit(level), col(xCol), col(yCol))
    val w = Window.partitionBy(col(groupCol), cell)
      .orderBy(xxhash64(col(xCol), col(yCol)).asc, col(xCol).asc, col(yCol).asc)
    pts.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= maxPerCell)
      .drop("__rn")
  }

  def tileAssignments(df: DataFrame, geomCol: String, level: Int): DataFrame =
    df.withColumn("cell", explode(st_covering(lit(level), col(geomCol))))

  /** Raster side of raster↔vector: per-cell point counts ("rasterize"
    * points onto the cell grid at `level`). */
  def rasterize(points: DataFrame, lonCol: String, latCol: String, level: Int): DataFrame =
    points
      .withColumn("cell", st_cellid(lit(level), col(lonCol), col(latCol)))
      .groupBy("cell")
      .agg(count(lit(1)).as("n"))

  /** Vector side of raster↔vector: cell counts back to cell-rect
    * polygons with their value — input for further vector ops. */
  def vectorize(raster: DataFrame): DataFrame =
    raster.withColumn("geom", st_cell_bounds(col("cell")))

  /**
   * Zonal statistics — the raster↔vector reduction: aggregate a
   * cell-keyed raster over polygon zones by the cell-CENTER rule (a
   * cell contributes to a zone iff its center lies inside the zone —
   * GDAL's default rasterization convention). Candidate (zone, cell)
   * pairs come from each zone's covering at the raster's level, so
   * the join is a plain equi-join on the cell id: the raster — the
   * big side at scale — shuffles only by cell (or broadcasts the
   * exploded zone coverings when the zone table is dimension-sized,
   * which Spark picks automatically), a zone's replication is bounded
   * by its covering size, and every (zone, cell) pair meets exactly
   * once because a covering is a set. The center-in-zone refine runs
   * inside the join condition (codegen'd PIP).
   *
   * Returns one row per zone with at least one contributing cell:
   * (zoneKey, n_cells, total = sum(valueCol), mean).
   */
  def zonalStats(raster: DataFrame, cellCol: String, valueCol: String,
      zones: DataFrame, zoneKey: String, geomCol: String, level: Int): DataFrame = {
    val cand = zones.select(col(zoneKey), col(geomCol).as("__zg"))
      .withColumn(cellCol, explode(st_covering(lit(level), col("__zg"))))
    val bounds = st_cell_bounds(col(cellCol))
    val cx = (st_xmin(bounds) + st_xmax(bounds)) / 2.0
    val cy = (st_ymin(bounds) + st_ymax(bounds)) / 2.0
    raster.join(cand, Seq(cellCol))
      .filter(st_contains_xy(col("__zg"), cx, cy))
      .groupBy(col(zoneKey))
      .agg(count(lit(1)).as("n_cells"),
        sum(col(valueCol)).as("total"))
      .withColumn("mean",
        col("total").cast("double") / col("n_cells").cast("double"))
  }

  /**
   * Raster→vector polygonization (the GDAL-polygonize analogue the
   * reference leaves to callers): dissolve a class-labelled grid into
   * region polygons. Input is one row per occupied cell — integer
   * grid coordinates (xCol, yCol) plus a class label — and the output
   * is one row per class with the dissolved geometry on the UNIT
   * LATTICE (cell (x,y) → square [x,x+1]×[y,y+1]) plus its cell count.
   * Unit-lattice output keeps every overlay coordinate an exact small
   * integer; callers map to world coordinates with `st_affine`
   * (cellW, 0, xmin, 0, cellH, ymin).
   *
   * Scale shape: the dissolve is `st_union_agg` — a real
   * TypedImperativeAggregate with per-partition partial unions and a
   * balanced pairwise merge — so the shuffle carries partially
   * dissolved regions, never the raw cell list, and per-class state is
   * bounded by the region boundary complexity, not the cell count.
   * Holes (a class ring around foreign cells) and corner-touching
   * cells are preserved exactly by the integer-lattice overlay.
   */
  def polygonizeGrid(grid: DataFrame, xCol: String, yCol: String,
      classCol: String): DataFrame =
    grid
      .withColumn("cell_sq", st_rect(
        col(xCol).cast("double"), col(yCol).cast("double"),
        (col(xCol) + 1).cast("double"), (col(yCol) + 1).cast("double")))
      .groupBy(col(classCol))
      .agg(st_union_agg(col("cell_sq")).as("geom"),
        count(lit(1)).as("n_cells"))
}
