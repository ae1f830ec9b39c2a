package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Raster sampling ops over a cell-keyed grid (x, y, v) — the
 * raster-side complement of rasterize / zonalStats / contour.
 *
 * Node-registered convention: value v(x, y) sits AT integer lattice
 * node (x, y); a sample point lives in the same coordinate space.
 */
object Raster {

  /**
   * Bilinear interpolation of the raster at each point: the four
   * surrounding nodes blend with weights ((1−fx)(1−fy), fx(1−fy),
   * (1−fx)fy, fx·fy). Points whose 2×2 node neighborhood is not fully
   * present drop out (no extrapolation).
   *
   * Scale: each point ships to its ≤4 nodes (bounded in-row explode),
   * ONE equi-join against the grid on the node key, one
   * map-side-combinable reassembly keyed by the point id — never a
   * broadcast of the raster, never a cross join. The blend is a
   * FIXED-op-order expression over four pivoted columns (no float
   * sum-order nondeterminism), so results are bit-identical at any
   * parallelism and exactly SQL-replayable.
   */
  def sampleBilinear(grid: DataFrame, xCol: String, yCol: String, vCol: String,
      points: DataFrame, idCol: String, pxCol: String, pyCol: String): DataFrame = {
    val g = grid.select(col(xCol).cast("long").as("__x"),
      col(yCol).cast("long").as("__y"), col(vCol).cast("double").as("__v"))
    val p = points.select(col(idCol),
        floor(col(pxCol)).cast("long").as("i0"),
        floor(col(pyCol)).cast("long").as("j0"),
        (col(pxCol) - floor(col(pxCol))).as("fx"),
        (col(pyCol) - floor(col(pyCol))).as("fy"))
    val corners = p.select(col(idCol), col("fx"), col("fy"),
      explode(array(
        struct(col("i0").as("__x"), col("j0").as("__y"), lit(0).as("c")),
        struct((col("i0") + 1).as("__x"), col("j0").as("__y"), lit(1).as("c")),
        struct(col("i0").as("__x"), (col("j0") + 1).as("__y"), lit(2).as("c")),
        struct((col("i0") + 1).as("__x"), (col("j0") + 1).as("__y"), lit(3).as("c"))
      )).as("k"))
      .select(col(idCol), col("fx"), col("fy"),
        col("k.__x").as("__x"), col("k.__y").as("__y"), col("k.c").as("c"))
    val joined = corners.join(g, Seq("__x", "__y"))
    joined.groupBy(idCol)
      .agg(max(col("fx")).as("fx"), max(col("fy")).as("fy"),
        sum(when(col("c") === 0, col("__v"))).as("v00"),
        sum(when(col("c") === 1, col("__v"))).as("v10"),
        sum(when(col("c") === 2, col("__v"))).as("v01"),
        sum(when(col("c") === 3, col("__v"))).as("v11"),
        count(lit(1)).as("nc"))
      .filter(col("nc") === 4)
      .select(col(idCol),
        ((lit(1.0) - col("fx")) * (lit(1.0) - col("fy")) * col("v00")
          + col("fx") * (lit(1.0) - col("fy")) * col("v10")
          + (lit(1.0) - col("fx")) * col("fy") * col("v01")
          + col("fx") * col("fy") * col("v11")).as("value"))
  }

  /** The 3×3 neighborhood pivot shared by [[focalStats]] and
    * [[terrain]]: each cell ships its value to its 9 neighbors IN-ROW
    * (bounded explode — never a self-join per offset), one
    * map-side-combined aggregation keyed by the target cell pivots the
    * window into positional columns. Position code for target t and
    * source s = t + (rx, ry): pos = (1−ry)·3 + (rx+1), i.e. the Horn
    * stencil letters a..i laid out west→east, north→south with y
    * increasing northward. */
  private def window3x3(grid: DataFrame, xCol: String, yCol: String,
      vCol: String): DataFrame = {
    val g = grid.select(col(xCol).cast("long").as("__x"),
      col(yCol).cast("long").as("__y"), col(vCol).cast("double").as("__v"))
    val offs = (-1 to 1).flatMap(oy => (-1 to 1).map(ox => (ox, oy)))
    val contrib = g.select(
      explode(array(offs.map { case (ox, oy) =>
        struct((col("__x") + ox).as("x"), (col("__y") + oy).as("y"),
          lit((1 - (-oy)) * 3 + ((-ox) + 1)).as("pos"))
      }: _*)).as("k"), col("__v"))
      .select(col("k.x").as("x"), col("k.y").as("y"), col("k.pos").as("pos"), col("__v"))
    def at(p: Int) = sum(when(col("pos") === p, col("__v")))
    contrib.groupBy(col("x"), col("y"))
      .agg(count(lit(1)).as("n"),
        at(0).as("va"), at(1).as("vb"), at(2).as("vc"),
        at(3).as("vd"), at(4).as("ve"), at(5).as("vf"),
        at(6).as("vg"), at(7).as("vh"), at(8).as("vi"))
  }

  /**
   * Focal statistics over the 3×3 window of PRESENT cells: count, sum,
   * min, max, mean (sum/count, fixed op order). Cells on raster edges
   * aggregate their partial window (GIS "focal" default). One shuffle
   * (the window pivot); integer-valued rasters stay exact because the
   * per-window sum folds ≤9 pivoted columns in a FIXED expression
   * order, never a float reduce in partition order.
   */
  def focalStats(grid: DataFrame, xCol: String, yCol: String, vCol: String): DataFrame = {
    val w = window3x3(grid, xCol, yCol, vCol)
    val vs = Seq("va", "vb", "vc", "vd", "ve", "vf", "vg", "vh", "vi").map(col)
    val arr = array(vs: _*)
    w.filter(col("ve").isNotNull) // emit only cells present in the raster
      .select(col("x"), col("y"), col("n").as("fcount"),
        aggregate(filter(arr, v => v.isNotNull), lit(0.0), (acc, v) => acc + v).as("fsum"),
        array_min(arr).as("fmin"), array_max(arr).as("fmax"))
      .withColumn("fmean", col("fsum") / col("fcount"))
  }

  /**
   * Terrain derivatives by Horn's method (Horn 1981, the gdaldem /
   * ESRI formulas) over a node-registered DEM grid with y increasing
   * NORTHWARD: for each interior cell (all 8 neighbors present),
   *   dz/dx = ((c + 2f + i) − (a + 2d + g)) / (8·cell)
   *   dz/dy = ((a + 2b + c) − (g + 2h + i)) / (8·cell)
   *   slope_deg  = degrees(atan(z · √((dz/dx)² + (dz/dy)²)))
   *   aspect_deg = compass bearing of steepest descent
   *                (atan2(−dz/dx, −dz/dy), normalized to [0, 360);
   *                NULL on flat cells)
   *   hillshade  = 255·(cos zen·cos slope + sin zen·sin slope·
   *                cos(az_math − aspect_trig)), clamped at 0 — the
   *                ESRI/GDAL formula with zen = 90°−altitude and
   *                az_math = 360°−azimuth+90°.
   * Every expression is fixed-op-order (SQL-replayable bit-for-bit on
   * integer-valued DEMs up to libm ulps); one shuffle total.
   */
  def terrain(grid: DataFrame, xCol: String, yCol: String, vCol: String,
      cellSize: Double = 1.0, zFactor: Double = 1.0,
      azimuthDeg: Double = 315.0, altitudeDeg: Double = 45.0): DataFrame = {
    val w = window3x3(grid, xCol, yCol, vCol).filter(col("n") === 9)
    val dzdx = ((col("vc") + lit(2.0) * col("vf") + col("vi"))
      - (col("va") + lit(2.0) * col("vd") + col("vg"))) / lit(8.0 * cellSize)
    val dzdy = ((col("va") + lit(2.0) * col("vb") + col("vc"))
      - (col("vg") + lit(2.0) * col("vh") + col("vi"))) / lit(8.0 * cellSize)
    val base = w.select(col("x"), col("y"), dzdx.as("dzdx"), dzdy.as("dzdy"))
    val slopeRad = atan(lit(zFactor) *
      sqrt(col("dzdx") * col("dzdx") + col("dzdy") * col("dzdy")))
    // steepest-descent direction (−dzdx, −dzdy) in (east, north)
    // components; compass angle = atan2(east, north), normalized to
    // [0, 360). Matches ESRI's published aspect example (92.64°).
    // `phi + 0.0` canonicalizes IEEE signed zero: dzdx == 0, dzdy < 0
    // yields atan2(-0.0, +north) = -0.0, which the `< 0.0` guard does
    // not catch and which hashes differently from +0.0 downstream
    val phi = degrees(atan2(-col("dzdx"), -col("dzdy")))
    val aspect = when(col("dzdx") === 0.0 && col("dzdy") === 0.0, lit(null))
      .otherwise(when(phi < 0.0, phi + 360.0).otherwise(phi + 0.0))
    val azMathDeg = { val a = 360.0 - azimuthDeg + 90.0; if (a >= 360.0) a - 360.0 else a }
    val zenRad = math.toRadians(90.0 - altitudeDeg)
    // the same descent direction as a MATH angle (ccw from east) for
    // the hillshade cosine — matches ESRI's worked example (154)
    val aspectTrig = atan2(-col("dzdy"), -col("dzdx"))
    val hs = lit(255.0) * (lit(math.cos(zenRad)) * cos(slopeRad)
      + lit(math.sin(zenRad)) * sin(slopeRad)
        * cos(lit(math.toRadians(azMathDeg)) - aspectTrig))
    base.select(col("x"), col("y"),
      degrees(slopeRad).as("slope_deg"), aspect.as("aspect_deg"),
      greatest(hs, lit(0.0)).as("hillshade"))
  }

  /**
   * Inverse-distance-weighted interpolation (Shepard 1968, power 2)
   * of scattered sample points onto target locations, radius-limited.
   * Weights are FIXED-POINT: w = floor(scale / d²) — integer weights
   * make both aggregation sums order-independent (exact for
   * integer-valued samples: every w·v product and partial sum is an
   * exact integer below 2^53), the same determinism trick as the
   * engine's KMeans centroid sums and LM scoring. A target
   * coinciding with a sample takes that sample's value directly
   * (smallest value on ties). Targets with no sample in range drop
   * out.
   *
   * Scale shape: the radius-limited candidate join is the
   * cell-neighborhood equi-join of `SpatialJoins.withinDistanceJoin`
   * (in-row 3×3 replication, one exchange, exactly-once pairs); the
   * reduction is ONE map-side-combined aggregation keyed by the
   * target. Radius must not exceed the cell edge at `level` (the
   * join's contract).
   */
  def idw(points: DataFrame, pxCol: String, pyCol: String, vCol: String,
      targets: DataFrame, idCol: String, txCol: String, tyCol: String,
      radius: Double, level: Int, scale: Long = 1L << 20): DataFrame = {
    val pairs = SpatialJoins.withinDistanceJoin(
      targets.select(col(idCol), col(txCol), col(tyCol)), txCol, tyCol,
      points.select(col(pxCol), col(pyCol), col(vCol)), pxCol, pyCol,
      radius, level)
    val d2 = (col(txCol) - col(pxCol)) * (col(txCol) - col(pxCol)) +
      (col(tyCol) - col(pyCol)) * (col(tyCol) - col(pyCol))
    // cap the weight at 2^40: a near-coincident (but not exact-hit)
    // sample would otherwise saturate the long cast and a few such
    // weights would overflow the sum — 2^40 keeps any realistic
    // neighbor count orders of magnitude below 2^63 while preserving
    // 12+ significant digits of weight ratio
    val w = least(floor(lit(scale.toDouble) / col("__d2")),
      lit((1L << 40).toDouble)).cast("long")
    pairs.withColumn("__d2", d2)
      .withColumn("__w", when(col("__d2") > 0, w))
      .groupBy(col(idCol))
      .agg(
        min(struct(col("__d2").as("d2"), col(vCol).cast("double").as("v"))).as("__m"),
        sum(col("__w")).as("__den"),
        sum(col("__w") * col(vCol).cast("double")).as("__num"),
        count(lit(1)).as("n_samples"))
      .select(col(idCol),
        when(col("__m.d2") === 0.0, col("__m.v"))
          .otherwise(col("__num") / col("__den")).as("idw_value"),
        col("n_samples"))
  }

  /**
   * Pyramid downsampling: aggregate each `factor`×`factor` block of
   * cells into one coarser cell (floor division with a non-negative
   * remainder, so signed grid indices bucket correctly). Returns
   * (x, y, n, vsum, vmin, vmax, vmean) per occupied coarse cell —
   * one map-side-combined shuffle; integer rasters stay exact
   * (vmean = exact sum / exact count). Chain calls for a full tile
   * pyramid.
   */
  def downsample(grid: DataFrame, xCol: String, yCol: String,
      vCol: String, factor: Int): DataFrame = {
    require(factor >= 2)
    def div(c: Column): Column =
      ((c.cast("long") - pmod(c.cast("long"), lit(factor.toLong))) / factor).cast("long")
    grid
      .groupBy(div(col(xCol)).as("x"), div(col(yCol)).as("y"))
      .agg(count(lit(1)).as("n"),
        sum(col(vCol).cast("double")).as("vsum"),
        min(col(vCol).cast("double")).as("vmin"),
        max(col(vCol).cast("double")).as("vmax"))
      .withColumn("vmean", col("vsum") / col("n"))
  }

  /**
   * Getis-Ord Gi* hotspot statistic (Getis & Ord 1992; the ArcGIS
   * "Hot Spot Analysis" formula) with binary 3×3 weights including
   * self: for each cell, z = (S_w − X̄·W) / (S·√((n·W − W²)/(n−1)))
   * where S_w and W are the focal sum/count from the shared window
   * pivot and X̄, S come from ONE global aggregation (three exact
   * scalars for integer rasters, broadcast back — never a per-row
   * recompute). NULL where the denominator vanishes (constant field
   * or W = n). Edge cells use their partial window, the standard
   * convention.
   */
  def hotspots(grid: DataFrame, xCol: String, yCol: String,
      vCol: String): DataFrame = {
    val f = focalStats(grid, xCol, yCol, vCol)
    val g = grid.agg(
      sum(col(vCol).cast("double")).as("__sv"),
      sum(col(vCol).cast("double") * col(vCol).cast("double")).as("__sq"),
      count(lit(1)).cast("double").as("__n"))
    val xbar = col("__sv") / col("__n")
    val s = sqrt(col("__sq") / col("__n") - xbar * xbar)
    val wi = col("fcount").cast("double")
    val num = col("fsum") - xbar * wi
    val den = s * sqrt((col("__n") * wi - wi * wi) / (col("__n") - 1.0))
    f.crossJoin(broadcast(g))
      .select(col("x"), col("y"),
        when(den > 0.0, num / den).as("gi_star"))
  }

  /**
   * Global Moran's I spatial autocorrelation (Moran 1950) with binary
   * 3×3 weights excluding self — the single-scalar companion to
   * [[hotspots]]. Computed in INTEGER space so the result is exact
   * for integer rasters: with Z_i = n·x_i − Σx (a long) and
   * NB_i = n·(focalSum_i − x_i) − Σx·(W_i − 1),
   * I = (n / ΣW) · (Σ Z_i·NB_i) / (Σ Z_i²) — the 1/n² factors
   * cancel, every summand is an integer-valued double, and only the
   * final two divisions round. Exact (order-independent) while
   * |Z_i·NB_i| stays below 2^53 — about n·|x| < 2^26, i.e. a few
   * hundred million cell-value units; beyond that the sums are still
   * correct to double precision but no longer bit-order-independent.
   * Returns one row (n_cells, sum_w, moran_i); null I on a constant
   * field.
   */
  /** Shared per-cell Moran term frame for [[moransI]] and
    * [[localMoran]]: (x, y, __n, __sv, __sq, __w, __znb, __zz) with
    * Z_i = n·x_i − Σx and NB_i the weighted neighbor deviation — the
    * ONE place the integer-space op order lives. */
  private def moranTerms(grid: DataFrame, xCol: String, yCol: String,
      vCol: String): DataFrame = {
    val f = focalStats(grid, xCol, yCol, vCol)
      .join(grid.select(col(xCol).cast("long").as("x"),
        col(yCol).cast("long").as("y"), col(vCol).cast("double").as("__v")),
        Seq("x", "y"))
    val g = grid.agg(sum(col(vCol).cast("double")).as("__sv"),
      sum(col(vCol).cast("double") * col(vCol).cast("double")).as("__sq"),
      count(lit(1)).cast("double").as("__n"))
    val z = col("__n") * col("__v") - col("__sv")
    val nb = col("__n") * (col("fsum") - col("__v")) -
      col("__sv") * (col("fcount").cast("double") - 1.0)
    f.crossJoin(broadcast(g))
      .select(col("x"), col("y"), col("__n"), col("__sv"), col("__sq"),
        (col("fcount").cast("double") - 1.0).as("__w"),
        (z * nb).as("__znb"), (z * z).as("__zz"))
  }

  def moransI(grid: DataFrame, xCol: String, yCol: String,
      vCol: String): DataFrame = {
    moranTerms(grid, xCol, yCol, vCol)
      .agg(max(col("__n")).as("__nd"), sum(col("__w")).as("__sw"),
        sum(col("__znb")).as("__sznb"), sum(col("__zz")).as("__szz"))
      .select(col("__nd").cast("long").as("n_cells"),
        col("__sw").cast("long").as("sum_w"),
        when(col("__szz") > 0.0,
          (col("__nd") / col("__sw")) * (col("__sznb") / col("__szz")))
          .as("moran_i"))
  }

  /**
   * Local Moran's I (LISA — Anselin 1995) with binary queen 3×3
   * weights excluding self: I_i = z_i·(Σ_j w_ij z_j)/m2 with
   * m2 = Σz²/n, computed in the same integer space as [[moransI]]
   * (I_i = Z_i·NB_i·n / ΣZ² — exact sums, two mirrored float ops).
   * Positive I_i = the cell sits in a high-high or low-low cluster;
   * negative = a spatial outlier. Null on a constant field.
   */
  def localMoran(grid: DataFrame, xCol: String, yCol: String,
      vCol: String): DataFrame = {
    // ΣZ² has the closed form n·(n·Σx² − (Σx)²) — exact in the same
    // integer space — so the per-cell projection needs NO second pass
    // over the focal pipeline
    val szz = col("__n") * (col("__n") * col("__sq") - col("__sv") * col("__sv"))
    moranTerms(grid, xCol, yCol, vCol)
      .select(col("x"), col("y"),
        when(szz > 0.0, col("__znb") * (col("__n") / szz)).as("lisa"))
  }

  /**
   * Kernel-density heatmap onto the cell grid: every sample spreads a
   * truncated Gaussian onto its 3×3 neighbor CELLS (in-row
   * neighborhood explode — antimeridian wrap, pole-row drop, no
   * shuffle before the one density aggregation); the density at a
   * cell is the sum of fixed-point kernel weights
   * floor(scale · exp(−d²/2h²)) evaluated at the CELL CENTER — long
   * weights, so partial sums are exact in any order (the IDW/KMeans
   * determinism trick) and the heatmap is bit-identical at any
   * parallelism. Returns (cell, density, n_samples) for every cell
   * touched by at least one sample's neighborhood.
   */
  def kdeCells(points: DataFrame, pxCol: String, pyCol: String,
      level: Int, bandwidth: Double, scale: Long = 1L << 20): DataFrame = {
    import graft.sql.{functions => gf}
    require(bandwidth > 0)
    val step = 360.0 / (1L << level).toDouble
    val latStep = 180.0 / (1L << level).toDouble
    val cx = lit(-180.0) + (gf.st_cell_x(col("__cell")).cast("double") + 0.5) * step
    val cy = lit(90.0) - (gf.st_cell_y(col("__cell")).cast("double") + 0.5) * latStep
    points
      .withColumn("__cell", explode(
        gf.st_cell_neighborhood(lit(level), col(pxCol), col(pyCol), lit(1))))
      .withColumn("__d2",
        (col(pxCol) - cx) * (col(pxCol) - cx) + (col(pyCol) - cy) * (col(pyCol) - cy))
      .withColumn("__w", floor(lit(scale.toDouble) *
        exp(-col("__d2") / lit(2.0 * bandwidth * bandwidth))).cast("long"))
      .groupBy(col("__cell").as("cell"))
      .agg(sum(col("__w")).as("density"), count(lit(1)).as("n_samples"))
  }

  /**
   * The remaining gdaldem window measures, exact on integer DEMs
   * (pure +/−/abs/min/max — no trig): TRI (Riley 1999 as gdaldem
   * computes it: MEAN |center − neighbor| over the 8 neighbors), TPI
   * (center − mean(8 neighbors)) and roughness (window max − min).
   * Interior cells only (n = 9), same single-shuffle window pivot.
   */
  def terrainIndices(grid: DataFrame, xCol: String, yCol: String,
      vCol: String): DataFrame = {
    val w = window3x3(grid, xCol, yCol, vCol).filter(col("n") === 9)
    val nbrs = Seq("va", "vb", "vc", "vd", "vf", "vg", "vh", "vi").map(col)
    val e = col("ve")
    // fixed fold order a,b,c,d,f,g,h,i — exact for integer DEMs
    val absSum = nbrs.map(v => abs(e - v)).reduce(_ + _)
    val nbrSum = nbrs.reduce(_ + _)
    val allCols = e +: nbrs
    w.select(col("x"), col("y"),
      (absSum / 8.0).as("tri"),
      (e - nbrSum / 8.0).as("tpi"),
      (allCols.reduce((a, b) => greatest(a, b)) -
        allCols.reduce((a, b) => least(a, b))).as("roughness"))
  }

  /**
   * D8 flow direction (O'Callaghan & Mark 1984, the ESRI code
   * convention): each interior cell drains toward the neighbor with
   * the steepest positive DESCENT (drop / distance, diagonal distance
   * √2), encoded 1=E, 2=SE, 4=S, 8=SW, 16=W, 32=NW, 64=N, 128=NE;
   * ties break to the smallest code (deterministic); cells with no
   * lower neighbor (pits/flats) get 0. The drop comparison
   * cross-multiplies instead of dividing — (vᵉ−vₙ)·d₂ vs (vᵉ−vₘ)·d₁
   * with d ∈ {1, √2} — so integer DEMs compare exactly (each product
   * is an integer times √2 or an integer; equality/order is exact in
   * doubles for |v| < 2^51).
   */
  def flowDirection(grid: DataFrame, xCol: String, yCol: String,
      vCol: String): DataFrame = {
    val w = window3x3(grid, xCol, yCol, vCol).filter(col("n") === 9)
    val e = col("ve")
    // (neighbor, ESRI code, diagonal?) with y north-up:
    // E=vf, SE=vi, S=vh, SW=vg, W=vd, NW=va, N=vb, NE=vc
    val nbrs = Seq(
      (col("vf"), 1, false), (col("vi"), 2, true), (col("vh"), 4, false),
      (col("vg"), 8, true), (col("vd"), 16, false), (col("va"), 32, true),
      (col("vb"), 64, false), (col("vc"), 128, true))
    // weighted drop: (ve - vn) for cardinal, (ve - vn)/sqrt(2) for
    // diagonal — compare via (ve - vn) * invDist with invDist in
    // {1, 1/sqrt(2)}; strictly-positive drops only
    val invDiag = 1.0 / math.sqrt(2.0)
    val drops = nbrs.map { case (v, code, diag) =>
      ((e - v) * lit(if (diag) invDiag else 1.0), code)
    }
    // argmax with smallest-code ties: fold in ascending code order,
    // strict > keeps the earlier (smaller) code on equality
    val (bestDrop, bestCode) = drops.tail.foldLeft(
      (drops.head._1, lit(drops.head._2))) { case ((bd, bc), (d, code)) =>
      (greatest(bd, d), when(d > bd, lit(code)).otherwise(bc))
    }
    w.select(col("x"), col("y"),
      when(bestDrop > 0.0, bestCode).otherwise(lit(0)).as("flow_dir"))
  }

  /**
   * D8 flow accumulation: for every cell, the number of cells whose
   * drainage path passes through it (0 for ridge cells — the ESRI
   * convention, self excluded). The D8 forest is a DAG (strictly
   * positive drops), so accumulation is the classic distributed
   * topological sweep: in-degree-0 cells push (1 + acc) to their
   * downstream cell; a cell resolves — and pushes in the NEXT round —
   * when its last upstream contribution arrives. Round count = the
   * longest drainage path; each round is one frontier-edge join plus
   * one map-side-combined sum, with per-round localCheckpoint lineage
   * truncation (the Components/Network discipline). Border cells
   * (incomplete window) get no direction and act as outlets; they
   * still accumulate inflow.
   */
  def flowAccumulation(grid: DataFrame, xCol: String, yCol: String,
      vCol: String, maxRounds: Int = 10000): DataFrame = {
    val fd = flowDirection(grid, xCol, yCol, vCol)
    // bias both coordinates so SIGNED grid indices pack/unpack
    // correctly (plain shift + low-32 remainder corrupts negative y)
    val B = 1L << 30
    def pack(x: Column, y: Column): Column =
      shiftleft(x.cast("long") + B, 32) + (y.cast("long") + B)
    val nodes = grid.select(pack(col(xCol), col(yCol)).as("node")).distinct()
    // dx/dy per ESRI code, y north-up
    val dx = map(lit(1), lit(1), lit(2), lit(1), lit(4), lit(0), lit(8), lit(-1),
      lit(16), lit(-1), lit(32), lit(-1), lit(64), lit(0), lit(128), lit(1))
    val dy = map(lit(1), lit(0), lit(2), lit(-1), lit(4), lit(-1), lit(8), lit(-1),
      lit(16), lit(0), lit(32), lit(1), lit(64), lit(1), lit(128), lit(1))
    val edges = fd.filter(col("flow_dir") =!= 0)
      .select(
        pack(col("x"), col("y")).as("u"),
        pack(col("x") + element_at(dx, col("flow_dir")),
          col("y") + element_at(dy, col("flow_dir"))).as("v"))
      .localCheckpoint(false)
    val indeg = edges.groupBy(col("v").as("node")).agg(count(lit(1)).as("__in"))
    val state0 = nodes.join(indeg, Seq("node"), "left")
      .select(col("node"), coalesce(col("__in"), lit(0L)).as("pending"), lit(0L).as("acc"))
    var frontier = state0.filter(col("pending") === 0).select(col("node"), col("acc"))
      .localCheckpoint(false)
    var rest = state0.filter(col("pending") > 0).localCheckpoint(false)
    var resolved = frontier
    var round = 0
    while (!rest.isEmpty && round < maxRounds) {
      require(!frontier.isEmpty,
        "flowAccumulation: cycle detected (non-DAG input)") // D8 cannot cycle
      val msgs = frontier.join(edges, frontier("node") === edges("u"))
        .select(edges("v").as("node"), (frontier("acc") + 1L).as("add"))
        .groupBy("node").agg(sum(col("add")).as("add"), count(lit(1)).as("cnt"))
      val rest2 = rest.join(msgs, Seq("node"), "left")
        .select(col("node"),
          (col("pending") - coalesce(col("cnt"), lit(0L))).as("pending"),
          (col("acc") + coalesce(col("add"), lit(0L))).as("acc"))
      frontier = rest2.filter(col("pending") === 0).select(col("node"), col("acc"))
        .localCheckpoint(false)
      // statsBarrier: rest2 is rest joined against a rest-derived
      // frontier, so propagated checkpoint stats would compound as
      // size^2 per topological level (see PlanBridge)
      rest = org.apache.spark.sql.graft.PlanBridge.statsBarrier(
        rest2.filter(col("pending") > 0).localCheckpoint(false))
      resolved = resolved.union(frontier).localCheckpoint(false)
      round += 1
    }
    require(rest.isEmpty, s"flowAccumulation did not converge in $maxRounds rounds")
    resolved.select((shiftright(col("node"), 32) - B).as("x"),
      ((col("node") - shiftleft(shiftright(col("node"), 32), 32)) - B).as("y"),
      col("acc"))
  }
}
