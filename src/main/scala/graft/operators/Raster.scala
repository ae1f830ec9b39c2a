package graft.operators

import org.apache.spark.sql.DataFrame
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
}
