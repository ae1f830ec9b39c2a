package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Distributed marching squares — the GDAL `gdal_contour` analogue over
 * a cell-keyed raster (x, y, v), producing iso-level crossing segments
 * (and optionally merged lines). Neither the reference geo crate nor
 * PostGIS has a contour operator.
 *
 * Scale design: every grid cell ships itself to the ≤4 2×2 blocks it
 * corners (a bounded in-row explode), blocks assemble in ONE shuffle
 * keyed by the block id (map-side combinable), and each block emits
 * its 0–2 segments independently — no global state, no iteration;
 * merging segments into polylines is a per-level dissolve whose input
 * is bounded by contour complexity, not raster size.
 *
 * Determinism: crossing points interpolate with a FIXED op order
 * (t = (level − va) / (vb − va)); segment endpoints sort
 * lexicographically; the saddle cases (4 crossings) disambiguate by
 * the standard center-average rule. Everything is +,-,*,/ and
 * comparisons — an external SQL engine replays it bit-for-bit.
 *
 * Convention: a vertex is "inside" iff v >= level; missing cells are
 * outside (only blocks with all 4 corners present emit — pad the
 * raster with a zero collar to close contours at the data edge).
 */
object Contour {

  /**
   * Iso-level crossing segments per 2×2 block. Input: one row per
   * grid cell (integer x/y, double v). Output: (bx, by, seg,
   * x1, y1, x2, y2) in grid coordinates — (bx, by) is the block's
   * lower-left cell, seg ∈ {0, 1}.
   */
  def contourSegments(grid: DataFrame, xCol: String, yCol: String,
      vCol: String, level: Double): DataFrame = {
    val g = grid.select(col(xCol).cast("long").as("x"),
      col(yCol).cast("long").as("y"), col(vCol).cast("double").as("v"))
    // each cell corners the blocks (x-dx, y-dy), dx,dy ∈ {0,1};
    // corner index = dx + 2*dy (0=LL, 1=LR, 2=UL, 3=UR of the block)
    val corners = g.select(
      explode(array(
        struct(col("x").as("bx"), col("y").as("by"), lit(0).as("c")),
        struct((col("x") - 1).as("bx"), col("y").as("by"), lit(1).as("c")),
        struct(col("x").as("bx"), (col("y") - 1).as("by"), lit(2).as("c")),
        struct((col("x") - 1).as("bx"), (col("y") - 1).as("by"), lit(3).as("c"))
      )).as("b"), col("v"))
      .select(col("b.bx"), col("b.by"), col("b.c"), col("v"))
    // ONE shuffle: assemble the 4 corner values per block
    val blocks = corners.groupBy("bx", "by")
      .agg(
        sum(when(col("c") === 0, col("v"))).as("v00"),
        sum(when(col("c") === 1, col("v"))).as("v10"),
        sum(when(col("c") === 2, col("v"))).as("v01"),
        sum(when(col("c") === 3, col("v"))).as("v11"),
        count(lit(1)).as("nc"))
      .filter(col("nc") === 4)
    val L = lit(level)
    def in(v: Column) = v >= L
    // crossing coordinate along an edge from corner a (at 0) to b (at 1);
    // guarded (ANSI mode): uncrossed equal-value edges would divide by 0
    def tOf(va: Column, vb: Column) =
      when(va =!= vb, (L - va) / (vb - va)).otherwise(lit(0.0))
    val b = blocks
      .withColumn("i00", in(col("v00"))).withColumn("i10", in(col("v10")))
      .withColumn("i01", in(col("v01"))).withColumn("i11", in(col("v11")))
      // edges: bottom v00-v10, right v10-v11, top v01-v11, left v00-v01
      .withColumn("cb", col("i00") =!= col("i10"))
      .withColumn("cr", col("i10") =!= col("i11"))
      .withColumn("ct", col("i01") =!= col("i11"))
      .withColumn("cl", col("i00") =!= col("i01"))
      .withColumn("pbx", col("bx") + tOf(col("v00"), col("v10")))
      .withColumn("pby", col("by").cast("double"))
      .withColumn("prx", (col("bx") + 1).cast("double"))
      .withColumn("pry", col("by") + tOf(col("v10"), col("v11")))
      .withColumn("ptx", col("bx") + tOf(col("v01"), col("v11")))
      .withColumn("pty", (col("by") + 1).cast("double"))
      .withColumn("plx", col("bx").cast("double"))
      .withColumn("ply", col("by") + tOf(col("v00"), col("v01")))
      .withColumn("ncross",
        col("cb").cast("int") + col("cr").cast("int") +
          col("ct").cast("int") + col("cl").cast("int"))
      // saddle disambiguation: center average inside pairs B-R & T-L,
      // else B-L & T-R (both crossing sets exist only when ncross=4)
      .withColumn("centerIn",
        (col("v00") + col("v10") + col("v01") + col("v11")) / lit(4.0) >= L)

    // the two endpoints of segment `seg` as arrays [x, y]
    def pt(which: String): Column = which match {
      case "b" => array(col("pbx"), col("pby"))
      case "r" => array(col("prx"), col("pry"))
      case "t" => array(col("ptx"), col("pty"))
      case "l" => array(col("plx"), col("ply"))
    }
    // ncross == 2: join the two crossed edges (fixed edge order b,r,t,l)
    val two = b.filter(col("ncross") === 2)
      .withColumn("p1",
        when(col("cb"), pt("b")).when(col("cr"), pt("r")).otherwise(pt("t")))
      .withColumn("p2",
        when(col("cl"), pt("l")).when(col("ct"), pt("t")).otherwise(pt("r")))
      .withColumn("seg", lit(0))
    // ncross == 4 (saddle): two segments by the center rule
    val saddle = b.filter(col("ncross") === 4)
    // center matching the LR corner's side means LR is NOT isolated:
    // bottom pairs left; center on the other side isolates LR: bottom
    // pairs right (and the top segment takes the complementary edge)
    val s0 = saddle
      .withColumn("p1", pt("b"))
      .withColumn("p2", when(col("centerIn") =!= col("i10"), pt("r")).otherwise(pt("l")))
      .withColumn("seg", lit(0))
    val s1 = saddle
      .withColumn("p1", pt("t"))
      .withColumn("p2", when(col("centerIn") =!= col("i10"), pt("l")).otherwise(pt("r")))
      .withColumn("seg", lit(1))
    val segs = two.unionByName(s0).unionByName(s1)
    // deterministic endpoint order: (x1,y1) lexicographically smallest
    val flip = col("p1")(0) > col("p2")(0) ||
      (col("p1")(0) === col("p2")(0) && col("p1")(1) > col("p2")(1))
    segs.select(col("bx"), col("by"), col("seg"),
      when(flip, col("p2")(0)).otherwise(col("p1")(0)).as("x1"),
      when(flip, col("p2")(1)).otherwise(col("p1")(1)).as("y1"),
      when(flip, col("p1")(0)).otherwise(col("p2")(0)).as("x2"),
      when(flip, col("p1")(1)).otherwise(col("p2")(1)).as("y2"))
  }

  /** Segments dissolved into maximal polylines (one MULTILINESTRING
    * row) via the engine's line merger — input bounded by contour
    * complexity, not raster size. */
  def contourLines(grid: DataFrame, xCol: String, yCol: String,
      vCol: String, level: Double): DataFrame = {
    import graft.sql.{functions => gf}
    val segs = contourSegments(grid, xCol, yCol, vCol, level)
    val lines = segs.select(gf.st_makeline(array(
      gf.st_point(col("x1"), col("y1")),
      gf.st_point(col("x2"), col("y2")))).as("g"))
    // unary union nodes + dissolves + chain-merges the linework
    lines.agg(gf.st_unary_union(collect_list(col("g"))).as("contour"))
  }
}
