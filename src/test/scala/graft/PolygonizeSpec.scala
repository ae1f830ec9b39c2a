package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sql.{functions => gf}

/**
 * Raster→vector polygonization (`SpatialJoins.polygonizeGrid`): the
 * dissolve of class-labelled grid cells into region polygons on the
 * unit lattice. Oracles are exact integer identities that hold for ANY
 * correct dissolve, regardless of how parts/pinches are decomposed:
 *   area(region)      == n_cells                      (disjoint squares)
 *   perimeter(region) == 4·n_cells − 2·(4-adjacencies within the class)
 * plus point-membership: every cell's center lies in its own class
 * region and in no other class region.
 */
class PolygonizeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def run(cells: Seq[(Int, Int, Int)]) = {
    val grid = cells.toDF("x", "y", "cls")
    val out = operators.SpatialJoins.polygonizeGrid(grid, "x", "y", "cls")
      .select(col("cls"), col("n_cells"),
        gf.st_unsigned_area(col("geom")).as("area"),
        gf.st_perimeter(col("geom")).as("perim"),
        gf.st_isvalid(col("geom")).as("valid"),
        col("geom"))
      .collect()
    out.map(r => r.getInt(0) -> r).toMap
  }

  private def check(cells: Seq[(Int, Int, Int)]): Unit = {
    val byClass = run(cells)
    val classes = cells.map(_._3).distinct
    assert(byClass.keySet == classes.toSet)
    val cellSet = cells.map(c => (c._1, c._2) -> c._3).toMap
    for (cls <- classes) {
      val mine = cells.filter(_._3 == cls)
      val n = mine.size
      val adj = mine.count(c => cellSet.get((c._1 + 1, c._2)).contains(cls)) +
        mine.count(c => cellSet.get((c._1, c._2 + 1)).contains(cls))
      val r = byClass(cls)
      assert(r.getLong(1) == n, s"cls $cls n_cells")
      assert(r.getDouble(2) == n.toDouble, s"cls $cls area: ${r.getDouble(2)} vs $n")
      assert(r.getDouble(3) == (4 * n - 2 * adj).toDouble,
        s"cls $cls perimeter: ${r.getDouble(3)} vs ${4 * n - 2 * adj}")
      assert(r.getBoolean(4), s"cls $cls produced an invalid geometry")
    }
    // point membership: each cell center in its own region only
    val regions = spark.createDataFrame(spark.sparkContext.parallelize(
      byClass.toSeq.map { case (cls, r) => org.apache.spark.sql.Row(cls, r.get(5)) }),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("rcls",
          org.apache.spark.sql.types.IntegerType),
        org.apache.spark.sql.types.StructField("geom",
          graft.sql.GeomSchema.dataType))))
    val hits = cells.toDF("x", "y", "cls")
      .crossJoin(regions)
      .filter(gf.st_contains_xy(col("geom"),
        col("x") + lit(0.5), col("y") + lit(0.5)))
      .select("x", "y", "cls", "rcls")
      .collect()
    assert(hits.length == cells.size, s"${hits.length} containments for ${cells.size} cells")
    hits.foreach(h => assert(h.getInt(2) == h.getInt(3),
      s"cell (${h.getInt(0)},${h.getInt(1)}) of class ${h.getInt(2)} inside region ${h.getInt(3)}"))
  }

  test("ring of 8 cells keeps its hole (area 8, perimeter 12+4)") {
    val ring = for {
      x <- 0 to 2; y <- 0 to 2; if !(x == 1 && y == 1)
    } yield (x, y, 0)
    val byClass = run(ring)
    assert(byClass(0).getDouble(2) == 8.0)
    assert(byClass(0).getDouble(3) == 16.0)
    // the hole's center must be OUTSIDE the region
    val df = spark.createDataFrame(spark.sparkContext.parallelize(
      Seq(org.apache.spark.sql.Row(byClass(0).get(5)))),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("geom",
          graft.sql.GeomSchema.dataType))))
    val contained = df.select(gf.st_contains_xy(col("geom"), lit(1.5), lit(1.5)))
      .head().getBoolean(0)
    assert(!contained, "hole center must not be inside the dissolved ring")
  }

  test("corner-touching cells: area 2, perimeter 8, both centers inside") {
    check(Seq((0, 0, 0), (1, 1, 0)))
  }

  test("two-class checkerboard 4x4: full dissolve identities") {
    val cb = for { x <- 0 until 4; y <- 0 until 4 } yield (x, y, (x + y) % 2)
    check(cb)
  }

  test("three-class pseudo-random 12x12 grids (3 seeds)") {
    for (seed <- Seq(1, 2, 3)) {
      val cells = for {
        x <- 0 until 12; y <- 0 until 12
        h = (x * 7919 + y * 104729 + seed * 65537) % 97
        if h % 5 != 0 // leave gaps — unlabelled cells are not in any class
      } yield (x, y, h % 3)
      check(cells)
    }
  }
}
