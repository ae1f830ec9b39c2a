package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Raster

/** Bilinear sampling: affine reproduction, node exactness, edge
  * drop-out, parallelism invariance. */
class RasterSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val grid = (for (x <- 0L to 10L; y <- 0L to 10L)
    yield (x, y, (x + 2 * y).toDouble)).toDF("x", "y", "v")

  test("affine field reproduced exactly at fractional points") {
    val pts = Seq((1L, 2.25, 3.5), (2L, 0.0, 0.0), (3L, 9.75, 9.875))
      .toDF("id", "u", "w")
    val out = Raster.sampleBilinear(grid, "x", "y", "v", pts, "id", "u", "w")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out(1L) == 2.25 + 2 * 3.5)
    assert(out(2L) == 0.0)
    assert(out(3L) == 9.75 + 2 * 9.875)
  }

  test("points outside the full 2x2 neighborhood drop out") {
    val pts = Seq((1L, 10.5, 5.0), (2L, 5.0, -0.5), (3L, 5.5, 5.5))
      .toDF("id", "u", "w")
    val out = Raster.sampleBilinear(grid, "x", "y", "v", pts, "id", "u", "w")
      .collect().map(_.getLong(0)).toSet
    assert(out == Set(3L))
  }

  test("bit-identical at any parallelism") {
    val pts = (1L to 60L).map(i => (i, i % 9 + 0.37, i % 8 + 0.81))
      .toDF("id", "u", "w")
    def run(parts: Int) = Raster.sampleBilinear(
        grid.repartition(parts), "x", "y", "v",
        pts.repartition(parts), "id", "u", "w")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1).toSeq
    assert(run(1) == run(7))
  }
}
