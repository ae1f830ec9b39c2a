package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Contour

/** Distributed marching squares: case geometry, saddle rule, exact
  * interpolation, segment stitching, parallelism invariance. */
class ContourSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def segs(cells: Seq[(Long, Long, Double)], level: Double) =
    Contour.contourSegments(cells.toDF("x", "y", "v"), "x", "y", "v", level)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6)))
      .sortBy(t => (t._1, t._2, t._3)).toSeq

  test("single peak: a closed diamond of 4 segments at edge midpoints") {
    val grid = for (x <- 0L to 2L; y <- 0L to 2L)
      yield (x, y, if (x == 1 && y == 1) 1.0 else 0.0)
    val out = segs(grid.toSeq, 0.5)
    assert(out.length == 4, out.toString)
    // all endpoints are half-integer edge midpoints around (1,1)
    val pts = out.flatMap(t => Seq((t._4, t._5), (t._6, t._7))).toSet
    assert(pts == Set((0.5, 1.0), (1.0, 0.5), (1.5, 1.0), (1.0, 1.5)), pts)
  }

  test("vertical band: two straight contour walls") {
    val grid = for (x <- 0L to 4L; y <- 0L to 2L)
      yield (x, y, if (x == 2) 2.0 else 0.0)
    val out = segs(grid.toSeq, 1.0)
    // crossing at t = (1-0)/(2-0) = 0.5 from the outside corner
    assert(out.nonEmpty)
    assert(out.forall { t =>
      (t._4 == t._6) && (t._4 == 1.5 || t._4 == 2.5)
    }, out.toString)
  }

  test("saddle: center rule pairs bottom-right / top-left") {
    // diagonal insides, center avg exactly at level (>= -> inside)
    val grid = Seq((0L, 0L, 1.0), (1L, 1L, 1.0), (1L, 0L, 0.0), (0L, 1L, 0.0))
    val out = segs(grid, 0.5)
    assert(out.length == 2)
    // centerIn (0.5 >= 0.5) and i10=false -> bottom pairs RIGHT
    val s0 = out.find(_._3 == 0).get
    assert(Set((s0._4, s0._5), (s0._6, s0._7)) == Set((0.5, 0.0), (1.0, 0.5)))
    val s1 = out.find(_._3 == 1).get
    assert(Set((s1._4, s1._5), (s1._6, s1._7)) == Set((0.5, 1.0), (0.0, 0.5)))
  }

  test("interpolation uses exact rational t on integer values") {
    val grid = Seq((0L, 0L, 0.0), (1L, 0L, 4.0), (0L, 1L, 0.0), (1L, 1L, 4.0))
    val out = segs(grid, 1.0)
    // t = (1-0)/(4-0) = 0.25 exactly on both horizontal edges
    assert(out.length == 1)
    val t = out.head
    assert(t._4 == 0.25 && t._6 == 0.25, t.toString)
  }

  test("contourLines dissolves the peak into one closed ring") {
    val grid = for (x <- 0L to 2L; y <- 0L to 2L)
      yield (x, y, if (x == 1 && y == 1) 1.0 else 0.0)
    val row = Contour.contourLines(grid.toSeq.toDF("x", "y", "v"),
      "x", "y", "v", 0.5).collect()(0)
    val wkts = row.getSeq[org.apache.spark.sql.Row](0)
    assert(wkts.nonEmpty)
  }

  test("bit-identical at any parallelism") {
    val grid = (for (x <- 0L to 20L; y <- 0L to 20L)
      yield (x, y, ((x * 7 + y * 13) % 10).toDouble)).toSeq
    def run(parts: Int) = Contour.contourSegments(
      grid.toDF("x", "y", "v").repartition(parts), "x", "y", "v", 4.5)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6)))
      .sortBy(t => (t._1, t._2, t._3)).toSeq
    val a = run(1)
    assert(a == run(8) && a.nonEmpty)
  }
}
