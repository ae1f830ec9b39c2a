package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Trajectory

/** Stay-point detection (Li et al. 2008): closed-form fixtures,
  * threshold gates, parallelism invariance. */
class TrajectorySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // user 1: 4 fixes home (~0,0), hop, 4 fixes work (~1,0)
  private val fixes = Seq(
    (1L, 0L, 0.0, 0.0), (1L, 100L, 0.001, 0.0), (1L, 200L, 0.002, 0.0),
    (1L, 300L, 0.001, 0.001),
    (1L, 400L, 0.5, 0.25), // transit fix (far from both clusters)
    (1L, 1000L, 1.0, 0.0), (1L, 1100L, 1.001, 0.0), (1L, 1200L, 1.0, 0.001),
    (1L, 1300L, 1.002, 0.0),
    // user 2: fast drive-through, never dwells long enough
    (2L, 0L, 5.0, 5.0), (2L, 50L, 5.001, 5.0)
  ).toDF("user", "ts", "lon", "lat")

  test("two stays with closed-form spans and centroids") {
    val out = Trajectory.stayPoints(fixes, "user", "ts", "lon", "lat",
        distM = 1000.0, minDurSec = 250L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getInt(3), r.getDouble(4), r.getDouble(5))).sortBy(_._2).toSeq
    assert(out.length == 2, out.toString)
    val home = out(0); val work = out(1)
    assert(home._1 == 1L && home._2 == 0L && home._3 == 300L && home._4 == 4)
    assert(math.abs(home._5 - 0.001) < 1e-12 && math.abs(home._6 - 0.00025) < 1e-12)
    assert(work._2 == 1000L && work._3 == 1300L && work._4 == 4)
    assert(math.abs(work._5 - 1.00075) < 1e-12)
  }

  test("duration gate: short dwells emit nothing") {
    val out = Trajectory.stayPoints(fixes, "user", "ts", "lon", "lat",
      distM = 1000.0, minDurSec = 10000L)
    assert(out.count() == 0)
  }

  test("distance gate: huge radius merges everything per user") {
    val out = Trajectory.stayPoints(fixes, "user", "ts", "lon", "lat",
        distM = 1e9, minDurSec = 0L)
      .collect().map(r => (r.getLong(0), r.getInt(3))).sortBy(_._1).toSeq
    assert(out == Seq((1L, 9), (2L, 2)))
  }

  test("bit-identical at any parallelism") {
    def run(parts: Int) = Trajectory.stayPoints(
        fixes.repartition(parts), "user", "ts", "lon", "lat", 1000.0, 250L)
      .collect().map(_.toSeq).sortBy(_.mkString(",")).toSeq
    assert(run(1) == run(7))
  }
}
