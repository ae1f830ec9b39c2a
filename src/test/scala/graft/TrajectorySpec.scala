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

  test("kinematics: closed-form speed and heading, null contracts") {
    import spark.implicits._
    // user 1: due-north hop (heading 0) then due-east hop at the
    // equator; user 2: a single fix (all-null enrichment)
    val df = Seq(
      (1L, 1000L, 0.0, 0.0), (1L, 1100L, 0.0, 1.0), (1L, 1200L, 1.0, 1.0),
      (2L, 500L, 10.0, 10.0)
    ).toDF("user", "ts", "lon", "lat")
    val out = Trajectory.kinematics(df, "user", "ts", "lon", "lat")
      .select("user", "ts", "dist_m", "dt_sec", "speed_mps", "heading_deg")
      .collect().map(r => (r.getLong(0), r.getLong(1))
        -> (Option(r.get(2)), Option(r.get(3)), Option(r.get(4)), Option(r.get(5)))).toMap
    assert(out((1L, 1000L)) == ((None, None, None, None)))
    assert(out((2L, 500L)) == ((None, None, None, None)))
    val oneDegM = 6371008.8 * math.Pi / 180.0
    val (d1, dt1, s1, h1) = out((1L, 1100L))
    assert(math.abs(d1.get.asInstanceOf[Double] - oneDegM) < 1e-6)
    assert(dt1.get == 100L)
    assert(math.abs(s1.get.asInstanceOf[Double] - oneDegM / 100.0) < 1e-9)
    assert(h1.get.asInstanceOf[Double] == 0.0)
    val (_, _, _, h2) = out((1L, 1200L))
    // east along lat 1: initial bearing just above 90 minus the
    // convergence correction — strictly between 89 and 91
    assert(math.abs(h2.get.asInstanceOf[Double] - 90.0) < 1.0)
  }

  test("od matrix: flows and entity counts over cell transitions") {
    import spark.implicits._
    // cells at level 2 are 90x45 degrees; use far-apart fixes
    val df = Seq(
      (1L, 1L, -100.0, 10.0), (1L, 2L, 100.0, 10.0), (1L, 3L, -100.0, 10.0),
      (2L, 1L, -100.0, 11.0), (2L, 2L, 100.0, 12.0),
      (3L, 1L, -100.0, 10.0), (3L, 2L, -100.5, 10.5) // same cell: no flow
    ).toDF("user", "ts", "lon", "lat")
    val out = Trajectory.odMatrix(df, "user", "ts", "lon", "lat", level = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(out.size == 2)
    // west->east carries users 1 and 2; east->west only user 1
    assert(out.values.toSet == Set((2L, 2L), (1L, 1L)))
  }
}
