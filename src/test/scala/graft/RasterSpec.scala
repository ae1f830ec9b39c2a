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

  // 3×3 DEM in MY orientation (y north-up). Rows listed north→south.
  private def dem(rows: Seq[Seq[Double]]): org.apache.spark.sql.DataFrame = {
    val n = rows.length
    (for (j <- rows.indices; i <- rows(j).indices)
      yield (i.toLong, (n - 1 - j).toLong, rows(j)(i))).toDF("x", "y", "v")
  }

  test("focal stats: window counts, exact sums, edge partials") {
    val g = (for (x <- 0L to 2L; y <- 0L to 2L) yield (x, y, (x + 3 * y + 1).toDouble))
      .toDF("x", "y", "v")
    val out = Raster.focalStats(g, "x", "y", "v")
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6)))).toMap
    // all 9 values: x + 3y + 1 for x,y in 0..2 → 1..9, sum 45
    assert(out((1L, 1L)) == ((9L, 45.0, 1.0, 9.0, 5.0)))
    // corner (0,0): window {(0,0),(1,0),(0,1),(1,1)} = {1,2,4,5}
    assert(out((0L, 0L)) == ((4L, 12.0, 1.0, 5.0, 3.0)))
    assert(out.size == 9)
  }

  test("terrain: ESRI published aspect example (92.64 deg)") {
    val g = dem(Seq(Seq(101.0, 92, 85), Seq(101, 92, 85), Seq(101, 91, 84)))
    val r = Raster.terrain(g, "x", "y", "v").collect()
    assert(r.length == 1)
    assert(math.abs(r(0).getDouble(3) - 92.64) < 0.01, s"aspect ${r(0).getDouble(3)}")
  }

  test("terrain: ESRI published hillshade example (153.9, cell 5)") {
    val g = dem(Seq(Seq(2450.0, 2461, 2483), Seq(2452, 2461, 2483),
      Seq(2447, 2455, 2477)))
    val r = Raster.terrain(g, "x", "y", "v", cellSize = 5.0).collect()
    assert(r.length == 1)
    assert(math.abs(r(0).getDouble(4) - 153.9) < 0.2, s"hillshade ${r(0).getDouble(4)}")
  }

  test("terrain: ESRI published slope example (75.26 deg, cell 5)") {
    val g = dem(Seq(Seq(50.0, 45, 50), Seq(30, 30, 30), Seq(8, 10, 10)))
    val r = Raster.terrain(g, "x", "y", "v", cellSize = 5.0).collect()
    assert(r.length == 1)
    assert(math.abs(r(0).getDouble(2) - 75.25766) < 0.001, s"slope ${r(0).getDouble(2)}")
  }

  test("terrain: inclined plane closed form; flat plane null aspect") {
    val plane = (for (x <- 0L to 4L; y <- 0L to 4L) yield (x, y, (2 * x + 3 * y).toDouble))
      .toDF("x", "y", "v")
    val out = Raster.terrain(plane, "x", "y", "v").collect()
    assert(out.length == 9) // 3×3 interior
    out.foreach { r =>
      // gradient (2, 3): slope = atan(sqrt(13)), descent compass =
      // atan2(-2, -3) + 360
      assert(math.abs(r.getDouble(2) - math.toDegrees(math.atan(math.sqrt(13.0)))) < 1e-9)
      assert(math.abs(r.getDouble(3) - (math.toDegrees(math.atan2(-2.0, -3.0)) + 360.0)) < 1e-9)
    }
    val flat = (for (x <- 0L to 2L; y <- 0L to 2L) yield (x, y, 7.0)).toDF("x", "y", "v")
    val fr = Raster.terrain(flat, "x", "y", "v").collect()
    assert(fr.length == 1 && fr(0).isNullAt(3) && fr(0).getDouble(2) == 0.0)
    // flat hillshade = 255·cos(zen) = 255·sin(alt)
    assert(math.abs(fr(0).getDouble(4) - 255.0 * math.sin(math.toRadians(45.0))) < 1e-9)
  }

  test("terrain indices: plane closed forms (TRI 2.75, TPI 0, roughness 10)") {
    val plane = (for (x <- 0L to 2L; y <- 0L to 2L) yield (x, y, (2 * x + 3 * y).toDouble))
      .toDF("x", "y", "v")
    val r = Raster.terrainIndices(plane, "x", "y", "v").collect()
    assert(r.length == 1)
    assert(r(0).getDouble(2) == 2.75 && r(0).getDouble(3) == 0.0
      && r(0).getDouble(4) == 10.0)
  }

  test("flow direction: steepest descent, pits, flats, tie to smallest code") {
    def dirOf(rows: Seq[Seq[Double]]): Int = {
      val r = Raster.flowDirection(dem(rows), "x", "y", "v").collect()
      assert(r.length == 1); r(0).getInt(2)
    }
    // plane 2x+3y: steepest descent is SW (drop 5/sqrt2 > S's 3) = 8
    val plane = (for (x <- 0L to 2L; y <- 0L to 2L) yield (x, y, (2 * x + 3 * y).toDouble))
      .toDF("x", "y", "v")
    val p = Raster.flowDirection(plane, "x", "y", "v").collect()
    assert(p.length == 1 && p(0).getInt(2) == 8)
    // pit: all neighbors higher -> 0; flat -> 0
    assert(dirOf(Seq(Seq(5, 5, 5), Seq(5, 1, 5), Seq(5, 5, 5))) == 0)
    assert(dirOf(Seq(Seq(7, 7, 7), Seq(7, 7, 7), Seq(7, 7, 7))) == 0)
    // equal drops E and W: smallest code (E = 1) wins
    assert(dirOf(Seq(Seq(9, 9, 9), Seq(3, 5, 3), Seq(9, 9, 9))) == 1)
    // single lower neighbor due north -> 64
    assert(dirOf(Seq(Seq(9, 2, 9), Seq(9, 5, 9), Seq(9, 9, 9))) == 64)
  }

  test("flow accumulation matches a driver-side D8 simulation") {
    // deterministic bumpy DEM — mixes chains, confluences, pits
    def v(x: Long, y: Long): Double = ((3 * x * x + 2 * y * y + x * y) % 23).toDouble
    val cells = for (x <- 0L to 9L; y <- 0L to 7L) yield (x, y, v(x, y))
    val g = cells.toDF("x", "y", "v")
    // oracle: local D8 (same drop rule) + ancestor counting
    val inv = 1.0 / math.sqrt(2.0)
    val dirs = Seq((1, 0, 1.0), (1, -1, inv), (0, -1, 1.0), (-1, -1, inv),
      (-1, 0, 1.0), (-1, 1, inv), (0, 1, 1.0), (1, 1, inv))
    val down = (for (x <- 1L to 8L; y <- 1L to 6L) yield {
      val drops = dirs.map { case (ddx, ddy, w) => ((v(x, y) - v(x + ddx, y + ddy)) * w, (ddx, ddy)) }
      val best = drops.maxBy(_._1)
      if (best._1 > 0) Some((x, y) -> (x + best._2._1, y + best._2._2)) else None
    }).flatten.toMap
    val acc = collection.mutable.Map.empty[(Long, Long), Long].withDefaultValue(0L)
    for (start <- down.keys) {
      var cur = down.get(start)
      while (cur.isDefined) { acc(cur.get) += 1; cur = down.get(cur.get) }
    }
    val got = Raster.flowAccumulation(g, "x", "y", "v")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got.size == cells.size)
    cells.foreach { case (x, y, _) =>
      assert(got((x, y)) == acc((x, y)), s"($x,$y): got ${got((x, y))} want ${acc((x, y))}")
    }
    assert(got.values.max > 2, "fixture should have a real confluence")
  }

  test("flow accumulation handles signed (negative) grid coordinates") {
    def v(x: Long, y: Long): Double = ((3 * x * x + 2 * y * y + x * y) % 23).toDouble
    def run(x0: Long, y0: Long) = {
      val cells = for (x <- x0 to x0 + 7L; y <- y0 to y0 + 5L) yield (x, y, v(x - x0, y - y0))
      Raster.flowAccumulation(cells.toDF("x", "y", "v"), "x", "y", "v")
        .collect().map(r => (r.getLong(0) - x0, r.getLong(1) - y0) -> r.getLong(2)).toMap
    }
    // the same field shifted into negative coordinates must produce
    // the identical accumulation pattern
    assert(run(0L, 0L) == run(-4L, -3L))
  }

  test("idw: single-sample identity, symmetric average, exact-hit override") {
    import graft.operators.Raster
    val pts = Seq((0.0, 0.0, 10.0), (2.0, 0.0, 30.0), (50.0, 50.0, 99.0))
      .toDF("px", "py", "v")
    val tgts = Seq((1L, 1.0, 0.0), (2L, -4.0, 0.0), (3L, 0.0, 0.0), (4L, 20.0, 20.0))
      .toDF("id", "tx", "ty")
    val out = Raster.idw(pts, "px", "py", "v", tgts, "id", "tx", "ty",
        radius = 5.0, level = 5)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap
    // symmetric between the two samples -> plain average
    assert(out(1L)._1 == 20.0 && out(1L)._2 == 2)
    // only (0,0) in range of (-4,0) -> its value
    assert(out(2L)._1 == 10.0 && out(2L)._2 == 1)
    // exact hit -> sample value even with another sample in range
    assert(out(3L)._1 == 10.0 && out(3L)._2 == 2)
    // out of range of everything -> absent
    assert(!out.contains(4L))
  }

  test("kde: center sample closed form, 3x3 spread, parallelism-invariant") {
    // one sample exactly at a level-2 cell center: own-cell weight =
    // scale * exp(0) = scale; 8 neighbors get lower positive weights
    val level = 2
    val step = 360.0 / 4; val latStep = 180.0 / 4
    val pts = Seq((-180.0 + 1.5 * step, 90.0 - 1.5 * latStep)).toDF("px", "py")
    val out = Raster.kdeCells(pts, "px", "py", level, bandwidth = 60.0)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out.size == 9)
    assert(out.values.map(_._1).max == (1L << 20))
    assert(out.values.forall(v => v._1 > 0 && v._2 == 1))
    val many = (0 until 200).map { i =>
      var h = 3L + i * 2654435761L
      h ^= h >>> 33; h *= -49064778989728563L; h ^= h >>> 33
      ((math.abs(h % 3600) / 10.0) - 180.0,
        { h *= -4265267296055464877L; h ^= h >>> 32; (math.abs(h % 1700) / 10.0) - 85.0 })
    }.toDF("px", "py")
    def run(parts: Int) = Raster.kdeCells(many.repartition(parts), "px", "py", 3, 20.0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    assert(run(1) == run(7))
  }

  test("hotspots: constant field null, peak positive, ring negative") {
    val flat = (for (x <- 0L to 4L; y <- 0L to 4L) yield (x, y, 5.0)).toDF("x", "y", "v")
    assert(Raster.hotspots(flat, "x", "y", "v").collect().forall(_.isNullAt(2)))
    val peak = (for (x <- 0L to 6L; y <- 0L to 6L)
      yield (x, y, if (x == 3 && y == 3) 100.0 else 0.0)).toDF("x", "y", "v")
    val z = Raster.hotspots(peak, "x", "y", "v")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // the peak and its 8 neighbors are hot; far corners are cold
    assert(z((3L, 3L)) > 2.0 && z((2L, 2L)) > 2.0)
    assert(z((0L, 0L)) < 0.0 && z((6L, 6L)) < 0.0)
  }

  test("morans I: gradient positive, stripes negative, flat null") {
    def iOf(vf: (Long, Long) => Double): Option[Double] = {
      val g = (for (x <- 0L to 7L; y <- 0L to 7L) yield (x, y, vf(x, y)))
        .toDF("x", "y", "v")
      val r = Raster.moransI(g, "x", "y", "v").collect()(0)
      if (r.isNullAt(2)) None else Some(r.getDouble(2))
    }
    assert(iOf((x, y) => (x + y).toDouble).exists(_ > 0.5))
    assert(iOf((x, y) => (x % 2 * 10).toDouble).exists(_ < -0.2)) // stripes: 6 of 8 queen neighbors differ
    assert(iOf((_, _) => 3.0).isEmpty)
  }

  test("terrain and focal stats bit-identical at any parallelism") {
    val g = (for (x <- 0L to 12L; y <- 0L to 12L)
      yield (x, y, ((3 * x * x + 2 * y * y + x * y) % 97).toDouble)).toDF("x", "y", "v")
    def runT(parts: Int) = Raster.terrain(g.repartition(parts), "x", "y", "v")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        if (r.isNullAt(3)) Double.NaN else r.getDouble(3), r.getDouble(4)))
      .sortBy(t => (t._1, t._2)).toSeq
    def runF(parts: Int) = Raster.focalStats(g.repartition(parts), "x", "y", "v")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6)))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(runT(1) == runT(7))
    assert(runF(1) == runF(7))
  }
}
