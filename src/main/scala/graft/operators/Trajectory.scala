package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

import graft.kernels.Sphere
import graft.sql.{functions => gf}

/**
 * Trajectory mining over (user, ts, lon, lat) streams of GPS-like
 * fixes — the classic stay-point detector of Li et al. 2008 ("Mining
 * user similarity based on location history", ACM GIS), anchor-based:
 * starting at an anchor fix, extend the run while every later fix
 * stays within `distM` meters (haversine) of the ANCHOR; when the run
 * spans at least `minDurSec` seconds it emits one stay (time span,
 * fix count, arithmetic-mean centroid) and scanning resumes after it.
 *
 * Scale: one shuffle keyed by user (flatMapGroups), per-group state is
 * one trajectory (bounded by a user's fix count — the natural unit no
 * algorithm can avoid reading in order); the scan is O(n) two-pointer.
 * Deterministic: fixes sort by (ts, lon, lat) so ties cannot reorder,
 * and the centroid mean accumulates in that fixed order.
 */
object Trajectory {

  val staySchema: StructType = StructType(Seq(
    StructField("user", LongType, nullable = false),
    StructField("start_ts", LongType, nullable = false),
    StructField("end_ts", LongType, nullable = false),
    StructField("n_fixes", IntegerType, nullable = false),
    StructField("clon", DoubleType, nullable = false),
    StructField("clat", DoubleType, nullable = false)))

  def stayPoints(df: DataFrame, userCol: String, tsCol: String,
      lonCol: String, latCol: String,
      distM: Double, minDurSec: Long): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val ds = df.select(col(userCol).cast("long"),
        col(tsCol).cast("long"), col(lonCol).cast("double"),
        col(latCol).cast("double"))
      .as[(Long, Long, Double, Double)]
    val stays = ds.groupByKey(_._1).flatMapGroups { (user, it) =>
      val fixes = it.toArray.sortBy(t => (t._2, t._3, t._4))
      val out = scala.collection.mutable.ArrayBuffer.empty[Row]
      var i = 0
      while (i < fixes.length) {
        var j = i + 1
        while (j < fixes.length &&
            Sphere.haversineDistance(fixes(i)._3, fixes(i)._4,
              fixes(j)._3, fixes(j)._4) <= distM) {
          j += 1
        }
        // run [i, j) anchored at i
        if (j - i >= 2 && fixes(j - 1)._2 - fixes(i)._2 >= minDurSec) {
          var sx = 0.0; var sy = 0.0
          var k = i
          while (k < j) { sx += fixes(k)._3; sy += fixes(k)._4; k += 1 }
          val n = j - i
          out += Row(user, fixes(i)._2, fixes(j - 1)._2, n, sx / n, sy / n)
          i = j
        } else i += 1
      }
      out.iterator
    }(org.apache.spark.sql.Encoders.row(staySchema))
    stays.toDF()
  }

  /**
   * Per-fix kinematic enrichment: haversine speed (m/s) and compass
   * heading from the PREVIOUS fix of the same entity, in the
   * deterministic (ts, lon, lat) trajectory order every operator here
   * uses. First fixes and zero-dt repeats carry null speed; heading is
   * the great-circle initial bearing (null on the first fix). One
   * shuffle — the entity-keyed lag window; everything else is
   * codegen'd column work.
   */
  def kinematics(df: DataFrame, userCol: String, tsCol: String,
      lonCol: String, latCol: String): DataFrame = {
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol).cast("timestamp").cast("long"), col(lonCol), col(latCol))
    val ts = col(tsCol).cast("timestamp").cast("long")
    val prevTs = lag(ts, 1).over(w)
    val prevLon = lag(col(lonCol), 1).over(w)
    val prevLat = lag(col(latCol), 1).over(w)
    df.withColumn("__pts", prevTs)
      .withColumn("__plon", prevLon)
      .withColumn("__plat", prevLat)
      .withColumn("dist_m", when(col("__plon").isNotNull,
        gf.st_distance_sphere(gf.st_point(col("__plon"), col("__plat")),
          gf.st_point(col(lonCol), col(latCol)))))
      .withColumn("dt_sec", ts - col("__pts"))
      .withColumn("speed_mps",
        when(col("dt_sec") > 0, col("dist_m") / col("dt_sec")))
      .withColumn("heading_deg", when(col("__plon").isNotNull,
        gf.st_bearing(gf.st_point(col("__plon"), col("__plat")),
          gf.st_point(col(lonCol), col(latCol)))))
      .drop("__pts", "__plon", "__plat")
  }

  /**
   * Origin-destination matrix: count entity transitions between cells
   * at `level` — consecutive fixes (same deterministic order) whose
   * cells DIFFER become one flow edge, aggregated to (origin_cell,
   * dest_cell, flows, entities). The entity-keyed lag window is the
   * only row-sized shuffle; the flow aggregation is map-side combined
   * and its cardinality is bounded by occupied cell pairs. This is
   * the standard mobility-matrix reduction (and the edge-list input
   * for [[Network.shortestPaths]] when weighted by flow).
   */
  def odMatrix(df: DataFrame, userCol: String, tsCol: String,
      lonCol: String, latCol: String, level: Int): DataFrame = {
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol).cast("timestamp").cast("long"), col(lonCol), col(latCol))
    val cell = gf.st_cellid(lit(level), col(lonCol), col(latCol))
    df.withColumn("__dcell", cell)
      .withColumn("__ocell", lag(col("__dcell"), 1).over(w))
      .filter(col("__ocell").isNotNull && col("__ocell") =!= col("__dcell"))
      .groupBy(col("__ocell").as("origin_cell"), col("__dcell").as("dest_cell"))
      .agg(count(lit(1)).as("flows"),
        countDistinct(col(userCol)).as("entities"))
  }
}
