package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import graft.kernels.Shapes

/**
 * Distributed LOF outlier scoring (Breunig et al. 2000; the
 * reference's OutlierDetection, geo/src/algorithm/outlier_detection.rs:23):
 * points are grouped by a key (e.g. their coarse cell — each group is
 * one executor-local task), each group's LOF scores computed by the
 * pure kernel. The group is the parallelism unit, so the operator
 * scales with the number of cells, and per-task memory is bounded by
 * the densest cell (salt hot cells upstream if needed).
 */
object Outliers {

  /** df must have (keyCol: long-castable, idCol: long, lonCol, latCol).
    * Returns (key, id, lof). */
  def lofPerGroup(df: DataFrame, keyCol: String, idCol: String,
      lonCol: String, latCol: String, k: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val ds = df.select(
      col(keyCol).cast("long").as("key"),
      col(idCol).cast("long").as("id"),
      col(lonCol).cast("double").as("x"),
      col(latCol).cast("double").as("y")).as[(Long, Long, Double, Double)]
    ds.groupByKey(_._1)
      .flatMapGroups { (key, it) =>
        val rows = it.toArray
        val coords = new Array[Double](rows.length * 2)
        var i = 0
        while (i < rows.length) { coords(2 * i) = rows(i)._3; coords(2 * i + 1) = rows(i)._4; i += 1 }
        val scores = Shapes.lofScores(coords, k)
        rows.indices.map(j => (key, rows(j)._2, scores(j)))
      }
      .toDF("key", "id", "lof")
  }
}
