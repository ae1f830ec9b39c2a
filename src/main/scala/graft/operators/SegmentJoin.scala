package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.index.CellId
import graft.kernels.{SegIntersect, Sweep}

/**
 * Distributed all-pairs segment intersection (the scale form of the
 * reference's Bentley-Ottmann `Intersections` iterator, SURVEY.md §2.3
 * row "sweep"): explode segments to covering cells at `level`, run the
 * local sweep per cell, and report each intersecting pair exactly once
 * (a hit is kept only in the cell that contains its intersection point
 * — the reporting-cell rule, no distinct shuffle).
 */
object SegmentJoin {

  /**
   * @param segs columns (seg_id: long, x1, y1, x2, y2: double)
   * @return (a, b, kind, ix, iy) — kind 1 proper, 2 improper/touch,
   *         3 collinear overlap (ix,iy = overlap midpoint)
   */
  def intersectionJoin(segs: DataFrame, level: Int): DataFrame = {
    val spark = segs.sparkSession
    import spark.implicits._
    val typed = segs.select(
      col("seg_id").cast("long"), col("x1").cast("double"), col("y1").cast("double"),
      col("x2").cast("double"), col("y2").cast("double"))
      .as[(Long, Double, Double, Double, Double)]

    // explode each segment to the cells its bbox covers at `level`
    val celled = typed.flatMap { case (id, x1, y1, x2, y2) =>
      CellId.coveringForBbox(level,
        Math.min(x1, x2), Math.min(y1, y2), Math.max(x1, x2), Math.max(y1, y2))
        .map(cell => (cell, id, x1, y1, x2, y2))
    }

    celled.groupByKey(_._1).flatMapGroups { (cell, it) =>
      val rows = it.toArray
      val coords = new Array[Double](rows.length * 4)
      val ids = new Array[Int](rows.length)
      val longIds = new Array[Long](rows.length)
      var i = 0
      while (i < rows.length) {
        ids(i) = i
        longIds(i) = rows(i)._2
        coords(4 * i) = rows(i)._3; coords(4 * i + 1) = rows(i)._4
        coords(4 * i + 2) = rows(i)._5; coords(4 * i + 3) = rows(i)._6
        i += 1
      }
      Sweep.intersections(coords, ids).iterator
        .filter(h => longIds(h.a) != longIds(h.b))
        .map { h =>
          val r = h.result
          val (ix, iy) = r.kind match {
            case SegIntersect.CollinearOverlap => ((r.x0 + r.x1) / 2.0, (r.y0 + r.y1) / 2.0)
            case _ => (r.x0, r.y0)
          }
          val (a, b) = if (longIds(h.a) < longIds(h.b)) (longIds(h.a), longIds(h.b))
            else (longIds(h.b), longIds(h.a))
          (cell, a, b, r.kind, ix, iy)
        }
        // reporting-cell dedupe: emit only where the hit point falls
        .filter { case (c, _, _, _, ix, iy) => CellId.cellId(level, ix, iy) == c }
    }.toDF("cell", "a", "b", "kind", "ix", "iy")
      .drop("cell")
      .dropDuplicates("a", "b") // guards hits exactly on cell borders
  }
}
