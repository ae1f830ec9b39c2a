package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.SpatialJoins
import graft.sql.{functions => gf}

/**
 * The flagship spatial-join + tiling pipeline (north rule): synthesize
 * Common-Crawl-style pages → extract geo entities → broadcast PIP join
 * against admin polygons → tile every point into cells → rasterize.
 * Every stage checkpoints through the Iceberg-style manifest layer and
 * the whole run resumes from the last completed stage.
 *
 * Plan shape at scale (1000 executors / 100 TB):
 *  - synthesis/extraction: embarrassingly parallel, no shuffle;
 *  - PIP join: polygons exploded to covering cells and BROADCAST —
 *    the probe side never shuffles; refine predicate is codegen'd;
 *  - tiling: narrow map (cell id per point);
 *  - rasterize: single groupBy(cell) with map-side combine; hot cells
 *    (dense metros) are handled by deterministic salting when counts
 *    exceed the threshold (SpatialJoins.saltedCellJoin).
 */
object GeoPipeline {

  final case class Result(
      pages: Long, points: Long, joinRows: Long, tiles: Long, cells: Long,
      wallMs: Long)

  def run(spark: SparkSession, nPages: Long, checkpointRoot: String,
      numPolys: Int = 16, cellLevel: Int = 12, joinLevel: Int = 6): Result = {
    val t0 = System.nanoTime()
    val cp = new Checkpoint(spark, checkpointRoot)

    val pages = cp.stage("s1_pages") { WebCorpus.pages(spark, nPages) }
    val entities = cp.stage("s2_entities") { WebCorpus.extractEntities(pages) }
    val polys = WebCorpus.adminPolygons(spark, numPolys) // tiny dimension, rebuilt

    // s3 (join) and s4→s5 (tiling/raster) both depend only on s2 —
    // submit the two chains CONCURRENTLY so one chain's stage
    // boundaries (write tail, commit, manifest) overlap the other's
    // compute. Spark's scheduler interleaves jobs from different
    // threads; on a cluster this is the standard multi-job driver
    // shape, and locally it lifts executor-thread utilization (the
    // 4N run gains the most: idle slots are 4× wider).
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    val fJoin = Future {
      cp.stage("s3_pip_join") {
        SpatialJoins.broadcastPipJoin(entities, "lon", "lat", polys, "geom", joinLevel)
          .select(col("url"), col("id"), col("mention_idx"), col("lon"), col("lat"), col("poly_id"))
      }
    }
    val fRaster = Future {
      val tiles = cp.stage("s4_tiles") {
        entities.withColumn("cell", gf.st_cellid(lit(cellLevel), col("lon"), col("lat")))
          .select("url", "mention_idx", "cell")
      }
      cp.stage("s5_raster") {
        tiles.groupBy("cell").agg(count(lit(1)).as("n"))
      }
    }
    Await.result(fJoin, Duration.Inf)
    Await.result(fRaster, Duration.Inf)

    Result(
      pages = cp.stageRows("s1_pages"),
      points = cp.stageRows("s2_entities"),
      joinRows = cp.stageRows("s3_pip_join"),
      tiles = cp.stageRows("s4_tiles"),
      cells = cp.stageRows("s5_raster"),
      wallMs = (System.nanoTime() - t0) / 1000000)
  }
}
