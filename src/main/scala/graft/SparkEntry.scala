package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001: the spatial-join +
    * tiling pipeline (synthesized corpus → extract geo entities →
    * broadcast PIP join vs admin polygons → per-polygon page counts).
    * Driver smoke-checks rows > 0. */
  def entry(spark: SparkSession): DataFrame = {
    graft.sql.functions.register(spark)
    val pages = pipeline.WebCorpus.pages(spark, 2000)
    val ents = pipeline.WebCorpus.extractEntities(pages)
    val polys = pipeline.WebCorpus.adminPolygons(spark, 16)
    operators.SpatialJoins.broadcastPipJoin(ents, "lon", "lat", polys, "geom", 6)
      .groupBy("poly_id").agg(count(lit(1)).as("pages"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Queries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (hulls, RDP, LSH pipelines) → driver records a rows-only check. */
  def oracleSql: Map[String, String] = Queries.oracles
}
