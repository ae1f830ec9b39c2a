package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Deterministic Common-Crawl-style corpus synthesis + extraction
 * (BASELINE.json input_hint: url, warc_ts, html, text, lang).
 *
 * Everything is a pure function of the row id — no RNG, no wall clock —
 * so any run at any parallelism produces byte-identical pages, and the
 * "byte-identical extracted text per url" invariant is testable by
 * construction (extractText(synth(html)) == synth(text) exactly).
 *
 * Geo-entity mentions are embedded as `geo:lon,lat` spans with exact
 * decimal coordinates derived from integer arithmetic on the id
 * (pseudo-random but reproducible in ANSI SQL — the DuckDB oracle
 * re-derives identical values).
 */
object WebCorpus {

  /** Fixed epoch for warc_ts (2024-01-01T00:00:00Z). */
  final val Epoch = 1704067200L

  /** Synthesize `n` pages. Schema: url, warc_ts, html(binary), text, lang.
    *
    * Partition count is 4× the default parallelism: a stage with
    * exactly one task per core has ZERO wave slack — any task-duration
    * jitter (co-tenant bursts, skewed splits) idles every other core
    * until the straggler finishes. Four waves let the scheduler
    * rebalance, which matters MOST at high core counts (measured: a
    * one-wave 32-thread stage ran at 25% utilization under jitter). */
  def pages(spark: SparkSession, n: Long): DataFrame = {
    val langs = array(lit("en"), lit("de"), lit("fr"), lit("es"), lit("zh"))
    spark.range(0, n, 1, spark.sparkContext.defaultParallelism * 4)
      .withColumn("url",
        concat(lit("https://host"), pmod(col("id") * 2654435761L, lit(997L)),
          lit(".example/page/"), col("id")))
      .withColumn("warc_ts",
        timestamp_seconds(lit(Epoch) + pmod(col("id") * 7919L, lit(86400L * 365))))
      .withColumn("lang", langs(pmod(col("id") * 31L, lit(5L)).cast("int")))
      // two geo mentions per page, exact 3-decimal coordinates
      .withColumn("lon1", (pmod(col("id") * 48271L, lit(360000L)) - 180000L) / lit(1000.0))
      .withColumn("lat1", (pmod(col("id") * 69621L, lit(170000L)) - 85000L) / lit(1000.0))
      .withColumn("lon2", (pmod(col("id") * 16807L + 13L, lit(360000L)) - 180000L) / lit(1000.0))
      .withColumn("lat2", (pmod(col("id") * 39916801L + 7L, lit(170000L)) - 85000L) / lit(1000.0))
      .withColumn("text",
        concat(lit("Doc "), col("id"), lit(" in "), col("lang"),
          lit(" mentions geo:"), col("lon1"), lit(","), col("lat1"),
          lit(" and geo:"), col("lon2"), lit(","), col("lat2"), lit(" end.")))
      .withColumn("html",
        concat(lit("<html><head><title>"), col("id"),
          lit("</title></head><body><p>"), col("text"),
          lit("</p></body></html>")).cast("binary"))
      .select("url", "warc_ts", "html", "text", "lang", "id")
  }

  /** Extraction rule: the text between `<p>` and `</p>` — byte-exact
    * inverse of the synthesis template. */
  def extractText(pagesDf: DataFrame): DataFrame =
    pagesDf.withColumn("extracted_text",
      regexp_extract(col("html").cast("string"), "(?s)<p>(.*)</p>", 1))

  /** Geo-entity extraction: every `geo:lon,lat` span → one point row
    * (url, lon, lat, mention_idx). One regex pass finds the spans; the
    * lon/lat split inside a span is fixed-shape (`geo:` prefix, one
    * comma), so it parses with codegen'd substring ops — regex is the
    * hottest allocator in the pipeline and two extra passes per mention
    * measurably inflate CPU at high thread counts. */
  def extractEntities(pagesDf: DataFrame): DataFrame = {
    val mentions = regexp_extract_all(col("text"), lit("geo:(-?[0-9.]+),(-?[0-9.]+)"), lit(0))
    pagesDf
      .select(col("url"), col("id"), posexplode(mentions).as(Seq("mention_idx", "m")))
      // m = "geo:<lon>,<lat>": strip through ':', then split at ','
      .withColumn("ll", substring_index(col("m"), ":", -1))
      .withColumn("lon", substring_index(col("ll"), ",", 1).cast("double"))
      .withColumn("lat", substring_index(col("ll"), ",", -1).cast("double"))
      .drop("m", "ll")
  }

  /**
   * Deterministic admin-polygon dimension: `k` non-convex star
   * polygons with exact-rational vertices (reproducible in SQL).
   * Polygon i is an 8-vertex star centred at an exact lattice point.
   */
  def adminPolygons(spark: SparkSession, k: Int): DataFrame = {
    import spark.implicits._
    val dirs = Array((1.0, 0.0), (0.7, 0.7), (0.0, 1.0), (-0.7, 0.7),
      (-1.0, 0.0), (-0.7, -0.7), (0.0, -1.0), (0.7, -0.7))
    (0 until k).map { i =>
      val clon = ((i * 67) % 300) - 150 + 0.5
      val clat = ((i * 41) % 120) - 60 + 0.5
      val verts = (0 until 8).map { j =>
        val r = 1.0 + ((i + j) % 3) * 2.0
        (clon + r * dirs(j)._1, clat + r * dirs(j)._2)
      }
      val wkt = "POLYGON((" +
        (verts :+ verts.head).map { case (x, y) => s"$x $y" }.mkString(",") + "))"
      (i, wkt)
    }.toDF("poly_id", "wkt")
      .withColumn("geom", graft.sql.functions.st_geomfromtext(col("wkt")))
      .drop("wkt")
  }
}
