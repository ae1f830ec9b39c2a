package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sql.{functions => gf}

/**
 * Structured Streaming surface (the reference has no streams —
 * SURVEY.md §2.6 — so this is host-engine capability): a streaming
 * geo-event pipeline with watermarked windowed aggregation per cell,
 * and the stateful sessionization shape for per-entity tracking.
 *
 * At scale: the aggregation state is keyed by (cell, window), so state
 * distributes with the same cell partitioning as the batch engine, and
 * watermarks bound state size.
 */
object GeoStream {

  /** Windowed per-cell event counts over a stream with columns
    * (ts: timestamp, lon: double, lat: double, value: double). */
  def cellCounts(events: DataFrame, level: Int,
      windowDur: String = "5 minutes", watermark: String = "10 minutes"): DataFrame =
    events
      .withColumn("ts", col("ts").cast("timestamp")) // NTZ sources → event time
      .withColumn("cell", gf.st_cellid(lit(level), col("lon"), col("lat")))
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowDur), col("cell"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("value_sum"))

  /** Windowed per-type counts of the generic events table shape
    * (event_type, ts, value). */
  def typeCounts(events: DataFrame,
      windowDur: String = "1 hour", watermark: String = "2 hours"): DataFrame =
    events
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowDur), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("value_sum"))

  /** Drive a streaming query synchronously from parquet files (test /
    * local harness: file source + memory sink + processAllAvailable). */
  def runOnce(spark: SparkSession, source: String, schemaOf: String,
      build: DataFrame => DataFrame, queryName: String): DataFrame = {
    val schema = spark.read.parquet(schemaOf).schema
    // the file stream source requires a directory; stage single files
    val srcPath = java.nio.file.Paths.get(source)
    val sourceDir =
      if (java.nio.file.Files.isRegularFile(srcPath)) {
        val d = java.nio.file.Files.createTempDirectory("graft_stream")
        java.nio.file.Files.copy(srcPath, d.resolve(srcPath.getFileName))
        d.toString
      } else source
    val stream = spark.readStream.schema(schema).parquet(sourceDir)
    val q = build(stream).writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(queryName)
      .start()
    try q.processAllAvailable() finally q.stop()
    spark.table(queryName)
  }
}
