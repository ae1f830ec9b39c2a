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

  // ------------------------------------------------ custom state

  final case class CellEvent(cell: Long, ts: java.sql.Timestamp, lon: Double, lat: Double) {
    def tsSec: Long = ts.getTime / 1000L
  }
  final case class SessionState(start: Long, last: Long, n: Long,
      sumLon: Double, sumLat: Double)
  final case class CellSession(cell: Long, startSec: Long, endSec: Long,
      events: Long, centroidLon: Double, centroidLat: Double)

  /**
   * Per-cell visit sessionization with CUSTOM state
   * (`flatMapGroupsWithState`): events for a cell belong to one
   * session while their gaps stay under `gapSec`; a session closes —
   * and is emitted — when a later event exceeds the gap or the group
   * times out past the watermark. State per key is one open session
   * (five numbers), so state size is O(active cells), independent of
   * event volume; the key is the cell id, so state partitioning
   * matches the batch engine's cell partitioning.
   */
  def sessionize(events: DataFrame, level: Int, gapSec: Long = 1800): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = events.sparkSession
    import spark.implicits._
    val ds = events
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", s"${2 * gapSec} seconds")
      .withColumn("cell", gf.st_cellid(lit(level), col("lon"), col("lat")))
      .select(col("cell"), col("ts"), col("lon"), col("lat"))
      .as[CellEvent] // `ts` keeps the watermark attribute in scope

    def fn(cell: Long, events: Iterator[CellEvent],
        state: GroupState[SessionState]): Iterator[CellSession] = {
      val out = scala.collection.mutable.ArrayBuffer[CellSession]()
      def close(s: SessionState): Unit =
        out += CellSession(cell, s.start, s.last, s.n, s.sumLon / s.n, s.sumLat / s.n)
      if (state.hasTimedOut) {
        state.getOption.foreach(close)
        state.remove()
      } else {
        var cur = state.getOption.orNull
        events.toSeq.sortBy(_.tsSec).foreach { e =>
          cur match {
            case null =>
              cur = SessionState(e.tsSec, e.tsSec, 1, e.lon, e.lat)
            case s if e.tsSec - s.last > gapSec =>
              close(s)
              cur = SessionState(e.tsSec, e.tsSec, 1, e.lon, e.lat)
            case s =>
              cur = SessionState(s.start, Math.max(s.last, e.tsSec), s.n + 1,
                s.sumLon + e.lon, s.sumLat + e.lat)
          }
        }
        if (cur != null) {
          state.update(cur)
          state.setTimeoutTimestamp((cur.last + gapSec) * 1000L)
        }
      }
      out.iterator
    }

    ds.groupByKey(_.cell)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(fn)
      .toDF()
  }

  /** Drive a streaming query synchronously from parquet files (test /
    * local harness: file source + memory sink + processAllAvailable). */
  def runOnce(spark: SparkSession, source: String, schemaOf: String,
      build: DataFrame => DataFrame, queryName: String,
      mode: String = "complete"): DataFrame = {
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
      .outputMode(mode)
      .format("memory")
      .queryName(queryName)
      .start()
    try q.processAllAvailable() finally q.stop()
    spark.table(queryName)
  }
}
