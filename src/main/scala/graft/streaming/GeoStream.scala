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

  /** Guarded driver-side pull of a STATIC dimension side before it
    * broadcasts. Correct for dimension tables (zones, road segments,
    * reference histories) — but nothing used to fail fast when a
    * caller passed a FACT table here, and an unbounded collect is a
    * driver OOM at cluster scale. The guard pulls at most one row
    * past the bound (`limit`, not a second job) and names the
    * distributed batch twin to use instead. Bound configurable via
    * `spark.graft.stream.maxDimensionRows` (default 2,000,000 —
    * ~100 MB of broadcast at typical row widths). */
  private def collectDimension(dim: DataFrame, what: String,
      batchTwin: String): Array[org.apache.spark.sql.Row] = {
    val max = dim.sparkSession.conf
      .getOption("spark.graft.stream.maxDimensionRows")
      .map(_.toLong).getOrElse(2000000L)
    val cap = math.min(max + 1L, Int.MaxValue.toLong).toInt
    val rows = dim.limit(cap).collect()
    require(rows.length <= max,
      s"$what has more than $max rows — too large to broadcast as a " +
        s"streaming dimension. Use the distributed batch twin " +
        s"($batchTwin), or raise spark.graft.stream.maxDimensionRows " +
        s"if the driver really has the memory.")
    rows
  }

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

  /** Streaming exact dedup for a document ingest (url/text stream):
    * watermark + dropDuplicates on the content hash. State is one
    * compact key (hash) per distinct document inside the watermark
    * horizon — the streaming face of TrainingData.dedupExact.
    * dropDuplicatesWithinWatermark (not plain dropDuplicates) so the
    * dedup state is EVICTED once the watermark passes it; unbounded
    * state on a 10^12-doc ingest would OOM the state store. */
  def dedupExactStream(docs: DataFrame, tsCol: String, textCol: String,
      watermark: String = "1 hour"): DataFrame =
    docs
      .withColumn(tsCol, col(tsCol).cast("timestamp"))
      .withColumn("content_md5", md5(col(textCol).cast("binary")))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("content_md5")

  /** Stream-static broadcast PIP join: a point stream against a static
    * polygon dimension. Identical candidate/refine shape to the batch
    * `SpatialJoins.broadcastPipJoin` — the static side explodes to its
    * cell covering once and broadcasts, the stream side never shuffles,
    * and the refine predicate stays inside whole-stage codegen.
    * Stream-static inner joins are stateless in Structured Streaming,
    * so this scales with the stream's micro-batch size only. */
  def pipJoinStream(points: DataFrame, lonCol: String, latCol: String,
      polys: DataFrame, geomCol: String, level: Int): DataFrame =
    graft.operators.SpatialJoins.broadcastPipJoin(
      points, lonCol, latCol, polys, geomCol, level)

  /** Stream-static distance-within join: a point stream against a
    * static point dimension within `radius` planar degrees. Same
    * cell-neighborhood shape as the batch
    * `SpatialJoins.withinDistanceJoin` — the static side replicates to
    * its 3×3 neighbour cells IN-ROW (array_distinct + explode, no
    * shuffle), the stream side keys to its single cell, and the
    * stream-static inner join is stateless, so state never
    * accumulates across micro-batches. */
  def dwithinJoinStream(points: DataFrame, lonCol: String, latCol: String,
      targets: DataFrame, tLonCol: String, tLatCol: String,
      radius: Double, level: Int): DataFrame =
    graft.operators.SpatialJoins.withinDistanceJoin(
      points, lonCol, latCol, targets, tLonCol, tLatCol, radius, level)

  /** Stream-static zonal statistics: a valued point stream aggregated
    * over a static polygon-zone dimension per event-time window. The
    * zone assignment is the stateless broadcast PIP join (covering
    * cells on the broadcast side, cell prefilter + codegen'd refine —
    * the streaming face of `SpatialJoins.zonalStats`, with the stream
    * point itself as the sample instead of a cell center); the only
    * stateful operator is the watermarked windowed aggregation, whose
    * state is ONE accumulator row per (window, zone) — bounded by the
    * zone dimension, never by the stream. */
  def zonalStatsStream(points: DataFrame, tsCol: String, lonCol: String,
      latCol: String, valueCol: String, zones: DataFrame, zoneKey: String,
      geomCol: String, level: Int, windowDur: String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    graft.operators.SpatialJoins.broadcastPipJoin(
        points.withColumn(tsCol, col(tsCol).cast("timestamp"))
          .withWatermark(tsCol, watermark),
        lonCol, latCol, zones, geomCol, level)
      .groupBy(window(col(tsCol), windowDur), col(zoneKey))
      .agg(count(lit(1)).as("n"), sum(col(valueCol)).as("total"))

  final case class StreamProbe(key: Long, lon: Double, lat: Double)

  /** Stream-static kNN join: a point stream against a static point
    * dimension. The static side is bounded by construction (a
    * dimension table), so the scale-correct shape is a broadcast of
    * its raw (lon, lat, key) triples with the quadtree rebuilt once
    * per task from the broadcast — per-row probes are then exact
    * (branch-and-bound kNN), stateless, and need no stream-side
    * aggregation, shuffle, or watermark; the batch engine's
    * multi-pass cogroup (`SpatialJoins.knnJoinQuadtree`) is the
    * distributed-targets twin. Output schema matches the batch twin:
    * (pointKey, targetKey, tLonCol, tLatCol, __dist, __rank). */
  def knnJoinStream(points: DataFrame, lonCol: String, latCol: String,
      pointKey: String, targets: DataFrame, tLonCol: String, tLatCol: String,
      targetKey: String, k: Int): DataFrame = {
    val sp = points.sparkSession
    import sp.implicits._
    val triples: Array[(Double, Double, Long)] = collectDimension(
        targets.select(col(tLonCol).cast("double"), col(tLatCol).cast("double"),
          col(targetKey).cast("long")),
        "kNN target side", "batch SpatialJoins.knnJoinQuadtree")
      .map(r => (r.getDouble(0), r.getDouble(1), r.getLong(2)))
    val bc = sp.sparkContext.broadcast(triples)
    points.select(col(pointKey).cast("long").as("key"),
        col(lonCol).cast("double").as("lon"), col(latCol).cast("double").as("lat"))
      .as[StreamProbe]
      .mapPartitions { it =>
        if (it.isEmpty) Iterator.empty
        else {
          val qt = graft.index.Quadtree.build(bc.value)
          it.flatMap { p =>
            val hits = qt.knn(p.lon, p.lat, k)
            hits.iterator.zipWithIndex.map { case (h, i) =>
              (p.key, h.key, h.lon, h.lat, h.dist, i + 1)
            }
          }
        }
      }
      .toDF(pointKey, targetKey, tLonCol, tLatCol, "__dist", "__rank")
  }

  /** Live MVT tile maintenance: a point stream (lon/lat in EPSG:4326)
    * aggregated into binary vector tiles per (z, tx, ty), refreshed
    * every micro-batch. The whole chain — Mercator forward, tile
    * assignment, integer MVT snap — is stateless column work; the only
    * state is the streaming aggregate itself (the StAsMvtAgg
    * TypedImperativeAggregate's serialized feature buffer in the state
    * store, bounded by tile granularity). Output mode complete/update;
    * batch twin = the same expressions under a plain groupBy. */
  def mvtTilesStream(points: DataFrame, lonCol: String, latCol: String,
      keyCol: String, z: Int, layer: String = "layer"): DataFrame =
    mvtTileExprs(points, lonCol, latCol, keyCol, z)
      .groupBy(col("tx"), col("ty"))
      .agg(gf.st_asmvt(col("__mvt"), col(keyCol), layer, 4096).as("tile"))

  /** Shared column chain for [[mvtTilesStream]] and its batch twin. */
  def mvtTileExprs(points: DataFrame, lonCol: String, latCol: String,
      keyCol: String, z: Int): DataFrame = {
    val half = 20037508.342789244
    val size = half * 2 / (1L << z).toDouble
    points
      // the published Web-Mercator latitude clamp: |lat| < 85.05112878
      // (tan() diverges at the poles; out-of-domain rows drop)
      .filter(abs(col(latCol)) < lit(85.05112878))
      .withColumn("__mx", col(lonCol) / 180.0 * half)
      .withColumn("__my",
        lit(6378137.0) * log(tan(lit(math.Pi / 4) + radians(col(latCol)) / 2)))
      .withColumn("tx", floor((col("__mx") + half) / size).cast("long"))
      .withColumn("ty", floor((lit(half) - col("__my")) / size).cast("long"))
      .withColumn("__mvt", gf.st_asmvtgeom(
        gf.st_point(col("__mx"), col("__my")), lit(z), col("tx"), col("ty")))
  }

  /** Streaming ingest cleaning — the online face of
    * `TrainingData.cleanCorpus`. Boilerplate line frequency is a
    * CORPUS-level statistic no stream can see, so the production shape
    * is an offline dictionary (`TrainingData.boilerplateLines` over a
    * batch snapshot, refreshed on redeploy) applied per row: the
    * dictionary rides in as a literal array (dimension-sized by
    * construction — only corpus-frequent lines), the strip is a pure
    * `filter` lambda over the line split, then PII redaction, the
    * min-words quality gate, and exact content dedup with
    * watermark-evicted state. Everything before the dedup is
    * stateless; the dedup state is one md5 per distinct surviving doc
    * inside the watermark horizon. */
  def cleanStream(docs: DataFrame, tsCol: String, textCol: String,
      boilerplateLines: Seq[String], minWords: Int,
      watermark: String = "1 hour"): DataFrame = {
    val bp = typedLit(boilerplateLines)
    docs
      .withColumn("clean_text",
        graft.operators.TrainingData.redactPii(
          array_join(filter(split(col(textCol), "\n"),
            l => !array_contains(bp, trim(l))), "\n")))
      .filter(size(split(col("clean_text"), "\\s+")) >= minWords)
      .withColumn(tsCol, col(tsCol).cast("timestamp"))
      .withWatermark(tsCol, watermark)
      .withColumn("content_md5", md5(col("clean_text").cast("binary")))
      .dropDuplicatesWithinWatermark("content_md5")
  }

  // ------------------------------------------------ geofencing

  final case class GeoFix(key: Long, ts: java.sql.Timestamp, lon: Double, lat: Double) {
    def tsSec: Long = ts.getTime / 1000L
  }
  /** Per-JVM decoded-zone cache keyed by broadcast id (bounded: one
    * entry per live geofence dimension). */
  private object GeofenceZoneCache {
    private val m = new java.util.concurrent.ConcurrentHashMap[Long, Array[(Long, graft.core.FlatGeom)]]()
    def get(id: Long, mk: () => Array[(Long, graft.core.FlatGeom)]): Array[(Long, graft.core.FlatGeom)] = {
      // restarted queries create fresh broadcast ids; drop stale
      // entries so decoded dimensions never accumulate across restarts
      if (m.size > 8) m.clear()
      m.computeIfAbsent(id, _ => mk())
    }
  }
  final case class GeofenceState(inside: Seq[Long])
  final case class GeofenceEvent(key: Long, zone: Long, ts_sec: Long, event: String)

  /**
   * Streaming geofence monitoring: a GPS-fix stream (key, ts, lon,
   * lat) against a STATIC zone dimension (zoneKey, geomCol) — emits
   * one row per boundary crossing: (key, zone, ts_sec, 'enter'|'exit').
   * Membership is boundary-inclusive (covers — `Planar.coordPos !=
   * Outside`), identical to the batch twin's `st_intersects_xy`.
   *
   * Scale shape: zones are a dimension table by construction, so their
   * WKB broadcasts and each task decodes once; the per-user state is
   * ONE sorted array of currently-occupied zone ids (bounded by the
   * zone dimension, not by the stream), keyed by the entity, so state
   * partitioning follows the entity key. Fixes inside a micro-batch
   * sort by (ts, lon, lat) — the same total order the batch twin's
   * window uses — so replays and batch backfills produce identical
   * event sequences. Cross-batch correctness assumes per-key event-time
   * order across micro-batches (the usual device-upload contract);
   * late fixes older than an already-processed one are a reorder the
   * state cannot undo.
   */
  def geofenceStream(fixes: DataFrame, keyCol: String, tsCol: String,
      lonCol: String, latCol: String, zones: DataFrame, zoneKey: String,
      geomCol: String, watermark: String = "2 hours",
      stateTtlSec: Long = 86400L): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = fixes.sparkSession
    import spark.implicits._
    val zoneRows: Array[(Long, Array[Byte])] = collectDimension(
        zones.select(col(zoneKey).cast("long"), gf.st_aswkb(col(geomCol))),
        "geofence zone side", "batch geofenceBatch / SpatialJoins.broadcastPipJoin")
      .map(r => (r.getLong(0), r.getAs[Array[Byte]](1)))
      .sortBy(_._1)
    val bc = spark.sparkContext.broadcast(zoneRows)

    val ds = fixes
      .withColumn(tsCol, col(tsCol).cast("timestamp"))
      .withWatermark(tsCol, watermark)
      .select(col(keyCol).cast("long").as("key"), col(tsCol).as("ts"),
        col(lonCol).cast("double").as("lon"), col(latCol).cast("double").as("lat"))
      .as[GeoFix]

    val bcId = bc.id
    def fn(key: Long, it: Iterator[GeoFix],
        state: GroupState[GeofenceState]): Iterator[GeofenceEvent] = {
      if (state.hasTimedOut) {
        // TTL eviction bounds the state store to recently-active
        // entities; a re-appearing entity re-announces its zones
        state.remove()
        return Iterator.empty
      }
      // fn runs once per (group, micro-batch): decode the zone WKB once
      // per executor JVM, not once per user
      val zs = GeofenceZoneCache.get(bcId,
        () => bc.value.map { case (id, wkb) => (id, graft.core.Wkb.read(wkb)) })
      val out = scala.collection.mutable.ArrayBuffer.empty[GeofenceEvent]
      var cur: Set[Long] = state.getOption.map(_.inside.toSet).getOrElse(Set.empty)
      var lastTs = Long.MinValue
      it.toSeq.sortBy(f => (f.tsSec, f.lon, f.lat)).foreach { f =>
        val now = zs.iterator.filter { case (_, g) =>
          graft.kernels.Planar.coordPos(g, f.lon, f.lat) != graft.kernels.Planar.Outside
        }.map(_._1).toSet
        // zone-id order keeps the emitted sequence deterministic
        (now -- cur).toSeq.sorted.foreach(z => out += GeofenceEvent(key, z, f.tsSec, "enter"))
        (cur -- now).toSeq.sorted.foreach(z => out += GeofenceEvent(key, z, f.tsSec, "exit"))
        cur = now
        lastTs = f.tsSec
      }
      state.update(GeofenceState(cur.toSeq.sorted))
      if (lastTs != Long.MinValue)
        state.setTimeoutTimestamp(math.max((lastTs + stateTtlSec) * 1000L,
          state.getCurrentWatermarkMs() + 1L))
      out.iterator
    }

    ds.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(fn)
      .toDF()
  }

  final case class LastFix(ts: Long, lon: Double, lat: Double)
  final case class KinematicFix(key: Long, ts_sec: Long, lon: Double, lat: Double,
      dist_m: Option[Double], dt_sec: Option[Long], speed_mps: Option[Double],
      heading_deg: Option[Double])

  /**
   * Streaming kinematic enrichment — the online face of
   * `Trajectory.kinematics`: per-entity state is ONE fix (the last
   * seen), so the state store holds three numbers per active entity
   * regardless of stream volume. Distances/bearings come from the
   * same Sphere kernel the batch expressions call, so a batch backfill
   * and the stream produce bit-identical enrichment for in-order
   * input (the same per-key event-time-order contract as
   * [[geofenceStream]]).
   */
  def kinematicsStream(fixes: DataFrame, keyCol: String, tsCol: String,
      lonCol: String, latCol: String, watermark: String = "2 hours",
      stateTtlSec: Long = 86400L): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = fixes.sparkSession
    import spark.implicits._
    val ds = fixes
      .withColumn(tsCol, col(tsCol).cast("timestamp"))
      .withWatermark(tsCol, watermark)
      .select(col(keyCol).cast("long").as("key"), col(tsCol).as("ts"),
        col(lonCol).cast("double").as("lon"), col(latCol).cast("double").as("lat"))
      .as[GeoFix]
    def fn(key: Long, it: Iterator[GeoFix],
        state: GroupState[LastFix]): Iterator[KinematicFix] = {
      if (state.hasTimedOut) { state.remove(); return Iterator.empty }
      val out = scala.collection.mutable.ArrayBuffer.empty[KinematicFix]
      var prev = state.getOption.orNull
      it.toSeq.sortBy(f => (f.tsSec, f.lon, f.lat)).foreach { f =>
        if (prev == null) {
          out += KinematicFix(key, f.tsSec, f.lon, f.lat, None, None, None, None)
        } else {
          val d = graft.kernels.Sphere.haversineDistance(prev.lon, prev.lat, f.lon, f.lat)
          val dt = f.tsSec - prev.ts
          out += KinematicFix(key, f.tsSec, f.lon, f.lat, Some(d), Some(dt),
            if (dt > 0) Some(d / dt) else None,
            Some(graft.kernels.Sphere.haversineBearing(prev.lon, prev.lat, f.lon, f.lat)))
        }
        prev = LastFix(f.tsSec, f.lon, f.lat)
      }
      if (prev != null) {
        state.update(prev)
        state.setTimeoutTimestamp(math.max((prev.ts + stateTtlSec) * 1000L,
          state.getCurrentWatermarkMs() + 1L))
      }
      out.iterator
    }
    ds.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(fn)
      .toDF()
  }

  final case class StayState(fixes: Seq[(Long, Double, Double)])
  final case class Stay(user: Long, start_ts: Long, end_ts: Long,
      n_fixes: Int, clon: Double, clat: Double)

  /**
   * Streaming stay-point detection — the online face of
   * `Trajectory.stayPoints` (Li et al. 2008): per-entity state is the
   * CURRENT candidate run (the fixes since the active anchor —
   * bounded by one stay's length, the minimum any faithful
   * implementation must see together). Each arriving fix either
   * extends the run (within `distM` of the anchor) or closes it: a
   * qualifying run emits its stay and the fix anchors a fresh run; a
   * non-qualifying run re-anchors at its second fix and REPLAYS the
   * buffer — exactly the batch scan's advance-by-one — so stream and
   * backfill agree on in-order input (equality-tested; an open run
   * emits once a later far-away fix or timeout closes it).
   */
  def stayPointsStream(fixes: DataFrame, keyCol: String, tsCol: String,
      lonCol: String, latCol: String, distM: Double, minDurSec: Long,
      watermark: String = "2 hours", stateTtlSec: Long = 86400L): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = fixes.sparkSession
    import spark.implicits._
    val ds = fixes
      .withColumn(tsCol, col(tsCol).cast("timestamp"))
      .withWatermark(tsCol, watermark)
      .select(col(keyCol).cast("long").as("key"), col(tsCol).as("ts"),
        col(lonCol).cast("double").as("lon"), col(latCol).cast("double").as("lat"))
      .as[GeoFix]
    def fn(key: Long, it: Iterator[GeoFix],
        state: GroupState[StayState]): Iterator[Stay] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[Stay]
      var buf = state.getOption.map(_.fixes.toVector).getOrElse(Vector.empty)
      def emitIfStay(run: Vector[(Long, Double, Double)]): Unit =
        if (run.length >= 2 && run.last._1 - run.head._1 >= minDurSec) {
          var sx = 0.0; var sy = 0.0
          run.foreach { f => sx += f._2; sy += f._3 }
          out += Stay(key, run.head._1, run.last._1, run.length,
            sx / run.length, sy / run.length)
        }
      if (state.hasTimedOut) {
        // the entity went quiet: close the open run (emitting it when
        // it qualifies) and evict the state — the doc's promised
        // timeout closure
        emitIfStay(buf)
        state.remove()
        return out.iterator
      }
      var todo: List[(Long, Double, Double)] =
        it.toSeq.sortBy(f => (f.tsSec, f.lon, f.lat))
          .map(f => (f.tsSec, f.lon, f.lat)).toList
      while (todo.nonEmpty) {
        val f = todo.head; todo = todo.tail
        if (buf.isEmpty) buf = Vector(f)
        else {
          val anchor = buf.head
          if (graft.kernels.Sphere.haversineDistance(
              anchor._2, anchor._3, f._2, f._3) <= distM) {
            buf = buf :+ f
          } else if (buf.length >= 2 && buf.last._1 - anchor._1 >= minDurSec) {
            emitIfStay(buf)
            buf = Vector(f)
          } else {
            // advance-by-one: drop the anchor, replay the remainder
            todo = buf.tail.toList ::: f :: todo
            buf = Vector.empty
          }
        }
      }
      state.update(StayState(buf))
      if (buf.nonEmpty)
        state.setTimeoutTimestamp(math.max((buf.last._1 + stateTtlSec) * 1000L,
          state.getCurrentWatermarkMs() + 1L))
      out.iterator
    }
    ds.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(fn)
      .toDF()
  }

  final case class LastCell(cell: Long)
  final case class OdFlow(key: Long, ts_sec: Long, origin_cell: Long, dest_cell: Long)

  /**
   * Streaming origin-destination flow events — the online face of
   * `Trajectory.odMatrix`: per-entity state is the LAST occupied cell
   * (one long), and each fix whose cell differs emits one flow event
   * (key, ts_sec, origin_cell, dest_cell). Aggregate downstream
   * (`groupBy(origin, dest).count` per window) for the live OD
   * matrix; summing the emitted events equals the batch matrix on
   * in-order input (equality-tested).
   */
  def odFlowsStream(fixes: DataFrame, keyCol: String, tsCol: String,
      lonCol: String, latCol: String, level: Int,
      watermark: String = "2 hours", stateTtlSec: Long = 86400L): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = fixes.sparkSession
    import spark.implicits._
    val ds = fixes
      .withColumn(tsCol, col(tsCol).cast("timestamp"))
      .withWatermark(tsCol, watermark)
      .select(col(keyCol).cast("long").as("key"), col(tsCol).as("ts"),
        col(lonCol).cast("double").as("lon"), col(latCol).cast("double").as("lat"))
      .as[GeoFix]
    def fn(key: Long, it: Iterator[GeoFix],
        state: GroupState[LastCell]): Iterator[OdFlow] = {
      if (state.hasTimedOut) { state.remove(); return Iterator.empty }
      val out = scala.collection.mutable.ArrayBuffer.empty[OdFlow]
      var prev = state.getOption.map(_.cell).getOrElse(Long.MinValue)
      var lastTs = Long.MinValue
      it.toSeq.sortBy(f => (f.tsSec, f.lon, f.lat)).foreach { f =>
        val c = graft.index.CellId.cellId(level, f.lon, f.lat)
        if (prev != Long.MinValue && prev != c) out += OdFlow(key, f.tsSec, prev, c)
        prev = c
        lastTs = f.tsSec
      }
      if (prev != Long.MinValue) state.update(LastCell(prev))
      if (lastTs != Long.MinValue)
        state.setTimeoutTimestamp(math.max((lastTs + stateTtlSec) * 1000L,
          state.getCurrentWatermarkMs() + 1L))
      out.iterator
    }
    ds.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(fn)
      .toDF()
  }

  /**
   * Stream-static map-matching — the online face of
   * `SpatialJoins.matchToSegments`: the road dimension broadcasts as
   * decoded geometries (once per JVM, like the geofence zones) and
   * every fix scans it with a bbox pretest before the exact
   * point-to-linestring distance; the per-fix argmin keeps (dist,
   * segId) with smallest-id ties — identical semantics to the batch
   * join, stateless, no stream-side shuffle. Fixes with no segment
   * within maxDist drop out.
   */
  def matchToSegmentsStream(fixes: DataFrame, idCol: String, lonCol: String,
      latCol: String, segs: DataFrame, segIdCol: String, geomCol: String,
      maxDist: Double): DataFrame = {
    val spark = fixes.sparkSession
    import spark.implicits._
    val segRows: Array[(Long, Array[Byte])] = collectDimension(
        segs.select(col(segIdCol).cast("long"), gf.st_aswkb(col(geomCol))),
        "road-segment side", "batch Trajectory.matchToSegments")
      .map(r => (r.getLong(0), r.getAs[Array[Byte]](1)))
      .sortBy(_._1)
    val bc = spark.sparkContext.broadcast(segRows)
    val bcId = bc.id
    fixes.select(col(idCol).cast("long").as("key"),
        col(lonCol).cast("double").as("lon"), col(latCol).cast("double").as("lat"))
      .as[StreamProbe]
      .mapPartitions { it =>
        val gs = SegmentCache.get(bcId, () => bc.value.map { case (id, wkb) =>
          val g = graft.core.Wkb.read(wkb)
          var minX = Double.MaxValue; var minY = Double.MaxValue
          var maxX = Double.MinValue; var maxY = Double.MinValue
          var i = 0
          while (i < g.numPoints) {
            val x = g.x(i); val y = g.y(i)
            if (x < minX) minX = x; if (x > maxX) maxX = x
            if (y < minY) minY = y; if (y > maxY) maxY = y
            i += 1
          }
          SegEntry(id, g, minX, minY, maxX, maxY)
        })
        it.flatMap { p =>
          var bestD = Double.MaxValue
          var bestId = Long.MinValue
          gs.foreach { e =>
            // bbox pretest: skip segments provably farther than the
            // current best (or maxDist)
            val bound = math.min(bestD, maxDist)
            val ddx = math.max(math.max(e.minX - p.lon, p.lon - e.maxX), 0.0)
            val ddy = math.max(math.max(e.minY - p.lat, p.lat - e.maxY), 0.0)
            if (ddx * ddx + ddy * ddy <= bound * bound) {
              val d = graft.kernels.Topo.euclideanDistance(
                graft.core.FlatGeom.point(p.lon, p.lat), e.g)
              if (d < bestD || (d == bestD && e.id < bestId)) { bestD = d; bestId = e.id }
            }
          }
          if (bestD <= maxDist) Iterator.single((p.key, bestId, bestD))
          else Iterator.empty
        }
      }
      .toDF(idCol, "seg_id", "dist")
  }

  final case class SegEntry(id: Long, g: graft.core.FlatGeom,
      minX: Double, minY: Double, maxX: Double, maxY: Double)
  /** Per-JVM decoded-segment cache keyed by broadcast id. */
  private object SegmentCache {
    private val m = new java.util.concurrent.ConcurrentHashMap[Long, Array[SegEntry]]()
    def get(id: Long, mk: () => Array[SegEntry]): Array[SegEntry] = {
      if (m.size > 8) m.clear() // same staleness bound as the zone cache
      m.computeIfAbsent(id, _ => mk())
    }
  }

  /**
   * Stream-static interval join: tag each stream event with every
   * static [start, end] span containing its timestamp (inclusive,
   * `TemporalJoins.intervalJoin` semantics). Spans are a dimension by
   * construction: they broadcast sorted by start, and each row scans
   * only the prefix with start <= t (early exit on the sorted
   * starts) — stateless, no stream-side shuffle. Returns the event's
   * key/ts plus the span key; events in no span drop out.
   */
  def intervalJoinStream(events: DataFrame, keyCol: String, tsCol: String,
      intervals: DataFrame, intervalKey: String, startCol: String,
      endCol: String): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    // contract: spans need a non-null key and bounds; events with a
    // null key or timestamp can match nothing and drop (the inner-join
    // face of the batch twin) — they must not reach the non-null tuple
    // encoder, where they would kill the query
    val spans: Array[(Long, Long, Long)] = collectDimension(
        intervals.select(col(intervalKey).cast("long"),
          col(startCol).cast("timestamp").cast("long"),
          col(endCol).cast("timestamp").cast("long")).na.drop(),
        "interval side", "batch TemporalJoins.intervalJoin")
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(0)))
      .sortBy(t => (t._1, t._2, t._3))
    val bc = spark.sparkContext.broadcast(spans)
    // avoid a duplicate output column when both sides share a key name
    val outKey = if (intervalKey == keyCol) s"interval_$intervalKey" else intervalKey
    events.select(col(keyCol).cast("long").as("key"),
        col(tsCol).cast("timestamp").cast("long").as("ts"))
      .filter(col("key").isNotNull && col("ts").isNotNull)
      .as[(Long, Long)]
      .flatMap { case (k, t) =>
        val ss = bc.value
        val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
        var i = 0
        while (i < ss.length && ss(i)._1 <= t) {
          if (t <= ss(i)._2) out += ((k, t, ss(i)._3))
          i += 1
        }
        out
      }
      .toDF(keyCol, "ts_sec", outKey)
  }

  /**
   * Stream-static as-of join: enrich a stream with the latest static
   * reference row at or before each event (DuckDB ASOF LEFT JOIN
   * semantics — the batch twin is `TemporalJoins.asofJoin`). The
   * reference is a dimension by construction, so its rows broadcast
   * as per-key timestamp-sorted arrays and each stream row binary
   * searches its key's history — stateless, no stream-side shuffle,
   * watermark, or state store. Make the reference unique per (key,
   * ts) — the batch twin's order-free-semantics contract.
   */
  def asofJoinStream(left: DataFrame, keyCol: String, lTsCol: String,
      right: DataFrame, rTsCol: String, valueCols: Seq[String],
      toleranceSec: Long = Long.MaxValue): DataFrame = {
    import org.apache.spark.sql.types.{StructType, ByteType, ShortType, IntegerType, LongType, DataType}
    import org.apache.spark.sql.Row
    // the batch twin's integral-key contract, enforced symmetrically
    for (df <- Seq(left, right))
      require(Seq[DataType](ByteType, ShortType, IntegerType, LongType)
        .contains(df.schema(keyCol).dataType),
        s"asofJoinStream key '$keyCol' must be an integral type, got " +
          df.schema(keyCol).dataType.simpleString +
          " (hash non-integral keys to long first, e.g. xxhash64)")
    val spark = left.sparkSession
    val vStruct = StructType(valueCols.map(c => right.schema(c).copy(nullable = true)))
    val lStruct = StructType(left.schema.fields.map(_.copy(nullable = true)))
    val outSchema = StructType(lStruct.fields ++ vStruct.fields)
    val refRows: Map[Long, (Array[Long], Array[Seq[Any]])] = collectDimension(
        right.select(col(keyCol).cast("long").as("__k"),
          col(rTsCol).cast("timestamp").cast("long").as("__t"),
          struct(valueCols.map(col): _*))
        // a null key/ts reference row can never match (batch-twin
        // contract) — and Row.getLong on a null long would throw here
        .filter(col("__k").isNotNull && col("__t").isNotNull),
        "as-of reference side", "batch TemporalJoins.asofJoin")
      .map(r => (r.getLong(0), r.getLong(1), r.getStruct(2).toSeq))
      .groupBy(_._1)
      .map { case (k, rows) =>
        val sorted = rows.sortBy(_._2)
        k -> (sorted.map(_._2).toArray, sorted.map(_._3).toArray)
      }
    val bc = spark.sparkContext.broadcast(refRows)
    val nL = left.columns.length
    val all = left
      .withColumn("__k", col(keyCol).cast("long"))
      .withColumn("__t", col(lTsCol).cast("timestamp").cast("long"))
    // a null key/ts row matches nothing: pass it through with null
    // values (batch-twin semantics) instead of letting Row.getLong
    // unbox null to 0 and silently enrich it with key-0's history
    val passthrough = all.filter(col("__k").isNull || col("__t").isNull)
      .select(left.columns.map(col) ++
        valueCols.map(c => lit(null).cast(right.schema(c).dataType).as(c)): _*)
    val prepped = all.filter(col("__k").isNotNull && col("__t").isNotNull)
    val enriched = prepped.mapPartitions { rows =>
      val ref = bc.value
      rows.map { row =>
        val lvals = (0 until nL).map(row.get)
        val k = row.getLong(nL)
        val t = row.getLong(nL + 1)
        val rvals: Seq[Any] = ref.get(k) match {
          case Some((ts, vals)) =>
            // rightmost index with ts(i) <= t
            var lo = 0; var hi = ts.length - 1; var ans = -1
            while (lo <= hi) {
              val mid = (lo + hi) >>> 1
              if (ts(mid) <= t) { ans = mid; lo = mid + 1 } else hi = mid - 1
            }
            if (ans >= 0 && t - ts(ans) <= toleranceSec) vals(ans)
            else Seq.fill(vStruct.length)(null)
          case None => Seq.fill(vStruct.length)(null)
        }
        Row.fromSeq(lvals ++ rvals)
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
    enriched.union(passthrough)
  }

  /**
   * Batch twin of [[geofenceStream]]: every (fix, zone) pair gets a
   * boundary-inclusive membership bit from the broadcast zone
   * dimension, and a lag window per (key, zone) — ordered by the SAME
   * (ts, lon, lat) total order the stream sorts by — turns membership
   * flips into enter/exit rows (initial state = outside). The
   * fix×zone blow-up is bounded by the zone dimension; for large zone
   * sets, prefilter pairs by covering cells before the window.
   */
  def geofenceBatch(fixes: DataFrame, keyCol: String, tsCol: String,
      lonCol: String, latCol: String, zones: DataFrame, zoneKey: String,
      geomCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pairs = fixes.select(col(keyCol).cast("long").as("key"),
        (col(tsCol).cast("timestamp").cast("double").cast("long")).as("ts_sec"),
        col(lonCol).cast("double").as("lon"), col(latCol).cast("double").as("lat"))
      .crossJoin(broadcast(zones.select(col(zoneKey).cast("long").as("zone"), col(geomCol).as("__zg"))))
      .withColumn("inside", gf.st_intersects_xy(col("__zg"), col("lon"), col("lat")))
    val w = Window.partitionBy(col("key"), col("zone"))
      .orderBy(col("ts_sec"), col("lon"), col("lat"))
    pairs
      .withColumn("prev", coalesce(lag(col("inside"), 1).over(w), lit(false)))
      .filter(col("inside") =!= col("prev"))
      .select(col("key"), col("zone"), col("ts_sec"),
        when(col("inside"), lit("enter")).otherwise(lit("exit")).as("event"))
  }

  // ------------------------------------------------ custom state

  final case class CellEvent(cell: Long, ts: java.sql.Timestamp, lon: Double, lat: Double) {
    def tsSec: Long = ts.getTime / 1000L
  }
  /** One session's accumulator: [start, last] second bounds, event
    * count, and two caller-defined sums (lon/lat for the streaming
    * cell sessions; value/0 for the batch user sessions). */
  final case class SessionState(start: Long, last: Long, n: Long,
      sumA: Double, sumB: Double)
  final case class CellSession(cell: Long, startSec: Long, endSec: Long,
      events: Long, centroidLon: Double, centroidLat: Double)

  /** The gap-split fold shared by the streaming and batch
    * sessionizers: advance one open session with one event (in
    * nondecreasing ts order), emitting the closed session when the
    * gap is exceeded. Returns (closedOrNull, newOpen). */
  def foldEvent(open: SessionState, tsSec: Long, a: Double, b: Double,
      gapSec: Long): (SessionState, SessionState) =
    open match {
      case null =>
        (null, SessionState(tsSec, tsSec, 1, a, b))
      case s if tsSec - s.last > gapSec =>
        (s, SessionState(tsSec, tsSec, 1, a, b))
      case s =>
        (null, SessionState(s.start, Math.max(s.last, tsSec), s.n + 1,
          s.sumA + a, s.sumB + b))
    }

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
        out += CellSession(cell, s.start, s.last, s.n, s.sumA / s.n, s.sumB / s.n)
      if (state.hasTimedOut) {
        state.getOption.foreach(close)
        state.remove()
      } else {
        var cur = state.getOption.orNull
        events.toSeq.sortBy(_.tsSec).foreach { e =>
          val (closed, next) = foldEvent(cur, e.tsSec, e.lon, e.lat, gapSec)
          if (closed != null) close(closed)
          cur = next
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

  final case class KeyedSession(key: Long, sid: Long, start_sec: Long,
      end_sec: Long, n: Long, val_sum: Double)

  /**
   * Batch sessionization over a bounded table, same gap-split fold
   * ([[foldEvent]]) as the streaming path. Shape chosen for scale:
   * repartition by key + secondary sort (key, ts) + a streaming
   * per-partition fold — the sort is Tungsten-external (spills), and
   * the fold holds ONE open session per in-flight key, so memory is
   * O(1) regardless of events-per-key (a flatMapGroups that
   * materializes a group would OOM on a hot key at 100 TB).
   * Sessions are numbered 0.. per key in time order.
   */
  def sessionizeBatch(events: DataFrame, keyCol: String, tsCol: String,
      valCol: String, gapSec: Long): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val prepped = events.select(
      col(keyCol).cast("long").as("key"),
      (col(tsCol).cast("timestamp").cast("double").cast("long")).as("ts_sec"),
      col(valCol).cast("double").as("v"))
      .repartition(col("key"))
      .sortWithinPartitions(col("key"), col("ts_sec"))
      .as[(Long, Long, Double)]
    prepped.mapPartitions { rows =>
      new Iterator[KeyedSession] {
        private var curKey = Long.MinValue
        private var open: SessionState = null
        private var sid = -1L
        private var pending: KeyedSession = null
        private var done = false
        private def emit(k: Long, s: SessionState): KeyedSession = {
          sid += 1
          KeyedSession(k, sid, s.start, s.last, s.n, s.sumA)
        }
        @annotation.tailrec
        private def advance(): Unit = {
          if (pending != null || done) return
          if (!rows.hasNext) {
            if (open != null) { pending = emit(curKey, open); open = null }
            done = true
            return
          }
          val (k, ts, v) = rows.next()
          if (k != curKey && open != null) {
            pending = emit(curKey, open)
            open = null
            sid = -1L
            curKey = k
            val (closed, next) = foldEvent(null, ts, v, 0.0, gapSec)
            require(closed == null)
            open = next
          } else {
            if (k != curKey) { curKey = k; sid = -1L }
            val (closed, next) = foldEvent(open, ts, v, 0.0, gapSec)
            open = next
            if (closed != null) pending = emit(curKey, closed)
          }
          if (pending == null) advance()
        }
        override def hasNext: Boolean = { advance(); pending != null }
        override def next(): KeyedSession = {
          advance()
          val r = pending; pending = null; r
        }
      }
    }.toDF()
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
