package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Temporal join operators Spark SQL lacks natively — the as-of join
 * (latest right row at or before each left timestamp, per key) and
 * the interval/range join (events against [start, end] spans) — both
 * re-expressed as shuffle-once DataFrame programs rather than
 * inequality joins (which Catalyst can only plan as broadcast
 * nested-loop or cartesian).
 */
object TemporalJoins {

  /**
   * As-of join: for every left row, append the value columns of the
   * LATEST right row with the same key and right-ts <= left-ts (and
   * left-ts − right-ts <= `toleranceSec` when given); nulls when no
   * such row. Semantics match DuckDB's `ASOF LEFT JOIN` (inclusive
   * >=); among right rows sharing (key, ts) the largest value tuple
   * wins — make right unique per (key, ts) for order-free semantics.
   *
   * Shape at scale: the classic union + single repartition by key +
   * Tungsten-external secondary sort (key, ts, side) + a streaming
   * per-partition sweep holding ONE (ts, values) pair per in-flight
   * key — O(1) state regardless of rows-per-key, no inequality join,
   * no window over the union. Exactly the sessionizeBatch discipline.
   */
  def asofJoin(left: DataFrame, right: DataFrame, keyCol: String,
      lTsCol: String, rTsCol: String, valueCols: Seq[String],
      toleranceSec: Long = Long.MaxValue): DataFrame = {
    require(valueCols.nonEmpty, "valueCols must be non-empty")
    // the engine-wide integral-key contract (shared with
    // shuffleDeterministic / assignSplits / mixtureSample and the
    // streaming twins): a string key would silently cast to null and
    // pass every left row through unmatched; a fractional key would
    // silently truncate-merge distinct keys
    for (df <- Seq(left, right))
      require(Seq[DataType](ByteType, ShortType, IntegerType, LongType)
        .contains(df.schema(keyCol).dataType),
        s"asofJoin key '$keyCol' must be an integral type, got " +
          df.schema(keyCol).dataType.simpleString +
          " (hash non-integral keys to long first, e.g. xxhash64)")
    require(valueCols.intersect(left.columns.toSeq).isEmpty,
      s"valueCols ${valueCols.intersect(left.columns.toSeq)} collide with left columns")
    val lStruct = StructType(left.schema.fields.map(_.copy(nullable = true)))
    val vStruct = StructType(valueCols.map(c => right.schema(c).copy(nullable = true)))
    // ASOF LEFT JOIN semantics for unusable rows: a left row whose key
    // or timestamp casts to null can match nothing — it passes through
    // with null value columns (instead of NPE-ing the sweep); right
    // rows with null key/ts can never be matched and drop.
    val lAll = left.select(
      col(keyCol).cast("long").as("__k"),
      col(lTsCol).cast("timestamp").cast("long").as("__t"),
      lit(1).as("__side"),
      struct(left.columns.map(col): _*).as("__l"),
      lit(null).cast(vStruct).as("__r"))
    val lPrep = lAll.filter(col("__k").isNotNull && col("__t").isNotNull)
    val lNullRows = lAll.filter(col("__k").isNull || col("__t").isNull)
    val rPrep = right.select(
      col(keyCol).cast("long").as("__k"),
      col(rTsCol).cast("timestamp").cast("long").as("__t"),
      lit(0).as("__side"),
      lit(null).cast(lStruct).as("__l"),
      struct(valueCols.map(col): _*).as("__r"))
      .filter(col("__k").isNotNull && col("__t").isNotNull)
    val outSchema = StructType(lStruct.fields ++ vStruct.fields)
    val sorted = lPrep.union(rPrep)
      .repartition(col("__k"))
      // right rows (side 0) sort before left rows at equal ts, so an
      // equal-timestamp right row is visible (inclusive >=); among
      // equal-(key, ts) right rows the LAST by value tuple wins
      .sortWithinPartitions(col("__k"), col("__t"), col("__side"), col("__r"))
    val passthrough = lNullRows.select(
      (0 until left.columns.length).map(i => col("__l").getField(left.columns(i))) ++
      valueCols.map(c => lit(null).cast(right.schema(c).dataType).as(c)): _*)
    val swept = sorted.mapPartitions { rows =>
      var curKey = Long.MinValue
      var lastTs = Long.MinValue
      var lastVals: Row = null
      rows.flatMap { row =>
        val k = row.getLong(0)
        if (k != curKey) { curKey = k; lastTs = Long.MinValue; lastVals = null }
        if (row.getInt(2) == 0) { // right
          lastTs = row.getLong(1)
          lastVals = row.getStruct(4)
          Iterator.empty
        } else {
          val lrow = row.getStruct(3)
          val ok = lastVals != null && row.getLong(1) - lastTs <= toleranceSec
          val rvals: Seq[Any] =
            if (ok) lastVals.toSeq else Seq.fill(vStruct.length)(null)
          Iterator.single(Row.fromSeq(lrow.toSeq ++ rvals))
        }
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
    swept.union(passthrough)
  }

  /**
   * Interval (range) join: every event row whose `tsCol` falls inside
   * a [startCol, endCol] span (inclusive both ends) pairs with that
   * span — the temporal analogue of the engine's cell-neighborhood
   * spatial joins, and the same trick: time buckets of `bucketSec`
   * are the equi-join key. Each interval explodes IN-ROW to the
   * buckets it covers (bounded by span/bucketSec — pick bucketSec
   * near the typical span so replication stays small), the event side
   * keys to its single bucket, and the exact containment refine runs
   * inside the join. An event has ONE bucket, so each qualifying
   * (event, interval) pair meets exactly once — no dedupe.
   */
  def intervalJoin(events: DataFrame, tsCol: String,
      intervals: DataFrame, startCol: String, endCol: String,
      bucketSec: Long): DataFrame = {
    require(bucketSec > 0)
    val et = col(tsCol).cast("timestamp").cast("long")
    val st = col(startCol).cast("timestamp").cast("long")
    val en = col(endCol).cast("timestamp").cast("long")
    val iPrep = intervals
      .withColumn("__s", st).withColumn("__e", en)
      .filter(col("__s") <= col("__e"))
      .withColumn("__b", explode(sequence(
        floor(col("__s") / bucketSec.toDouble).cast("long"),
        floor(col("__e") / bucketSec.toDouble).cast("long"))))
    events.withColumn("__t", et)
      .withColumn("__b", floor(col("__t") / bucketSec.toDouble).cast("long"))
      .join(iPrep, Seq("__b"))
      .filter(col("__t") >= col("__s") && col("__t") <= col("__e"))
      .drop("__b", "__s", "__e", "__t")
  }
}
