package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.classic.Dataset
import org.apache.spark.sql.execution.LogicalRDD

/** Bridge to `private[sql]` plan construction for ITERATIVE operators.
  *
  * `Dataset.localCheckpoint` truncates lineage but PROPAGATES the
  * origin plan's `Statistics` into the replacement `LogicalRDD`
  * (`originStats`). In a loop whose round joins a checkpointed frame
  * against itself k times, the estimated sizeInBytes therefore grows
  * as prev^k per round — the exponent COMPOUNDS, and after ~20 rounds
  * Catalyst's size-only stats visitor is multiplying BigIntegers with
  * billions of bits (observed: minutes of Karatsuba/Toom-Cook inside
  * `SizeInBytesOnlyStatsPlanVisitor` before a single job launched).
  *
  * [[statsBarrier]] rebuilds a checkpointed frame as the same
  * `LogicalRDD` leaf — same RDD, same output attributes, same
  * partitioning and ordering (so co-partitioned loop joins still
  * avoid re-shuffles) — with `originStats` dropped, resetting the
  * size estimate to the session default. Runtime re-planning (AQE)
  * still sees real shuffle sizes; only the compile-time snowball is
  * cut. Apply it once per iteration right after `localCheckpoint`.
  */
object PlanBridge {
  def statsBarrier(df: DataFrame): DataFrame = {
    val ds = df.asInstanceOf[Dataset[Row]]
    ds.queryExecution.analyzed match {
      case l: LogicalRDD =>
        Dataset.ofRows(ds.sparkSession,
          new LogicalRDD(l.output, l.rdd, l.outputPartitioning, l.outputOrdering,
            l.isStreaming, l.stream)(ds.sparkSession, None, None))
      case _ => df // not a checkpointed leaf: nothing to strip
    }
  }
}
