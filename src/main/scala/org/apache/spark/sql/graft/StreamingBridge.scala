package org.apache.spark.sql.graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
import org.apache.spark.sql.catalyst.types.DataTypeUtils
import org.apache.spark.sql.classic.{Dataset, SparkSession}
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.types.StructType

/** Bridge into the `private[sql]` pieces a V1 streaming `Source` needs
  * to hand back micro-batches that are ordinary Spark plans.
  *
  * `MicroBatchExecution` asserts that the DataFrame a v1
  * `Source.getBatch` returns has `isStreaming = true` — the marker
  * lives on the plan's LEAF nodes, and a frame built with the public
  * batch readers (the point of the graft changefeed: each batch IS the
  * vectorized parquet read over the version's added files) carries
  * batch leaves. `FileStreamSource` solves this by constructing its
  * `LogicalRelation(…, isStreaming = true)` directly; these helpers do
  * the same flip for an already-built frame.
  */
object StreamingBridge {

  /** The same frame with every relation leaf marked streaming —
    * projections/unions above the leaves inherit the flag. */
  def asStreamingBatch(df: DataFrame): DataFrame = {
    val spark = df.sparkSession.asInstanceOf[SparkSession]
    val plan = df.queryExecution.analyzed.transform {
      case lr: LogicalRelation if !lr.isStreaming =>
        lr.copy(isStreaming = true)
    }
    Dataset.ofRows(spark, plan)
  }

  /** A zero-row micro-batch (every version in the range was a pure
    * rewrite): an empty LocalRelation born with the streaming flag. */
  def emptyStreamingFrame(spark: org.apache.spark.sql.SparkSession,
                          schema: StructType): DataFrame =
    Dataset.ofRows(spark.asInstanceOf[SparkSession],
      LocalRelation(DataTypeUtils.toAttributes(schema), Nil,
        isStreaming = true))
}
