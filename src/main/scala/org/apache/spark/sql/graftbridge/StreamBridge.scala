package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Batch-plan → streaming-plan bridge for V1 streaming sources.
  *
  * `MicroBatchExecution` asserts that the DataFrame a V1
  * `Source.getBatch` returns has `isStreaming = true`; file streaming
  * satisfies it by building its per-batch relation with the streaming
  * flag set. A source whose batch is an arbitrary derived plan (the
  * Iceberg incremental scan: pruned file reads + identity restore +
  * unions) marks the handoff here instead — the computed rows are
  * wrapped in a streaming-flagged LogicalRDD via the classic session's
  * `internalCreateDataFrame`, the same technique `Sink`-side memory
  * streams use. Same namespace rationale as [[ColumnBridge]]. */
object StreamBridge {

  /** The same rows, re-rooted under a streaming-flagged plan.
    * `declaredSchema` (must match the frame's columns by name and
    * type) overrides per-batch nullability drift — a source's
    * declared schema is checked against every batch, and an empty
    * range's plan would otherwise carry different nullability than a
    * real scan's. */
  def asStreaming(df: DataFrame,
      declaredSchema: Option[org.apache.spark.sql.types.StructType] = None)
      : DataFrame = {
    val schema = declaredSchema.getOrElse(df.schema)
    require(schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      df.schema.fields.map(f => (f.name, f.dataType)).toSeq,
      s"declared schema $schema does not align with batch ${df.schema}")
    val spark = df.sparkSession.asInstanceOf[
      org.apache.spark.sql.classic.SparkSession]
    spark.internalCreateDataFrame(
      df.queryExecution.toRdd, schema, isStreaming = true)
  }

  /** The reverse hand-off: a micro-batch frame delivered to a V1
    * `Sink.addBatch` still rides the streaming-flagged plan; re-root
    * its rows under a plain batch LogicalRDD so batch-shaped sink
    * bodies (which count/filter/write it like any DataFrame) can run
    * unrestricted. */
  def asBatch(df: DataFrame): DataFrame = {
    val spark = df.sparkSession.asInstanceOf[
      org.apache.spark.sql.classic.SparkSession]
    spark.internalCreateDataFrame(
      df.queryExecution.toRdd, df.schema, isStreaming = false)
  }

  /** Streaming-flagged EMPTY frame of a schema (the no-new-commits
    * micro-batch). */
  def emptyStreaming(spark: SparkSession,
      schema: org.apache.spark.sql.types.StructType): DataFrame = {
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    classic.internalCreateDataFrame(
      classic.sparkContext.emptyRDD[org.apache.spark.sql.catalyst.InternalRow],
      schema, isStreaming = true)
  }
}
