package org.apache.spark.sql.graftbridge

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.execution.LogicalRDD

/** Handle on the block-storage side of `Dataset.localCheckpoint()`.
  *
  * A localCheckpoint materializes the plan into persisted RDD blocks
  * and rewrites the logical plan to a [[LogicalRDD]] over them. Those
  * blocks are NOT registered in the CacheManager, so
  * `spark.catalog.clearCache()` never frees them — they survive until
  * the wrapping RDD is GC'd and the ContextCleaner notices, which in a
  * long-lived session (a bench pass, a notebook) can be never. Iterative
  * operators that checkpoint per round ([[graft.operators.Dedup
  * .duplicateClusters]]) therefore free superseded rounds eagerly
  * through this bridge instead of waiting for GC.
  *
  * Lives in the `org.apache.spark.sql` namespace because
  * `Dataset.queryExecution`'s analyzed-plan internals are the supported
  * extension surface but `LogicalRDD` is execution-package API — same
  * technique as [[ColumnBridge]].
  */
object CheckpointBridge {

  /** The checkpoint-backing RDDs referenced by this Dataset's analyzed
    * plan (empty if the Dataset is not checkpoint-backed). */
  def checkpointRdds(df: Dataset[_]): Seq[RDD[_]] = df match {
    case d: org.apache.spark.sql.classic.Dataset[_] =>
      d.queryExecution.analyzed.collect { case lr: LogicalRDD => lr.rdd }
    case _ => Nil
  }

  /** Drop the persisted blocks behind a checkpoint-backed Dataset.
    * After this the Dataset is unrecoverable (lineage was truncated) —
    * only call once every consumer of it has materialized. */
  def freeCheckpoint(df: Dataset[_]): Unit =
    checkpointRdds(df).foreach(_.unpersist(blocking = false))
}
