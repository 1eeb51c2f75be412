package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for training pipelines: assign documents to
  * fixed-capacity token bins ("context windows") so a trainer can
  * concatenate each bin into one sequence.
  *
  * Scale shape: a GLOBAL greedy packing is inherently sequential (bin
  * of doc i depends on all docs before it), so the operator packs
  * WITHIN `nWorkers` deterministic groups (`id mod nWorkers`) — the
  * standard practice (each data-loader worker packs its own shard).
  * The cumulative-sum window is partitioned by group, so parallelism
  * is `nWorkers` and no unpartitioned window ever materializes. Bin
  * boundaries use the cumulative count BEFORE each doc, i.e. a doc
  * lands in the bin where its first token would fall, and long docs
  * spill over their bin boundary (boundary-chunking semantics — the
  * trainer splits at the boundary).
  *
  * Deterministic end-to-end (integer arithmetic on ids and token
  * counts), hence oracle-checkable (q41). Quotients are exact: the
  * numerator is pmod-aligned to a multiple of `capacity`, so the
  * double division is exact for any cumulative count below 2^53
  * (beyond any real token budget).
  */
object Packing {

  /** @param docs     input rows
    * @param idCol    unique long id (orders docs within a group)
    * @param nTokens  per-row token count column (long-compatible)
    * @param capacity bin capacity in tokens
    * @param nWorkers number of parallel packing groups
    * Output: input columns + (pack_group, n_tokens, bin). */
  def packBins(docs: DataFrame, idCol: String, nTokens: Column,
      capacity: Long, nWorkers: Int): DataFrame = {
    val w = Window.partitionBy(col("pack_group")).orderBy(col(idCol))
    val cumBefore = sum(col("n_tokens")).over(w) - col("n_tokens")
    val aligned = cumBefore - pmod(cumBefore, lit(capacity))
    docs
      .withColumn("pack_group", pmod(col(idCol), lit(nWorkers.toLong)).cast("int"))
      .withColumn("n_tokens", nTokens.cast("long"))
      .withColumn("bin", (aligned / lit(capacity.toDouble)).cast("int"))
  }
}
