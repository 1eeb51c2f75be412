package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, ScalarSubquery}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Holdout-decontamination at scale: an exact anti-join with a
  * broadcast Bloom-filter prefilter.
  *
  * The plain `left_anti` join shuffles the ENTIRE train side on the
  * fingerprint key. At 100 TB that shuffle dominates the job even
  * though the holdout side is tiny and almost nothing matches. The
  * Bloom path builds one filter over the holdout keys (a few MB),
  * broadcasts it, and discards the provably-clean rows scan-side —
  * only the `might_contain` survivors (true matches + the configured
  * false-positive mass) reach the exact verification join. Because
  * every dropped row was a definite non-member, the output EQUALS the
  * exact anti-join row-for-row — approximation in the prefilter, none
  * in the result (PipelineSpec asserts equality; q46 carries q42's
  * exact oracle).
  *
  * Spark ships `bloom_filter_agg` / `might_contain` as Catalyst
  * expressions for its runtime-filter rule but does not SQL-register
  * them; [[ColumnBridge]] lifts them into Column-land directly.
  */
object Decontaminate {

  /** `bloom_filter_agg(xxhash64(c))` as a Column: aggregates the
    * column's 64-bit hashes into one serialized Bloom filter sized for
    * `expectedItems` distinct keys. */
  def bloomAgg(c: Column, expectedItems: Long): Column =
    ColumnBridge.column(new BloomFilterAggregate(
      ColumnBridge.expression(xxhash64(c)), expectedItems).toAggregateExpression())

  /** `might_contain(<scalar-subquery>, xxhash64(c))`. `might_contain`
    * requires its filter side to be a constant or scalar subquery (the
    * same contract Spark's InjectRuntimeFilter satisfies), so the
    * aggregated filter is attached as a [[ScalarSubquery]] over the
    * aggregation's analyzed plan — evaluated once, broadcast to every
    * task, reused across consumers by ReuseSubquery. */
  def mightContain(bloomOf: DataFrame, c: Column): Column =
    ColumnBridge.column(BloomFilterMightContain(
      ScalarSubquery(bloomOf.queryExecution.analyzed),
      ColumnBridge.expression(xxhash64(c))))

  /** Exact `left.join(right, keyCol, "left_anti")` with the Bloom
    * prefilter: rows whose key cannot be in `right` pass through
    * scan-side; only the survivors are verified with the exact
    * anti-join. `expectedItems` sizes the filter (default 1M keys
    * ≈ 1.2 MB at 3% fpp — broadcastable at any corpus size). */
  def bloomAntiJoin(left: DataFrame, right: DataFrame, keyCol: String,
      expectedItems: Long = 1000000L): DataFrame = {
    val bf = right.agg(bloomAgg(col(keyCol), expectedItems).as("__bf"))
    // BloomFilterAggregate over ZERO rows evals to null, and
    // might_contain(null, x) null-propagates — without the coalesce an
    // empty holdout would drop EVERY left row (both filters reject
    // null) instead of keeping them all like the exact anti-join. A
    // null bloom means no keys were aggregated, so nothing can match:
    // the row is provably clean.
    val flagged = left.withColumn("__maybe",
      coalesce(mightContain(bf, col(keyCol)), lit(false)))
    val clean = flagged.filter(!col("__maybe")).drop("__maybe")
    val suspects = flagged.filter(col("__maybe")).drop("__maybe")
    clean.unionByName(
      suspects.join(right.select(col(keyCol)).distinct(), Seq(keyCol), "left_anti"))
  }
}
