package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation operators (builder brief: "skewed keys → salting or
  * AQE skew-join").
  *
  * [[saltedAgg]] implements the classic two-stage salted aggregation:
  * stage 1 aggregates on (key, salt) — spreading a hot key over
  * `saltBuckets` reducers — stage 2 merges the partials per key. For
  * algebraic aggregates (sum/count/min/max) the result is EXACTLY the
  * plain groupBy result, so the same DuckDB oracle applies; only the
  * shuffle layout changes. With exact types (longs, decimals) the
  * equality is bitwise.
  *
  * Note Spark's own partial aggregation already does map-side combine;
  * explicit salting matters when the *reduce* side of a low-cardinality
  * key set is the bottleneck (a handful of keys, 1000 executors) or for
  * non-combinable flows (collect_list). The operator exists for those
  * shapes and as the oracle-checkable demonstration.
  */
object Skew {

  /** Salted equi-join for a skewed LEFT (fact) side: the hot fact keys
    * no longer land on one reducer. Each fact row gets a deterministic
    * salt in [0, saltBuckets); the (small-ish, unskewed) right side is
    * replicated `saltBuckets`× with every salt value; the join runs on
    * (key, salt). Result set is EXACTLY the plain inner equi-join
    * (spec-asserted) — only the shuffle layout changes: a key carrying
    * p% of the fact table spreads over saltBuckets reducers instead of
    * one, at the cost of a saltBuckets× blow-up of the right side.
    * Use when AQE skew-join can't help (e.g. the skew is in the
    * aggregation feeding the join, or deterministic layout is needed);
    * right side must be the smaller input — at `saltBuckets` ×
    * |right| ≫ shuffle budget prefer a broadcast join instead. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: Seq[String],
      saltBuckets: Int): DataFrame = {
    val saltedFact = fact.withColumn("_salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(saltBuckets)).cast("int"))
    val replicatedDim = dim.withColumn("_salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    saltedFact.join(replicatedDim, key :+ "_salt").drop("_salt")
  }

  /** Two-stage salted sum/count aggregation over one key column.
    * `sums` are (inputColumn → alias) pairs aggregated with exact
    * decimal sums. */
  def saltedAgg(df: DataFrame, key: String, saltBuckets: Int,
      sums: Seq[(Column, String)]): DataFrame = {
    val salted = df.withColumn("_salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(saltBuckets)))
    // monotonically_increasing_id is fine as a salt source: any
    // distribution works, correctness never depends on it.
    val stage1 = salted.groupBy(col(key), col("_salt"))
      .agg(count(lit(1)).as("_n"),
        sums.zipWithIndex.map { case ((c, _), i) =>
          sum(c.cast("decimal(28,4)")).as(s"_s$i")
        }: _*)
    stage1.groupBy(col(key))
      .agg(sum(col("_n")).cast("bigint").as("n_rows"),
        sums.zipWithIndex.map { case ((_, alias), i) =>
          sum(col(s"_s$i")).cast("double").as(alias)
        }: _*)
  }
}
