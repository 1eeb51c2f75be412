package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** DSIR-style data selection: importance-resample a raw pool toward a
  * target (in-domain) distribution using hashed n-gram bag models —
  * the "Data Selection via Importance Resampling" recipe (Xie et al.,
  * NeurIPS 2023, public paper): fit bucketed bag-of-ngrams models on
  * the target sample and on the raw pool, weight every raw document by
  * the per-bucket likelihood ratio folded over its gram counts, keep
  * the highest-weight fraction.
  *
  * Production DSIR weights are log-ratios (Σ c_b·(log t̂_b − log q̂_b));
  * logs are transcendental, so this implementation scores with the
  * EQUIVALENT-ORDER integer surrogate Σ c_b · ⌊(t_b+1)·S / (q_b+1)⌋
  * (Laplace-smoothed ratio at fixed scale S) — every arithmetic step
  * is exact 64-bit integer math, so the whole selector hash-checks
  * against a DuckDB oracle (q87) instead of a rows-only pin. The
  * surrogate preserves DSIR's structure (per-bucket target/raw ratio,
  * linear fold over gram counts); swapping the ratio column for a
  * float log-ratio changes nothing about the plan shape.
  *
  * Scale shape (100 TB): gram hashing is scan-side (the native
  * [[graft.functions.GramBuckets]] expression — ints, not gram
  * strings, enter the explode), per-doc bucket counts are the one
  * corpus-mass shuffle, both bag models collapse to ≤ numBuckets rows
  * (broadcast-small — the IVF-centroid contract), the weight fold is a
  * broadcast join plus a per-doc agg, and top-fraction selection
  * reuses [[BudgetSelect]]'s histogram-boundary trick: no global sort,
  * only the single boundary bucket is windowed. */
object ImportanceResampling {

  /** Hashed uni+bigram counts, one row per (doc, bucket) — the
    * [[QualityClassifier.features]] layout under the selector's own
    * salt ("ir:") so quality-classifier and DSIR bucket spaces stay
    * independent. */
  def features(docs: DataFrame, idCol: String, textCol: String,
      numBuckets: Int): DataFrame =
    docs.select(col(idCol),
        explode(graft.functions.GramBuckets(col(textCol), numBuckets, "ir:")).as("b"))
      .groupBy(col(idCol), col("b")).agg(count(lit(1)).as("v"))

  /** Per-bucket integer ratio table (b, ratio): ratio = ⌊(t_b+1)·scale
    * / (q_b+1)⌋ with t_b/q_b the target/raw gram mass in bucket b
    * (Laplace +1 on both sides — unseen buckets score scale/(q+1), not
    * 0). Both inputs collapse to ≤ numBuckets rows before the join;
    * with target ⊆ raw the ratio is bounded by `scale`, so a per-doc
    * fold is ≤ n_grams·scale — far inside Long. */
  def bucketRatios(rawFeats: DataFrame, targetFeats: DataFrame,
      scale: Long = 1000000L): DataFrame = {
    val qb = rawFeats.groupBy("b").agg(sum("v").as("q"))
    val tb = targetFeats.groupBy("b").agg(sum("v").as("t"))
    qb.join(tb, Seq("b"), "left")
      .select(col("b"),
        expr(s"((coalesce(t, CAST(0 AS BIGINT)) + 1) * $scale) div (q + 1)")
          .as("ratio"))
  }

  /** [[bucketRatios]] for the common target-⊆-raw case, in ONE pass:
    * when the target is a predicate over the raw pool's id column,
    * both bag models are conditional sums of the same aggregation —
    * half the feature-mass passes of the two-input form (and no join).
    * Result-identical to `bucketRatios(feats, feats.filter(isTarget))`
    * (spec-pinned). */
  def bucketRatiosBy(feats: DataFrame, isTarget: org.apache.spark.sql.Column,
      scale: Long = 1000000L): DataFrame =
    feats.groupBy("b")
      .agg(sum("v").as("q"),
        sum(when(isTarget, col("v")).otherwise(lit(0L))).as("t"))
      .select(col("b"),
        expr(s"((t + 1) * $scale) div (q + 1)").as("ratio"))

  /** Per-doc importance weight: (idCol, n_grams, weight) with weight =
    * Σ_b v·ratio_b. The ratio table broadcasts (≤ numBuckets rows);
    * the only shuffle is the bounded one-row-per-doc agg. Docs absent
    * from `rawFeats` (empty text) are absent here — callers that need
    * every doc left-join back to the corpus with coalesce(0). */
  def weights(rawFeats: DataFrame, ratios: DataFrame,
      idCol: String): DataFrame =
    rawFeats.join(broadcast(ratios), Seq("b"))
      .groupBy(col(idCol))
      .agg(sum("v").cast("bigint").as("n_grams"),
        sum(col("v") * col("ratio")).cast("bigint").as("weight"))

  /** Freeze a [[bucketRatios]] table into a dense lookup array for
    * the serving face: index = bucket, value = ratio; buckets never
    * seen in the raw pool default to `scale` — exactly the formula's
    * (0+1)·scale/(0+1), so a LIVE document hitting an unseen bucket
    * scores as the model prescribes, not as a hole. ≤ numBuckets rows
    * collect (the broadcast-small contract). */
  def freezeRatios(ratios: DataFrame, numBuckets: Int,
      scale: Long = 1000000L): Array[Long] = {
    val arr = Array.fill(numBuckets)(scale)
    ratios.select("b", "ratio").collect().foreach { r =>
      arr(r.getInt(0)) = r.getLong(1)
    }
    arr
  }

  /** Exact gram count of the hashed bag (Σ v without aggregating):
    * the native gram expression's array length, scan-side. */
  def gramCount(textCol: org.apache.spark.sql.Column,
      numBuckets: Int): org.apache.spark.sql.Column =
    size(graft.functions.GramBuckets(textCol, numBuckets, "ir:")).cast("long")

  /** Per-row scoring column against a frozen ratio array — the
    * SERVING face: one native generated call per row
    * ([[graft.functions.BucketWeight]]), no explode, no join, no
    * state, so it runs unchanged over a structured stream. Equals the
    * training-face [[weights]] fold (spec-pinned). */
  def scoreWith(textCol: org.apache.spark.sql.Column, numBuckets: Int,
      ratios: Array[Long]): org.apache.spark.sql.Column =
    graft.functions.BucketWeight(textCol, numBuckets, "ir:", ratios)

  /** Ids of the top-k rows by (weightCol desc, idCol asc) — the
    * resampling cut. Row-identical to a global rank ≤ k, computed via
    * [[BudgetSelect.byScoreBudget]] with unit row weights: histogram
    * buckets select whole score ranges, only the boundary bucket is
    * windowed (no full sort, no single-partition rank). */
  def selectTopK(weights: DataFrame, idCol: String, weightCol: String,
      k: Long): DataFrame =
    BudgetSelect.byScoreBudget(
      weights.select(col(idCol), col(weightCol))
        .withColumn("g", lit(0)).withColumn("one", lit(1L)),
      "g", idCol, "one", weightCol, budget = k)
      .select(col(idCol))
}
