package graft.operators

import java.io.ByteArrayInputStream

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.CountMinSketch

import graft.functions.TextFunctions

/** Frequency sketches: count-min heavy hitters over a token stream —
  * the sketch face of q47's exact top-terms (hot tokens, hot domains,
  * hot dedup keys at corpus scale).
  *
  * Scale shape: `count_min_sketch` is Spark's mergeable one-pass
  * aggregate — every partition builds a local sketch, partials merge
  * associatively, and the result is a few KB REGARDLESS of corpus
  * size (eps and confidence fix the width×depth). The driver-side
  * `readFrom`/`estimateCount` probe is the documented exception to
  * the no-driver-data rule: the sketch IS the aggregate, broadcast-
  * small by construction, same contract as the IVF centroid table.
  * Estimates only ever overestimate (est ≥ exact, and
  * est ≤ exact + eps·N with probability ≥ confidence) — SketchSpec
  * asserts both bounds against the exact counts. */
object Sketches {

  /** Top-k tokens by exact count (count desc, token asc — the q47
    * tie-break) with their count-min estimates attached. The exact
    * side exists to make the estimate auditable; a pure-sketch
    * deployment would probe candidate keys instead. */
  def tokenHeavyHitters(docs: DataFrame, textCol: String, k: Int,
      eps: Double = 0.001, confidence: Double = 0.99,
      seed: Int = 42): DataFrame = {
    val spark = docs.sparkSession
    val toks = docs.select(
      explode(TextFunctions.words(col(textCol))).as("tok"))
    val skBytes = toks
      .agg(count_min_sketch(col("tok"), lit(eps), lit(confidence), lit(seed)))
      .head.getAs[Array[Byte]](0)
    val cms = CountMinSketch.readFrom(new ByteArrayInputStream(skBytes))
    val exactTop = toks.groupBy(col("tok"))
      .agg(count(lit(1)).as("exact_n"))
      .orderBy(col("exact_n").desc, col("tok").asc)
      .limit(k)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val rows = exactTop.map { case (tok, exact) =>
      (tok, exact, cms.estimateCount(tok))
    }.toSeq
    import spark.implicits._
    rows.toDF("token", "exact_n", "est_n")
      .orderBy(col("exact_n").desc, col("token").asc)
  }

  /** [[tokenHeavyHitters]] with the estimate folded into a bound
    * check: (token, exact_n, est_in_bound) where est_in_bound ⇔
    * exact_n ≤ est_n ≤ exact_n + ⌈eps·N⌉. The exact top-k is plain
    * aggregation an external engine reproduces verbatim, so this
    * surface hash-checks cross-engine (the oracle expects `true` —
    * computed here, asserted there), while the engine-specific
    * estimate value stays internal. With a fixed seed the sketch is
    * deterministic, so the check is stable, not probabilistic. */
  def tokenHeavyHittersAudit(docs: DataFrame, textCol: String, k: Int,
      eps: Double = 0.001, confidence: Double = 0.99,
      seed: Int = 42): DataFrame = {
    val spark = docs.sparkSession
    val toks = docs.select(
      explode(TextFunctions.words(col(textCol))).as("tok"))
    // one pass builds the sketch AND the error-bound N
    val agg = toks.agg(
      count_min_sketch(col("tok"), lit(eps), lit(confidence), lit(seed)),
      count(lit(1))).head
    val cms = CountMinSketch.readFrom(new ByteArrayInputStream(agg.getAs[Array[Byte]](0)))
    val slack = math.ceil(eps * agg.getLong(1)).toLong
    val exactTop = toks.groupBy(col("tok"))
      .agg(count(lit(1)).as("exact_n"))
      .orderBy(col("exact_n").desc, col("tok").asc)
      .limit(k)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val rows = exactTop.map { case (tok, exact) =>
      val est = cms.estimateCount(tok)
      (tok, exact, est >= exact && est <= exact + slack)
    }.toSeq
    import spark.implicits._
    rows.toDF("token", "exact_n", "est_in_bound")
      .orderBy(col("exact_n").desc, col("token").asc)
  }

  /** Total token count — the N in the count-min error bound. */
  def totalTokens(docs: DataFrame, textCol: String): Long =
    docs.select(explode(TextFunctions.words(col(textCol))).as("tok"))
      .count()
}
