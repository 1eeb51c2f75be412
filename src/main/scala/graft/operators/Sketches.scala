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

  /** Total token count — the N in the count-min error bound. */
  def totalTokens(docs: DataFrame, textCol: String): Long =
    docs.select(explode(TextFunctions.words(col(textCol))).as("tok"))
      .count()
}
