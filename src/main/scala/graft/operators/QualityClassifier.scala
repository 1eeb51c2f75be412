package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** fastText/CCNet-style document quality classifier: logistic
  * regression over hashed bag-of-{uni,bi}gram counts, trained by
  * full-batch gradient descent entirely as DataFrame joins — the
  * second half of the LM-filter pair ([[LanguageModel]] scores
  * "reference-likeness"; this learns a supervised gate from labeled
  * examples). The reference converter has no classifier surface; this
  * is one of the training-data-pipeline families the brief adds as
  * first-class (see /root/reference/db2ice/converter.py:1 scope).
  *
  * Spark-first shape, and the one that survives 100 TB:
  *   - featurization is a pure scan projection (explode → hash →
  *     per-doc count); the feature table is hash-bucketed so the
  *     model is a bounded table of ≤ `numBuckets` rows no matter how
  *     large the corpus is;
  *   - each GD iteration is: margin = features ⋈ weights (the weight
  *     table is KB–MB sized → AQE broadcasts it; the corpus never
  *     shuffles), residual per doc, gradient = features ⋈ residuals
  *     re-aggregated per bucket (one bounded O(buckets·partitions)
  *     partial-agg shuffle). The driver never materializes weights —
  *     no `collect`, the model stays a DataFrame end-to-end;
  *   - iteration lineage is truncated with `localCheckpoint` on the
  *     (tiny) weight table every `ckptEvery` rounds (lazy persist in
  *     between — one eager job per cadence, not per iteration), the
  *     same discipline as [[Dedup.duplicateClusters]].
  *
  * Floats: margins/gradients are cross-partition double sums, so
  * training is NOT bit-deterministic across partitionings — the
  * integer featurizer face is oracle-checked (q77) and the trained
  * scorer is spec-pinned against a sequential in-JVM reference with
  * tolerance (QualityClassifierSpec), the q74/q76 discipline.
  */
object QualityClassifier {

  /** Word uni+bigrams of the lowercased token stream — the fastText
    * default feature set (wordNgrams=2). The HOF formulation; kept as
    * the independent reference [[featuresHof]] runs (the production
    * path is the native [[graft.functions.GramBuckets]], spec-pinned
    * equal). */
  private def gramsCol(text: Column): Column = {
    val w = filter(TextFunctions.words(text), t => length(t) > 0)
    // guard: sequence(1, 0) DESCENDS in Spark — size<2 must yield []
    val bi = when(size(w) >= 2,
      transform(sequence(lit(1), size(w) - 1),
        i => concat_ws(" ", slice(w, i, lit(2)))))
      .otherwise(array().cast("array<string>"))
    concat(w, bi)
  }

  /** Hashed feature counts: one row per (doc, bucket), `v` = how many
    * of the doc's grams landed in the bucket. Integer-valued, so the
    * whole featurizer is DuckDB-checkable; `bucket` is the md5 fold of
    * [[Sampling.hashValue]] (salt "qc:") mod `numBuckets`, computed by
    * the native [[graft.functions.GramBuckets]] expression — the
    * interpreted-HOF gram pipeline cost 4.4 s of q78's 6.3 s
    * featurization at sf0.1 (see BASELINE.md), and exploding int
    * buckets instead of gram strings shrinks the explode payload. */
  def features(docs: DataFrame, idCol: String, textCol: String,
      numBuckets: Int): DataFrame =
    docs.select(col(idCol),
        explode(graft.functions.GramBuckets(col(textCol), numBuckets, "qc:")).as("b"))
      .groupBy(col(idCol), col("b")).agg(count(lit(1)).as("v"))

  /** The pre-native HOF formulation of [[features]] — retained as the
    * in-plan independent reference the parity spec compares against. */
  def featuresHof(docs: DataFrame, idCol: String, textCol: String,
      numBuckets: Int): DataFrame =
    docs.select(col(idCol), explode(gramsCol(col(textCol))).as("g"))
      .select(col(idCol),
        (Sampling.hashValue(col("g"), "qc:") % numBuckets).cast("int").as("b"))
      .groupBy(col(idCol), col("b")).agg(count(lit(1)).as("v"))

  /** σ(x) with the same op order the sequential reference uses. */
  private def sigmoid(x: Column): Column = lit(1.0) / (lit(1.0) + exp(-x))

  /** Full-batch logistic regression on `labels(idCol, label∈{0,1})`.
    * Returns the weight table (b, w) — a DataFrame of ≤ numBuckets
    * rows; never collected. Gradient is the mean over docs of
    * (σ(margin) − y)·x with learning rate `lr`; weights start at 0 so
    * iteration 1's margins are exactly 0 (the empty-weight left join
    * coalesces to 0 rather than materializing a zero table). */
  def train(feats: DataFrame, labels: DataFrame, idCol: String,
      iters: Int, lr: Double, ckptEvery: Int = 2): DataFrame = {
    val spark = feats.sparkSession
    val n = labels.count().toDouble // one scalar; fixed across iters
    // corpus-sized tables are scanned once per iter — persist them;
    // caller-visible lifetime, released in the caller (query/spec)
    var weights: DataFrame = null // null = all-zero weights
    // Intermediate (non-checkpointed) weight tables: lazily persisted so
    // the checkpoint job reuses rather than recomputes them, unpersisted
    // once the next checkpoint has truncated lineage past them.
    var pending: List[DataFrame] = Nil
    for (i <- 1 to iters) {
      val joined =
        if (weights == null) feats.withColumn("w", lit(0.0))
        else feats.join(broadcast(weights), Seq("b"), "left")
          .withColumn("w", coalesce(col("w"), lit(0.0)))
      val margins = joined.groupBy(col(idCol))
        .agg(sum(col("v").cast("double") * col("w")).as("m"))
      val resid = labels.join(margins, Seq(idCol), "left")
        .select(col(idCol),
          ((sigmoid(coalesce(col("m"), lit(0.0))) -
            col("label").cast("double")) / lit(n)).as("r"))
      val grad = feats.join(resid, Seq(idCol))
        .groupBy(col("b"))
        .agg(sum(col("v").cast("double") * col("r")).as("g"))
      val next =
        if (weights == null)
          grad.select(col("b"), (lit(-lr) * col("g")).as("w"))
        else weights.join(grad, Seq("b"), "outer")
          .select(col("b"),
            (coalesce(col("w"), lit(0.0)) -
              lit(lr) * coalesce(col("g"), lit(0.0))).as("w"))
      // One eager job per CADENCE, not per iteration: an eager
      // localCheckpoint each round cost 8 scheduler round-trips for 8
      // GD iterations (the dominant q78 overhead in the driver bench
      // window — see BASELINE.md r6). Between checkpoints the weight
      // table is persisted LAZILY: no job runs until the next
      // checkpoint, whose job materializes the intermediates via cache
      // substitution. The cadence must stay SHORT: an A/B at sf0.1
      // measured ckptEvery=1/2/4 at par (6–9 s min) but ckptEvery=8 at
      // 49–140 s — past a few rounds the un-truncated window re-derives
      // exponentially instead of reusing, so 2 is the default and 4 the
      // experimentally-safe ceiling.
      weights =
        if (i % ckptEvery == 0 || i == iters) {
          val w = next.localCheckpoint(true)
          pending.foreach(_.unpersist(false))
          pending = Nil
          w
        } else {
          val w = next.persist()
          pending = w :: pending
          w
        }
    }
    if (weights == null) spark.emptyDataFrame.select(lit(0).as("b"), lit(0.0).as("w"))
    else weights
  }

  /** Score docs under a trained weight table: margin and probability
    * per doc (docs with no features score σ(0) = 0.5). */
  def score(feats: DataFrame, weights: DataFrame, docs: DataFrame,
      idCol: String): DataFrame = {
    val margins = feats.join(broadcast(weights), Seq("b"), "left")
      .withColumn("w", coalesce(col("w"), lit(0.0)))
      .groupBy(col(idCol))
      .agg(sum(col("v").cast("double") * col("w")).as("margin"))
    docs.select(col(idCol)).join(margins, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("margin"), lit(0.0)).as("margin"))
      .withColumn("prob", sigmoid(col("margin")))
  }
}
