package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed n-gram language model (orders 1–3) with stupid-backoff
  * scoring — the CCNet-style LM quality filter: train count tables on
  * a reference slice of the corpus, score every document by how
  * "reference-like" its token transitions are, and gate or bucket on
  * the score. (The reference converter has no LM surface; this is one
  * of the training-data-pipeline operator families the brief adds as
  * first-class — see /root/reference/db2ice/converter.py:1 scope.)
  *
  * Spark-first shape, and the one that survives 100 TB:
  *   - training is one `groupBy(gram)` shuffle per order over the
  *     reference slice's exploded n-grams — count tables stay
  *     DataFrames end-to-end, nothing model-sized ever crosses the
  *     driver (the total-token scalar rides as a one-row broadcast);
  *   - scoring explodes each document into its trigram-start positions
  *     in the scan stage and resolves counts with LEFT equi-joins
  *     against the count tables; an aggregated count table is orders
  *     of magnitude smaller than the token stream, so AQE broadcasts
  *     it when it fits and shuffles on the gram key when it does not —
  *     exactly the per-shard KenLM-lookup shape, minus the driver-side
  *     model file.
  */
object LanguageModel {

  /** Count tables per order plus the unigram total as a ONE-ROW
    * DataFrame (`__total`) — kept lazy/distributed so building a model
    * triggers no driver action; it broadcasts into scoring plans.
    *
    * Count tables are keyed by the 8-byte chained-XXH64 window hash
    * ([[graft.functions.TokenWindowHashes]]) of the gram, not the gram
    * STRING: every consumer only ever joins grams for count lookups —
    * gram text never reaches an output — so the key can be the hash
    * (equal text ⇔ equal hash modulo 2⁻⁶⁵ collisions, the same
    * contract q56/q69/q95 ride), which shrinks all three groupBy
    * exchanges and every scoring-join key from multi-token strings to
    * longs and replaces the interpreted transform/slice/concat_ws
    * gram construction with one native generator per order. */
  final case class Model(uni: DataFrame, bi: DataFrame, tri: DataFrame,
      total: DataFrame)

  /** Train the order-1/2/3 count tables over `docs(textCol)`. One
    * shuffle per order; tokenization matches [[Chunking.tokens]] (the
    * oracle-checkable whitespace split — TokenWindowHashes hashes the
    * exact same token stream). */
  def train(docs: DataFrame, textCol: String): Model = {
    def countTable(n: Int, cname: String): DataFrame =
      docs.select(explode(
          graft.functions.TokenWindowHashes(col(textCol), n)).as("gram"))
        .groupBy("gram").agg(count(lit(1)).as(cname))
    val total = docs
      .select(Chunking.tokens(col(textCol)).as("__w"))
      .filter(size(col("__w")) > 0)
      .agg(sum(size(col("__w"))).cast("bigint").as("__total"))
    Model(countTable(1, "c1"), countTable(2, "c2"), countTable(3, "c3"), total)
  }

  /** One row per trigram-start position i (1-based, i = 1..n−2):
    * target gram HASHES for each order, ready to join against count
    * tables — all five keys are element_at lookups into the three
    * native per-order window-hash arrays, indexed off one posexplode.
    * Docs with fewer than 3 tokens emit no rows (callers LEFT-join
    * totals back). */
  private def positions(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    docs.select(col(idCol),
        graft.functions.TokenWindowHashes(col(textCol), 3).as("__h3"),
        graft.functions.TokenWindowHashes(col(textCol), 2).as("__h2"),
        graft.functions.TokenWindowHashes(col(textCol), 1).as("__h1"))
      .select(col(idCol), col("__h2"), col("__h1"),
        posexplode(col("__h3")).as(Seq("i0", "tg")))
      .select(col(idCol), (col("i0") + 1).as("i"), col("tg"),
        element_at(col("__h2"), col("i0") + 2).as("bg"),
        element_at(col("__h1"), col("i0") + 3).as("ug"),
        element_at(col("__h2"), col("i0") + 1).as("ctx_bg"),
        element_at(col("__h1"), col("i0") + 2).as("ctx_ug"))
  }

  private def leftOn(base: DataFrame, table: DataFrame, key: String,
      as: String): DataFrame =
    base.join(table.select(col("gram").as(key),
      col(table.columns.last).as(as)), Seq(key), "left")

  /** Per-document integer backoff audit — the oracle-checkable face:
    * for each position the matched order (3 if the trigram is in the
    * model, else 2 if the bigram is, else 1 if the token is, else
    * OOV), counted per order, plus the exact count mass at the matched
    * order. Integers only, so DuckDB reproduces every column
    * bit-for-bit; the float score in [[avgLogProb]] builds on exactly
    * these lookups, so a green hash here pins the lookup layer of the
    * scorer cross-engine. */
  def backoffStats(docs: DataFrame, idCol: String, textCol: String,
      model: Model): DataFrame = {
    val j = leftOn(leftOn(leftOn(positions(docs, idCol, textCol),
      model.tri, "tg", "c3"), model.bi, "bg", "c2"), model.uni, "ug", "c1")
    val level = when(col("c3").isNotNull, 3)
      .when(col("c2").isNotNull, 2)
      .when(col("c1").isNotNull, 1).otherwise(0)
    def n(l: Int) = sum(when(level === l, 1L).otherwise(0L))
    def mass(l: Int, c: String) = sum(when(level === l, col(c)).otherwise(0L))
    val per = j.groupBy(col(idCol)).agg(
      count(lit(1)).as("n_pos"),
      n(3).as("n_tri"), n(2).as("n_bi"), n(1).as("n_uni"), n(0).as("n_oov"),
      mass(3, "c3").as("sum_c3"), mass(2, "c2").as("sum_c2"),
      mass(1, "c1").as("sum_c1"))
    val zeroed = Seq("n_pos", "n_tri", "n_bi", "n_uni", "n_oov",
      "sum_c3", "sum_c2", "sum_c1")
    docs.select(col(idCol),
        size(Chunking.tokens(col(textCol))).cast("bigint").as("n_tokens"))
      .join(per, Seq(idCol), "left")
      .select(col(idCol) +: col("n_tokens") +:
        zeroed.map(c => coalesce(col(c), lit(0L)).as(c)): _*)
  }

  /** Per-document average log-probability under stupid backoff
    * (α = 0.4): S = c₃/c(ctx₂) | α·c₂/c(ctx₁) | α²·c₁/T | α²·½/T for
    * OOV. Denominators are never null when their numerator matched —
    * a counted trigram implies its context bigram was counted from the
    * same training text. Per-doc sums fold in POSITION order
    * (array_sort over (i, lp) structs) so the double result is
    * bit-deterministic across runs and partitionings; exactness is
    * spec-pinned against a sequential in-JVM reference
    * (LanguageModelSpec). Not oracle-checked: ln() is transcendental
    * and engines differ in the final ulp. */
  def avgLogProb(docs: DataFrame, idCol: String, textCol: String,
      model: Model, alpha: Double = 0.4): DataFrame = {
    val j = leftOn(leftOn(leftOn(leftOn(leftOn(
      positions(docs, idCol, textCol),
      model.tri, "tg", "c3"), model.bi, "bg", "c2"), model.uni, "ug", "c1"),
      model.bi, "ctx_bg", "ctx_c2"), model.uni, "ctx_ug", "ctx_c1")
      .crossJoin(broadcast(model.total))
    val tot = col("__total").cast("double")
    val s = when(col("c3").isNotNull,
        col("c3").cast("double") / col("ctx_c2").cast("double"))
      .when(col("c2").isNotNull,
        lit(alpha) * col("c2").cast("double") / col("ctx_c1").cast("double"))
      .when(col("c1").isNotNull,
        lit(alpha * alpha) * col("c1").cast("double") / tot)
      .otherwise(lit(alpha * alpha) * lit(0.5) / tot)
    val per = j.select(col(idCol), struct(col("i"), log(s).as("lp")).as("p"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_pos"),
        aggregate(array_sort(collect_list(col("p"))), lit(0.0),
          (acc, x) => acc + x.getField("lp")).as("sum_lp"))
      .select(col(idCol), col("n_pos"),
        (col("sum_lp") / col("n_pos").cast("double")).as("avg_logprob"))
    docs.select(col(idCol)).join(per, Seq(idCol), "left")
  }
}
