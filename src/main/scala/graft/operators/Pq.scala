package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/** Product quantization (PQ) — the ANN memory-compression scale path
  * that completes the family (brute force → LSH buckets → IVF cells →
  * PQ codes): each vector is stored as `nSub` small codeword ids
  * instead of `dim` floats, and queries score codes through a
  * per-query lookup table (asymmetric distance computation, ADC).
  * At 100 TB this is what makes the index FIT — 64 floats become 8
  * bytes — and IVF+PQ together are the standard billion-scale layout
  * (cells bound the scan, codes bound the memory).
  *
  * Spark shape, all declarative:
  *  - [[train]]: one [[Ivf.train]] k-means per subspace over a sliced
  *    view of the corpus (codebooks are nSub·k·subDim doubles —
  *    always driver/broadcast-small by construction);
  *  - [[encode]]: a pure scan-side projection — the argmin over k
  *    codewords is an `array_min` over a LITERAL struct array of
  *    codeword distances (whole-stage codegen, no join, no shuffle);
  *  - [[adcTopK]]: queries build their 8×k inner-product tables,
  *    which broadcast; the encoded corpus is scanned once with
  *    `element_at` lookups per subspace — the corpus never shuffles
  *    beyond the bounded per-query top-k.
  *
  * Determinism: codebooks come from [[Ivf.train]] (deterministic
  * seeds), encoding ties break by codeword id, ADC ties by candidate
  * id — reproducible run-to-run like every other ANN path here.
  */
object Pq {

  /** Local codebooks: codebooks(m)(j) = codeword j of subspace m. */
  final case class Codebooks(subDim: Int, books: Array[Array[Array[Double]]]) {
    def nSub: Int = books.length
    def k: Int = books.headOption.map(_.length).getOrElse(0)
  }

  private def sliceCol(vec: Column, m: Int, subDim: Int): Column =
    slice(vec, m * subDim + 1, subDim)

  /** Nearest-codeword id (0-based) of subspace m as a pure scan
    * expression: argmin over ‖sub − cw‖² with the codeword-independent
    * ‖sub‖² term dropped — an `array_min` over a literal struct array,
    * ties toward the lower codeword id. Whole-stage codegen, no join,
    * no shuffle. Shared by [[train]]'s Lloyd step and [[encode]]. */
  private def codeCol(vec: Column, m: Int, subDim: Int,
      book: Array[Array[Double]]): Column = {
    val sub = sliceCol(vec, m, subDim)
    val entries = book.zipWithIndex.map { case (cw, j) =>
      val d2 = lit(cw.map(x => x * x).sum) -
        lit(2.0) * dotNative(sub, array(cw.map(lit): _*))
      struct(d2.as("d2"), lit(j).as("j"))
    }
    array_min(array(entries: _*)).getField("j")
  }

  /** Per-subspace k-means codebooks. ALL subspaces train together:
    * each Lloyd round is ONE job — codes come from the scan-side
    * [[codeCol]] expression against the current (literal) codebooks,
    * and a single (subspace·k + code)-keyed [[VecMeanAgg]] shuffle
    * recomputes every codeword mean (map tasks emit one (Σ, n) per
    * codeword — O(nSub·k·subDim) per task regardless of corpus size).
    * Codebooks are nSub·k·subDim doubles, materialized on the driver
    * per round (constant-depth plans, the Ivf.train lesson). */
  def train(corpus: DataFrame, dim: Int, nSub: Int, k: Int,
      nIters: Int): Codebooks = {
    require(dim % nSub == 0, s"dim $dim not divisible by nSub $nSub")
    val subDim = dim / nSub
    val spark = corpus.sparkSession
    import spark.implicits._
    // seeds: first k vectors by id, sliced into every subspace
    val seeds = corpus.orderBy("vec_id").limit(k)
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
      .collect()
      .sortBy(r => r.getAs[Number](0).longValue())
      .map(_.getSeq[Double](1).toArray)
    var books: Array[Array[Array[Double]]] =
      Array.tabulate(nSub)(m => seeds.map(_.slice(m * subDim, (m + 1) * subDim)))
    val meanAgg = new VecMeanAgg
    var it = 0
    while (it < nIters) {
      val parts = (0 until nSub).map { m =>
        struct((lit(m * k) + codeCol(col("embedding"), m, subDim, books(m)))
            .as("key"),
          transform(sliceCol(col("embedding"), m, subDim), x => x.cast("double"))
            .as("v"))
      }
      val means = corpus
        .select(posexplode(array(parts: _*)).as(Seq("m", "s")))
        .select(col("s.key"), col("s.v")).as[(Int, Seq[Double])]
        .groupByKey(_._1)
        .agg(meanAgg.toColumn.name("mn"))
        .collect()
        .map { case (key, mn) => key -> mn.toArray }.toMap
      // empty codewords keep their previous value
      books = Array.tabulate(nSub)(m =>
        Array.tabulate(k)(j => means.getOrElse(m * k + j, books(m)(j))))
      it += 1
    }
    Codebooks(subDim, books)
  }

  /** Scan-side encoder: adds `code` (array<int>, 0-based codeword ids,
    * one per subspace) — one [[codeCol]] argmin per subspace, all in
    * the scan projection. */
  def encode(corpus: DataFrame, cb: Codebooks): DataFrame =
    corpus.withColumn("code", array((0 until cb.nSub).map(m =>
      codeCol(col("embedding"), m, cb.subDim, cb.books(m))): _*))

  /** Decoded (reconstructed) vector for a code — spec/diagnostic
    * helper; production never materializes it. */
  def decode(code: Seq[Int], cb: Codebooks): Array[Double] =
    code.zipWithIndex.flatMap { case (j, m) => cb.books(m)(j) }.toArray

  /** ADC cosine top-k over an encoded corpus: every query precomputes
    * its nSub×k inner-product table (tiny, broadcast); each corpus row
    * costs nSub `element_at` lookups. Norm uses the EXACT stored
    * vector norm (kept beside the code — the standard trick to keep
    * cosine well-scaled while the dot is approximated). Output schema
    * matches [[Similarity.bruteForceTopK]].
    *
    * `rerank > 0` enables the production refinement: ADC retrieves the
    * top-`rerank` candidates per query, which are re-scored with the
    * EXACT dot — recall approaches exact while only `rerank` true
    * vectors per query are touched. `rerank ≥ |corpus|` degenerates to
    * exact brute force (PqSpec anchors this to
    * [[Similarity.bruteForceTopK]], which carries the q22 oracle).
    * Here the candidate vectors ride the scan; at 100 TB they'd be
    * point-fetched by id after the ADC pass instead. */
  def adcTopK(encoded: DataFrame, queries: DataFrame, k: Int,
      cb: Codebooks, rerank: Int = 0): DataFrame = {
    val spark = encoded.sparkSession
    import spark.implicits._
    // per-query LUT: lut(m)(j) = dot(q_m, codeword_mj), built on the
    // driver from the collected (small) query set — queries are the
    // broadcast side by contract, same as bruteForceTopK
    val qRows = queries
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"),
        normNative(col("embedding")).as("qn"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray, r.getDouble(2)))
    val lutDF = qRows.toSeq.map { case (qid, qv, qn) =>
      val lut = cb.books.zipWithIndex.map { case (book, m) =>
        book.map { cw =>
          var s = 0.0
          var i = 0
          while (i < cb.subDim) { s += qv(m * cb.subDim + i) * cw(i); i += 1 }
          s
        }.toSeq
      }.toSeq
      (qid, lut, qn, qv.toSeq)
    }.toDF("q_id", "lut", "q_norm", "q_vec")
    val corpus = encoded.select(col("vec_id").as("c_id"), col("code"),
      col("embedding").as("c_vec"), normNative(col("embedding")).as("c_norm"))
    // static unroll: one element_at chain per subspace, codegen-friendly
    val dotApprox = (0 until cb.nSub)
      .map(m => element_at(element_at(col("lut"), m + 1),
        element_at(col("code"), m + 1) + 1))
      .reduce(_ + _)
    val scored = corpus.crossJoin(broadcast(lutDF))
      .filter(col("q_id") =!= col("c_id"))
      .withColumn("score", round(dotApprox / (col("q_norm") * col("c_norm")), 6))
    val w = Window.partitionBy("q_id").orderBy(col("score").desc, col("c_id"))
    if (rerank <= 0)
      scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
        .select(col("q_id"), col("rk"), col("c_id"), col("score"))
    else {
      // refinement: exact dot over the ADC top-`rerank` candidates only
      val cand = scored.withColumn("rk0", row_number().over(w))
        .filter(col("rk0") <= rerank)
        .withColumn("exact_score",
          round(dotNative(col("q_vec"), col("c_vec")) / (col("q_norm") * col("c_norm")), 6))
      val w2 = Window.partitionBy("q_id")
        .orderBy(col("exact_score").desc, col("c_id"))
      cand.withColumn("rk", row_number().over(w2)).filter(col("rk") <= k)
        .select(col("q_id"), col("rk"), col("c_id"),
          col("exact_score").as("score"))
    }
  }

  /** Recall@k of PQ-ADC against the exact baseline, per query
    * (mirrors [[Ivf.recallVsExact]]). */
  def recallVsExact(corpus: DataFrame, queries: DataFrame, k: Int,
      dim: Int, nSub: Int, codewords: Int, nIters: Int,
      rerank: Int = 0): DataFrame = {
    val cb = train(corpus, dim, nSub, codewords, nIters)
    val exact = Similarity.bruteForceTopK(corpus, queries, k)
      .select(col("q_id"), col("c_id"))
    val approx = adcTopK(encode(corpus, cb), queries, k, cb, rerank)
      .select(col("q_id"), col("c_id"))
    exact.join(approx, Seq("q_id", "c_id"), "left_semi")
      .groupBy("q_id").agg(count(lit(1)).as("hits"))
      .join(exact.groupBy("q_id").agg(count(lit(1)).as("n_exact")), Seq("q_id"), "right")
      .select(col("q_id"),
        round(coalesce(col("hits"), lit(0)).cast("double") / col("n_exact"), 4).as("recall"))
  }
}
