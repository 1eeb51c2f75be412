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

  /** Per-subspace k-means: train one codebook per `nSub` contiguous
    * subvector ranges. `dim` must be divisible by nSub. */
  def train(corpus: DataFrame, dim: Int, nSub: Int, k: Int,
      nIters: Int): Codebooks = {
    require(dim % nSub == 0, s"dim $dim not divisible by nSub $nSub")
    val subDim = dim / nSub
    val books = (0 until nSub).toArray.map { m =>
      Ivf.train(
          corpus.select(col("vec_id"),
            sliceCol(col("embedding"), m, subDim).as("embedding")),
          nCentroids = k, nIters = nIters)
        .select(col("cid"), col("c_vec")).collect()
        .map(r => r.getInt(0) -> r.getSeq[Double](1).toArray)
        .sortBy(_._1).map(_._2)
    }
    Codebooks(subDim, books)
  }

  /** Scan-side encoder: adds `code` (array<int>, 0-based codeword ids,
    * one per subspace). The per-subspace argmin is an `array_min` over
    * a literal struct array — ties break toward the lower codeword id
    * via the struct's (distance, id) ordering. */
  def encode(corpus: DataFrame, cb: Codebooks): DataFrame = {
    val codeCols = (0 until cb.nSub).map { m =>
      val sub = sliceCol(col("embedding"), m, cb.subDim)
      val entries = cb.books(m).zipWithIndex.map { case (cw, j) =>
        val cwLit = array(cw.map(lit): _*)
        // argmin over ‖sub − cw‖² drops the codeword-independent
        // ‖sub‖² term: rank by −2·sub·cw + ‖cw‖² only
        val d2 = lit(cw.map(x => x * x).sum) -
          lit(2.0) * dotNative(sub, cwLit)
        struct(d2.as("d2"), lit(j).as("j"))
      }
      array_min(array(entries: _*)).getField("j")
    }
    corpus.withColumn("code", array(codeCols: _*))
  }

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
