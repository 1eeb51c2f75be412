package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.PqEncode
import graft.functions.VectorFunctions._

/** IVF+PQ — the standard billion-scale ANN layout, composing the two
  * scale paths: IVF coarse cells bound the SCAN (a query touches only
  * its nProbe cells' inverted lists) and PQ codes bound the MEMORY
  * (each list entry is nSub bytes of codes plus one stored norm, not
  * dim floats). The composed ladder (brute → LSH → IVF → PQ → IVF+PQ)
  * is exactly SURVEY §8's path to 100 TB similarity search.
  *
  * Spark shape: [[buildIndex]] is one scan-side projection over the
  * cell assignment — (cid, c_id, code, c_norm), the codes-only
  * inverted file you'd bucket-materialize by cid at scale (the same
  * layout PlanSpec's bucketed-IVF test pins); [[topK]] joins the
  * broadcast probe list against it, ADC-scores through the broadcast
  * per-query LUTs, ranks with the bounded [[TopK]] aggregator
  * (O(queries·rerank) shuffle), and point-fetches only the surviving
  * candidates' true vectors for the exact re-rank.
  *
  * Exactness anchor: with nProbe = nCentroids and rerank ≥ |corpus|
  * every cell is probed and every candidate re-ranked exactly, so the
  * result degenerates to [[Similarity.bruteForceTopK]] — which carries
  * the q22 DuckDB oracle (PipelineSpec asserts the equality). Recall
  * at small (nProbe, rerank) is measured by [[recallVsExact]] (q60).
  */
object IvfPq {

  /** The codes-only inverted file: (cid, c_id, code, c_norm). The
    * embedding is read once here (index build) and never again until
    * re-rank — searches scan nSub ints + one double per row. */
  def buildIndex(corpus: DataFrame, centroids: DataFrame,
      cb: Pq.Codebooks): DataFrame =
    Ivf.assign(corpus, centroids)
      .select(col("cid"), col("id").as("c_id"),
        PqEncode(col("vec"), cb.books).as("code"),
        sqrt(col("n2")).as("c_norm"))

  /** Search a materialized codes-only inverted file (the [[buildIndex]]
    * layout: cid, c_id, code, c_norm) — the production shape: the index
    * is built once, bucket-materialized by cid, and searched many
    * times without ever re-reading embedding bytes. `rerank > 0`
    * point-fetches the surviving candidates' true vectors from
    * `vectors` (vec_id, embedding — required when rerank > 0). */
  def searchIndex(index: DataFrame, queries: DataFrame, k: Int,
      centroids: DataFrame, nProbe: Int, cb: Pq.Codebooks,
      rerank: Int = 0, vectors: DataFrame = null): DataFrame = {
    require(rerank <= 0 || vectors != null,
      "rerank > 0 needs `vectors` (vec_id, embedding) to point-fetch candidates")
    val lutDF = Pq.buildLut(queries, cb)
    val probes = Ivf.probes(queries, centroids, nProbe).select("cid", "q_id")
    // cell-pruned ADC: only rows of probed cells are scored, and the
    // scored projection is (q_id, c_id, score) — codes never leave the
    // scan stage, vectors are not touched at all
    val scored = index
      .join(broadcast(probes), "cid")
      .join(broadcast(lutDF.select("q_id", "lut", "q_norm")), "q_id")
      .filter(col("q_id") =!= col("c_id"))
      .select(col("q_id"), col("c_id"),
        round(Pq.adcDot(col("lut"), col("code"), cb.nSub) /
          (col("q_norm") * col("c_norm")), 6).as("score"))
    if (rerank <= 0) TopK.perKey(scored, "q_id", "c_id", "score", k)
    else Pq.exactRerank(TopK.perKey(scored, "q_id", "c_id", "score", rerank),
      vectors, lutDF, k)
  }

  /** IVF+PQ cosine top-k: probe nProbe cells, ADC-score their lists,
    * exact-re-rank the top-`rerank` ADC candidates (0 = no re-rank).
    * Output schema matches [[Similarity.bruteForceTopK]]. */
  def topK(corpus: DataFrame, queries: DataFrame, k: Int,
      centroids: DataFrame, nProbe: Int, cb: Pq.Codebooks,
      rerank: Int = 0): DataFrame =
    searchIndex(buildIndex(corpus, centroids, cb), queries, k, centroids,
      nProbe, cb, rerank, corpus.select(col("vec_id"), col("embedding")))

  /** Recall@k of IVF+PQ against the exact baseline, per query (mirrors
    * [[Ivf.recallVsExact]] / [[Pq.recallVsExact]]). */
  def recallVsExact(corpus: DataFrame, queries: DataFrame, k: Int,
      nCentroids: Int, centroidIters: Int, nProbe: Int,
      dim: Int, nSub: Int, codewords: Int, pqIters: Int,
      rerank: Int): DataFrame = {
    val centroids = Ivf.train(corpus, nCentroids, centroidIters)
    val cb = Pq.train(corpus, dim, nSub, codewords, pqIters)
    val exact = Similarity.bruteForceTopK(corpus, queries, k)
      .select(col("q_id"), col("c_id"))
    val approx = topK(corpus, queries, k, centroids, nProbe, cb, rerank)
      .select(col("q_id"), col("c_id"))
    exact.join(approx, Seq("q_id", "c_id"), "left_semi")
      .groupBy("q_id").agg(count(lit(1)).as("hits"))
      .join(exact.groupBy("q_id").agg(count(lit(1)).as("n_exact")), Seq("q_id"), "right")
      .select(col("q_id"),
        round(coalesce(col("hits"), lit(0)).cast("double") / col("n_exact"), 4).as("recall"))
  }
}
