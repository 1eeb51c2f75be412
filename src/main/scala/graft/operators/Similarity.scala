package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Two paths (SURVEY.md / builder brief):
  *  - [[bruteForceTopK]] — exact baseline: broadcast the (small) query
  *    set, one streaming pass over the corpus, per-query top-k. At
  *    100 TB the corpus side never shuffles; cost is a single scan ×
  *    |queries| fused into whole-stage codegen.
  *  - [[lshTopK]] — scale path: random-hyperplane LSH buckets corpus
  *    and queries; each query searches only its bucket (probe=1) —
  *    turns scan×|Q| into bucket-local work. Recall measured against
  *    the baseline in tests/queries.
  *
  * Hot-path arithmetic uses the native [[graft.functions.VectorDot]]
  * expression (one generated loop, constant compile cost) with norms
  * precomputed ONCE per row — the per-pair work is a single dot, not
  * three interpreted HOF folds. Results are bit-identical to the
  * sequential-fold formulation (same left-to-right addition order), so
  * the DuckDB oracles hold.
  */
object Similarity {

  /** cosine = dot / (na · nb) with precomputed norm columns. */
  private def pairScore(qv: Column, cv: Column, nq: Column, nc: Column,
      dim: Int): Column =
    round(dotNative(qv, cv) / (nq * nc), 6)

  /** Exact top-k by cosine for each query vector. Scores rounded to 6
    * decimals (engine-portable); ties broken by corpus id. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      dim: Int = 64): DataFrame = {
    val c = corpus.select(col("vec_id").as("c_id"), col("embedding").as("c_vec"),
      normNative(col("embedding")).as("c_norm"))
    val q = queries.select(col("vec_id").as("q_id"), col("embedding").as("q_vec"),
      normNative(col("embedding")).as("q_norm"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("q_id") =!= col("c_id"))
      .withColumn("score",
        pairScore(col("q_vec"), col("c_vec"), col("q_norm"), col("c_norm"), dim))
    val w = Window.partitionBy(col("q_id")).orderBy(col("score").desc, col("c_id"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("q_id"), col("rk"), col("c_id"), col("score"))
  }

  /** Exact top-k via the bounded [[TopK]] Aggregator instead of a
    * window sort: per-partition partial top-k runs map-side, so the
    * shuffle carries O(queries·k) rows, not every scored candidate —
    * the form that survives a 100× corpus scale-up. Output is
    * identical to [[bruteForceTopK]]. */
  def bruteForceTopKAgg(corpus: DataFrame, queries: DataFrame, k: Int,
      dim: Int = 64): DataFrame = {
    val c = corpus.select(col("vec_id").as("c_id"), col("embedding").as("c_vec"),
      normNative(col("embedding")).as("c_norm"))
    val q = queries.select(col("vec_id").as("q_id"), col("embedding").as("q_vec"),
      normNative(col("embedding")).as("q_norm"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("q_id") =!= col("c_id"))
      .select(col("q_id"), col("c_id"),
        pairScore(col("q_vec"), col("c_vec"), col("q_norm"), col("c_norm"), dim).as("score"))
    TopK.perKey(scored, "q_id", "c_id", "score", k)
  }

  /** Hard-negative mining for contrastive/embedding training: per
    * query, the top-k most similar corpus vectors BELOW `posThreshold`
    * — near enough to be informative negatives, far enough to not be
    * positives/near-dups (the SimCSE/DPR mining recipe). Same bounded
    * shape as [[bruteForceTopKAgg]]: queries broadcast, corpus never
    * shuffles, O(queries·k) rank exchange; the threshold compares the
    * 6-dp-rounded score, so the cut is engine-portable. */
  def hardNegatives(corpus: DataFrame, queries: DataFrame, k: Int,
      posThreshold: Double, dim: Int = 64): DataFrame = {
    val c = corpus.select(col("vec_id").as("c_id"), col("embedding").as("c_vec"),
      normNative(col("embedding")).as("c_norm"))
    val q = queries.select(col("vec_id").as("q_id"), col("embedding").as("q_vec"),
      normNative(col("embedding")).as("q_norm"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("q_id") =!= col("c_id"))
      .select(col("q_id"), col("c_id"),
        pairScore(col("q_vec"), col("c_vec"), col("q_norm"), col("c_norm"), dim).as("score"))
      .filter(col("score") < posThreshold)
    TopK.perKey(scored, "q_id", "c_id", "score", k)
  }

  /** LSH-bucketed approximate top-k with multi-probe: each query probes
    * its own bucket plus all hamming-1 neighbors (nPlanes+1 probes) —
    * recovers neighbors that fell just across one hyperplane while
    * staying bucket-local (never a full corpus scan). */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      nPlanes: Int, dim: Int): DataFrame = {
    val c = corpus.select(col("vec_id").as("c_id"), col("embedding").as("c_vec"),
      normNative(col("embedding")).as("c_norm"),
      lshBucket(col("embedding"), nPlanes, dim).as("c_bucket"))
    val q = queries.select(col("vec_id").as("q_id"), col("embedding").as("q_vec"),
      normNative(col("embedding")).as("q_norm"),
      lshBucket(col("embedding"), nPlanes, dim).as("q_base"))
      .select(col("q_id"), col("q_vec"), col("q_norm"),
        explode(lshProbeBuckets(col("q_base"), nPlanes)).as("q_bucket"))
    // probe buckets are pairwise-distinct and each corpus row has one
    // bucket, so a (q_id, c_id) pair matches at most one probe — no
    // dedup needed before ranking. Ranking is the bounded [[TopK]]
    // aggregator: the shuffle carries O(queries·k) rows, never every
    // bucket-local candidate.
    val scored = c.join(broadcast(q), col("c_bucket") === col("q_bucket"))
      .filter(col("q_id") =!= col("c_id"))
      .select(col("q_id"), col("c_id"),
        pairScore(col("q_vec"), col("c_vec"), col("q_norm"), col("c_norm"), dim).as("score"))
    TopK.perKey(scored, "q_id", "c_id", "score", k)
  }

  /** Cross-corpus cosine threshold join: every (a, b) pair with
    * cosine ≥ threshold, b-side broadcast — the semantic-contamination
    * check between a training corpus and a (small) holdout/benchmark
    * embedding set. Same physical shape as [[bruteForceTopK]]: the
    * train side never shuffles, cost is one scan × |holdout| in
    * whole-stage codegen. For a LARGE right side, bucket both sides
    * with [[graft.functions.VectorFunctions.lshBucket]] and join
    * bucket-local instead. */
  def crossCosinePairs(a: DataFrame, b: DataFrame, threshold: Double,
      dim: Int = 64): DataFrame = {
    val l = a.select(col("vec_id").as("a_id"), col("embedding").as("a_vec"),
      normNative(col("embedding")).as("a_norm"))
    val r = b.select(col("vec_id").as("b_id"), col("embedding").as("b_vec"),
      normNative(col("embedding")).as("b_norm"))
    l.crossJoin(broadcast(r))
      .withColumn("score",
        pairScore(col("a_vec"), col("b_vec"), col("a_norm"), col("b_norm"), dim))
      .filter(col("score") >= threshold)
      .select(col("a_id"), col("b_id"), col("score"))
  }

  /** Embedding near-duplicate pairs: all (a<b) pairs with cosine ≥
    * threshold. Demo-scale all-pairs; the production path buckets via
    * [[graft.functions.VectorFunctions.lshBucket]] first. */
  def cosineNearDupPairs(corpus: DataFrame, threshold: Double,
      dim: Int = 64): DataFrame = {
    val a = corpus.select(col("vec_id").as("a_id"), col("embedding").as("a_vec"),
      normNative(col("embedding")).as("a_norm"))
    val b = corpus.select(col("vec_id").as("b_id"), col("embedding").as("b_vec"),
      normNative(col("embedding")).as("b_norm"))
    a.crossJoin(b).filter(col("a_id") < col("b_id"))
      .withColumn("score",
        pairScore(col("a_vec"), col("b_vec"), col("a_norm"), col("b_norm"), dim))
      .filter(col("score") >= threshold)
      .select(col("a_id"), col("b_id"), col("score"))
  }

  /** Blocked all-pairs near-dup: identical output to
    * [[cosineNearDupPairs]], different physical shape. Vectors are
    * packed into blocks of ~`blockSize`; unordered block pairs cross-
    * join ((n/B)² rows instead of n²) and a tight per-block-pair kernel
    * emits only the pairs above threshold. This drops the per-pair join
    * machinery (BNLJ row copy + filter + projection ≈ µs/pair) to a
    * per-BLOCK cost, leaving ~ns/pair arithmetic — the blocked-GEMM
    * shape all-pairs similarity takes at scale. At 100 TB the block
    * table is still n/B rows and the cross-join (n/B)²: the production
    * path buckets by LSH first (see [[graft.functions.VectorFunctions
    * .lshBucket]]) and runs this kernel within buckets.
    *
    * Numeric contract: same index-order dot, sqrt norms, and
    * HALF_UP-on-shortest-decimal rounding as the expression form, so
    * results are bit-identical (spec-asserted) and the DuckDB oracle
    * holds. */
  def cosineNearDupPairsBlocked(corpus: DataFrame, threshold: Double,
      blockSize: Int = 128): DataFrame = {
    import corpus.sparkSession.implicits._
    // Pack each block as PRIMITIVE flat arrays (ids, norms, flattened
    // vectors): primitive-array encoders bulk-copy without per-element
    // boxing, which otherwise dominates the kernel. The struct
    // collect_list keeps (id, vec, nrm) aligned; the flat layout is
    // derived from it in one projection.
    val packed = corpus
      .select(col("vec_id").cast("long").as("id"), col("embedding").as("vec"),
        normNative(col("embedding")).as("nrm"),
        floor(col("vec_id") / lit(blockSize)).cast("int").as("block"))
      .groupBy("block")
      .agg(collect_list(struct(col("id"), col("vec"), col("nrm"))).as("items"))
      .select(col("block"),
        transform(col("items"), x => x.getField("id")).as("ids"),
        transform(col("items"), x => x.getField("nrm")).as("nrms"),
        flatten(transform(col("items"), x => x.getField("vec"))).as("flat"))
    val a = packed.select(col("block").as("b1"), col("ids").as("ids1"),
      col("nrms").as("nrms1"), col("flat").as("flat1"))
    val b = packed.select(col("block").as("b2"), col("ids").as("ids2"),
      col("nrms").as("nrms2"), col("flat").as("flat2"))
    val pairs = a.crossJoin(b).filter(col("b1") <= col("b2"))
      .as[(Int, Array[Long], Array[Double], Array[Float],
           Int, Array[Long], Array[Double], Array[Float])]
    pairs.flatMap { case (blk1, ids1, nrms1, flat1, blk2, ids2, nrms2, flat2) =>
      val n1 = ids1.length
      val n2 = ids2.length
      val dim = if (n1 > 0) flat1.length / n1 else 0
      val same = blk1 == blk2
      val out = Seq.newBuilder[(Long, Long, Double)]
      var i = 0
      while (i < n1) {
        val idI = ids1(i); val nI = nrms1(i); val oi = i * dim
        // same block: unordered pairs once (j > i); cross block: all.
        var j = if (same) i + 1 else 0
        while (j < n2) {
          val oj = j * dim
          var dot = 0.0
          var d = 0
          while (d < dim) { dot += flat1(oi + d).toDouble * flat2(oj + d).toDouble; d += 1 }
          // java BigDecimal.valueOf == Spark round(): HALF_UP over the
          // shortest-decimal rendering of the double.
          val score = java.math.BigDecimal.valueOf(dot / (nI * nrms2(j)))
            .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
          if (score >= threshold) {
            val idJ = ids2(j)
            if (idI < idJ) out += ((idI, idJ, score))
            else if (idJ < idI) out += ((idJ, idI, score))
          }
          j += 1
        }
        i += 1
      }
      out.result()
    }.toDF("a_id", "b_id", "score")
  }

  /** SemDeDup-style semantic dedup: drop a document when an EARLIER
    * (lower-id) document in its comparison set has cosine ≥ threshold
    * with it; keep the rest. With `nClusters = 1` the comparison set
    * is the whole corpus via the blocked exact kernel — the mode the
    * q70 oracle hash-checks. With `nClusters > 1` the corpus is
    * k-means-clustered first and comparisons are CLUSTER-LOCAL — the
    * published SemDeDup recipe, which is what survives at 100 TB: the
    * quadratic term is bounded by cell sizes, each cell's pairs
    * shuffle on `cid`, and the pruned pair set is a subset of the
    * exact mode's (cluster-local survivors ⊇ exact survivors,
    * spec-asserted), trading a bounded recall loss for linear-ish
    * cost exactly like q20/q25/q31 do for their exact anchors.
    * Output: the surviving corpus rows. */
  def semanticDedup(corpus: DataFrame, threshold: Double,
      nClusters: Int = 1, nIters: Int = 5): DataFrame = {
    val pairs =
      if (nClusters <= 1) cosineNearDupPairsBlocked(corpus, threshold)
      else {
        val asg = Ivf.assign(corpus, Ivf.train(corpus, nClusters, nIters))
        val a = asg.select(col("cid"), col("id").as("a_id"),
          col("vec").as("a_vec"), sqrt(col("n2")).as("a_norm"))
        val b = asg.select(col("cid"), col("id").as("b_id"),
          col("vec").as("b_vec"), sqrt(col("n2")).as("b_norm"))
        a.join(b, "cid").filter(col("a_id") < col("b_id"))
          .withColumn("score", pairScore(col("a_vec"), col("b_vec"),
            col("a_norm"), col("b_norm"), 0))
          .filter(col("score") >= threshold)
          .select(col("a_id"), col("b_id"), col("score"))
      }
    corpus.join(pairs.select(col("b_id").as("vec_id")).distinct(),
      Seq("vec_id"), "left_anti")
  }

  /** Recall@k of the LSH path against the exact baseline, per query. */
  def lshRecall(corpus: DataFrame, queries: DataFrame, k: Int,
      nPlanes: Int, dim: Int): DataFrame = {
    val exact = bruteForceTopK(corpus, queries, k, dim)
      .select(col("q_id"), col("c_id"))
    val approx = lshTopK(corpus, queries, k, nPlanes, dim)
      .select(col("q_id"), col("c_id"))
    exact.join(approx, Seq("q_id", "c_id"), "left_semi")
      .groupBy("q_id").agg(count(lit(1)).as("hits"))
      .join(exact.groupBy("q_id").agg(count(lit(1)).as("n_exact")), Seq("q_id"), "right")
      .select(col("q_id"),
        round(coalesce(col("hits"), lit(0)).cast("double") / col("n_exact"), 4).as("recall"))
  }
}
