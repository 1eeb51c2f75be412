package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines: reproducible
  * train/val/test splits, Bernoulli samples and per-group caps, all
  * keyed on a CONTENT hash rather than a random number generator.
  *
  * Why hash-based, not `rand()`/`df.sample()`:
  *  - reproducible across runs, engines and cluster layouts — the
  *    split of a document never depends on partitioning or seed
  *    plumbing, so a re-run (or a different engine) assigns every row
  *    identically; this is what makes holdout contamination auditable;
  *  - a pure scan-side projection/filter — no shuffle, no state, works
  *    identically at 100 TB and in streaming;
  *  - oracle-checkable: the hash is the first 32 bits of md5(key),
  *    which DuckDB computes bit-identically (same trick as the q21
  *    SimHash oracle — md5 is the one high-quality hash both engines
  *    expose).
  *
  * The unit interval value is `hv / 2^32` where hv = first 8 hex chars
  * of md5(salt || key) — an integer-valued double divided by a power
  * of two, so the division is EXACT and threshold comparisons agree
  * bit-for-bit across engines.
  */
object Sampling {

  /** First 32 bits of md5(salt || key) as a bigint in [0, 2^32). */
  def hashValue(key: Column, salt: String = ""): Column = {
    val keyed = if (salt.isEmpty) key.cast("string")
    else concat(lit(salt), key.cast("string"))
    conv(substring(md5(keyed), 1, 8), 16, 10).cast("bigint")
  }

  /** Deterministic uniform [0,1) from the key hash (exact double). */
  def hashUnit(key: Column, salt: String = ""): Column =
    hashValue(key, salt) / lit(4294967296.0)

  /** Adds a `split` column assigning each row to one of the named
    * fractions (must sum to ≤1; the LAST named bucket absorbs any
    * remainder, so fractions summing to exactly 1 give exact
    * semantics). E.g.
    * `assignSplit(docs, col("doc_id"), Seq("train"->0.8, "val"->0.1, "test"->0.1))`. */
  def assignSplit(df: DataFrame, key: Column,
      splits: Seq[(String, Double)], salt: String = ""): DataFrame = {
    require(splits.nonEmpty && splits.map(_._2).sum <= 1.0 + 1e-9,
      "split fractions must sum to at most 1")
    val u = hashUnit(key, salt)
    val cums = splits.scanLeft(0.0)(_ + _._2).tail
    val expr = splits.zip(cums).init
      .foldRight(lit(splits.last._1): Column) { case (((name, _), cum), acc) =>
        when(u < lit(cum), lit(name)).otherwise(acc)
      }
    df.withColumn("split", expr)
  }

  /** Deterministic Bernoulli sample: keeps rows with hash-unit below
    * `fraction`. Different `salt`s give independent samples. */
  def bernoulli(df: DataFrame, key: Column, fraction: Double,
      salt: String = ""): DataFrame =
    df.filter(hashUnit(key, salt) < lit(fraction))

  /** Deterministic source-mix upsampling: assigns each row an integer
    * `repeats` so that a group's expected repeat count equals a weight
    * derived from the group-size ratio (classic "temperature"
    * rebalancing of under-represented sources/languages before
    * training). `weightOf` maps the ratio column max_n/n to the weight
    * — pass `r => sqrt(r)` for temperature 0.5; use only
    * correctly-rounded IEEE ops (sqrt, div, +, ×) if the result must
    * be engine-reproducible (`pow` is NOT correctly rounded and can
    * differ across math libraries). The fractional part is realized
    * per row by the content hash: repeats = ⌊w⌋ + (u < frac(w)), so
    * the assignment is reproducible row-for-row — no RNG, no
    * partitioning dependence — and Σ repeats/n → w. The counts
    * aggregate is the only shuffle; weights broadcast back. */
  def mixRepeats(df: DataFrame, groupCol: String, key: Column,
      weightOf: Column => Column, salt: String = "mix"): DataFrame = {
    val counts = df.groupBy(col(groupCol)).agg(count(lit(1)).as("__n"))
    val weights = counts
      .crossJoin(broadcast(counts.agg(max(col("__n")).as("__maxn"))))
      .select(col(groupCol),
        weightOf(col("__maxn").cast("double") / col("__n").cast("double"))
          .as("__w"))
    df.join(broadcast(weights), Seq(groupCol))
      .withColumn("repeats",
        (floor(col("__w")) +
          when(hashUnit(key, salt) < col("__w") - floor(col("__w")), 1)
            .otherwise(0)).cast("bigint"))
      .drop("__w")
  }

  /** Deterministic stratified sample: an independent Bernoulli rate
    * per stratum (strata missing from `rates` keep `defaultRate`),
    * keyed on the content hash like every sampler here — reproducible
    * across runs/engines/partitionings, pure scan-side filter (the
    * rate table rides as a CASE expression; even a million-stratum
    * rate table would broadcast-join, never shuffle the corpus).
    * The standard corpus-shaping move: downsample over-represented
    * languages/sources at per-stratum rates in one pass. */
  /** Deterministic weighted sampling WITHOUT replacement — the
    * Efraimidis–Spirakis scheme: every item competes with a key
    * distributed as u^(1/w), and the k largest keys win (items with
    * twice the weight are twice as likely to beat any given rival,
    * without ever being drawn twice). Integer weights use the EXACT
    * equivalent construction — the max of w independent hashed draws
    * (max of w uniforms ≡ u^(1/w) in distribution) — so every step is
    * integer arithmetic on md5 folds and the whole sampler
    * hash-checks against a SQL oracle: no pow, no ln, no
    * engine-specific float libm. Weights clamp to [1, maxWeight]; the
    * draw fan-out is w per row (scan-side generate, map-side max
    * combine, one one-row-per-item shuffle). At weights beyond the
    * clamp, production switches to the float-key u^(1/w) form — same
    * ranking contract, O(1) draws, no exact oracle.
    *
    * Returns the (idCol, weight, draw) rows of the k winners, ranked
    * (draw desc, id asc) through [[BudgetSelect]]'s histogram cut (no
    * global sort — the [[ImportanceResampling.selectTopK]] path). */
  def weightedSample(df: DataFrame, idCol: String, weightCol: Column,
      k: Long, salt: String = "wrs:", maxWeight: Int = 64): DataFrame = {
    require(maxWeight >= 1)
    val draws = weightedDraws(df, idCol, weightCol, salt, maxWeight)
    draws.join(
      ImportanceResampling.selectTopK(draws, idCol, "draw", k),
      Seq(idCol), "left_semi")
  }

  /** The per-item competition keys behind [[weightedSample]]:
    * (idCol, weight, draw) with draw = max of `weight` hashed draws. */
  def weightedDraws(df: DataFrame, idCol: String, weightCol: Column,
      salt: String = "wrs:", maxWeight: Int = 64): DataFrame =
    df.select(col(idCol),
        least(greatest(weightCol.cast("int"), lit(1)), lit(maxWeight))
          .as("weight"))
      .select(col(idCol), col("weight"),
        explode(sequence(lit(1), col("weight"))).as("j"))
      .select(col(idCol), col("weight"),
        hashValue(concat(col(idCol).cast("string"), lit(":"),
          col("j").cast("string")), salt).as("hv"))
      .groupBy(col(idCol))
      .agg(max(col("weight")).as("weight"), max(col("hv")).as("draw"))

  def stratifiedSample(df: DataFrame, strataCol: String, key: Column,
      rates: Seq[(String, Double)], defaultRate: Double = 0.0,
      salt: String = "strat"): DataFrame = {
    require(rates.forall { case (_, r) => r >= 0.0 && r <= 1.0 } &&
      defaultRate >= 0.0 && defaultRate <= 1.0, "rates must be in [0,1]")
    val rate = rates.foldRight(lit(defaultRate): Column) {
      case ((stratum, r), acc) =>
        when(col(strataCol) === lit(stratum), lit(r)).otherwise(acc)
    }
    df.filter(hashUnit(key, salt) < rate)
  }

  /** Deterministic shard assignment for training export: `shard` =
    * hash(key) mod nShards. The reproducible stand-in for a global
    * "shuffle then split into N files" — every engine and every run
    * routes a document to the same shard, shard sizes concentrate
    * tightly around n/N (md5 is uniform), and the assignment is a pure
    * scan-side projection: the only shuffle a writer pays is the final
    * `repartition("shard")` it chooses to do. */
  def shardByHash(df: DataFrame, key: Column, nShards: Int,
      salt: String = ""): DataFrame = {
    require(nShards > 0, "nShards must be positive")
    df.withColumn("shard",
      pmod(hashValue(key, salt), lit(nShards.toLong)).cast("bigint"))
  }

  /** Deterministic cap: at most `k` rows per group, chosen by hash
    * order (stable "which k" across runs). Runs on the bounded
    * [[TopKAggregator]] — map-side partial top-k, the shuffle carries
    * O(groups·k), never a whole-group sort. Output: (groupCol, rk,
    * idCol) with rk 1..k by hash asc, id asc. */
  def capPerGroup(df: DataFrame, groupCol: String, idCol: String, k: Int,
      salt: String = ""): DataFrame = {
    // TopK keeps the LARGEST scores; negate the hash for "smallest k".
    val scored = df.select(col(groupCol), col(idCol),
      (-hashValue(col(idCol), salt).cast("double")).as("neg_hash"))
    TopK.perStringKey(scored, groupCol, idCol, "neg_hash", k)
      .drop("neg_hash")
  }
}
