package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact per-group continuous quantiles (`quantile_cont` semantics) at
  * 100 TB group sizes: two-level bucket histogram + within-bucket rank
  * selection.
  *
  * Why not the alternatives:
  *  - built-in `percentile()` buffers EVERY value of a group in one
  *    aggregation buffer (value→count map, sorted single-threaded at
  *    merge) — OOM at large groups (measured 13 s at sf0.1).
  *  - a whole-group window sort (`row_number` over partitionBy(group))
  *    is spillable but caps parallelism at #groups: with 3 groups, 3
  *    sort tasks carry the entire table at any scale.
  *
  * The two-level form keeps every stage scale-free:
  *  1. per-group min/max (hash agg, map-side partial);
  *  2. fixed-width bucket histogram per group (hash agg on
  *     (group, bucket) — parallelism = #groups · nBuckets);
  *  3. cumulative counts over the HISTOGRAM (≤ #groups · nBuckets
  *     rows — driver-scale metadata, windowed per group) locate, for
  *     each requested rank `r = ⌊p·(n−1)⌋ / ⌈p·(n−1)⌉`, the bucket
  *     containing it and the rank local to that bucket;
  *  4. only the needed buckets (≤ 2·|ps| per group, ~n/nBuckets rows
  *     each) are re-read (broadcast semi-join prunes the rest) and
  *     rank-selected with a window partitioned by (group, bucket) —
  *     the sort touches a ~2·|ps|/nBuckets fraction of the data and
  *     parallelism is #needed-buckets, not #groups.
  *
  * Interpolation matches DuckDB `quantile_cont` exactly (hash-verified
  * by q34): `v_lo·(⌈pos⌉−pos) + v_hi·(pos−⌊pos⌋)`, `pos = p·(n−1)`.
  * Null values are excluded (quantile over non-null, `n` counts
  * non-null rows — `quantile_cont` semantics).
  */
object Quantiles {

  /** @param df       input
    * @param groupCol grouping column name
    * @param valCol   numeric value column (cast to double)
    * @param ps       (output column name, quantile in [0,1]) pairs
    * @param nBuckets histogram resolution; the selection sort touches
    *                 ~2·|ps|/nBuckets of the data
    * Output: (groupCol, <one column per ps name>, n), one row per group.
    */
  def exactQuantiles(df: DataFrame, groupCol: String, valCol: String,
      ps: Seq[(String, Double)], nBuckets: Int = 1024): DataFrame = {
    val base = df.select(col(groupCol).as("g"), col(valCol).cast("double").as("v"))
      .filter(col("v").isNotNull)
    // 1. per-group value range → fixed bucket width. Materialized via
    // localCheckpoint: the bucketed view is consumed by BOTH the
    // histogram pass and the selection pass, and without
    // materialization each would re-scan the base for the min/max agg.
    // #groups rows — always tiny. localCheckpoint (not persist): a
    // persist() registers in the CacheManager and leaks one cached
    // table per invocation unless the caller unpersists; checkpoint
    // blocks are dropped by the ContextCleaner once the plan is GC'd.
    // Tradeoff: localCheckpoint truncates lineage, so losing the
    // executor holding the block fails the query instead of
    // recomputing — acceptable for this #groups-row table (cheap to
    // re-run); long-lived cluster jobs wanting fault tolerance should
    // prefer reliable checkpointing or caller-owned persist.
    val stats = base.groupBy("g").agg(min("v").as("vmin"), max("v").as("vmax"))
      .localCheckpoint()
    val wb = base.join(broadcast(stats), "g")
      .withColumn("bw", (col("vmax") - col("vmin")) / lit(nBuckets.toDouble))
      .withColumn("bucket",
        when(col("bw") === 0.0, lit(0))
          .otherwise(least(floor((col("v") - col("vmin")) / col("bw")),
            lit((nBuckets - 1).toLong)).cast("int")))
    // 2. histogram: one row per non-empty (group, bucket) — ≤
    // #groups·nBuckets rows, always tiny. Materialized like `stats`:
    // downstream it feeds the cumulative window AND two broadcast
    // subtrees (`tb`, `needed`), and broadcast subqueries execute as
    // separate concurrent jobs that would each re-aggregate the full
    // base scan (measured on q53: several overlapping 32-task jobs
    // racing the same scan before any cache lands). With the
    // checkpoint they all read one histogram-sized leaf and only the
    // selection pass re-scans base.
    val hist = wb.groupBy("g", "bucket").agg(count(lit(1)).as("cnt"))
      .localCheckpoint()
    // 3. cumulative counts over the histogram (histogram-sized data).
    val cum = hist
      .withColumn("cum_before", coalesce(sum("cnt").over(
        Window.partitionBy("g").orderBy("bucket")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("n", sum("cnt").over(Window.partitionBy("g")))
    // Requested global ranks: ⌊pos⌋ and ⌈pos⌉ per quantile.
    val pArr = array(ps.map { case (nm, p) =>
      struct(lit(nm).as("pname"), lit(p).as("p")) }: _*)
    val targets = cum.select("g", "n").distinct()
      .select(col("g"), col("n"), explode(pArr).as("q"))
      .withColumn("pos", col("q.p") * (col("n") - 1).cast("double"))
      .select(col("g"), col("q.pname").as("pname"), col("pos"),
        explode(array(floor(col("pos")), ceil(col("pos")))).as("r"))
      .distinct()
    // Rank → (bucket, local rank): cum_before ≤ r < cum_before + cnt.
    val tb = targets.join(cum.select("g", "bucket", "cnt", "cum_before"), Seq("g"))
      .filter(col("r") >= col("cum_before") && col("r") < col("cum_before") + col("cnt"))
      .select(col("g"), col("pname"), col("pos"), col("r"), col("bucket"),
        (col("r") - col("cum_before")).as("local_r"))
    // 4. prune to needed buckets, rank within each, pick the targets.
    val needed = tb.select("g", "bucket").distinct()
    val wIn = Window.partitionBy("g", "bucket").orderBy("v")
    val sel = wb.join(broadcast(needed), Seq("g", "bucket"), "left_semi")
      .withColumn("local_r", (row_number().over(wIn) - 1).cast("long"))
      .join(broadcast(tb), Seq("g", "bucket", "local_r"))
    val q = sel.groupBy("g", "pname")
      .agg(
        max(when(col("r") === floor(col("pos")), col("v"))).as("vLo"),
        max(when(col("r") === ceil(col("pos")), col("v"))).as("vHi"),
        first(col("pos")).as("pos"))
      .withColumn("qv",
        when(floor(col("pos")) === ceil(col("pos")), col("vLo"))
          .otherwise(col("vLo") * (ceil(col("pos")) - col("pos")) +
            col("vHi") * (col("pos") - floor(col("pos")))))
    val ns = hist.groupBy("g").agg(sum("cnt").as("n"))
    val wide = ps.map { case (nm, _) =>
      max(when(col("pname") === nm, col("qv"))).as(nm)
    }
    q.groupBy("g")
      .agg(wide.head, wide.tail: _*)
      .join(ns, "g")
      .withColumnRenamed("g", groupCol)
  }
}
