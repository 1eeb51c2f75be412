package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Budget-constrained corpus selection: per group, take rows in
  * descending score order until a weight budget is exhausted — "the
  * highest-quality documents up to N tokens per source", the standard
  * final step of corpus assembly.
  *
  * The sequential definition (sort by score, running-sum, cut) caps
  * parallelism at #groups and sorts whole groups — the same trap
  * [[Quantiles.exactQuantiles]] avoids, solved the same way: bucket
  * scores into a fixed histogram, accumulate WEIGHT mass per bucket
  * (histogram-sized data), select whole buckets above the boundary,
  * and run the running-sum window only INSIDE the single boundary
  * bucket per group (≈1/nBuckets of the data, partitioned by (group,
  * bucket)). Result is row-identical to the sequential definition:
  * bucket order refines score order, and ids break ties within a
  * bucket exactly as the total order (score desc, id asc) does.
  */
object BudgetSelect {

  /** Selects the prefix of each group's rows in (scoreCol desc, idCol
    * asc) order whose running `weightCol` sum stays ≤ budget. Output:
    * (groupCol, idCol, weightCol, scoreCol) of selected rows. */
  def byScoreBudget(df: DataFrame, groupCol: String, idCol: String,
      weightCol: String, scoreCol: String, budget: Long,
      nBuckets: Int = 1024): DataFrame = {
    // Integral scores keep their exact 64-bit type end to end: ordering
    // and tie-breaks never pass through a double, so weights above 2^53
    // (reachable for [[ImportanceResampling.selectTopK]]'s exact integer
    // ratio weights at scale) still rank identically to the integer
    // oracle. The lossy double PROJECTION below is used only for bucket
    // ASSIGNMENT, where long→double rounding being monotone means a
    // collision merely co-buckets neighbors — bucket order still refines
    // exact score order.
    val qIsIntegral = df.schema(scoreCol).dataType match {
      case org.apache.spark.sql.types.ByteType | org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.IntegerType | org.apache.spark.sql.types.LongType => true
      case _ => false
    }
    val base = df.select(col(groupCol).as("g"), col(idCol).as("id"),
      col(weightCol).cast("long").as("w"),
      (if (qIsIntegral) col(scoreCol).cast("long")
       else col(scoreCol).cast("double")).as("q"))
    // per-group score range → fixed bucket width (tiny, broadcast
    // back). localCheckpoint, not persist: same leak-avoidance
    // rationale as Quantiles.exactQuantiles — checkpoint blocks are
    // ContextCleaner-reclaimed, CacheManager entries are not. Same
    // tradeoff too: lineage is truncated, so executor loss fails the
    // query rather than recomputing this tiny table.
    val stats = base.groupBy("g").agg(min("q").as("vmin"), max("q").as("vmax"))
      .localCheckpoint()
    val wb = base.join(broadcast(stats), "g")
      .withColumn("bw", (col("vmax").cast("double") - col("vmin").cast("double"))
        / lit(nBuckets.toDouble))
      .withColumn("bucket",
        when(col("bw") === 0.0, lit(0))
          .otherwise(least(floor(
            (col("q").cast("double") - col("vmin").cast("double")) / col("bw")),
            lit((nBuckets - 1).toLong)).cast("int")))
    // weight-mass histogram + cumulative mass of higher-score buckets
    val hist = wb.groupBy("g", "bucket").agg(sum("w").as("mass"))
    val cum = hist.withColumn("cum_above",
      coalesce(sum("mass").over(
        Window.partitionBy("g").orderBy(col("bucket").desc)
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    // buckets selected whole vs the one boundary bucket per group
    val full = cum.filter(col("cum_above") + col("mass") <= budget)
      .select("g", "bucket")
    val boundary = cum
      .filter(col("cum_above") <= budget && col("cum_above") + col("mass") > budget)
      .select(col("g"), col("bucket"), col("cum_above"))
    val out = Seq(col("g"), col("id"), col("w"), col("q"))
    val fullSel = wb.join(broadcast(full), Seq("g", "bucket"), "left_semi")
      .select(out: _*)
    val wIn = Window.partitionBy("g", "bucket")
      .orderBy(col("q").desc, col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val bSel = wb.join(broadcast(boundary), Seq("g", "bucket"))
      .withColumn("cum_in", sum("w").over(wIn))
      .filter(col("cum_above") + col("cum_in") <= budget)
      .select(out: _*)
    fullSel.unionByName(bSel)
      .withColumnRenamed("g", groupCol).withColumnRenamed("id", idCol)
      .withColumnRenamed("w", weightCol).withColumnRenamed("q", scoreCol)
  }
}
