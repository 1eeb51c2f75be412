package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bucketed interval (range) join: match point rows to interval rows of
  * the same key with `start <= point < end`.
  *
  * Naive Spark plans a keyed range join as an equi-join on the key plus
  * a post-filter — fine — but with a LOW-cardinality key it degenerates
  * to near-cross-product fanout before the filter (every point × every
  * interval of the key). The scalable formulation COARSENS TIME INTO
  * THE JOIN KEY: explode each interval into the fixed-width buckets it
  * overlaps, bucket each point once, equi-join on (key, bucket), then
  * apply the exact range predicate. Fanout per point is the number of
  * intervals overlapping its bucket — proportional to local density,
  * not to the key's total interval count. Bucket width trades explode
  * fanout (wide intervals → many buckets) against join fanout; set it
  * near the typical interval length.
  *
  * Output: one row per (point, matching interval) pair — a plain
  * equi-join result, dedup/aggregate downstream as needed.
  */
object RangeJoin {

  /** @param points      point rows
    * @param intervals   interval rows
    * @param key         equi-key column names (present in both)
    * @param pointCol    long point coordinate column in `points`
    * @param startCol    long inclusive start column in `intervals`
    * @param endCol      long exclusive end column in `intervals`
    * @param bucketWidth bucket width in the coordinate's unit
    */
  def pointsInIntervals(points: DataFrame, intervals: DataFrame,
      key: Seq[String], pointCol: String, startCol: String, endCol: String,
      bucketWidth: Long): DataFrame = {
    val b = lit(bucketWidth)
    // Bucket ids are the bucket START values, computed with pure
    // integer arithmetic: `c - pmod(c, w)` is exact floor-alignment
    // for ANY long (pmod is non-negative, so negatives floor
    // correctly). `floor(c / w)` would divide in DOUBLE and silently
    // misbucket coordinates beyond 2^53 — the API takes arbitrary
    // longs, not just unix_micros.
    def bucketOf(c: Column): Column = c - pmod(c, b)
    // end is exclusive: an interval [s, e) overlaps the buckets
    // starting at bucketOf(s), bucketOf(s)+w, .., bucketOf(e-1);
    // guard empty intervals (e <= s).
    val iv = intervals
      .filter(col(endCol) > col(startCol))
      .withColumn("__bucket",
        explode(sequence(bucketOf(col(startCol)), bucketOf(col(endCol) - 1), b)))
    val pt = points.withColumn("__bucket", bucketOf(col(pointCol)))
    pt.join(iv, key :+ "__bucket")
      .filter(col(pointCol) >= col(startCol) && col(pointCol) < col(endCol))
      .drop("__bucket")
  }
}
