package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Changelog (CDC) operators: SCD2 validity intervals and latest-wins
  * compaction — what a training-data pipeline runs over mutable
  * upstream feeds (user profiles, label corrections, document
  * re-crawls) before joining them to the corpus.
  *
  * Scale design: both operators key on the NATURAL key of the feed
  * (e.g. (user_id, event_type)), which is high-cardinality — so the
  * SCD2 window sorts per-key version lists (bounded by version count,
  * never the table; cf. the q34 lesson about low-cardinality window
  * keys), and the compaction is a bounded aggregation with map-side
  * partials whose shuffle carries O(keys) rows.
  */
object Cdc {

  /** SCD2 intervals from a changelog: one row per version with
    * `valid_from` (its own ordering key), `valid_to` (the next
    * version's, null while current) and `is_current`. `tieCol` must
    * make (orderCol, tieCol) unique per key so the version chain is
    * deterministic. */
  def scd2(df: DataFrame, keyCols: Seq[String], orderCol: String,
      tieCol: String): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(orderCol), col(tieCol))
    df.withColumn("valid_from", col(orderCol))
      .withColumn("valid_to", lead(col(orderCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
  }

  /** Latest-wins compaction WITHOUT a window: the per-key argmax rides
    * in `max(struct(order, tie, payload…))`, a bounded aggregation —
    * each map task reduces its partition to one candidate per key
    * before the shuffle. The scale path when only the current version
    * matters (the common case when refreshing a dimension before a
    * corpus join). Output: keyCols ++ (last_<order>, last_<payload>…,
    * n_versions). */
  def compactLatest(df: DataFrame, keyCols: Seq[String], orderCol: String,
      tieCol: String, payloadCols: Seq[String]): DataFrame = {
    val ordered = (Seq(orderCol, tieCol) ++ payloadCols).map(col)
    df.groupBy(keyCols.map(col): _*)
      .agg(max(struct(ordered: _*)).as("__best"),
        count(lit(1)).as("n_versions"))
      .select(keyCols.map(col) ++
        Seq(col(s"__best.$orderCol").as(s"last_$orderCol")) ++
        payloadCols.map(c => col(s"__best.$c").as(s"last_$c")) ++
        Seq(col("n_versions")): _*)
  }
}
