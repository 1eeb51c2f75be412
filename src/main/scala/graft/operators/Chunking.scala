package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sliding-window chunking: documents → fixed-size token sequences,
  * the map from a cleaned corpus to training examples (context-window
  * packing's upstream neighbor; [[Packing]] bins the chunks this
  * operator emits).
  *
  * Scale shape: a pure per-row generator in the scan projection —
  * `sequence` builds the chunk starts, `posexplode` emits one row per
  * chunk, nothing shuffles and nothing is buffered beyond one row's
  * starts. Token boundaries are whitespace splits (empties dropped),
  * chosen because both engines compute them identically — swap
  * [[graft.functions.TextFunctions.bpeTokenCount]]'s regex in for a
  * BPE-ish boundary when parity is not required.
  */
object Chunking {

  /** Whitespace tokens with empty strings dropped — identical in
    * Spark (`split` + `filter`) and DuckDB (`string_split` +
    * `list_filter`), which is what makes chunk geometry
    * oracle-checkable. */
  def tokens(text: Column): Column =
    filter(split(text, " "), t => length(t) > 0)

  /** One row per (input row, chunk): all input columns except
    * `textCol`, plus `chunk_idx` (0-based), `tok_start` (token offset
    * of the window) and `tok_count` (window length; the last chunk may
    * be short). Windows advance by `chunkSize - overlap` tokens; rows
    * with zero tokens emit no chunks. */
  def slidingTokenWindows(df: DataFrame, textCol: String,
      chunkSize: Int, overlap: Int): DataFrame = {
    require(chunkSize > 0 && overlap >= 0 && overlap < chunkSize,
      "need 0 <= overlap < chunkSize")
    val stride = chunkSize - overlap
    val keep = df.columns.filterNot(_ == textCol).map(col).toSeq
    df.withColumn("__n", size(tokens(col(textCol))))
      .filter(col("__n") > 0)
      .select(keep ++ Seq(col("__n"),
        posexplode(sequence(lit(0), col("__n") - 1, lit(stride)))
          .as(Seq("chunk_idx", "tok_start"))): _*)
      .select(keep ++ Seq(
        col("chunk_idx").cast("bigint"),
        col("tok_start").cast("bigint"),
        least(lit(chunkSize), col("__n") - col("tok_start"))
          .cast("bigint").as("tok_count")): _*)
  }
}
