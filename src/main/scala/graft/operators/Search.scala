package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Positional inverted index + phrase search over the corpus — the
  * "find every document containing this exact phrase" primitive a
  * training-data pipeline uses for targeted contamination checks and
  * corpus forensics (e.g. locating benchmark questions verbatim).
  *
  * The index is the classic search-engine shape: one (token, doc, pos)
  * posting per token occurrence, partitioned by token — at 100 TB the
  * postings table is written bucketed by token once and every phrase
  * query is a bucket-local m-way self-join, no corpus rescan. Phrase
  * matching is the textbook positional join: occurrences of token i
  * at pos p must pair with token i+1 at pos p+1; each join's right
  * side is a single token's postings (broadcast-small for all but
  * stop-word tokens, where a real engine would reorder rarest-first —
  * [[phraseOccurrences]] keeps left-to-right order, which is already
  * rarest-first for the top-phrase use here).
  */
object Search {

  /** The positional inverted index: (token, doc_id, pos), pos 1-based
    * in token offsets. */
  def postings(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
      posexplode(Chunking.tokens(col(textCol))).as(Seq("p0", "token")))
      .select(col("token"), col("doc_id"), (col("p0") + 1).as("pos"))

  /** All occurrences of a multi-token phrase: (doc_id, pos of the
    * phrase's first token). */
  def phraseOccurrences(post: DataFrame, phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "empty phrase")
    var acc = post.filter(col("token") === phrase.head)
      .select(col("doc_id"), col("pos"))
    for ((t, i) <- phrase.zipWithIndex.drop(1)) {
      val nxt = post.filter(col("token") === t)
        .select(col("doc_id").as("__d"), (col("pos") - i).as("__p"))
      acc = acc.join(nxt,
        acc("doc_id") === nxt("__d") && acc("pos") === nxt("__p"))
        .select(acc("doc_id"), acc("pos"))
    }
    acc
  }

  /** Mine the top-`n` trigram phrases (occurrence count desc, phrase
    * asc — deterministic) and run each through the positional phrase
    * search: (phrase, n_docs, n_occurrences, sum_ids). The phrase list
    * crossing the driver is bounded by `n` (broadcast-small contract,
    * like IVF centroids); everything else is distributed. */
  def topPhraseStats(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 5): DataFrame = {
    val w = Chunking.tokens(col(textCol))
    val tri = docs.select(col(idCol).as("doc_id"), w.as("__w"))
      .filter(size(col("__w")) >= 3)
      .select(col("doc_id"), explode(
        transform(sequence(lit(1), size(col("__w")) - 2),
          i => concat_ws(" ", slice(col("__w"), i, lit(3))))).as("phrase"))
    val top: Seq[String] = tri.groupBy("phrase").count()
      .orderBy(col("count").desc, col("phrase"))
      .limit(n).collect().map(_.getString(0)).toSeq
    val post = postings(docs, idCol, textCol)
    top.map { p =>
      phraseOccurrences(post, p.split(' ').toSeq)
        .groupBy("doc_id").agg(count(lit(1)).as("c"))
        .agg(count(lit(1)).cast("bigint").as("n_docs"),
          sum(col("c")).cast("bigint").as("n_occurrences"),
          sum(col("doc_id")).cast("bigint").as("sum_ids"))
        .select(lit(p).as("phrase"), col("n_docs"), col("n_occurrences"),
          col("sum_ids"))
    }.reduce(_ unionByName _)
  }
}
