package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** BM25 ranked retrieval over the document corpus — the lexical
  * counterpart of the embedding ANN paths (retrieval-augmented data
  * curation mines training examples with exactly this scorer). The
  * reference converter has no retrieval surface; this is one of the
  * training-data-pipeline families the brief adds as first-class (see
  * /root/reference/db2ice/converter.py:1 scope).
  *
  * Spark-first shape, and the one that survives 100 TB:
  *   - the term-frequency table is the postings aggregate (one
  *     `groupBy(doc, term)` shuffle over the exploded token stream);
  *     doc lengths ride the same scan; `avgdl`/`N` are one-row aggs
  *     that broadcast;
  *   - the query set joins the tf table ON TERM with the query side
  *     broadcast — the corpus-sized postings never shuffle for the
  *     probe; per-(query, doc) contributions re-aggregate on the
  *     bounded (q_id, doc) key and rank through the bounded [[TopK]]
  *     aggregator (O(queries·k) exchange, no per-query sort);
  *   - at indexed scale the tf table is the thing you persist/bucket
  *     by term (the inverted-index layout [[Search.postings]] already
  *     uses); the probe plan is bucket-local joins.
  *
  * Float discipline: per-row BM25 arithmetic is exact IEEE mirrored
  * op-for-op in the oracle; the cross-TERM sum per (query, doc) routes
  * through DECIMAL(28,12) so partial-aggregation order cannot perturb
  * the double (the q49/q53 idiom). `idf` defaults to the Robertson
  * log form for production use; `linearIdf = true` swaps the exact
  * rational (N − df + ½)/(df + ½) so the whole scorer is
  * DuckDB-checkable (ln differs in the final ulp across engines) —
  * same monotone per-term direction, rank-compatible on the fixture.
  */
object Bm25 {

  /** (doc_id, term, tf) postings aggregate + (doc_id, dl) lengths off
    * one tokenization; words() tokens, stopwords kept (BM25's idf
    * already damps them). */
  def termFrequencies(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol),
        explode(filter(TextFunctions.words(col(textCol)),
          t => length(t) > 0)).as("term"))
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))

  /** Score `queries(q_id, term)` against the corpus: one row per
    * (q_id, rk, doc, score), rk 1..k by score desc, doc id asc. */
  def search(docs: DataFrame, idCol: String, textCol: String,
      queries: DataFrame, k: Int, k1: Double = 1.2, b: Double = 0.75,
      linearIdf: Boolean = false): DataFrame = {
    val tf = termFrequencies(docs, idCol, textCol)
    val dl = docs.select(col(idCol),
      size(filter(TextFunctions.words(col(textCol)),
        t => length(t) > 0)).cast("double").as("dl"))
    val stats = docs.agg(
      count(lit(1)).cast("double").as("n_docs"),
      (sum(size(filter(TextFunctions.words(col(textCol)),
        t => length(t) > 0))).cast("double") /
        count(lit(1)).cast("double")).as("avgdl"))
    // df restricted to the probe's terms BEFORE broadcasting — the full
    // vocabulary table is corpus-sized and must never broadcast
    val df = tf.groupBy("term").agg(count(lit(1)).cast("double").as("df"))
      .join(broadcast(queries.select("term").distinct()), Seq("term"))
    val idf: Column =
      if (linearIdf) (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))
      else log((col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1.0))
    val contrib = tf
      .join(broadcast(queries), Seq("term")) // query side is tiny
      .join(broadcast(df), Seq("term"))
      .join(dl, Seq(idCol))
      .crossJoin(broadcast(stats))
      .select(col("q_id"), col(idCol),
        (idf * (col("tf").cast("double") * lit(k1 + 1.0)) /
          (col("tf").cast("double") +
            lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))))
          .as("c"))
    val scored = contrib.groupBy(col("q_id"), col(idCol))
      .agg(round(sum(col("c").cast("decimal(28,12)")).cast("double"), 6)
        .as("score"))
    TopK.perKey(scored, "q_id", idCol, "score", k)
  }

  /** Deterministic probe mining for the fixture query: the top
    * `nQueries·termsPerQuery` non-stopword terms by document frequency
    * (ties by term), grouped into consecutive runs of `termsPerQuery`
    * — a bounded table (window over ≤ dozens of rows, scale-exempt). */
  def minedQueries(docs: DataFrame, idCol: String, textCol: String,
      nQueries: Int, termsPerQuery: Int): DataFrame = {
    val stop = TextFunctions.Stopwords("en").toSeq
    val df = termFrequencies(docs, idCol, textCol)
      .filter(!col("term").isin(stop: _*))
      .groupBy("term").agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc, col("term"))
      .limit(nQueries * termsPerQuery)
    df.withColumn("rn",
        row_number().over(Window.orderBy(col("df").desc, col("term"))))
      .select((((col("rn") - 1) / termsPerQuery).cast("int") + 1).as("q_id"),
        col("term"))
  }
}
