package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.CheckpointBridge

/** Distributed BPE (byte-pair-encoding) tokenizer training + encoding
  * — the Sennrich recipe re-expressed over DataFrames:
  *
  *  1. The corpus collapses to a (distinct word, frequency) table —
  *     orders of magnitude under the corpus at any scale (the
  *     classical BPE trick: merges depend only on word counts).
  *  2. Each word starts as its character symbols plus a `</w>`
  *     terminator.
  *  3. Per merge round: count adjacent symbol pairs weighted by word
  *     frequency (one explode + sum shuffle over the WORD table, not
  *     the corpus), take the most frequent pair (count desc, pair asc
  *     — deterministic), and greedily rewrite every word's symbol
  *     array left-to-right. The rewrite is checkpointed per round so
  *     plan depth stays constant across any merge count (same shape
  *     as [[Dedup.duplicateClusters]]'s rounds), and superseded
  *     rounds free their blocks eagerly.
  *
  * Encoding applies the learned merges rank-order greedily per word —
  * a broadcast merge list and a per-row function, so encoding the
  * full corpus is scan-side work.
  *
  * Training is exactly the sequential algorithm (spec-pinned against
  * a local reference implementation): pair counts are associative
  * sums, the argmax is total-ordered, and the greedy rewrite is
  * per-word — so distribution changes nothing about the result.
  */
object Bpe {

  /** End-of-word marker (keeps merges from crossing word boundaries
    * and lets a decoder restore spacing). */
  val EndOfWord = "</w>"

  private def greedyMerge(syms: Seq[String], a: String, b: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toSeq
  }

  /** The (word, freq, symbols) start state of training. */
  private def wordTable(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(Chunking.tokens(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .select(col("word"), col("freq"),
        concat(split(col("word"), ""), array(lit(EndOfWord))).as("syms"))

  /** Learn up to `nMerges` merges: Seq of (left, right) in rank order.
    * Stops early when no pair occurs at least `minCount` times. Each
    * round runs ONE distributed pair-count job over the (checkpointed
    * once) start-state word table with every merge learned so far
    * re-applied in rank order inside the row function — greedy merges
    * compose exactly that way (it is [[encode]]'s definition), so the
    * counted state is identical to the old materialize-per-round form
    * while the per-round localCheckpoint job (and its block churn) is
    * gone: rounds cost one job each instead of two, and only the
    * single argmax row ever crosses the driver. Re-applying i merges
    * per round is symbol-array CPU on the word table — orders of
    * magnitude under the corpus by step 1's collapse. */
  def trainMerges(docs: DataFrame, textCol: String, nMerges: Int,
      minCount: Long = 2L): Seq[(String, String)] = {
    require(nMerges >= 0, "nMerges must be >= 0")
    val tbl0 = wordTable(docs, textCol).localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    // ONE udf reused every round, merges arriving as a literal column:
    // the generated code is textually identical across rounds (only
    // the referenced literal changes), so codegen compiles once
    // instead of once per round
    val applyMerges = udf((syms: Seq[String], ms: Seq[Seq[String]]) => {
      var s = syms
      ms.foreach { m => s = greedyMerge(s, m(0), m(1)) }
      s
    })
    var rounds = 0
    while (rounds < nMerges) {
      val sofar = merges.toList.map(p => Seq(p._1, p._2))
      // guard: a fully-merged word has one symbol, and Spark's
      // sequence(1, 0) counts DOWN — emit no pairs instead
      val top = tbl0
        .withColumn("syms", applyMerges(col("syms"), typedlit(sofar)))
        .select(col("freq"), explode(
          when(size(col("syms")) >= 2,
            transform(sequence(lit(1), size(col("syms")) - 1),
              i => struct(element_at(col("syms"), i).as("a"),
                element_at(col("syms"), i + 1).as("b"))))
            .otherwise(array().cast("array<struct<a:string,b:string>>"))).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("freq")).as("n"))
        .orderBy(col("n").desc, col("a"), col("b"))
        .limit(1).collect()
      if (top.isEmpty || top.head.getLong(2) < minCount) rounds = nMerges
      else {
        merges += ((top.head.getString(0), top.head.getString(1)))
        rounds += 1
      }
    }
    CheckpointBridge.freeCheckpoint(tbl0)
    merges.toSeq
  }

  /** Encode `textCol` with learned merges: per-row tokenize → chars →
    * apply merges in rank order greedily. Pure scan-side projection
    * (the merge list broadcasts); returns array<string> of BPE
    * symbols. */
  def encode(textCol: Column, merges: Seq[(String, String)]): Column = {
    val enc = udf((text: String) => {
      if (text == null) Seq.empty[String]
      else text.split(" ").filter(_.nonEmpty).toSeq.flatMap { w =>
        var syms: Seq[String] = w.split("").toSeq :+ EndOfWord
        merges.foreach { case (a, b) => syms = greedyMerge(syms, a, b) }
        syms
      }
    })
    enc(textCol)
  }

  /** Reference single-node trainer (test oracle): same algorithm on
    * plain Scala collections. */
  private[graft] def trainMergesLocal(corpus: Seq[String], nMerges: Int,
      minCount: Long = 2L): Seq[(String, String)] = {
    val freq = scala.collection.mutable.Map.empty[String, Long]
    corpus.foreach(_.split(" ").filter(_.nonEmpty)
      .foreach(w => freq(w) = freq.getOrElse(w, 0L) + 1))
    var words: Seq[(Seq[String], Long)] =
      freq.toSeq.map { case (w, f) => (w.split("").toSeq :+ EndOfWord, f) }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var continueLoop = true
    while (continueLoop && merges.size < nMerges) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((syms, f) <- words; i <- 0 until syms.length - 1)
        counts((syms(i), syms(i + 1))) =
          counts.getOrElse((syms(i), syms(i + 1)), 0L) + f
      val best = counts.toSeq
        .sortBy { case ((a, b), n) => (-n, a, b) }.headOption
      best match {
        case Some(((a, b), n)) if n >= minCount =>
          merges += ((a, b))
          words = words.map { case (syms, f) => (greedyMerge(syms, a, b), f) }
        case _ => continueLoop = false
      }
    }
    merges.toSeq
  }
}
