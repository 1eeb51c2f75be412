package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Positional inverted index + phrase search over the corpus — the
  * "find every document containing this exact phrase" primitive a
  * training-data pipeline uses for targeted contamination checks and
  * corpus forensics (e.g. locating benchmark questions verbatim).
  *
  * The index is the classic search-engine shape: one (token, doc, pos)
  * posting per token occurrence, partitioned by token — at 100 TB the
  * postings table is written bucketed by token once ([[writeIndex]],
  * the same xxhash64-bucket-directory layout as [[Bm25.writeIndex]])
  * and every phrase query is a bucket-local m-way self-join over only
  * the phrase's buckets, no corpus rescan ([[phraseProbe]]). Phrase
  * matching is the textbook positional join: occurrences of token i at
  * pos p must pair with token i+1 at pos p+1; joins run RAREST-FIRST
  * (ascending posting-list length) so the accumulator after join 1 is
  * already no larger than the rarest list — a stop-word-leading phrase
  * must not make join 1 the biggest relation.
  */
object Search {

  /** The positional inverted index: (token, doc_id, pos), pos 1-based
    * in token offsets. */
  def postings(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
      posexplode(Chunking.tokens(col(textCol))).as(Seq("p0", "token")))
      .select(col("token"), col("doc_id"), (col("p0") + 1).as("pos"))

  /** All occurrences of a multi-token phrase: (doc_id, pos of the
    * phrase's FIRST token). `plen` maps token → posting-list length
    * (occurrence count); when present, joins run in ascending-length
    * order — the result set is join-order independent, only the plan
    * cost changes. Unknown tokens order last; ties keep left-to-right. */
  def phraseOccurrences(post: DataFrame, phrase: Seq[String],
      plen: Map[String, Long] = Map.empty): DataFrame = {
    require(phrase.nonEmpty, "empty phrase")
    val order = phrase.indices
      .sortBy(i => (plen.getOrElse(phrase(i), Long.MaxValue), i))
    val h = order.head
    // normalize every token's positions to the phrase's first-token
    // position, so each join is a plain (doc_id, pos) equi-key
    var acc = post.filter(col("token") === phrase(h))
      .select(col("doc_id"), (col("pos") - h).as("pos"))
    for (i <- order.drop(1)) {
      val nxt = post.filter(col("token") === phrase(i))
        .select(col("doc_id").as("__d"), (col("pos") - i).as("__p"))
      acc = acc.join(nxt,
        acc("doc_id") === nxt("__d") && acc("pos") === nxt("__p"))
        .select(acc("doc_id"), acc("pos"))
    }
    acc
  }

  /** Bucket id of a token under the index layout (the [[Bm25]] fold). */
  private def bucketOf(token: org.apache.spark.sql.Column, nBuckets: Int) =
    pmod(xxhash64(token), lit(nBuckets.toLong)).cast("int")

  /** All occurrences of EVERY phrase in the batch — (q_id, doc_id, pos
    * of the phrase's first token) — in ONE join + ONE aggregation,
    * replacing the per-phrase (m−1)-join chains the probe faces used
    * to union (5 trigram phrases = 10 joins = 20+ exchanges; the
    * assembled q92 plan carried 90). The textbook count-of-matched-
    * offsets formulation: postings ⋈ the broadcast (q_id, token,
    * offset) term table on token, every match normalized to its anchor
    * `pos − offset`, then an anchor is an occurrence iff ALL of its
    * phrase's offsets matched — postings are unique per (token, doc,
    * pos), so each (q_id, offset) contributes at most one row per
    * anchor and `count == phrase length` is exactly that test.
    * Identical rows to [[phraseOccurrences]] per phrase (the m-way
    * equi-join chain), with the whole batch's matching done in one
    * map-side-aggregated shuffle of (q_id, doc, anchor) triples
    * instead of m−1 shuffles per phrase. */
  private[operators] def phraseOccurrencesBatch(post: DataFrame,
      phrases: Seq[(Int, Seq[String])]): DataFrame = {
    require(phrases.nonEmpty && phrases.forall(_._2.nonEmpty), "empty phrase")
    val spark = post.sparkSession
    import spark.implicits._
    val terms = phrases.flatMap { case (q, p) =>
      p.zipWithIndex.map { case (tk, i) => (q, tk, i) }
    }.toDF("q_id", "token", "__off")
    val need = phrases.map { case (q, p) => (q, p.length.toLong) }
      .toDF("q_id", "__need")
    post.join(broadcast(terms), Seq("token"))
      .select(col("q_id"), col("doc_id"), (col("pos") - col("__off")).as("pos"))
      .groupBy(col("q_id"), col("doc_id"), col("pos"))
      .agg(count(lit(1)).as("__nm"))
      .join(broadcast(need), Seq("q_id"))
      .filter(col("__nm") === col("__need"))
      .select(col("q_id"), col("doc_id"), col("pos"))
  }

  /** Per-phrase rollup of a batched occurrence table: one row per
    * phrase in `qid` (phrase, n_docs, n_occurrences, sum_ids), with a
    * no-occurrence phrase coming back as (phrase, 0, null, null) —
    * exactly the row the old per-phrase global aggregate produced on
    * an empty occurrence set. */
  private def batchPhraseStats(occ: DataFrame, qid: DataFrame): DataFrame =
    qid.join(
        // right side of the left join broadcasts (≤ one row per phrase);
        // the phrase-name side cannot (build-left outer joins are
        // unsupported) and needs no hint — it is a local relation
        broadcast(occ.groupBy(col("q_id"), col("doc_id")).agg(count(lit(1)).as("c"))
          .groupBy(col("q_id"))
          .agg(count(lit(1)).cast("bigint").as("n_docs"),
            sum(col("c")).cast("bigint").as("n_occurrences"),
            sum(col("doc_id")).cast("bigint").as("sum_ids"))),
        Seq("q_id"), "left")
      .select(col("phrase"), coalesce(col("n_docs"), lit(0L)).as("n_docs"),
        col("n_occurrences"), col("sum_ids"))

  /** (q_id, tokens) batch + (q_id, phrase) local name table for a
    * phrase list — the shared head of every batched probe face. */
  private def phraseBatch(spark: SparkSession,
      top: Seq[String]): (Seq[(Int, Seq[String])], DataFrame) = {
    import spark.implicits._
    val qs = top.zipWithIndex.map { case (p, i) =>
      (i + 1, p, p.split(' ').filter(_.nonEmpty).toSeq) }
    (qs.map { case (q, _, toks) => (q, toks) },
      qs.map { case (q, p, _) => (q, p) }.toDF("q_id", "phrase"))
  }

  /** Current committed version of the layout under `path` (0 = not an
    * index) — the [[VersionedIndex]] pointer shared with [[Bm25]]. */
  def currentVersion(spark: SparkSession, path: String): Int =
    VersionedIndex.currentVersion(spark, path)

  /** True when a complete committed index exists under `path`. */
  def indexExists(spark: SparkSession, path: String): Boolean =
    currentVersion(spark, path) >= 1

  /** The version-`n` postings: union of the resolved base + delta
    * scans ([[VersionedIndex.familyDirs]] — [[compactIndex]] collapses
    * the chain into one base). Bucket filters above the union push
    * into every scan, so pruning survives the split. */
  def postingsTable(spark: SparkSession, path: String, n: Int): DataFrame =
    VersionedIndex.familyDirs(spark, path, "postings", n)
      .map(spark.read.parquet(_)).reduce(_ unionByName _)

  /** The version-`n` tombstoned doc ids (`doc_id` column), or None
    * when the index has never seen a delete — probes skip the
    * anti-join entirely then, keeping never-deleted indexes
    * plan-identical to the pre-delete layout. */
  def tombstonesTable(spark: SparkSession, path: String,
      n: Int): Option[DataFrame] = {
    val dirs = VersionedIndex.familyDirs(spark, path, "tombstones", n)
    if (dirs.isEmpty) None
    else Some(dirs.map(spark.read.parquet(_)).reduce(_ unionByName _))
  }

  /** Remove documents from the positional index WITHOUT rewriting
    * postings — [[Bm25.deleteFromIndex]]'s sibling (the takedown/GDPR
    * path): `ids` (one `doc_id` column) land as a
    * `tombstones/delta_v(n+1)` table, every probe anti-joins its
    * bucket-pruned postings against the chain, and [[compactIndex]]
    * folds the tombstones in permanently (rebuilding the per-token
    * df/n_occ aggregate from the surviving postings). Between delete
    * and compaction the df table's n_occ is slightly stale — it only
    * steers rarest-first JOIN ORDER, never the result set
    * (join-order independence is [[phraseOccurrences]]' contract);
    * `n_tokens` in stats likewise reconciles at compaction. Commit
    * follows the shared hint-flips-LAST protocol; re-deletes are
    * idempotent. Contract: tombstones are GLOBAL — a deleted id must
    * not be re-appended later (ENFORCED: [[appendToIndex]] refuses
    * such ids loudly; compaction folds tombstones in, after which the
    * id is free). */
  def deleteFromIndex(ids: DataFrame, path: String): Unit =
    deleteFromIndexInternal(ids, path, abortBeforeCommit = false)

  /** [[deleteFromIndex]] with the test-only crash-injection point:
    * returns after every data write but before the hint flip. */
  private[graft] def deleteFromIndexInternal(ids: DataFrame, path: String,
      abortBeforeCommit: Boolean): Unit = {
    val spark = ids.sparkSession
    val n = currentVersion(spark, path)
    require(n >= 1, s"no committed index under $path")
    VersionedIndex.clearCrashedAttempt(spark, path, n + 1,
      Seq("postings", "tombstones"))
    val fresh = ids.toDF("doc_id").select(col("doc_id")).distinct()
    val deduped = tombstonesTable(spark, path, n)
      .fold(fresh)(t => fresh.join(t, Seq("doc_id"), "left_anti"))
    // overwrite, not append: a retry clobbers a crashed attempt's delta
    deduped.write.mode("overwrite")
      .parquet(s"$path/tombstones/delta_v${n + 1}")
    dfTable(spark, path, n)
      .repartition(col("bucket"))
      .write.mode("overwrite").partitionBy("bucket")
      .parquet(s"$path/df_v${n + 1}")
    statsTable(spark, path, n)
      .write.mode("overwrite").parquet(s"$path/stats_v${n + 1}")
    // carry the committed batch id forward (sinks' replay guard)
    VersionedIndex.writeTxn(spark, path, n + 1,
      VersionedIndex.committedTxn(spark, path, n))
    if (abortBeforeCommit) return
    VersionedIndex.writeHint(spark, path, n + 1) // commit
    val (fs, _) = VersionedIndex.fsOf(spark, path)
    fs.delete(new org.apache.hadoop.fs.Path(s"$path/df_v$n"), true)
    fs.delete(new org.apache.hadoop.fs.Path(s"$path/stats_v$n"), true)
    fs.delete(new org.apache.hadoop.fs.Path(s"$path/batchid_v$n"), true)
  }

  /** Consolidate the positional index: one postings base with every
    * tombstoned document dropped and the delta chain collapsed —
    * [[Bm25.compactIndex]]'s sibling, same commit protocol (bases
    * first, hint LAST, best-effort cleanup after). With tombstones
    * present, df/n_occ and stats REBUILD from the surviving postings
    * (the permanent fold); untouched indexes carry them forward. */
  def compactIndex(spark: SparkSession, path: String): Unit =
    compactIndexInternal(spark, path, abortBeforeCommit = false)

  private[graft] def compactIndexInternal(spark: SparkSession,
      path: String, abortBeforeCommit: Boolean): Unit = {
    val n = currentVersion(spark, path)
    require(n >= 1, s"no committed index under $path")
    VersionedIndex.clearCrashedAttempt(spark, path, n + 1,
      Seq("postings", "tombstones"))
    val tomb = tombstonesTable(spark, path, n)
    val post = tomb.fold(postingsTable(spark, path, n))(t =>
      postingsTable(spark, path, n).join(t, Seq("doc_id"), "left_anti"))
    post.repartition(col("bucket"))
      .write.mode("overwrite").partitionBy("bucket")
      .parquet(s"$path/postings/base_v${n + 1}")
    tomb.fold(dfTable(spark, path, n)) { _ =>
      // rebuild from the COMPACTED postings (same expression as
      // writeIndex) — tombstoned docs leave df/n_occ for good
      spark.read.parquet(s"$path/postings/base_v${n + 1}")
        .groupBy(col("token"), col("bucket"))
        .agg(countDistinct(col("doc_id")).as("df"),
          count(lit(1)).as("n_occ"))
    }.repartition(col("bucket"))
      .write.mode("overwrite").partitionBy("bucket")
      .parquet(s"$path/df_v${n + 1}")
    tomb.fold(statsTable(spark, path, n)) { _ =>
      val nBuckets = statsTable(spark, path, n)
        .select(col("n_buckets")).head().getInt(0)
      spark.read.parquet(s"$path/postings/base_v${n + 1}")
        .agg(count(lit(1)).as("n_tokens"))
        .withColumn("n_buckets", lit(nBuckets))
    }.write.mode("overwrite").parquet(s"$path/stats_v${n + 1}")
    // tombstones folded in: an EMPTY base resets the family (only
    // written once deletes have created it — never-deleted indexes
    // keep their tombstone-free probe plans)
    tomb.foreach(t => t.limit(0).write.mode("overwrite")
      .parquet(s"$path/tombstones/base_v${n + 1}"))
    // carry the committed batch id forward (sinks' replay guard)
    VersionedIndex.writeTxn(spark, path, n + 1,
      VersionedIndex.committedTxn(spark, path, n))
    if (abortBeforeCommit) return
    VersionedIndex.writeHint(spark, path, n + 1) // commit
    val (fs, _) = VersionedIndex.fsOf(spark, path)
    for (fam <- Seq("postings", "tombstones"); i <- 1 to n) {
      fs.delete(new org.apache.hadoop.fs.Path(s"$path/$fam/delta_v$i"), true)
      fs.delete(new org.apache.hadoop.fs.Path(s"$path/$fam/base_v$i"), true)
    }
    fs.delete(new org.apache.hadoop.fs.Path(s"$path/df_v$n"), true)
    fs.delete(new org.apache.hadoop.fs.Path(s"$path/stats_v$n"), true)
    fs.delete(new org.apache.hadoop.fs.Path(s"$path/batchid_v$n"), true)
  }

  /** The sink transaction the current version committed with (None if
    * none) — the foreachBatch sinks' replay guard
    * ([[VersionedIndex.committedTxn]]). */
  def committedTxn(spark: SparkSession, path: String): Option[IndexCommitTxn] =
    VersionedIndex.committedTxn(spark, path, currentVersion(spark, path))

  /** The version-`n` per-token (df, n_occ) table. */
  def dfTable(spark: SparkSession, path: String, n: Int): DataFrame =
    spark.read.parquet(s"$path/df_v$n")

  /** The version-`n` one-row stats table. */
  def statsTable(spark: SparkSession, path: String, n: Int): DataFrame =
    spark.read.parquet(s"$path/stats_v$n")

  /** Materialize the positional index: one tokenization pass fans into
    * the crash-safe [[VersionedIndex]] layout under `path` —
    *
    *   - `postings/delta_v1` (token, doc_id, pos) partitioned by
    *     `bucket` = xxhash64(token) mod nBuckets — a phrase probe
    *     reads only its tokens' bucket directories (partition
    *     pruning);
    *   - `df_v1` (token, df, n_occ) on the same layout: document
    *     frequency and posting-list length per token — the probe's
    *     rarest-first ordering reads list lengths from here instead of
    *     re-counting postings;
    *   - `stats_v1` — a single (n_tokens, n_buckets) row; carrying
    *     n_buckets in-band makes the index self-describing —
    *
    * then commits by flipping `version-hint.text`. Build cost equals
    * one direct search's postings pass; every later probe is
    * corpus-free, and [[appendToIndex]] folds new documents in
    * without re-tokenizing history. */
  def writeIndex(docs: DataFrame, idCol: String, textCol: String,
      path: String, nBuckets: Int = 64,
      txn: Option[IndexCommitTxn] = None): Unit = {
    val spark = docs.sparkSession
    VersionedIndex.clearCrashedAttempt(spark, path, 1,
      Seq("postings", "tombstones"))
    val post = postings(docs, idCol, textCol)
      .withColumn("bucket", bucketOf(col("token"), nBuckets))
      .persist()
    try {
      post.repartition(col("bucket"))
        .write.mode("overwrite").partitionBy("bucket")
        .parquet(s"$path/postings/delta_v1")
      post.groupBy(col("token"), col("bucket"))
        .agg(countDistinct(col("doc_id")).as("df"),
          count(lit(1)).as("n_occ"))
        .repartition(col("bucket"))
        .write.mode("overwrite").partitionBy("bucket").parquet(s"$path/df_v1")
      post.agg(count(lit(1)).as("n_tokens"))
        .withColumn("n_buckets", lit(nBuckets))
        .write.mode("overwrite").parquet(s"$path/stats_v1")
      VersionedIndex.writeTxn(spark, path, 1, txn)
      VersionedIndex.writeHint(spark, path, 1) // commit
    } finally post.unpersist(false)
  }

  /** Incremental positional-index maintenance: fold a batch of NEW
    * documents into an existing [[writeIndex]] layout without
    * rebuilding — postings land as a version-(n+1) delta, the
    * per-token (df, n_occ) aggregate merges delta-into-existing over
    * two SMALL tables (never the corpus), stats add up, and the
    * version hint flips LAST (a crash anywhere before it leaves the
    * index probing version n exactly — same contract as
    * [[Bm25.appendToIndex]], spec-pinned via the abort hook). Caller
    * contract: `docs` are new ids — df counts distinct docs per
    * token, so re-appending an existing id would double-count it. */
  def appendToIndex(docs: DataFrame, idCol: String, textCol: String,
      path: String, txn: Option[IndexCommitTxn] = None): Unit =
    appendToIndexInternal(docs, idCol, textCol, path,
      abortBeforeCommit = false, txn = txn)

  private[graft] def appendToIndexInternal(docs: DataFrame, idCol: String,
      textCol: String, path: String, abortBeforeCommit: Boolean,
      txn: Option[IndexCommitTxn] = None): Unit = {
    val spark = docs.sparkSession
    val n = currentVersion(spark, path)
    require(n >= 1, s"no committed index under $path")
    // enforce the GLOBAL-tombstone contract up front ([[Bm25
    // .appendToIndex]]'s guard): re-appending a deleted id would index
    // rows the probe-time anti-join silently kills — refuse loudly.
    tombstonesTable(spark, path, n).foreach { t =>
      val bad = docs.select(col(idCol).as("doc_id"))
        .join(t, Seq("doc_id"), "left_semi").limit(3).collect()
      require(bad.isEmpty, s"appendToIndex: id(s) ${bad.mkString(", ")} " +
        "are tombstoned by deleteFromIndex — a deleted id must not be " +
        "re-appended (its rows would be indexed but never retrievable); " +
        "compactIndex folds tombstones in if the id must be reused")
    }
    VersionedIndex.clearCrashedAttempt(spark, path, n + 1,
      Seq("postings", "tombstones"))
    val nBuckets = statsTable(spark, path, n)
      .select(col("n_buckets")).head().getInt(0)
    val post = postings(docs, idCol, textCol)
      .withColumn("bucket", bucketOf(col("token"), nBuckets))
      .persist()
    try {
      // overwrite, not append: a retry after a crashed attempt clobbers
      // the partial delta instead of doubling rows
      post.repartition(col("bucket"))
        .write.mode("overwrite").partitionBy("bucket")
        .parquet(s"$path/postings/delta_v${n + 1}")
      val dfDelta = post.groupBy(col("token"), col("bucket"))
        .agg(countDistinct(col("doc_id")).as("df"),
          count(lit(1)).as("n_occ"))
      dfTable(spark, path, n)
        .select(col("token"), col("df"), col("n_occ"), col("bucket"))
        .unionByName(dfDelta
          .select(col("token"), col("df"), col("n_occ"), col("bucket")))
        .groupBy(col("token"), col("bucket"))
        .agg(sum(col("df")).as("df"), sum(col("n_occ")).as("n_occ"))
        .repartition(col("bucket"))
        .write.mode("overwrite").partitionBy("bucket")
        .parquet(s"$path/df_v${n + 1}")
      val prevTokens = statsTable(spark, path, n)
        .select(col("n_tokens")).head().getLong(0)
      post.agg((count(lit(1)) + lit(prevTokens)).as("n_tokens"))
        .withColumn("n_buckets", lit(nBuckets))
        .write.mode("overwrite").parquet(s"$path/stats_v${n + 1}")
      // sink commits record their batch id; manual appends CARRY the
      // prior one forward so the replay guard survives interleaving
      VersionedIndex.writeTxn(spark, path, n + 1,
        txn.orElse(VersionedIndex.committedTxn(spark, path, n)))
      if (abortBeforeCommit) return
      VersionedIndex.writeHint(spark, path, n + 1) // commit
      // post-commit cleanup of the superseded version (best-effort)
      val (fs, _) = VersionedIndex.fsOf(spark, path)
      fs.delete(new org.apache.hadoop.fs.Path(s"$path/df_v$n"), true)
      fs.delete(new org.apache.hadoop.fs.Path(s"$path/stats_v$n"), true)
      fs.delete(new org.apache.hadoop.fs.Path(s"$path/batchid_v$n"), true)
    } finally post.unpersist(false)
  }

  /** All occurrences of `phrase` through a [[writeIndex]] layout:
    * same (doc_id, first-token pos) rows as [[phraseOccurrences]] over
    * live postings, but the postings and length scans prune to the
    * phrase tokens' bucket directories — the corpus is never touched.
    * Driver materialization is bounded by the phrase: ≤ m bucket ids
    * and ≤ m list lengths. */
  def phraseProbe(spark: SparkSession, path: String,
      phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "empty phrase")
    import spark.implicits._
    val n = currentVersion(spark, path)
    require(n >= 1, s"no committed index under $path")
    val nBuckets = statsTable(spark, path, n)
      .select(col("n_buckets")).head().getInt(0)
    val toks = phrase.distinct
    val buckets = toks.toDF("token")
      .select(bucketOf(col("token"), nBuckets).as("bucket"))
      .distinct().collect().map(_.getInt(0)).toSeq
    val plen = dfTable(spark, path, n)
      .filter(col("bucket").isin(buckets: _*))
      .filter(col("token").isin(toks: _*))
      .select(col("token"), col("n_occ"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val pruned = postingsTable(spark, path, n)
      .filter(col("bucket").isin(buckets: _*))
      .filter(col("token").isin(toks: _*))
      .select(col("token"), col("doc_id"), col("pos"))
    val post = tombstonesTable(spark, path, n)
      .fold(pruned)(t => pruned.join(t, Seq("doc_id"), "left_anti"))
    phraseOccurrences(post, phrase, plen)
  }

  /** Mine the top-`n` trigram phrases (occurrence count desc, phrase
    * asc — deterministic); the phrase list crossing the driver is
    * bounded by `n` (broadcast-small contract, like IVF centroids). */
  private[operators] def topPhrases(docs: DataFrame, idCol: String,
      textCol: String, n: Int): Seq[String] = {
    val w = Chunking.tokens(col(textCol))
    val tri = docs.select(col(idCol).as("doc_id"), w.as("__w"))
      .filter(size(col("__w")) >= 3)
      .select(col("doc_id"), explode(
        transform(sequence(lit(1), size(col("__w")) - 2),
          i => concat_ws(" ", slice(col("__w"), i, lit(3))))).as("phrase"))
    tri.groupBy("phrase").count()
      .orderBy(col("count").desc, col("phrase"))
      .limit(n).collect().map(_.getString(0)).toSeq
  }

  /** Mine the top-`n` trigram phrases and run the WHOLE batch through
    * ONE [[phraseOccurrencesBatch]] pass over the postings (it used to
    * be a persisted postings table re-joined (m−1)× per phrase plus a
    * posting-length driver lookup for join ordering — the batch form
    * reads postings once, needs no persist and no length collect). */
  def topPhraseStats(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 5): DataFrame = {
    val top = topPhrases(docs, idCol, textCol, n)
    val (batch, qid) = phraseBatch(docs.sparkSession, top)
    batchPhraseStats(
      phraseOccurrencesBatch(postings(docs, idCol, textCol), batch), qid)
  }

  /** [[topPhraseStats]] answered through a [[writeIndex]] layout:
    * identical rows (the occurrence core is shared), but after phrase
    * mining nothing touches the corpus — phrases probe their bucket
    * directories. Mining stays corpus-side by design: the trigram
    * count is a build-time aggregate, not a probe. The index metadata
    * (n_buckets, posting lengths) and the bucket-pruned postings scan
    * are shared across the whole phrase batch — one stats read and one
    * length lookup, not one per phrase. */
  def topPhraseStatsIndexed(spark: SparkSession, path: String,
      docs: DataFrame, idCol: String, textCol: String,
      n: Int = 5): DataFrame =
    phraseStatsProbe(spark, path, topPhrases(docs, idCol, textCol, n))

  /** ONE metadata pass for a whole phrase batch — the shared head of
    * every batched probe: version resolution plus the bucket-pruned
    * postings scan restricted to the batch's tokens. Bucket ids come
    * from [[VersionedIndex.bucketOfLocal]] (driver arithmetic,
    * bit-identical to the plan-side fold the writers partitioned by) —
    * the old tiny local-relation job and the posting-length lookup
    * (join ordering — moot under [[phraseOccurrencesBatch]]) are both
    * gone, two fewer driver round-trips per probe. */
  private def batchProbePostings(spark: SparkSession, path: String,
      top: Seq[String]): DataFrame = {
    val v = currentVersion(spark, path)
    require(v >= 1, s"no committed index under $path")
    val nBuckets = statsTable(spark, path, v)
      .select(col("n_buckets")).head().getInt(0)
    val toks = top.flatMap(_.split(' ')).filter(_.nonEmpty).distinct
    val buckets = toks.map(VersionedIndex.bucketOfLocal(_, nBuckets)).distinct
    val pruned = postingsTable(spark, path, v)
      .filter(col("bucket").isin(buckets: _*))
      .filter(col("token").isin(toks: _*))
      .select(col("token"), col("doc_id"), col("pos"))
    tombstonesTable(spark, path, v)
      .fold(pruned)(t => pruned.join(t, Seq("doc_id"), "left_anti"))
  }

  /** The fully corpus-free probe face: per-phrase occurrence stats for
    * a GIVEN phrase list over a [[writeIndex]] layout — nothing in the
    * plan touches any corpus table (PlanSpec-pinned via
    * q71_indexed_probe), and the whole batch matches in ONE
    * [[phraseOccurrencesBatch]] pass over the bucket-pruned postings.
    * The phrase list is the caller's (mined at build time, read from a
    * config, etc.). */
  def phraseStatsProbe(spark: SparkSession, path: String,
      top: Seq[String]): DataFrame = {
    val post = batchProbePostings(spark, path, top)
    val (batch, qid) = phraseBatch(spark, top)
    batchPhraseStats(phraseOccurrencesBatch(post, batch), qid)
  }

  /** The matching-DOCUMENT sets of a phrase batch, in one pass:
    * (phrase, doc_id) distinct rows over a [[writeIndex]] layout,
    * corpus-free over the shared bucket-pruned postings scan — the
    * retrieval half [[Bm25.phraseRankedSearch]] composes with BM25
    * ranking. */
  def phraseDocsProbe(spark: SparkSession, path: String,
      top: Seq[String]): DataFrame = {
    val post = batchProbePostings(spark, path, top)
    val (batch, qid) = phraseBatch(spark, top)
    phraseOccurrencesBatch(post, batch)
      .select(col("q_id"), col("doc_id")).distinct()
      .join(broadcast(qid), Seq("q_id"))
      .select(col("phrase"), col("doc_id"))
  }
}
