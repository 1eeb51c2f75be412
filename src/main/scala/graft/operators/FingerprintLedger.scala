package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Persisted CROSS-RUN dedup ledger — the operator that answers
  * "dedup today's crawl against everything ever ingested" without
  * rescanning history: a bucket-partitioned fingerprint set on the
  * shared crash-safe [[VersionedIndex]] layout (same commit protocol
  * as the BM25/phrase/vector indexes: version n is complete iff
  * stats_vn exists, `version-hint.text` flips LAST; base+delta
  * resolution via [[VersionedIndex.familyDirs]]).
  *
  * The ledger is fingerprint-AGNOSTIC: it stores whatever `fp` column
  * the caller computes (md5 of normalized text, a MinHash band key, a
  * media checksum — any deterministic identity). In-batch duplicates
  * are the caller's concern ([[Dedup]] has every flavor); the ledger
  * owns cross-run identity only.
  *
  * Layout under `path`:
  *   fps/delta_vN (fp) partitioned by `bucket` = xxhash64(fp) mod
  *     nBuckets — at 100 TB both sides of the dedup anti-join hash on
  *     fp, so the ledger side is already laid out for the exchange,
  *     and [[compactLedger]] keeps the file count flat over years of
  *     daily appends;
  *   stats_vN — one (n_fps, n_buckets) row (the completeness marker).
  *
  * Scale shape: [[dedupAgainst]] is ONE anti-join keyed on fp — the
  * batch shuffles by fp once, the ledger side scans fp+bucket columns
  * only (never documents). [[appendToLedger]] writes only the NEW
  * fingerprints of a batch (one anti-join + one bucketed write) — the
  * nightly cost is proportional to the day's novel content, never to
  * history.
  */
object FingerprintLedger {

  private def bucketOf(fp: org.apache.spark.sql.Column, nBuckets: Int) =
    pmod(xxhash64(fp), lit(nBuckets.toLong)).cast("int")

  /** Current committed version (0 = not a ledger): stats is the
    * completeness marker (fps deltas are sparse-resolved). */
  def currentVersion(spark: org.apache.spark.sql.SparkSession,
      path: String): Int =
    VersionedIndex.currentVersion(spark, path, Seq("stats"))

  def ledgerExists(spark: org.apache.spark.sql.SparkSession,
      path: String): Boolean = currentVersion(spark, path) >= 1

  /** The version-`n` PHYSICAL fingerprint rows (fp, bucket) — the
    * on-disk union before tombstone resolution; probes and appends go
    * through [[effectiveFps]]. */
  def fpsTable(spark: org.apache.spark.sql.SparkSession, path: String,
      n: Int): DataFrame =
    VersionedIndex.familyDirs(spark, path, "fps", n)
      .map(spark.read.parquet(_)).reduce(_ unionByName _)

  private def versionOfDir(d: String): Int =
    "_v(\\d+)$".r.findFirstMatchIn(d).get.group(1).toInt

  /** The version-`n` EFFECTIVE fingerprint set: physical fps minus
    * [[forgetFingerprints]] tombstones, version-ordered — a `gone`
    * row at version g erases fp rows of versions ≤ g only, so a
    * RE-APPENDED fingerprint (fps delta at a later version) is seen
    * again. Every probe/append path resolves through here
    * ([[dedupAgainst]], [[seenRows]], [[appendToLedger]]'s novelty
    * anti-join); [[compactLedger]] folds the tombstones in and clears
    * the gone family. Scale shape: the big fps side streams through
    * ONE broadcast-hash join against the per-fp max of the gone family
    * (bounded by takedown volume, not history) — no shuffle of the
    * ledger, and a never-forgotten ledger keeps the plain union plan
    * bit-identical (gone family absent → no join at all). */
  def effectiveFps(spark: org.apache.spark.sql.SparkSession, path: String,
      n: Int): DataFrame = {
    val goneDirs = VersionedIndex.familyDirs(spark, path, "gone", n)
    if (goneDirs.isEmpty) fpsTable(spark, path, n)
    else {
      val fpsV = VersionedIndex.familyDirs(spark, path, "fps", n)
        .map(d => spark.read.parquet(d)
          .withColumn("__v", lit(versionOfDir(d))))
        .reduce(_ unionByName _)
      val goneMax = goneDirs
        .map(d => spark.read.parquet(d)
          .withColumn("__gv", lit(versionOfDir(d))))
        .reduce(_ unionByName _)
        .groupBy("fp").agg(max(col("__gv")).as("__gv"))
        .withColumnRenamed("fp", "__gfp")
      fpsV.join(broadcast(goneMax),
          fpsV("fp") === goneMax("__gfp"), "left_outer")
        .filter(col("__gv").isNull || col("__v") > col("__gv"))
        .drop("__v", "__gv", "__gfp")
    }
  }

  def statsTable(spark: org.apache.spark.sql.SparkSession, path: String,
      n: Int): DataFrame =
    spark.read.parquet(s"$path/stats_v$n")

  private def writeStats(spark: org.apache.spark.sql.SparkSession,
      path: String, n: Int, nFps: Long, nBuckets: Int): Unit = {
    import spark.implicits._
    Seq((nFps, nBuckets)).toDF("n_fps", "n_buckets")
      .write.mode("overwrite").parquet(s"$path/stats_v$n")
  }

  /** The sink transaction the current version committed with (None if
    * none) — the foreachBatch sinks' replay guard
    * ([[VersionedIndex.committedTxn]]). */
  def committedTxn(spark: org.apache.spark.sql.SparkSession,
      path: String): Option[IndexCommitTxn] =
    VersionedIndex.committedTxn(spark, path, currentVersion(spark, path))

  /** Bootstrap the ledger from a batch's `fp` column (distinct fps,
    * bucket-partitioned). Hint flips LAST. */
  def writeLedger(fps: DataFrame, path: String, nBuckets: Int = 64,
      txn: Option[IndexCommitTxn] = None): Unit = {
    val spark = fps.sparkSession
    VersionedIndex.clearCrashedAttempt(spark, path, 1, Seq("fps"))
    val distinctFps = fps.select(col("fp")).distinct()
      .withColumn("bucket", bucketOf(col("fp"), nBuckets))
    distinctFps.repartition(col("bucket"))
      .write.mode("overwrite").partitionBy("bucket")
      .parquet(s"$path/fps/delta_v1")
    val n = spark.read.parquet(s"$path/fps/delta_v1").count()
    writeStats(spark, path, 1, n, nBuckets)
    VersionedIndex.writeTxn(spark, path, 1, txn)
    VersionedIndex.writeHint(spark, path, 1) // commit
  }

  /** Fold a batch's fingerprints in: only fps NOT already present
    * land as the version-(n+1) delta (the ledger stays a SET), stats
    * add up, hint flips LAST — the abort window leaves version n
    * exactly (spec-pinned).
    *
    * Reader-window contract (single-writer, concurrent readers): an
    * append keeps the JUST-superseded version n fully readable — its
    * fps deltas are untouched and its stats table survives one more
    * commit cycle (only stats_v(n-1) is reclaimed here) — so a reader
    * that resolved version n before the flip finishes its scan
    * unharmed. Only [[compactLedger]] reclaims the delta chain itself;
    * run it in a write-quiet window. */
  def appendToLedger(fps: DataFrame, path: String,
      txn: Option[IndexCommitTxn] = None): Unit =
    appendToLedgerInternal(fps, path, abortBeforeCommit = false,
      txn = txn)

  private[graft] def appendToLedgerInternal(fps: DataFrame, path: String,
      abortBeforeCommit: Boolean, txn: Option[IndexCommitTxn] = None): Unit = {
    val spark = fps.sparkSession
    val n = currentVersion(spark, path)
    require(n >= 1, s"no committed ledger under $path")
    VersionedIndex.clearCrashedAttempt(spark, path, n + 1, Seq("fps", "gone"))
    val stats = statsTable(spark, path, n).head()
    val nBuckets = stats.getAs[Int]("n_buckets")
    // overwrite, not append: a retry clobbers a crashed attempt's
    // delta. Novelty is judged against the EFFECTIVE set: a forgotten
    // fingerprint re-appends as a later-version delta and is seen again
    fps.select(col("fp")).distinct()
      .join(effectiveFps(spark, path, n).select(col("fp")), Seq("fp"), "left_anti")
      .withColumn("bucket", bucketOf(col("fp"), nBuckets))
      .repartition(col("bucket"))
      .write.mode("overwrite").partitionBy("bucket")
      .parquet(s"$path/fps/delta_v${n + 1}")
    val added = spark.read.parquet(s"$path/fps/delta_v${n + 1}").count()
    writeStats(spark, path, n + 1, stats.getAs[Long]("n_fps") + added, nBuckets)
    // sink commits record their batch id; manual appends CARRY the
    // prior one forward so the replay guard survives interleaving
    VersionedIndex.writeTxn(spark, path, n + 1,
      txn.orElse(VersionedIndex.committedTxn(spark, path, n)))
    if (abortBeforeCommit) return
    VersionedIndex.writeHint(spark, path, n + 1) // commit
    // reclaim TWO versions back only: version n stays readable for the
    // concurrent-reader grace window (see scaladoc contract above)
    if (n >= 2) {
      val (fs, _) = VersionedIndex.fsOf(spark, path)
      fs.delete(new org.apache.hadoop.fs.Path(s"$path/stats_v${n - 1}"), true)
      fs.delete(new org.apache.hadoop.fs.Path(s"$path/batchid_v${n - 1}"), true)
    }
  }

  /** The rows of `df` whose `fpCol` has NEVER been seen by the ledger
    * — one anti-join keyed on the fingerprint; the ledger side scans
    * fp+bucket only. In-batch duplicates both survive (in-batch dedup
    * is [[Dedup]]'s job, run it first). */
  def dedupAgainst(df: DataFrame, fpCol: String, path: String): DataFrame = {
    val spark = df.sparkSession
    val n = currentVersion(spark, path)
    require(n >= 1, s"no committed ledger under $path")
    val seen = effectiveFps(spark, path, n).select(col("fp"))
    df.join(seen, df(fpCol) === seen("fp"), "left_anti")
  }

  /** The rows of `df` whose `fpCol` HAS been seen by the ledger —
    * [[dedupAgainst]]'s complement (one left-semi join on fp). The
    * prune step of verify-only-ledger-hits flows: with MinHash band
    * keys as fingerprints (q94), a row with no seen band key can have
    * no near-dup in history, so only [[seenRows]] proceed to the
    * expensive exact verify. */
  def seenRows(df: DataFrame, fpCol: String, path: String): DataFrame = {
    val spark = df.sparkSession
    val n = currentVersion(spark, path)
    require(n >= 1, s"no committed ledger under $path")
    val seen = effectiveFps(spark, path, n).select(col("fp"))
    df.join(seen, df(fpCol) === seen("fp"), "left_semi")
  }

  /** FORGET fingerprints — the takedown/GDPR face of the ledger
    * ([[Bm25.deleteFromIndex]]'s counterpart): commit a `gone`
    * tombstone delta erasing the given fps from the EFFECTIVE set, so
    * [[dedupAgainst]] treats matching future content as never-seen
    * (it re-ingests and re-appends cleanly — tombstones erase only
    * fp rows of versions ≤ their own). Unknown/already-forgotten fps
    * are ignored; a forget that erases nothing is a NO-OP (no version
    * bump). Same commit protocol as every other writer: overwrite-mode
    * delta, stats adjust, hint flips LAST; [[compactLedger]] folds
    * tombstones in permanently and clears the gone family. */
  def forgetFingerprints(fps: DataFrame, path: String): Unit =
    forgetFingerprintsInternal(fps, path, abortBeforeCommit = false)

  private[graft] def forgetFingerprintsInternal(fps: DataFrame, path: String,
      abortBeforeCommit: Boolean): Unit = {
    val spark = fps.sparkSession
    val n = currentVersion(spark, path)
    require(n >= 1, s"no committed ledger under $path")
    VersionedIndex.clearCrashedAttempt(spark, path, n + 1, Seq("fps", "gone"))
    val stats = statsTable(spark, path, n).head()
    val nBuckets = stats.getAs[Int]("n_buckets")
    val doomed = effectiveFps(spark, path, n).select(col("fp"))
      .join(fps.select(col("fp")).distinct(), Seq("fp"), "left_semi")
    doomed
      .withColumn("bucket", bucketOf(col("fp"), nBuckets))
      .repartition(col("bucket"))
      .write.mode("overwrite").partitionBy("bucket")
      .parquet(s"$path/gone/delta_v${n + 1}")
    val erased = spark.read.parquet(s"$path/gone/delta_v${n + 1}").count()
    if (erased == 0L) {
      // nothing to erase: leave version n exactly (drop the empty delta
      // so a later committer at n+1 doesn't inherit an empty gone dir)
      VersionedIndex.clearCrashedAttempt(spark, path, n + 1, Seq("gone"))
      return
    }
    writeStats(spark, path, n + 1, stats.getAs[Long]("n_fps") - erased, nBuckets)
    VersionedIndex.writeTxn(spark, path, n + 1,
      VersionedIndex.committedTxn(spark, path, n))
    if (abortBeforeCommit) return
    VersionedIndex.writeHint(spark, path, n + 1) // commit
    if (n >= 2) {
      val (fs, _) = VersionedIndex.fsOf(spark, path)
      fs.delete(new org.apache.hadoop.fs.Path(s"$path/stats_v${n - 1}"), true)
      fs.delete(new org.apache.hadoop.fs.Path(s"$path/batchid_v${n - 1}"), true)
    }
  }

  /** Consolidate the delta chain into one base (the
    * [[Bm25.compactIndex]] pattern — resolution starts at the highest
    * committed base, so the crash windows stay safe). This is the ONE
    * op that reclaims dirs a concurrent reader could hold (the
    * superseded deltas and every old stats table) — run it in a
    * write-quiet window; appends never reclaim more than the
    * two-versions-back stats (see [[appendToLedger]]). */
  def compactLedger(spark: org.apache.spark.sql.SparkSession,
      path: String): Unit =
    compactLedgerInternal(spark, path, abortBeforeCommit = false)

  private[graft] def compactLedgerInternal(
      spark: org.apache.spark.sql.SparkSession, path: String,
      abortBeforeCommit: Boolean): Unit = {
    val n = currentVersion(spark, path)
    require(n >= 1, s"no committed ledger under $path")
    VersionedIndex.clearCrashedAttempt(spark, path, n + 1, Seq("fps", "gone"))
    val stats = statsTable(spark, path, n).head()
    // fold [[forgetFingerprints]] tombstones in PERMANENTLY: the new
    // base is the EFFECTIVE set, and the gone family is reclaimed with
    // the delta chain below — the base's version sitting above every
    // erased row's is exactly why the tombstones must not survive it
    // (a leftover gone row would erase nothing, but a FUTURE forget's
    // arithmetic and re-append semantics stay clean only if compaction
    // resets the families together)
    effectiveFps(spark, path, n)
      .repartition(col("bucket"))
      .write.mode("overwrite").partitionBy("bucket")
      .parquet(s"$path/fps/base_v${n + 1}")
    val nEff = spark.read.parquet(s"$path/fps/base_v${n + 1}").count()
    writeStats(spark, path, n + 1, nEff, stats.getAs[Int]("n_buckets"))
    // carry the committed batch id forward (sink replay guard)
    VersionedIndex.writeTxn(spark, path, n + 1,
      VersionedIndex.committedTxn(spark, path, n))
    if (abortBeforeCommit) return
    VersionedIndex.writeHint(spark, path, n + 1) // commit
    val (fs, _) = VersionedIndex.fsOf(spark, path)
    for (i <- 1 to n) {
      fs.delete(new org.apache.hadoop.fs.Path(s"$path/fps/delta_v$i"), true)
      fs.delete(new org.apache.hadoop.fs.Path(s"$path/fps/base_v$i"), true)
      fs.delete(new org.apache.hadoop.fs.Path(s"$path/gone/delta_v$i"), true)
      fs.delete(new org.apache.hadoop.fs.Path(s"$path/stats_v$i"), true)
      fs.delete(new org.apache.hadoop.fs.Path(s"$path/batchid_v$i"), true)
    }
  }
}
