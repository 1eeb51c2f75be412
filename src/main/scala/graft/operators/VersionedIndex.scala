package graft.operators

import org.apache.spark.sql.SparkSession

/** The transaction identity a streaming index sink commits with —
  * the Delta `txnAppId`/`txnVersion` pattern: `appId` names ONE query
  * lineage (stable across restarts of the same checkpointed query;
  * no newlines), `batchId` is its monotonic foreachBatch id. A
  * replayed batch is recognized by SAME appId + batchId ≤ committed;
  * a different appId is a new lineage (fresh checkpoint), whose ids
  * legitimately restart at 0 and must NOT be skipped. */
case class IndexCommitTxn(appId: String, batchId: Long)

/** The crash-safe versioned index layout shared by [[Bm25]] and
  * [[Search]] (the Iceberg version-hint pattern from
  * `sources/IcebergSnapshot`, scaled down): every commit is a version
  * n whose completeness is defined by `df_vn` AND `stats_vn` both
  * existing, and a tiny `version-hint.text` pointer names the current
  * one, flipped LAST. A crash anywhere before the flip leaves every
  * version-n file untouched and the index probing the prior state; a
  * missing/corrupt hint falls back to the highest complete version on
  * disk (hint-is-a-hint semantics, same as Iceberg). */
private[operators] object VersionedIndex {

  val HintFile = "version-hint.text"

  /** Driver-side bucket id of a term under the index layouts —
    * bit-identical to the plan-side `pmod(xxhash64(term), nBuckets)`
    * the index writers partition by (Catalyst's xxhash64 over a
    * string is XXH64 of its UTF-8 bytes, seed 42), so probe faces can
    * prune buckets with plain arithmetic instead of a local-relation
    * Spark job per probe. Parity is spec-pinned (SearchSpec). */
  def bucketOfLocal(term: String, nBuckets: Int): Int = {
    val u = org.apache.spark.unsafe.types.UTF8String.fromString(term)
    val h = org.apache.spark.sql.catalyst.expressions.XXH64
      .hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes, 42L)
    val n = nBuckets.toLong
    (((h % n) + n) % n).toInt
  }

  def fsOf(spark: SparkSession, path: String)
      : (org.apache.hadoop.fs.FileSystem, org.apache.hadoop.fs.Path) = {
    val p = new org.apache.hadoop.fs.Path(path)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  /** Current committed version under `path`; 0 = not an index. Hint
    * first; fallback scans for the highest version whose required
    * version-suffixed tables ALL exist (a complete commit). `required`
    * names the layout's completeness pair — `df` + `stats` for the
    * token indexes, `model` + `stats` for the vector index. */
  def currentVersion(spark: SparkSession, path: String,
      required: Seq[String] = Seq("df", "stats")): Int = {
    val (fs, root) = fsOf(spark, path)
    def complete(n: Int): Boolean = required.forall(t =>
      fs.exists(new org.apache.hadoop.fs.Path(s"$path/${t}_v$n")))
    val hinted =
      try {
        val in = fs.open(new org.apache.hadoop.fs.Path(root, HintFile))
        val s = try scala.io.Source.fromInputStream(in).mkString.trim
          finally in.close()
        val n = s.toInt
        if (n >= 1 && complete(n)) n else 0
      } catch { case _: Exception => 0 }
    if (hinted >= 1) hinted
    else try {
      fs.listStatus(root).map(_.getPath.getName)
        .collect { case s if s.startsWith("stats_v") => s.drop(7).toInt }
        .filter(complete)
        .sorted.lastOption.getOrElse(0)
    } catch { case _: Exception => 0 }
  }

  def writeHint(spark: SparkSession, path: String, n: Int): Unit = {
    val (fs, root) = fsOf(spark, path)
    val out = fs.create(new org.apache.hadoop.fs.Path(root, HintFile), true)
    try out.write(s"$n\n".getBytes("UTF-8")) finally out.close()
  }

  /** Clobber a CRASHED prior attempt's leftovers at `version` — every
    * committer of version v MUST call this before its first write.
    * Without it the hint-flips-LAST protocol has a cross-OPERATION
    * hole: version numbers are per-layout, so a crashed compaction's
    * `base_v(v)` and a later append's `delta_v(v)` can coexist, and
    * [[familyDirs]] then resolves the stale base and IGNORES the new
    * delta entirely (appended rows silently vanish; an aborted
    * vector-compaction's EMPTY tombstones base resurrects deleted
    * vectors). Symmetrically, a crashed delete's orphan
    * `tombstones/delta_v(v)` would be phantom-committed by a later
    * append at v. Deleting BOTH kinds for EVERY family (plus the
    * `batchid_v(v)` marker) before writing closes all of these: a
    * committer's own overwrite-mode writes then land on a clean slate,
    * and readers never see the delete — resolution at the prior
    * version never reads dirs above it. */
  def clearCrashedAttempt(spark: SparkSession, path: String, version: Int,
      families: Seq[String]): Unit = {
    val (fs, _) = fsOf(spark, path)
    for (fam <- families; kind <- Seq("base", "delta"))
      fs.delete(
        new org.apache.hadoop.fs.Path(s"$path/$fam/${kind}_v$version"), true)
    fs.delete(new org.apache.hadoop.fs.Path(s"$path/batchid_v$version"), true)
  }

  /** The [[IndexCommitTxn]] recorded by version `n`'s commit, or None
    * when version n carries none. Part of the exactly-once contract of
    * the foreachBatch index sinks: the sink skips a batch whose
    * (appId, id) is a post-commit replay — same appId, id ≤ the
    * committed one — and re-runs it otherwise (a pre-commit crash:
    * the retry's overwrites clobber the partial attempt). The marker
    * is version-suffixed so it commits atomically with the hint flip:
    * a crash before the flip leaves the OLD version's marker
    * current. */
  def committedTxn(spark: SparkSession, path: String,
      n: Int): Option[IndexCommitTxn] = {
    val (fs, _) = fsOf(spark, path)
    try {
      val in = fs.open(new org.apache.hadoop.fs.Path(s"$path/batchid_v$n"))
      val s = try scala.io.Source.fromInputStream(in).mkString
        finally in.close()
      val lines = s.split("\n", 2)
      Some(IndexCommitTxn(lines(1).trim, lines(0).trim.toLong))
    } catch { case _: Exception => None }
  }

  /** Record `txn` as version `n`'s committed sink transaction —
    * written BEFORE the hint flip by committers carrying one (see
    * [[committedTxn]]). Non-sink commits (manual appends,
    * compactions) CARRY the prior version's txn forward instead, so
    * the replay guard survives interleaved maintenance. */
  def writeTxn(spark: SparkSession, path: String, n: Int,
      txn: Option[IndexCommitTxn]): Unit = {
    txn.foreach { t =>
      require(!t.appId.contains("\n"), "txn appId must not contain newlines")
      val (fs, _) = fsOf(spark, path)
      val out = fs.create(
        new org.apache.hadoop.fs.Path(s"$path/batchid_v$n"), true)
      try out.write(s"${t.batchId}\n${t.appId}\n".getBytes("UTF-8"))
      finally out.close()
    }
  }

  /** Resolve a table family's live dirs at version `n`: the highest
    * `base_vB` with B ≤ n (a compaction's consolidated rewrite) plus
    * every `delta_vI` with B < I ≤ n. Deltas may be SPARSE, and dirs
    * above the resolved version (a crashed attempt's leftovers) or
    * below the base (superseded, awaiting best-effort cleanup) are
    * never read — what makes the hint-flips-LAST protocol safe for
    * compaction too. Shared by every index family (BM25, phrase,
    * vector). */
  def familyDirs(spark: SparkSession, path: String, family: String,
      n: Int): Seq[String] = {
    val (fs, _) = fsOf(spark, path)
    def exists(d: String) = fs.exists(new org.apache.hadoop.fs.Path(d))
    val base = (n to 1 by -1)
      .map(i => i -> s"$path/$family/base_v$i").find(p => exists(p._2))
    val from = base.map(_._1).getOrElse(0)
    base.map(_._2).toSeq ++
      ((from + 1) to n).map(i => s"$path/$family/delta_v$i").filter(exists)
  }
}
