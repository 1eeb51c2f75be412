package graft.operators

import org.apache.spark.sql.SparkSession

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
