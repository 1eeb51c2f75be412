package graft

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Bm25

/** Pins the distributed BM25 ranker to a sequential in-JVM reference
  * (both idf variants), including the DECIMAL(28,12) routing of the
  * cross-term sum — the linear variant additionally carries q79's
  * DuckDB oracle. */
class Bm25Spec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("bm25-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val corpus = Seq(
    (1L, "spark shuffles data between stages for joins"),
    (2L, "spark spark spark tuning shuffle partitions"),
    (3L, "iceberg tables store snapshots and manifests"),
    (4L, "snowflake loads iceberg tables from manifests"),
    (5L, "a short doc"),
    (6L, "data pipelines join spark and iceberg tables for analytics"))

  private val probes = Seq((1, "spark"), (1, "shuffle"), (2, "iceberg"), (2, "tables"))

  private def docsDf: DataFrame = {
    import spark.implicits._
    corpus.toDF("doc_id", "text")
  }
  private def probesDf: DataFrame = {
    import spark.implicits._
    probes.toDF("q_id", "term")
  }

  // ---- sequential reference -------------------------------------------

  private def toks(s: String): Seq[String] =
    s.trim.toLowerCase.split(" +").toSeq.filter(_.nonEmpty)

  /** Same arithmetic as the operator: per-term double contribution,
    * then the Spark-cast DECIMAL(28,12) sum (BigDecimal.valueOf =
    * shortest-string semantics, HALF_UP — what Cast(double→decimal)
    * does), rounded like round(col, 6). */
  private def refScores(k1: Double, b: Double, linearIdf: Boolean)
      : Map[(Int, Long), Double] = {
    val docToks = corpus.map { case (id, t) => id -> toks(t) }.toMap
    val n = corpus.size.toDouble
    val avgdl = docToks.values.map(_.size).sum.toDouble / n
    val tf = docToks.map { case (id, ws) =>
      id -> ws.groupBy(identity).map { case (w, o) => w -> o.size.toLong }
    }
    val df = tf.values.flatMap(_.keys).groupBy(identity)
      .map { case (w, o) => w -> o.size.toDouble }
    (for {
      (qid, qterms) <- probes.groupBy(_._1).toSeq
      (docId, docTf) <- tf
      contribs = qterms.map(_._2).filter(docTf.contains).map { term =>
        val idfRaw = (n - df(term) + 0.5) / (df(term) + 0.5)
        val idf = if (linearIdf) idfRaw else math.log(idfRaw + 1.0)
        val t = docTf(term).toDouble
        idf * (t * (k1 + 1.0)) /
          (t + k1 * ((1.0 - b) + b * docToks(docId).size.toDouble / avgdl))
      }
      if contribs.nonEmpty
    } yield {
      val sum = contribs
        .map(c => JBigDecimal.valueOf(c).setScale(12, RoundingMode.HALF_UP))
        .reduce(_ add _)
      (qid, docId) ->
        JBigDecimal.valueOf(sum.doubleValue).setScale(6, RoundingMode.HALF_UP)
          .doubleValue
    }).toMap
  }

  private def runSearch(linearIdf: Boolean): Map[(Int, Long), Double] =
    Bm25.search(docsDf, "doc_id", "text", probesDf, k = 10,
        linearIdf = linearIdf)
      .collect()
      .map(r => (r.getLong(0).toInt, r.getLong(2)) -> r.getDouble(3)).toMap

  test("linear-idf scores are bit-identical to the sequential reference") {
    val got = runSearch(linearIdf = true)
    val want = refScores(1.2, 0.75, linearIdf = true)
    assert(got.keySet === want.keySet)
    for ((k, v) <- want)
      assert(java.lang.Double.compare(got(k), v) === 0,
        s"$k: got ${got(k)} want $v")
  }

  test("log-idf scores are bit-identical to the sequential reference") {
    val got = runSearch(linearIdf = false)
    val want = refScores(1.2, 0.75, linearIdf = false)
    assert(got.keySet === want.keySet)
    for ((k, v) <- want)
      assert(java.lang.Double.compare(got(k), v) === 0,
        s"$k: got ${got(k)} want $v")
  }

  test("ranking: repeated-term doc wins its query; rarity beats ubiquity") {
    val got = Bm25.search(docsDf, "doc_id", "text", probesDf, k = 10)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    // query 1 (spark+shuffle): doc 2 has spark×3 + shuffle — must lead
    assert(got((1L, 1)) === 2L)
    // query 2 (iceberg+tables): docs 3/4 carry both terms; 5 has neither
    val q2 = got.collect { case ((2L, _), d) => d }.toSet
    assert(Set(3L, 4L).subsetOf(q2) && !q2.contains(5L))
  }

  test("materialized index probe is bit-identical to the in-memory search " +
      "(both idf variants); stats round-trips n_buckets") {
    val idx = java.nio.file.Files.createTempDirectory("bm25idx").toString
    Bm25.writeIndex(docsDf, "doc_id", "text", idx, nBuckets = 8)
    for (linear <- Seq(true, false)) {
      val direct = Bm25.search(docsDf, "doc_id", "text", probesDf, k = 10,
          linearIdf = linear)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
        .sortBy(t => (t._1, t._2))
      val viaIndex = Bm25.searchIndex(spark, idx, probesDf, "doc_id", k = 10,
          linearIdf = linear)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
        .sortBy(t => (t._1, t._2))
      assert(viaIndex.length === direct.length)
      for ((g, w) <- viaIndex.zip(direct)) {
        assert(g._1 === w._1 && g._2 === w._2 && g._3 === w._3, s"$g vs $w")
        assert(java.lang.Double.compare(g._4, w._4) === 0, s"$g vs $w")
      }
    }
    // the index is self-describing: a probe with a different assumed
    // bucket count would mis-prune; n_buckets must round-trip
    assert(Bm25.currentVersion(spark, idx) === 1)
    val stats = Bm25.statsTable(spark, idx, 1).collect()
    assert(stats.length === 1 && stats.head.getAs[Int]("n_buckets") === 8)
    // postings lay out one directory per occupied bucket in the delta
    val dirs = new java.io.File(s"$idx/postings/delta_v1").listFiles()
      .filter(_.isDirectory).map(_.getName).toSeq
    assert(dirs.nonEmpty && dirs.forall(_.startsWith("bucket=")))
    // hint-is-a-hint: with the pointer gone, the resolver still finds
    // the highest complete version on disk
    assert(new java.io.File(s"$idx/version-hint.text").delete())
    assert(Bm25.currentVersion(spark, idx) === 1)
  }

  test("appendToIndex: index(A) + append(B) probes bit-identically to a " +
      "from-scratch index over A ∪ B") {
    import spark.implicits._
    val (a, b) = corpus.splitAt(4)
    val grown = java.nio.file.Files.createTempDirectory("bm25idx_grow").toString
    Bm25.writeIndex(a.toDF("doc_id", "text"), "doc_id", "text", grown, nBuckets = 8)
    Bm25.appendToIndex(b.toDF("doc_id", "text"), "doc_id", "text", grown)
    val scratch = java.nio.file.Files.createTempDirectory("bm25idx_full").toString
    Bm25.writeIndex(docsDf, "doc_id", "text", scratch, nBuckets = 8)
    for (linear <- Seq(true, false)) {
      def probe(p: String) = Bm25.searchIndex(spark, p, probesDf, "doc_id",
          k = 10, linearIdf = linear)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
        .sortBy(t => (t._1, t._2))
      val g = probe(grown); val s = probe(scratch)
      assert(g.length === s.length && g.nonEmpty)
      for ((x, y) <- g.zip(s)) {
        assert(x._1 === y._1 && x._2 === y._2 && x._3 === y._3, s"$x vs $y")
        assert(java.lang.Double.compare(x._4, y._4) === 0, s"$x vs $y")
      }
    }
    // df merged, not duplicated: one row per (term, bucket)
    val df = Bm25.dfTable(spark, grown)
    assert(df.groupBy("term").count()
      .filter(org.apache.spark.sql.functions.col("count") > 1).count() === 0)
    // stats absorbed the append; the commit advanced the version and
    // cleaned the superseded df/stats dirs
    assert(Bm25.currentVersion(spark, grown) === 2)
    assert(Bm25.statsTable(spark, grown, 2).head()
      .getAs[Double]("n_docs") === corpus.size.toDouble)
    assert(!new java.io.File(s"$grown/df_v1").exists())
    assert(!new java.io.File(s"$grown/stats_v1").exists())
  }

  test("appendToIndex: a crash before the hint flip leaves the index " +
      "probing the prior state bit-identically; the retry completes") {
    import spark.implicits._
    val (a, b) = corpus.splitAt(4)
    val idx = java.nio.file.Files.createTempDirectory("bm25idx_crash").toString
    Bm25.writeIndex(a.toDF("doc_id", "text"), "doc_id", "text", idx, nBuckets = 8)
    def probe(p: String) = Bm25.searchIndex(spark, p, probesDf, "doc_id", k = 10)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._2)).toSeq
    val before = probe(idx)
    // simulated kill in the old fatal window: every version-2 data file
    // is on disk, the commit pointer is not
    Bm25.appendToIndexInternal(b.toDF("doc_id", "text"), "doc_id", "text",
      idx, abortBeforeCommit = true)
    assert(Bm25.currentVersion(spark, idx) === 1)
    assert(probe(idx) === before, "aborted append leaked into the probe")
    // the retry overwrites the partial delta and commits; the result
    // matches a from-scratch index over the union
    Bm25.appendToIndex(b.toDF("doc_id", "text"), "doc_id", "text", idx)
    assert(Bm25.currentVersion(spark, idx) === 2)
    val scratch = java.nio.file.Files.createTempDirectory("bm25idx_crash_full").toString
    Bm25.writeIndex(docsDf, "doc_id", "text", scratch, nBuckets = 8)
    assert(probe(idx) === probe(scratch))
    // ---- compaction: the delta chain collapses into one base, probes
    // stay bit-identical; crash before the flip leaves version 2 ----
    val preCompact = probe(idx)
    Bm25.compactIndexInternal(spark, idx, abortBeforeCommit = true)
    assert(Bm25.currentVersion(spark, idx) === 2,
      "aborted compaction must leave version 2 current")
    assert(probe(idx) === preCompact,
      "aborted compaction leaked into the probe")
    Bm25.compactIndex(spark, idx)
    assert(Bm25.currentVersion(spark, idx) === 3)
    assert(probe(idx) === preCompact, "compaction changed probe results")
    assert(new java.io.File(s"$idx/postings/base_v3").exists())
    assert(!new java.io.File(s"$idx/postings/delta_v1").exists(),
      "superseded postings deltas must be cleaned up post-commit")
    // the compacted index keeps evolving: an append rides a delta
    // over the new base and still equals a from-scratch rebuild
    val extra = Seq((100L, "spark iceberg data pipelines"))
    Bm25.appendToIndex(extra.toDF("doc_id", "text"), "doc_id", "text", idx)
    val scratch2 = java.nio.file.Files
      .createTempDirectory("bm25idx_postcompact").toString
    Bm25.writeIndex(docsDf.unionByName(extra.toDF("doc_id", "text")),
      "doc_id", "text", scratch2, nBuckets = 8)
    assert(probe(idx) === probe(scratch2),
      "post-compaction append diverged from rebuild")
  }

  test("a CRASHED compaction's leftover base must not poison the next " +
      "append at the same version number") {
    import spark.implicits._
    val (a, b) = corpus.splitAt(4)
    val idx = java.nio.file.Files.createTempDirectory("bm25idx_poison").toString
    Bm25.writeIndex(a.toDF("doc_id", "text"), "doc_id", "text", idx, nBuckets = 8)
    // compaction dies after its consolidated base_v2 lands, before the flip
    Bm25.compactIndexInternal(spark, idx, abortBeforeCommit = true)
    assert(new java.io.File(s"$idx/postings/base_v2").exists(),
      "precondition: the crashed compaction left its base behind")
    assert(Bm25.currentVersion(spark, idx) === 1)
    // the next append also commits at version 2: without the stale-dir
    // clear, familyDirs(2) would resolve the crashed base and silently
    // drop this delta (and compute stats over the poisoned resolution)
    Bm25.appendToIndex(b.toDF("doc_id", "text"), "doc_id", "text", idx)
    assert(Bm25.currentVersion(spark, idx) === 2)
    val scratch = java.nio.file.Files.createTempDirectory("bm25idx_poison2").toString
    Bm25.writeIndex(docsDf, "doc_id", "text", scratch, nBuckets = 8)
    def probe(p: String) = Bm25.searchIndex(spark, p, probesDf, "doc_id", k = 10)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(probe(idx) === probe(scratch),
      "append after a crashed compaction must match a from-scratch rebuild")
    assert(Bm25.statsTable(spark, idx, 2).head()
      .getAs[Double]("n_docs") === corpus.size.toDouble,
      "stats must be computed over the cleared (not poisoned) resolution")
  }

  test("deleteFromIndex: probes are bit-identical to a scratch index over " +
      "the survivors — before AND after compaction; re-deletes idempotent; " +
      "aborted delete leaves the prior state; append after delete is exact") {
    import spark.implicits._
    val idx = java.nio.file.Files.createTempDirectory("bm25idx_del").toString
    Bm25.writeIndex(docsDf, "doc_id", "text", idx, nBuckets = 8)
    def probe(p: String) = Bm25.searchIndex(spark, p, probesDf, "doc_id", k = 10)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._2)).toSeq
    def assertSame(g: Seq[(Long, Int, Long, Double)],
        w: Seq[(Long, Int, Long, Double)], label: String): Unit = {
      assert(g.length === w.length, label)
      for ((x, y) <- g.zip(w)) {
        assert(x._1 === y._1 && x._2 === y._2 && x._3 === y._3,
          s"$label: $x vs $y")
        assert(java.lang.Double.compare(x._4, y._4) === 0, s"$label: $x vs $y")
      }
    }
    val full = probe(idx)
    // aborted delete: every v2 file on disk, pointer not flipped —
    // version 1 keeps probing bit-identically
    Bm25.deleteFromIndexInternal(Seq(2L).toDF("doc_id"), idx,
      abortBeforeCommit = true)
    assert(Bm25.currentVersion(spark, idx) === 1)
    assertSame(probe(idx), full, "aborted delete leaked into the probe")
    // real delete (docs 2 and 4; 99 unknown — ignored); n_docs adjusts
    Bm25.deleteFromIndex(Seq(2L, 4L, 99L).toDF("doc_id"), idx)
    assert(Bm25.currentVersion(spark, idx) === 2)
    assert(Bm25.statsTable(spark, idx, 2).head()
      .getAs[Double]("n_docs") === (corpus.size - 2).toDouble)
    val survivors = corpus.filterNot(t => Set(2L, 4L).contains(t._1))
    val scratch = java.nio.file.Files.createTempDirectory("bm25idx_del_s").toString
    Bm25.writeIndex(survivors.toDF("doc_id", "text"), "doc_id", "text",
      scratch, nBuckets = 8)
    assertSame(probe(idx), probe(scratch), "delete diverged from rebuild")
    // idempotent re-delete: same probes, n_docs unchanged
    Bm25.deleteFromIndex(Seq(2L, 4L).toDF("doc_id"), idx)
    assert(Bm25.statsTable(spark, idx, Bm25.currentVersion(spark, idx)).head()
      .getAs[Double]("n_docs") === (corpus.size - 2).toDouble)
    assertSame(probe(idx), probe(scratch), "re-delete changed probes")
    // append after delete: stats must not resurrect tombstoned docs
    val extra = Seq((200L, "spark iceberg tables shuffle"))
    Bm25.appendToIndex(extra.toDF("doc_id", "text"), "doc_id", "text", idx)
    val scratch2 = java.nio.file.Files.createTempDirectory("bm25idx_del_s2").toString
    Bm25.writeIndex((survivors ++ extra).toDF("doc_id", "text"), "doc_id",
      "text", scratch2, nBuckets = 8)
    assertSame(probe(idx), probe(scratch2), "append-after-delete diverged")
    // compaction folds the tombstones permanently (df rebuilt); the
    // family resets and probes stay identical
    Bm25.compactIndex(spark, idx)
    assertSame(probe(idx), probe(scratch2), "compaction diverged")
    assert(spark.read.parquet(s"$idx/postings/base_v" +
        Bm25.currentVersion(spark, idx))
      .filter(org.apache.spark.sql.functions.col("doc_id").isin(2L, 4L))
      .count() === 0L, "compaction must drop tombstoned postings")
    // a crashed DELETE's orphan tombstone delta must not be
    // phantom-committed by the next append at the same version
    val idx2 = java.nio.file.Files.createTempDirectory("bm25idx_del_p").toString
    val (a, b) = corpus.splitAt(4)
    Bm25.writeIndex(a.toDF("doc_id", "text"), "doc_id", "text", idx2, nBuckets = 8)
    Bm25.deleteFromIndexInternal(Seq(1L).toDF("doc_id"), idx2,
      abortBeforeCommit = true)
    Bm25.appendToIndex(b.toDF("doc_id", "text"), "doc_id", "text", idx2)
    val scratchAll = java.nio.file.Files
      .createTempDirectory("bm25idx_del_p2").toString
    Bm25.writeIndex(docsDf, "doc_id", "text", scratchAll, nBuckets = 8)
    assertSame(probe(idx2), probe(scratchAll),
      "crashed delete's tombstones leaked into the committed append")
  }

  test("minedQueries: deterministic grouping of top-df terms") {
    val q = Bm25.minedQueries(docsDf, "doc_id", "text",
        nQueries = 2, termsPerQuery = 2)
      .collect().map(r => (r.getInt(0), r.getString(1)))
    assert(q.length === 4)
    assert(q.map(_._1).toSet === Set(1, 2))
    // df order on this corpus: iceberg/spark/tables at df=3 (ties break
    // by term), then data at df=2 ahead of manifests
    val byQ = q.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(byQ(1) === Set("iceberg", "spark"))
    assert(byQ(2) === Set("tables", "data"))
  }
}
