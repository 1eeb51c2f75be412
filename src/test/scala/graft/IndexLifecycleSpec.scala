package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Bm25, FingerprintLedger, IvfPq, Search, Similarity}
import graft.streaming.StreamingOps

/** Randomized lifecycle property harness for the four on-disk index
  * families (BM25, positional/phrase, IVF+PQ vector, fingerprint
  * ledger) — the [[IcebergLifecycleSpec]] pattern pointed at the
  * VersionedIndex commit protocol: random interleavings of
  * append / delete-or-forget / compact / streaming-sink batch /
  * sink replay, with CRASH INJECTION (abortBeforeCommit) at every
  * commit point, each op followed by a full model check:
  *
  *   - BM25: index probes bit-identical to the in-memory
  *     [[Bm25.search]] over the model's live docs (the shared
  *     scoreProbe contract);
  *   - phrase: [[Search.phraseProbe]] row-equal to
  *     [[Search.phraseOccurrences]] over live postings;
  *   - IVF+PQ: with nProbe = all cells and rerank ≥ n_vecs the probe
  *     must equal [[Similarity.bruteForceTopK]] over live vectors
  *     exactly (the q60 degeneracy), and stats track the live count;
  *   - ledger: [[FingerprintLedger.dedupAgainst]] returns exactly the
  *     never-seen (fresh + forgotten) rows, stats track the effective
  *     count, and a FORGOTTEN fingerprint re-appends cleanly (the
  *     gone-tombstone semantics).
  *
  * An aborted op must leave the committed version AND every probe
  * bit-unchanged; a replayed sink batch must be a no-op. Fresh seeds
  * every run (printed for reproduction); failures minimize naturally
  * (sequences are short) and get pinned as deterministic regressions.
  */
class IndexLifecycleSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("index-lifecycle-spec")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  // ---------------------------------------------------------- ops
  private sealed trait Op
  private case class Append(n: Int) extends Op
  private case class Delete(frac: Int) extends Op
  private case object Compact extends Op
  private case class Abort(kind: Int) extends Op // 0 append, 1 delete, 2 compact
  private case class Sink(n: Int) extends Op
  private case object ReplaySink extends Op
  private case object ReAppendForgotten extends Op // ledger only; Append(1) elsewhere

  // ------------------------------------------------------- fixtures
  private val vocab = Array("spark", "iceberg", "shuffle", "manifest",
    "tables", "joins", "parquet")
  private def textOf(id: Long): String = {
    val base = Seq(vocab((id % 7).toInt), vocab(((id * 3) % 7).toInt),
      vocab(((id * 5) % 7).toInt))
    // even ids carry the probe phrase; id%3==0 repeats a term (tf > 1)
    val phrase = if (id % 2 == 0) Seq("alpha", "beta") else Seq("alpha")
    val rep = if (id % 3 == 0) Seq(vocab((id % 7).toInt)) else Nil
    (base ++ phrase ++ rep).mkString(" ")
  }
  private def embOf(id: Long): Array[Float] =
    Array.tabulate(8)(j => (((id * 31 + j * 17 + id * j) % 97 + 97) % 97) / 97.0f)

  private def docsDf(ids: Seq[Long]): DataFrame = {
    import spark.implicits._
    ids.map(id => (id, textOf(id))).toDF("doc_id", "text")
  }
  private def idsDf(ids: Seq[Long]): DataFrame = {
    import spark.implicits._
    ids.toDF("doc_id")
  }
  private def vecsDf(ids: Seq[Long]): DataFrame = {
    import spark.implicits._
    ids.map(id => (id, embOf(id))).toDF("vec_id", "embedding")
  }
  private def fpsDf(ids: Seq[Long]): DataFrame = {
    import spark.implicits._
    ids.map(id => s"fp$id").toDF("fp")
  }

  // ------------------------------------------------------ families
  private trait Family {
    def name: String
    def bootstrap(ids: Seq[Long]): Unit
    def append(ids: Seq[Long]): Unit
    def abortAppend(ids: Seq[Long]): Unit
    def delete(ids: Seq[Long]): Unit
    def abortDelete(ids: Seq[Long]): Unit
    def compact(): Unit
    def abortCompact(): Unit
    def sink(ids: Seq[Long], bid: Long): Unit
    def version: Int
    def check(live: Set[Long], label: String): Unit
    /** ledger only: forgotten fps may legally re-enter. */
    def supportsReappend: Boolean = false
  }

  private def assertRows(got: Array[org.apache.spark.sql.Row],
      want: Array[org.apache.spark.sql.Row], label: String): Unit = {
    val g = got.map(_.toString).sorted.toSeq
    val w = want.map(_.toString).sorted.toSeq
    assert(g == w, s"$label:\n got=$g\nwant=$w")
  }

  private final class Bm25Family(path: String) extends Family {
    val name = "bm25"
    private val probes = {
      import spark.implicits._
      Seq((1, "alpha"), (2, "spark"), (2, "manifest"), (3, "beta"))
        .toDF("q_id", "term")
    }
    def bootstrap(ids: Seq[Long]): Unit =
      Bm25.writeIndex(docsDf(ids), "doc_id", "text", path, nBuckets = 4)
    def append(ids: Seq[Long]): Unit =
      Bm25.appendToIndex(docsDf(ids), "doc_id", "text", path)
    def abortAppend(ids: Seq[Long]): Unit =
      Bm25.appendToIndexInternal(docsDf(ids), "doc_id", "text", path,
        abortBeforeCommit = true)
    def delete(ids: Seq[Long]): Unit =
      Bm25.deleteFromIndex(idsDf(ids), path)
    def abortDelete(ids: Seq[Long]): Unit =
      Bm25.deleteFromIndexInternal(idsDf(ids), path, abortBeforeCommit = true)
    def compact(): Unit = Bm25.compactIndex(spark, path)
    def abortCompact(): Unit =
      Bm25.compactIndexInternal(spark, path, abortBeforeCommit = true)
    private val sinkFn =
      StreamingOps.bm25IndexSink("doc_id", "text", path, nBuckets = 4,
        txnAppId = Some("ils-app"))
    def sink(ids: Seq[Long], bid: Long): Unit = sinkFn(docsDf(ids), bid)
    def version: Int = Bm25.currentVersion(spark, path)
    def check(live: Set[Long], label: String): Unit =
      assertRows(
        Bm25.searchIndex(spark, path, probes, "doc_id", k = 10).collect(),
        Bm25.search(docsDf(live.toSeq.sorted), "doc_id", "text", probes,
          k = 10).collect(),
        s"$name $label probe != batch-over-model")
  }

  private final class SearchFamily(path: String) extends Family {
    val name = "phrase"
    private val phrase = Seq("alpha", "beta")
    def bootstrap(ids: Seq[Long]): Unit =
      Search.writeIndex(docsDf(ids), "doc_id", "text", path, nBuckets = 4)
    def append(ids: Seq[Long]): Unit =
      Search.appendToIndex(docsDf(ids), "doc_id", "text", path)
    def abortAppend(ids: Seq[Long]): Unit =
      Search.appendToIndexInternal(docsDf(ids), "doc_id", "text", path,
        abortBeforeCommit = true)
    def delete(ids: Seq[Long]): Unit =
      Search.deleteFromIndex(idsDf(ids), path)
    def abortDelete(ids: Seq[Long]): Unit =
      Search.deleteFromIndexInternal(idsDf(ids), path, abortBeforeCommit = true)
    def compact(): Unit = Search.compactIndex(spark, path)
    def abortCompact(): Unit =
      Search.compactIndexInternal(spark, path, abortBeforeCommit = true)
    private val sinkFn =
      StreamingOps.phraseIndexSink("doc_id", "text", path, nBuckets = 4,
        txnAppId = Some("ils-app"))
    def sink(ids: Seq[Long], bid: Long): Unit = sinkFn(docsDf(ids), bid)
    def version: Int = Search.currentVersion(spark, path)
    def check(live: Set[Long], label: String): Unit =
      assertRows(
        Search.phraseProbe(spark, path, phrase).collect(),
        Search.phraseOccurrences(
          Search.postings(docsDf(live.toSeq.sorted), "doc_id", "text"),
          phrase).collect(),
        s"$name $label probe != batch-over-model")
  }

  private final class IvfPqFamily(path: String) extends Family {
    val name = "ivfpq"
    private val queries = vecsDf(Seq(9001L, 9002L))
    def bootstrap(ids: Seq[Long]): Unit =
      IvfPq.writeIndex(vecsDf(ids), path, nCentroids = 4, centroidIters = 1,
        dim = 8, nSub = 2, codewords = 4, pqIters = 1)
    def append(ids: Seq[Long]): Unit =
      IvfPq.appendToIndex(vecsDf(ids), path)
    def abortAppend(ids: Seq[Long]): Unit =
      IvfPq.appendToIndexInternal(vecsDf(ids), path, abortBeforeCommit = true)
    def delete(ids: Seq[Long]): Unit = {
      import spark.implicits._
      IvfPq.deleteFromIndex(ids.toDF("vec_id"), path)
    }
    def abortDelete(ids: Seq[Long]): Unit = {
      import spark.implicits._
      IvfPq.deleteFromIndexInternal(ids.toDF("vec_id"), path,
        abortBeforeCommit = true)
    }
    def compact(): Unit = IvfPq.compactIndex(spark, path)
    def abortCompact(): Unit =
      IvfPq.compactIndexInternal(spark, path, abortBeforeCommit = true)
    private val sinkFn = StreamingOps.ivfPqIndexSink(path, nCentroids = 4,
      centroidIters = 1, dim = 8, nSub = 2, codewords = 4, pqIters = 1,
      txnAppId = Some("ils-app"))
    def sink(ids: Seq[Long], bid: Long): Unit = sinkFn(vecsDf(ids), bid)
    def version: Int = IvfPq.currentVersion(spark, path)
    def check(live: Set[Long], label: String): Unit = {
      assert(IvfPq.statsTable(spark, path).head().getAs[Long]("n_vecs")
        === live.size.toLong, s"$name $label stats n_vecs != model")
      // full-probe + full-rerank degeneracy: exactly brute force over
      // the live vectors (the q60 contract), deletes excluded
      assertRows(
        IvfPq.searchIndex(spark, path, queries, k = 5, nProbe = 4,
          rerank = 1 << 20).collect(),
        Similarity.bruteForceTopK(vecsDf(live.toSeq.sorted), queries,
          k = 5, dim = 8).collect(),
        s"$name $label degenerate probe != brute force over model")
    }
  }

  private final class LedgerFamily(path: String) extends Family {
    val name = "ledger"
    def bootstrap(ids: Seq[Long]): Unit =
      FingerprintLedger.writeLedger(fpsDf(ids), path, nBuckets = 4)
    def append(ids: Seq[Long]): Unit =
      FingerprintLedger.appendToLedger(fpsDf(ids), path)
    def abortAppend(ids: Seq[Long]): Unit =
      FingerprintLedger.appendToLedgerInternal(fpsDf(ids), path,
        abortBeforeCommit = true)
    def delete(ids: Seq[Long]): Unit = // forget = the ledger's delete
      FingerprintLedger.forgetFingerprints(fpsDf(ids), path)
    def abortDelete(ids: Seq[Long]): Unit =
      FingerprintLedger.forgetFingerprintsInternal(fpsDf(ids), path,
        abortBeforeCommit = true)
    def compact(): Unit = FingerprintLedger.compactLedger(spark, path)
    def abortCompact(): Unit =
      FingerprintLedger.compactLedgerInternal(spark, path,
        abortBeforeCommit = true)
    private val out =
      java.nio.file.Files.createTempDirectory("ils_ledger_out").toString
    private val sinkFn = StreamingOps.ledgerDedupSink("fp", path, out,
      txnAppId = "ils-app", nBuckets = 4)
    def sink(ids: Seq[Long], bid: Long): Unit = sinkFn(fpsDf(ids), bid)
    def version: Int = FingerprintLedger.currentVersion(spark, path)
    override def supportsReappend: Boolean = true
    def check(live: Set[Long], label: String): Unit = {
      assert(FingerprintLedger.statsTable(spark, path, version).head()
        .getAs[Long]("n_fps") === live.size.toLong,
        s"$name $label stats n_fps != model")
      // a probe batch of live ∪ two-fresh: dedupAgainst returns exactly
      // the fresh rows (forgotten fps count as never-seen — they are
      // generated back into the probe set by the caller)
      val fresh = Seq(888881L, 888882L)
      val probe = fpsDf(live.toSeq.sorted ++ fresh)
      val got = FingerprintLedger.dedupAgainst(probe, "fp", path)
        .collect().map(_.getString(0)).toSet
      assert(got === fresh.map(id => s"fp$id").toSet,
        s"$name $label dedupAgainst != model")
    }
  }

  // ------------------------------------------------------ the runner
  private def runSequence(fam: Family, ops: List[Op], label: String): Unit = {
    var live = Set.empty[Long]
    var forgotten = Set.empty[Long] // ledger: re-appendable
    var nextId = 1L
    var nextBid = 0L
    var lastSink: Option[(Seq[Long], Long)] = None
    def fresh(n: Int): Seq[Long] = {
      val ids = (nextId until nextId + n); nextId += n; ids
    }
    def victims(frac: Int): Seq[Long] = {
      val sorted = live.toSeq.sorted
      val picked = sorted.zipWithIndex.collect {
        case (id, i) if i % frac == 0 => id
      }
      if (picked.size >= sorted.size) picked.drop(1) else picked
    }
    val boot = fresh(8)
    fam.bootstrap(boot)
    live ++= boot
    fam.check(live, s"$label bootstrap")
    for ((op, i) <- ops.zipWithIndex) {
      val l = s"$label op$i $op"
      op match {
        case Append(n) =>
          val ids = fresh(n); fam.append(ids); live ++= ids
        case Sink(n) =>
          val ids = fresh(n); fam.sink(ids, nextBid)
          lastSink = Some((ids, nextBid)); nextBid += 1; live ++= ids
        case ReplaySink =>
          lastSink.foreach { case (ids, b) =>
            val v0 = fam.version
            fam.sink(ids, b)
            assert(fam.version === v0, s"$l replayed sink committed")
          }
        case Delete(frac) =>
          val ids = victims(frac)
          if (ids.nonEmpty) {
            fam.delete(ids); live --= ids
            if (fam.supportsReappend) forgotten ++= ids
          }
        case ReAppendForgotten =>
          if (fam.supportsReappend && forgotten.nonEmpty) {
            val ids = forgotten.toSeq.sorted.take(2)
            fam.append(ids); live ++= ids; forgotten --= ids
          } else { val ids = fresh(1); fam.append(ids); live ++= ids }
        case Compact =>
          fam.compact()
          if (!fam.supportsReappend) forgotten = Set.empty
        case Abort(kind) =>
          val v0 = fam.version
          kind % 3 match {
            case 0 => fam.abortAppend(fresh(2))
            case 1 =>
              val ids = victims(3)
              if (ids.nonEmpty) fam.abortDelete(ids)
            case _ => fam.abortCompact()
          }
          assert(fam.version === v0, s"$l aborted op committed")
      }
      fam.check(live, l)
    }
  }

  private def genOps(rnd: scala.util.Random, n: Int,
      reappend: Boolean): List[Op] =
    List.fill(n) {
      rnd.nextInt(10) match {
        case 0 | 1 => Append(1 + rnd.nextInt(3))
        case 2 | 3 => Sink(1 + rnd.nextInt(3))
        case 4 => ReplaySink
        case 5 | 6 => Delete(2 + rnd.nextInt(3))
        case 7 => Compact
        case 8 => Abort(rnd.nextInt(3))
        case _ => if (reappend) ReAppendForgotten else Append(1)
      }
    }

  test("randomized index-family lifecycles uphold probe==model across " +
      "append/delete/compact/sink/replay with crash injection " +
      "(48 sequences, fresh seeds)") {
    val seed = System.nanoTime()
    println(s"[IndexLifecycleSpec] seed=$seed")
    val rnd = new scala.util.Random(seed)
    val mk: Seq[String => Family] = Seq(
      p => new Bm25Family(p), p => new SearchFamily(p),
      p => new IvfPqFamily(p), p => new LedgerFamily(p))
    for (s <- 0 until 12; (f, fi) <- mk.zipWithIndex) {
      val fam = f(java.nio.file.Files
        .createTempDirectory(s"ils_${fi}_$s").toString)
      val ops = genOps(rnd, 6, fam.supportsReappend)
      runSequence(fam, ops, s"seed=$seed fam=${fam.name} seq=$s")
    }
  }

  test("pinned: forget → re-append → forget → compact keeps the ledger " +
      "exact (gone-tombstone version ordering)") {
    val path = java.nio.file.Files.createTempDirectory("ils_pin1").toString
    val fam = new LedgerFamily(path)
    runSequence(fam, List(Delete(2), ReAppendForgotten, Delete(2),
      Compact, Append(2), ReAppendForgotten, Compact),
      "pinned-ledger")
  }

  test("pinned: tombstoned ids refuse re-append on the text indexes " +
      "until compaction folds the tombstones in") {
    import spark.implicits._
    val idx = java.nio.file.Files.createTempDirectory("ils_pin2").toString
    Bm25.writeIndex(docsDf(1L to 6L), "doc_id", "text", idx, nBuckets = 4)
    Bm25.deleteFromIndex(Seq(2L, 4L).toDF("doc_id"), idx)
    val ex = intercept[IllegalArgumentException] {
      Bm25.appendToIndex(docsDf(Seq(4L, 100L)), "doc_id", "text", idx)
    }
    assert(ex.getMessage.contains("tombstoned"))
    // the refused append must not have committed anything
    assert(Bm25.currentVersion(spark, idx) === 2)
    Bm25.compactIndex(spark, idx)
    Bm25.appendToIndex(docsDf(Seq(4L, 100L)), "doc_id", "text", idx)

    val pIdx = java.nio.file.Files.createTempDirectory("ils_pin3").toString
    Search.writeIndex(docsDf(1L to 6L), "doc_id", "text", pIdx, nBuckets = 4)
    Search.deleteFromIndex(Seq(3L).toDF("doc_id"), pIdx)
    val ex2 = intercept[IllegalArgumentException] {
      Search.appendToIndex(docsDf(Seq(3L)), "doc_id", "text", pIdx)
    }
    assert(ex2.getMessage.contains("tombstoned"))
    Search.compactIndex(spark, pIdx)
    Search.appendToIndex(docsDf(Seq(3L)), "doc_id", "text", pIdx)
  }
}
