package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.api.SchemaTranslator
import graft.parse.Db2Parser
import graft.sources.{IcebergChanges, IcebergDeletes, IcebergSnapshot}

/** Incremental / changelog reads over the v2 writer: an append-only
  * incremental scan returns exactly the rows the in-range snapshots
  * committed (discriminated by the manifest entries' own snapshot
  * ids), refuses ranges that remove rows, skips compactions; the CDC
  * changesTable reproduces the model's per-snapshot insert/delete
  * diff for every operation, with compaction diffing to nothing. The
  * table is identity-partitioned so both paths exercise the
  * dir-encoded restore. */
class IcebergChangesSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("iceberg-changes-spec")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val table = Db2Parser.parse(
    """CREATE TABLE S.CHG (
      |  K BIGINT NOT NULL,
      |  V VARCHAR(10),
      |  N INTEGER
      |) PARTITION BY RANGE (V);""".stripMargin).tables.head

  private def rowsDf(rows: Seq[(Long, String, Int)]) = {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("K", LongType, nullable = false),
      StructField("V", StringType), StructField("N", IntegerType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        rows.map(r => org.apache.spark.sql.Row(r._1, r._2, r._3)), 2),
      schema)
  }

  private def mk(k: Long): (Long, String, Int) = (k, s"p${k % 2}", (k * 7).toInt)

  private def chainIds(out: String): Seq[Long] = {
    val v = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(out, "metadata", "version-hint.text")), "UTF-8")
      .trim.toInt
    val meta = org.json4s.jackson.JsonMethods.parse(
      new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(out, "metadata", s"v$v.metadata.json")), "UTF-8"))
    import org.json4s._
    (meta \ "snapshots").asInstanceOf[JArray].arr
      .map(s => (s \ "snapshot-id").asInstanceOf[JInt].num.toLong)
  }

  private def collectChanges(df: org.apache.spark.sql.DataFrame)
      : Set[(Long, Int, String, Long)] =
    df.select(col("K"), col("N"), col("_change_type"),
        col("_commit_snapshot_id"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getLong(3)))
      .toSet

  /** migrate(1-5) → append(6-9) → append(10-12) → pos-delete(K%3==0)
    * → upsert(update K=1, insert 13) → compactWithDeletes. */
  private lazy val fixture: (String, Seq[Long]) = {
    val out = java.nio.file.Files.createTempDirectory("iceberg_chg").toString
    SchemaTranslator.migrateTable(rowsDf((1L to 5L).map(mk)), table, out)
    SchemaTranslator.appendIncrement(rowsDf((6L to 9L).map(mk)), table, out)
    SchemaTranslator.appendIncrement(rowsDf((10L to 12L).map(mk)), table, out)
    IcebergDeletes.commitPositionDeletes(spark, table, out, col("K") % 3 === 0)
    SchemaTranslator.mergeUpsert(
      rowsDf(Seq((1L, "p1", 9999), mk(13L))), table, out, keyCols = Seq("K"))
    IcebergDeletes.compactWithDeletes(spark, table, out)
    val ids = chainIds(out)
    assert(ids.size === 6)
    (out, ids)
  }

  test("incrementalAppendScan returns exactly the in-range snapshots' rows, " +
      "tagged with their committer") {
    val (out, ids) = fixture
    val inc = IcebergChanges.incrementalAppendScan(spark, out, table,
      fromSnapshotId = Some(ids(0)), toSnapshotId = Some(ids(2)))
    val got = collectChanges(inc)
    val want = ((6L to 9L).map(k => (k, (k * 7).toInt, "insert", ids(1))) ++
      (10L to 12L).map(k => (k, (k * 7).toInt, "insert", ids(2)))).toSet
    assert(got === want)
    // the restored identity column comes back too
    assert(inc.filter(col("V") === "p0").count() ===
      (6L to 12L).count(_ % 2 == 0).toLong)
    // from None = since table creation (append-only prefix)
    val all = IcebergChanges.incrementalAppendScan(spark, out, table,
      fromSnapshotId = None, toSnapshotId = Some(ids(2)))
    assert(all.count() === 12L)
    assert(all.filter(col("_commit_snapshot_id") === ids(0)).count() === 5L)
    // ordinals follow commit order within the requested range
    assert(all.select("_change_ordinal").distinct().count() === 3L)
  }

  test("incrementalAppendScan refuses row-removing snapshots in strict " +
      "mode, reports only adds with strict=false, skips REPLACE") {
    val (out, ids) = fixture
    val ex = intercept[IllegalArgumentException] {
      IcebergChanges.incrementalAppendScan(spark, out, table,
        fromSnapshotId = Some(ids(2)))
    }
    assert(ex.getMessage.contains("changesTable"))
    // non-strict: the delete snapshot contributes nothing, the upsert
    // contributes its data file's rows, the compaction is skipped
    val lax = IcebergChanges.incrementalAppendScan(spark, out, table,
      fromSnapshotId = Some(ids(2)), strict = false)
    val got = collectChanges(lax)
    assert(got === Set((1L, 9999, "insert", ids(4)),
      (13L, 13 * 7, "insert", ids(4))))
    // an all-append range below the deletes stays strict-clean
    IcebergChanges.incrementalAppendScan(spark, out, table,
      fromSnapshotId = Some(ids(0)), toSnapshotId = Some(ids(2)))
  }

  test("incrementalAppendScan reads ONLY the in-range snapshots' files — " +
      "the O(rows added), table-size-independent contract") {
    val (out, ids) = fixture
    def inputsOf(from: Option[Long], to: Option[Long]) =
      IcebergChanges.incrementalAppendScan(spark, out, table, from, to)
        .inputFiles.toSet
    val snap1Files = inputsOf(None, Some(ids(0)))
    val snap2Files = inputsOf(Some(ids(0)), Some(ids(1)))
    val snap3Files = inputsOf(Some(ids(1)), Some(ids(2)))
    assert(snap1Files.nonEmpty && snap2Files.nonEmpty && snap3Files.nonEmpty)
    // per-snapshot scans are pairwise disjoint: no range ever re-reads
    // an earlier commit's files
    assert((snap1Files & snap2Files).isEmpty)
    assert((snap1Files & snap3Files).isEmpty)
    assert((snap2Files & snap3Files).isEmpty)
    // and a sub-range's scan is exactly its snapshots' union
    assert(inputsOf(Some(ids(0)), Some(ids(2))) === snap2Files ++ snap3Files)
  }

  test("changesTable reproduces the per-snapshot insert/delete diff; " +
      "compaction emits nothing") {
    val (out, ids) = fixture
    val all = IcebergChanges.changesTable(spark, out, table,
      fromSnapshotId = None)
    def at(id: Long) = collectChanges(
      all.filter(col("_commit_snapshot_id") === id))
    assert(at(ids(0)) ===
      (1L to 5L).map(k => (k, (k * 7).toInt, "insert", ids(0))).toSet)
    assert(at(ids(1)) ===
      (6L to 9L).map(k => (k, (k * 7).toInt, "insert", ids(1))).toSet)
    // position delete: K % 3 == 0 among 1..12
    assert(at(ids(3)) ===
      Seq(3L, 6L, 9L, 12L).map(k => (k, (k * 7).toInt, "delete", ids(3))).toSet)
    // upsert: K=1 old row out, new row in; K=13 pure insert
    assert(at(ids(4)) === Set(
      (1L, 7, "delete", ids(4)), (1L, 9999, "insert", ids(4)),
      (13L, 13 * 7, "insert", ids(4))))
    // compaction: bytes moved, no logical change
    assert(at(ids(5)) === Set.empty)
    // a mid-chain range carries only its snapshots
    val mid = IcebergChanges.changesTable(spark, out, table,
      fromSnapshotId = Some(ids(2)), toSnapshotId = Some(ids(3)))
    assert(collectChanges(mid) ===
      Seq(3L, 6L, 9L, 12L).map(k => (k, (k * 7).toInt, "delete", ids(3))).toSet)
    // unknown from-snapshot fails loudly
    intercept[IllegalArgumentException] {
      IcebergChanges.changesTable(spark, out, table, fromSnapshotId = Some(42L))
    }
  }

  test("incrementalChangesScan == changesTable row-for-row over every " +
      "range of a sink-shaped history, at O(changes) cost; position " +
      "deletes refuse loudly; the parent read is key-pruned") {
    // sink-shaped history: appends + equality upserts + a pure
    // equality delete + an identical-content rewrite + compaction
    val out = java.nio.file.Files.createTempDirectory("iceberg_ics").toString
    SchemaTranslator.migrateTable(rowsDf((1L to 6L).map(mk)), table, out)
    SchemaTranslator.appendIncrement(rowsDf((7L to 10L).map(mk)), table, out)
    SchemaTranslator.mergeUpsert(
      rowsDf(Seq((2L, "p0", 2222), (3L, "p1", 3333), mk(11L))), table, out,
      keyCols = Seq("K"))
    // identical-content rewrite: both faces must emit NOTHING for K=4
    SchemaTranslator.mergeUpsert(rowsDf(Seq(mk(4L))), table, out,
      keyCols = Seq("K"))
    // pure equality delete (no replacement rows): K = 5 and 7 out
    IcebergDeletes.commitUpsert(spark, table, out,
      rowsDf(Seq(mk(5L), mk(7L))).select("K"))
    IcebergDeletes.compactWithDeletes(spark, table, out)
    SchemaTranslator.appendIncrement(rowsDf((12L to 13L).map(mk)), table, out)
    val ids = chainIds(out)
    assert(ids.size === 7)

    def full(df: org.apache.spark.sql.DataFrame)
        : Seq[(Long, String, Int, String, Long, Int)] =
      df.select(col("K"), col("V"), col("N"), col("_change_type"),
          col("_commit_snapshot_id"), col("_change_ordinal"))
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getString(3),
          r.getLong(4), r.getInt(5)))
        .toSeq.sorted
    // EVERY (from, to] range over the chain agrees with the state diff
    // — rows, metadata columns and ordinals included
    val froms = None +: ids.map(Some(_))
    for (fi <- froms.indices; ti <- fi until ids.size) {
      val from = froms(fi); val to = Some(ids(ti))
      assert(full(IcebergChanges.incrementalChangesScan(
          spark, out, table, from, to)) ===
        full(IcebergChanges.changesTable(spark, out, table, from, to)),
        s"range ($from, $to] diverged from the state diff")
    }

    // cost shape: the scan's data-file inputs for one append snapshot
    // are exactly that snapshot's files (no parent read when no
    // deletes), and the upsert snapshot's parent read is PRUNED — its
    // input set stays a strict subset of the parent's full live set
    val appendOnly = IcebergChanges.incrementalChangesScan(spark, out, table,
      fromSnapshotId = Some(ids(5)), toSnapshotId = Some(ids(6)))
    val appendScan = IcebergChanges.incrementalAppendScan(spark, out, table,
      fromSnapshotId = Some(ids(5)), toSnapshotId = Some(ids(6)))
    assert(appendOnly.inputFiles.toSet === appendScan.inputFiles.toSet,
      "an append-only range must read exactly the added files")
    // the pure equality delete (keys {5,7}): its parent read must skip
    // the parent files whose K stats cannot contain those keys
    val deleteRange = IcebergChanges.incrementalChangesScan(spark, out, table,
      fromSnapshotId = Some(ids(3)), toSnapshotId = Some(ids(4)))
    val parentFull = IcebergSnapshot.readSnapshot(spark, out, table,
      Some(ids(3))).inputFiles.toSet
    val extraOverAdds = deleteRange.inputFiles.toSet
      .filterNot(_.contains("/deletes/")) // the key file itself
    assert(extraOverAdds.subsetOf(parentFull))
    assert(extraOverAdds.size < parentFull.size,
      "the delete-resolving parent read must be file-pruned by the keys")

    // position deletes have no key identity: the O(changes) face
    // refuses and points at changesTable
    val out2 = java.nio.file.Files.createTempDirectory("iceberg_ics2").toString
    SchemaTranslator.migrateTable(rowsDf((1L to 6L).map(mk)), table, out2)
    IcebergDeletes.commitPositionDeletes(spark, table, out2, col("K") % 3 === 0)
    val e = intercept[IllegalArgumentException] {
      IcebergChanges.incrementalChangesScan(spark, out2, table, None).collect()
    }
    assert(e.getMessage.contains("POSITION deletes"))
  }

  test("incrementalChangesScan resolves NULL-keyed equality deletes " +
      "(null-safe join, matching the read path's <=> application)") {
    val tableNk = Db2Parser.parse(
      """CREATE TABLE S.CHGNK (
        |  K BIGINT NOT NULL,
        |  V VARCHAR(10),
        |  N INTEGER
        |);""".stripMargin).tables.head
    val out = java.nio.file.Files.createTempDirectory("iceberg_nullkey").toString
    SchemaTranslator.migrateTable(rowsDf(Seq(
      (1L, "a", 1), (2L, null, 2), (3L, "b", 3), (4L, null, 44))),
      tableNk, out)
    // equality delete keyed on the NULLABLE column, with a null key row:
    // table state drops V='a' AND both V=null rows (read path is
    // null-safe), so the CDC scan must emit all three deletes
    IcebergDeletes.commitUpsert(spark, tableNk, out,
      rowsDf(Seq((0L, "a", 0), (0L, null, 0))).select("V"))
    assert(IcebergSnapshot.readSnapshot(spark, out, tableNk)
      .select("K").collect().map(_.getLong(0)).toSet === Set(3L))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select(col("K"), col("_change_type"), col("_change_ordinal"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
        .toSeq.sorted
    val stateDiff = rows(IcebergChanges.changesTable(spark, out, tableNk, None))
    assert(stateDiff.count(_._2 == "delete") === 3,
      s"state diff must show the null-keyed rows deleted: $stateDiff")
    assert(rows(IcebergChanges.incrementalChangesScan(
      spark, out, tableNk, None)) === stateDiff,
      "the O(changes) scan silently dropped null-keyed deletes")
  }

  test("a purge-scale delete commit (records > maxInKeys) resolves via " +
      "a SHUFFLED semi-join — same rows, no driver broadcast") {
    val out = java.nio.file.Files.createTempDirectory("iceberg_purge").toString
    SchemaTranslator.migrateTable(rowsDf((1L to 20L).map(mk)), table, out)
    IcebergDeletes.commitUpsert(spark, table, out,
      rowsDf((2L to 12L).map(mk)).select("K"))
    val want = IcebergChanges.changesTable(spark, out, table, None)
      .select(col("K"), col("_change_type")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq.sorted
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      // above the gate: no broadcast hint anywhere in the delete
      // resolution — with auto-broadcast off the semi-join must plan
      // shuffled, and the rows must not change
      val gated = IcebergChanges.incrementalChangesScan(
        spark, out, table, None, maxInKeys = 5)
      assert(gated.select(col("K"), col("_change_type")).collect()
        .map(r => (r.getLong(0), r.getString(1))).toSeq.sorted === want)
      val gatedPlan = gated.queryExecution.executedPlan.toString
      assert(!gatedPlan.contains("BroadcastHashJoin"),
        "purge-scale delete keys must not broadcast:\n" +
          gatedPlan.take(2000))
      // below the gate the explicit broadcast hint survives even with
      // auto-broadcast disabled — the batch-sized fast path
      val hinted = IcebergChanges.incrementalChangesScan(
        spark, out, table, None, maxInKeys = 10000)
      assert(hinted.queryExecution.executedPlan.toString
        .contains("BroadcastHashJoin"))
    } finally spark.conf.set(
      "spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }

  test("all three incremental faces number _change_ordinal identically " +
      "when a REPLACE interleaves the range") {
    val out = java.nio.file.Files.createTempDirectory("iceberg_ord").toString
    SchemaTranslator.migrateTable(rowsDf((1L to 4L).map(mk)), table, out)   // ord 0
    SchemaTranslator.appendIncrement(rowsDf(Seq(mk(5L))), table, out)       // ord 1
    IcebergSnapshot.compactDataFiles(spark, table, out,
      targetBytes = 512L * 1024 * 1024)                                     // ord 2 (replace)
    SchemaTranslator.appendIncrement(rowsDf(Seq(mk(6L))), table, out)       // ord 3
    def ordOf(df: org.apache.spark.sql.DataFrame): Map[Long, Int] =
      df.select(col("_commit_snapshot_id"), col("_change_ordinal"))
        .distinct().collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val a = ordOf(IcebergChanges.incrementalAppendScan(spark, out, table, None))
    val c = ordOf(IcebergChanges.changesTable(spark, out, table, None))
    val i = ordOf(IcebergChanges.incrementalChangesScan(spark, out, table, None))
    val ids = chainIds(out)
    // the replace consumes ordinal 2 in every face; the post-compaction
    // append lands at 3, not 2
    assert(a === Map(ids(0) -> 0, ids(1) -> 1, ids(3) -> 3), a.toString)
    assert(c.view.filterKeys(Set(ids(0), ids(1), ids(3))).toMap === a)
    assert(i === a, "CDC scan ordinals diverged from the append scan's")
  }
}
