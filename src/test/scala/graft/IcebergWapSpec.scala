package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.api.SchemaTranslator
import graft.parse.Db2Parser
import graft.sources.{IcebergChanges, IcebergInspect, IcebergSnapshot, IcebergWap}

/** Write-audit-publish over the Iceberg v2 writer: staged branch
  * appends are invisible on main, auditable through the branch read,
  * published atomically by fast-forward, refused when main advanced
  * past the fork, and GC'd when abandoned. Also pins that every
  * main-anchored face (reads, inspection defaults, incremental scans,
  * main-side commits, expiry, the structural validator) resolves the
  * MAIN head rather than the snapshots-array tail while a staged
  * snapshot trails it. */
class IcebergWapSpec extends AnyFunSuite {
  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("iceberg-wap-spec")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def mkTable(name: String) = Db2Parser.parse(
    s"""CREATE TABLE S.$name (
       |  K BIGINT NOT NULL,
       |  V VARCHAR(10),
       |  N INTEGER
       |) PARTITION BY RANGE (V);""".stripMargin).tables.head

  private def df(ks: Seq[Long]) = {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("K", LongType, nullable = false),
      StructField("V", StringType), StructField("N", IntegerType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        ks.map(k => org.apache.spark.sql.Row(k, s"p${k % 3}", (k * 7).toInt)), 2),
      schema)
  }

  private def ksOf(d: org.apache.spark.sql.DataFrame): Seq[Long] =
    d.select("K").collect().map(_.getLong(0)).sorted.toSeq

  private def metaText(out: String): String = {
    val v = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(out, "metadata", "version-hint.text")), "UTF-8")
      .trim.toInt
    new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(out, "metadata", s"v$v.metadata.json")), "UTF-8")
  }

  test("stage → audit → publish: main is untouched until fast-forward") {
    val table = mkTable("WAP1")
    val out = java.nio.file.Files.createTempDirectory("wap1").toString
    SchemaTranslator.migrateTable(df(1L to 4L), table, out)

    // stage day 2 on the audit branch — main still reads day 1 only
    SchemaTranslator.stageAppendToBranch(df(5L to 7L), table, out, "audit")
    assert(ksOf(IcebergSnapshot.readSnapshot(spark, out, table)) === (1L to 4L))
    assert(ksOf(IcebergSnapshot.readSnapshotAtRef(spark, out, table, "audit"))
      === (1L to 7L))

    // the staged metadata stays structurally valid (current-snapshot-id,
    // main ref, log-last == current, no dangling refs)
    IcebergV2Validation.validateV2(
      org.json4s.jackson.JsonMethods.parse(metaText(out)), expectSnapshot = true)

    // inspection surfaces: refs show the staged branch ahead of main;
    // files/partitions DEFAULT to the published head
    val refs = IcebergInspect.refsTable(spark, out).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(refs.contains("main") && refs.contains("audit"))
    assert(refs("main") !== refs("audit"))
    assert(IcebergInspect.filesTable(spark, out, table)
      .agg(org.apache.spark.sql.functions.sum("record_count")).collect()
      .head.getLong(0) === 4L)

    // incremental scan with default bounds stops at main's head
    assert(IcebergChanges.incrementalAppendScan(spark, out, table, None)
      .count() === 4L)

    // quality gate over the branch read (the audit step), then publish
    assert(IcebergSnapshot.readSnapshotAtRef(spark, out, table, "audit")
      .filter(col("N") < 0).count() === 0L)
    SchemaTranslator.publishBranch(spark, table, out, "audit")
    assert(ksOf(IcebergSnapshot.readSnapshot(spark, out, table)) === (1L to 7L))
    IcebergV2Validation.validateV2(
      org.json4s.jackson.JsonMethods.parse(metaText(out)), expectSnapshot = true)

    // a second staging round on the same branch works the same way
    SchemaTranslator.stageAppendToBranch(df(8L to 9L), table, out, "audit")
    assert(ksOf(IcebergSnapshot.readSnapshot(spark, out, table)) === (1L to 7L))
    assert(ksOf(IcebergSnapshot.readSnapshotAtRef(spark, out, table, "audit"))
      === (1L to 9L))
    SchemaTranslator.publishBranch(spark, table, out, "audit")
    assert(ksOf(IcebergSnapshot.readSnapshot(spark, out, table)) === (1L to 9L))

    // publish is idempotent once main is at the branch head
    IcebergWap.fastForwardMain(table, out, "audit",
      spark.sparkContext.hadoopConfiguration)
    assert(ksOf(IcebergSnapshot.readSnapshot(spark, out, table)) === (1L to 9L))
  }

  test("main-side commits while staged build on MAIN; diverged publish refuses; abandon GCs") {
    val table = mkTable("WAP2")
    val out = java.nio.file.Files.createTempDirectory("wap2").toString
    SchemaTranslator.migrateTable(df(1L to 4L), table, out)
    SchemaTranslator.stageAppendToBranch(df(5L to 6L), table, out, "audit")

    // a main-side append anchors at MAIN's head, not the staged tail
    SchemaTranslator.appendIncrement(df(10L to 11L), table, out)
    assert(ksOf(IcebergSnapshot.readSnapshot(spark, out, table))
      === Seq(1L, 2L, 3L, 4L, 10L, 11L))
    assert(ksOf(IcebergSnapshot.readSnapshotAtRef(spark, out, table, "audit"))
      === (1L to 6L))
    IcebergV2Validation.validateV2(
      org.json4s.jackson.JsonMethods.parse(metaText(out)), expectSnapshot = true)

    // the staged snapshot must not LEAK into main-ancestry reads even
    // now that the main head is the array tail again (chain is
    // [A, B_staged, C_main]): incremental and CDC reads over (_, C]
    // follow parent links, not array position …
    val stagedId = IcebergSnapshot.listRefs(out,
      spark.sparkContext.hadoopConfiguration)
      .collectFirst { case ("audit", id, _) => id }.get
    val inc = IcebergChanges.incrementalAppendScan(spark, out, table, None)
    assert(ksOf(inc.drop("_change_type", "_commit_snapshot_id",
      "_change_ordinal")) === Seq(1L, 2L, 3L, 4L, 10L, 11L),
      "a staged WAP snapshot must not surface as committed inserts")
    assert(!inc.select("_commit_snapshot_id").distinct().collect()
      .map(_.getLong(0)).contains(stagedId))
    val cdc = IcebergChanges.changesTable(spark, out, table, None)
    assert(!cdc.select("_commit_snapshot_id").distinct().collect()
      .map(_.getLong(0)).contains(stagedId))
    assert(cdc.filter(col("_change_type") === "insert").count() === 6L)
    // … and the snapshot-log never claims the staged snapshot was
    // made current (head == tail, so the old head!=tail guard alone
    // would have missed it)
    val metaDoc = org.json4s.jackson.JsonMethods.parse(metaText(out))
    val logIds = (metaDoc \ "snapshot-log").asInstanceOf[org.json4s.JArray]
      .arr.map(e => (e \ "snapshot-id").asInstanceOf[org.json4s.JInt].num.toLong)
    assert(!logIds.contains(stagedId),
      "snapshot-log must hold main-ancestry entries only")
    val allIds = (metaDoc \ "snapshots").asInstanceOf[org.json4s.JArray]
      .arr.map(e => (e \ "snapshot-id").asInstanceOf[org.json4s.JInt].num.toLong)
    assert(allIds.contains(stagedId), "the staged snapshot stays retained")
    // an EXPLICIT branch-head bound reads that branch's coherent
    // ancestry instead (A + B, not C)
    val branchInc = IcebergChanges.incrementalAppendScan(spark, out, table,
      None, toSnapshotId = Some(stagedId))
    assert(ksOf(branchInc.drop("_change_type", "_commit_snapshot_id",
      "_change_ordinal")) === (1L to 6L))

    // a main-side DELETE also anchors at main (the staged rows are not
    // candidates), and main's history stays linear
    SchemaTranslator.deleteWhere(spark, table, out, col("K") === 10L)
    assert(ksOf(IcebergSnapshot.readSnapshot(spark, out, table))
      === Seq(1L, 2L, 3L, 4L, 11L))
    assert(ksOf(IcebergSnapshot.readSnapshotAtRef(spark, out, table, "audit"))
      === (1L to 6L))

    // main advanced past the fork — publishing the stale branch refuses
    val err = intercept[IllegalArgumentException] {
      IcebergWap.fastForwardMain(table, out, "audit",
        spark.sparkContext.hadoopConfiguration)
    }
    assert(err.getMessage.contains("not an ancestor"))

    // abandon: drop the ref, expire — the staged snapshot's files are
    // GC'd, main reads on unchanged
    val staged = IcebergSnapshot.listRefs(out,
      spark.sparkContext.hadoopConfiguration)
      .collectFirst { case ("audit", id, _) => id }.get
    IcebergSnapshot.dropRef(table, out, "audit",
      spark.sparkContext.hadoopConfiguration)
    val (head, doomed) = IcebergSnapshot.expireSnapshots(table, out,
      keepLast = 1, spark.sparkContext.hadoopConfiguration)
    assert(doomed.nonEmpty)
    assert(ksOf(IcebergSnapshot.readSnapshot(spark, out, table))
      === Seq(1L, 2L, 3L, 4L, 11L))
    assert(head.snapshotId !== staged)
    intercept[IllegalArgumentException] {
      IcebergSnapshot.readSnapshot(spark, out, table, Some(staged))
    }
    IcebergV2Validation.validateV2(
      org.json4s.jackson.JsonMethods.parse(metaText(out)), expectSnapshot = true)
  }

  test("cherryPickAppend: a diverged staged append re-applies onto the " +
      "advanced main; idempotent; delete segments refuse; expiry keeps " +
      "the re-listed files") {
    val table = mkTable("WAP4")
    val out = java.nio.file.Files.createTempDirectory("wap4").toString
    val conf = spark.sparkContext.hadoopConfiguration
    SchemaTranslator.migrateTable(df(1L to 4L), table, out)
    // stage days 5-6, then main advances past the fork
    SchemaTranslator.stageAppendToBranch(df(5L to 6L), table, out, "audit")
    SchemaTranslator.appendIncrement(df(10L to 11L), table, out)
    val mainBefore = IcebergInspect.refsTable(spark, out).collect()
      .collectFirst { case r if r.getString(0) == "main" => r.getLong(2) }.get
    // publish refuses (diverged) — cherry-pick instead
    intercept[IllegalArgumentException] {
      IcebergWap.fastForwardMain(table, out, "audit", conf)
    }
    val snap = IcebergWap.cherryPickAppend(table, out, "audit", conf)
    assert(ksOf(IcebergSnapshot.readSnapshot(spark, out, table))
      === Seq(1L, 2L, 3L, 4L, 5L, 6L, 10L, 11L))
    IcebergV2Validation.validateV2(
      org.json4s.jackson.JsonMethods.parse(metaText(out)), expectSnapshot = true)
    // incremental scan attributes the staged rows to the PICK commit
    val inc = IcebergChanges.incrementalAppendScan(spark, out, table,
      Some(mainBefore))
    assert(ksOf(inc.drop("_change_type", "_commit_snapshot_id",
      "_change_ordinal")) === Seq(5L, 6L))
    assert(inc.select("_commit_snapshot_id").distinct().collect()
      .map(_.getLong(0)).toSeq === Seq(snap.snapshotId))
    // idempotent: the branch ref moved onto the pick — second call no-ops
    val again = IcebergWap.cherryPickAppend(table, out, "audit", conf)
    assert(again.snapshotId === snap.snapshotId)
    assert(ksOf(IcebergSnapshot.readSnapshot(spark, out, table))
      === Seq(1L, 2L, 3L, 4L, 5L, 6L, 10L, 11L))
    // the staged originals are expirable now; the re-listed data files
    // survive GC and main still reads everything
    IcebergSnapshot.dropRef(table, out, "audit", conf)
    val (_, doomed) = IcebergSnapshot.expireSnapshots(table, out,
      keepLast = 1, conf)
    assert(doomed.nonEmpty)
    assert(ksOf(IcebergSnapshot.readSnapshot(spark, out, table))
      === Seq(1L, 2L, 3L, 4L, 5L, 6L, 10L, 11L),
      "expiring the staged originals must not GC the re-listed files")
    // a segment that REMOVES rows refuses to cherry-pick: commit a
    // delete on main, branch at it, roll main back below it — the
    // branch's off-main segment is now exactly that delete snapshot
    SchemaTranslator.deleteWhere(spark, table, out, col("K") === 10L)
    val delHead = IcebergInspect.refsTable(spark, out).collect()
      .collectFirst { case r if r.getString(0) == "main" => r.getLong(2) }.get
    IcebergSnapshot.createRef(table, out, "delbranch", delHead, "branch", conf)
    IcebergWap.rollbackMain(table, out, snapParentOf(out, delHead), conf)
    val err = intercept[IllegalArgumentException] {
      IcebergWap.cherryPickAppend(table, out, "delbranch", conf)
    }
    assert(err.getMessage.contains("only append snapshots cherry-pick"))
  }

  /** Parent snapshot id of `id` in the current retained chain. */
  private def snapParentOf(out: String, id: Long): Long = {
    val doc = org.json4s.jackson.JsonMethods.parse(metaText(out))
    (doc \ "snapshots").asInstanceOf[org.json4s.JArray].arr
      .collectFirst {
        case s if (s \ "snapshot-id").asInstanceOf[org.json4s.JInt]
          .num.toLong == id =>
          (s \ "parent-snapshot-id").asInstanceOf[org.json4s.JInt].num.toLong
      }.get
  }

  test("rollbackMain: publish → rollback → re-publish; non-ancestors " +
      "refuse; expiry protects the restored head; CDC ranges follow it") {
    val table = mkTable("WAP3")
    val out = java.nio.file.Files.createTempDirectory("wap3").toString
    val conf = spark.sparkContext.hadoopConfiguration
    SchemaTranslator.migrateTable(df(1L to 4L), table, out)
    def mainRef(): Long = IcebergInspect.refsTable(spark, out).collect()
      .collectFirst { case r if r.getString(0) == "main" => r.getLong(2) }.get
    val day1 = mainRef()

    // stage + publish a bad batch
    SchemaTranslator.stageAppendToBranch(df(5L to 7L), table, out, "audit")
    val staged = IcebergSnapshot.listRefs(out, conf)
      .collectFirst { case ("audit", id, _) => id }.get
    SchemaTranslator.publishBranch(spark, table, out, "audit")
    assert(ksOf(IcebergSnapshot.readSnapshot(spark, out, table)) === (1L to 7L))

    // the published batch turns out bad — roll main back to day 1
    assert(mainRef() === staged)
    val restored = IcebergWap.rollbackMain(table, out, day1, conf)
    assert(restored.snapshotId === day1)
    assert(ksOf(IcebergSnapshot.readSnapshot(spark, out, table)) === (1L to 4L))
    IcebergV2Validation.validateV2(
      org.json4s.jackson.JsonMethods.parse(metaText(out)), expectSnapshot = true)
    // snapshot-log last entry IS the restored head; the abandoned
    // descendant holds no log entry
    val metaDoc = org.json4s.jackson.JsonMethods.parse(metaText(out))
    val logIds = (metaDoc \ "snapshot-log").asInstanceOf[org.json4s.JArray]
      .arr.map(e => (e \ "snapshot-id").asInstanceOf[org.json4s.JInt].num.toLong)
    assert(logIds.last === day1 && !logIds.contains(staged))
    // incremental reads over main see only day 1 now
    assert(IcebergChanges.incrementalAppendScan(spark, out, table, None)
      .count() === 4L)
    // rollback is idempotent; rolling back to a non-ancestor refuses
    assert(IcebergWap.rollbackMain(table, out, day1, conf).snapshotId === day1)
    SchemaTranslator.stageAppendToBranch(df(8L to 9L), table, out, "side")
    val sideHead = IcebergSnapshot.listRefs(out, conf)
      .collectFirst { case ("side", id, _) => id }.get
    val err = intercept[IllegalArgumentException] {
      IcebergWap.rollbackMain(table, out, sideHead, conf)
    }
    assert(err.getMessage.contains("not an ancestor"))
    intercept[IllegalArgumentException] {
      IcebergWap.rollbackMain(table, out, 424242L, conf)
    }

    // re-publish: the audit ref still points at the rolled-back-past
    // head; fast-forward restores it
    SchemaTranslator.publishBranch(spark, table, out, "audit")
    assert(ksOf(IcebergSnapshot.readSnapshot(spark, out, table)) === (1L to 7L))

    // roll back again and expire: the restored head (main) survives
    // expiry even when outside the keepLast tail window; the abandoned
    // published head survives only through its audit ref
    IcebergWap.rollbackMain(table, out, day1, conf)
    IcebergSnapshot.dropRef(table, out, "audit", conf)
    IcebergSnapshot.dropRef(table, out, "side", conf)
    val (head, doomed) = IcebergSnapshot.expireSnapshots(table, out,
      keepLast = 1, conf)
    assert(head.snapshotId === day1,
      "expiry must protect the rolled-back-to main head")
    assert(doomed.nonEmpty, "abandoned unref'd snapshots must GC")
    assert(ksOf(IcebergSnapshot.readSnapshot(spark, out, table)) === (1L to 4L))
    // the expired bad head is gone for good
    intercept[IllegalArgumentException] {
      IcebergWap.rollbackMain(table, out, staged, conf)
    }
    // life goes on: appends after a rollback anchor at the restored head
    SchemaTranslator.appendIncrement(df(20L to 21L), table, out)
    assert(ksOf(IcebergSnapshot.readSnapshot(spark, out, table))
      === Seq(1L, 2L, 3L, 4L, 20L, 21L))
    IcebergV2Validation.validateV2(
      org.json4s.jackson.JsonMethods.parse(metaText(out)), expectSnapshot = true)
  }
}
