package graft.sources

import java.nio.charset.StandardCharsets
import java.util.UUID

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

import graft.model.TableDef
import IcebergSnapshot._

/** Write-audit-publish (WAP) over the Iceberg v2 writer — the staging
  * pattern a production curation pipeline runs every day: land the new
  * batch on an AUDIT BRANCH (readers of `main` see nothing), run the
  * quality gates against the branch read, then publish atomically by
  * fast-forwarding `main`, or abandon by dropping the ref (expiry then
  * GCs the staged files).
  *
  * Mechanics, per the spec's refs model: a branch commit is a normal
  * append snapshot that enters the snapshots list and moves ONLY its
  * branch ref; `current-snapshot-id` (and the implicit `main` ref)
  * stay on the published head, so the staged snapshot trails the
  * array without being current. Every reader/committer of "the
  * current table state" resolves through
  * [[IcebergSnapshot.currentSnapshotOf]] rather than the array tail,
  * and sequence numbers are table-global (`max + 1` across the whole
  * chain), so interleaved main-side commits can never collide with a
  * staged branch. Publishing is a metadata-only commit that moves
  * `current-snapshot-id` to the branch head — legal only when the
  * published head is an ANCESTOR of the branch head (a true
  * fast-forward); once main has advanced past the fork the publish
  * refuses and the branch must be rebased (re-staged) or abandoned.
  *
  * Reference north-star: the converter emits DDL for live Iceberg
  * tables (`/root/reference/db2ice/converter.py:166-183`); a daily
  * sync into those tables needs staged, auditable batch publication.
  * All commits ride the shared metadata-version + hint-flip protocol,
  * so crash-safety is inherited: a crash before the flip leaves the
  * prior version resolving exactly.
  */
object IcebergWap {

  private def load(tablePath: String, conf: Configuration) = {
    val metadataDir = new Path(tablePath, "metadata")
    val fs = FileSystem.get(metadataDir.toUri, conf)
    val version = readText(new Path(metadataDir, "version-hint.text"), conf).trim.toInt
    require(version >= 2, s"no committed snapshot (version $version)")
    val metaText = readText(
      new Path(metadataDir, s"v$version.metadata.json"), conf)
    val chain = parseSnapshots(metaText)
    require(chain.nonEmpty, "metadata carries no snapshots")
    (metadataDir, fs, version, metaText, chain)
  }

  private def branchHeadOf(metaText: String,
      chain: Seq[IcebergMetadata.SnapshotMeta], branch: String)
      : Option[IcebergMetadata.SnapshotMeta] =
    parseRefs(metaText).collectFirst {
      case (n, id, "branch") if n == branch => id
    }.flatMap(id => chain.find(_.snapshotId == id))

  /** Stage the files that appeared under `<tablePath>/data` since any
    * retained snapshot as an append on `branch` — main is untouched.
    * The branch is created at the main head on first use. Returns the
    * staged snapshot (or the branch head unchanged when no new files
    * exist). Read the staged state with
    * [[IcebergSnapshot.readSnapshotAtRef]]; publish with
    * [[fastForwardMain]]; abandon with [[IcebergSnapshot.dropRef]]
    * (+ expiry to GC the staged files). */
  def commitAppendToBranch(table: TableDef, tablePath: String,
      branch: String, conf: Configuration = new Configuration(),
      timestampMs: Long = 0L): IcebergMetadata.SnapshotMeta = {
    require(branch.nonEmpty && branch != "main",
      "stage on a named audit branch, not main")
    val (metadataDir, fs, version, metaText, chain) = load(tablePath, conf)
    val mainHead = currentSnapshotOf(metaText, chain).get
    val head = branchHeadOf(metaText, chain, branch).getOrElse(mainHead)

    val priorList = readManifestList(new Path(head.manifestList), conf)
    val known = knownFilePaths(chain, conf)
    val newFiles = listDataFiles(new Path(tablePath, "data"), table, conf)
      .filterNot(f => known.contains(f.path))
    if (newFiles.isEmpty) return head

    val newSeq = chain.map(_.sequenceNumber).max + 1
    val snapshotId = UUID.nameUUIDFromBytes(
      (table.fullName + s"-branch-$branch-snapshot-$newSeq")
        .getBytes(StandardCharsets.UTF_8))
      .getMostSignificantBits & Long.MaxValue
    val manifest = writeManifest(table, newFiles, metadataDir, snapshotId, conf,
      ordinal = priorList.size)
    val nRows = newFiles.map(_.recordCount).sum
    val listPath = writeManifestList(table, manifest, newFiles.size.toLong,
      nRows, metadataDir, snapshotId, conf, sequenceNumber = newSeq,
      parentSnapshotId = Some(head.snapshotId), priorManifests = priorList)
    val snap = IcebergMetadata.SnapshotMeta(
      snapshotId = snapshotId,
      schemaId = table.schemaId,
      timestampMs = timestampMs,
      manifestList = listPath.toString,
      addedFiles = newFiles.size.toLong,
      addedRecords = nRows,
      sequenceNumber = newSeq,
      parentSnapshotId = Some(head.snapshotId),
      totalFiles = head.cumulativeFiles + newFiles.size,
      totalRecords = head.cumulativeRecords + nRows,
      totalDeleteFiles = head.totalDeleteFiles,
      totalPositionDeletes = head.totalPositionDeletes,
      totalEqualityDeletes = head.totalEqualityDeletes)

    writeNewMetadataVersion(table, tablePath, metadataDir, fs, version,
      chain :+ snap, timestampMs,
      addRefs = Seq((branch, snap.snapshotId, "branch")),
      currentIdOverride = Some(mainHead.snapshotId))
    snap
  }

  /** Publish: move `main` to the head of `branch`. Metadata-only;
    * refuses unless the current main head is an ancestor of the branch
    * head (fast-forward), so a publish can never silently discard
    * main-side commits that landed after the fork. No-op when already
    * published. Returns the new main head. */
  def fastForwardMain(table: TableDef, tablePath: String, branch: String,
      conf: Configuration = new Configuration(),
      timestampMs: Long = 0L): IcebergMetadata.SnapshotMeta = {
    val (metadataDir, fs, version, metaText, chain) = load(tablePath, conf)
    val mainHead = currentSnapshotOf(metaText, chain).get
    val target = branchHeadOf(metaText, chain, branch).getOrElse(
      throw new IllegalArgumentException(s"no branch $branch"))
    if (target.snapshotId == mainHead.snapshotId) return mainHead

    val byId = chain.map(s => s.snapshotId -> s).toMap
    val ancestry = Iterator.iterate(Option(target))(
      _.flatMap(_.parentSnapshotId).flatMap(byId.get))
      .takeWhile(_.isDefined).map(_.get.snapshotId).toSet
    require(ancestry.contains(mainHead.snapshotId),
      s"main (${mainHead.snapshotId}) is not an ancestor of " +
        s"$branch's head (${target.snapshotId}) — main advanced past " +
        "the fork; re-stage the branch or abandon it")

    writeNewMetadataVersion(table, tablePath, metadataDir, fs, version,
      chain, timestampMs, currentIdOverride = Some(target.snapshotId))
    target
  }

  /** Roll `main` back to a retained ANCESTOR snapshot — the first
    * thing an operator wants after a bad publish (Iceberg's
    * `rollback_to_snapshot`). Metadata-only: `current-snapshot-id`
    * (and the main ref) move back to `snapshotId`; every snapshot
    * stays in the array, so the rolled-back-PAST descendants remain
    * re-publishable (a branch ref still pointing at the bad head can
    * fast-forward main onto it again) and become expirable once no
    * ref protects them — expiry always protects the main head, i.e.
    * the rolled-back-TO snapshot. Refuses a target that is not on the
    * main head's parent-link ancestry (a staged branch snapshot or an
    * expired id is not a rollback — it would silently abandon
    * history sideways). The snapshot-log, which this writer derives
    * from main's ancestry, truncates to the restored head (keeping
    * the spec's log-last == current invariant) rather than appending
    * a duplicate made-current entry. No-op when already current. */
  def rollbackMain(table: TableDef, tablePath: String, snapshotId: Long,
      conf: Configuration = new Configuration(),
      timestampMs: Long = 0L): IcebergMetadata.SnapshotMeta = {
    val (metadataDir, fs, version, metaText, chain) = load(tablePath, conf)
    val mainHead = currentSnapshotOf(metaText, chain).get
    if (snapshotId == mainHead.snapshotId) return mainHead
    val target = chain.find(_.snapshotId == snapshotId).getOrElse(
      throw new IllegalArgumentException(
        s"snapshot $snapshotId not in the retained chain (expired?)"))
    val byId = chain.map(s => s.snapshotId -> s).toMap
    val ancestry = Iterator.iterate(Option(mainHead))(
      _.flatMap(_.parentSnapshotId).flatMap(byId.get))
      .takeWhile(_.isDefined).map(_.get.snapshotId).toSet
    require(ancestry.contains(snapshotId),
      s"snapshot $snapshotId is not an ancestor of main " +
        s"(${mainHead.snapshotId}) — rollback only walks main's own " +
        "history; use fastForwardMain for branch heads")
    writeNewMetadataVersion(table, tablePath, metadataDir, fs, version,
      chain, timestampMs, currentIdOverride = Some(snapshotId))
    target
  }
}
