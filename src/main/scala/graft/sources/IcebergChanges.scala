package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit}

import graft.model.TableDef
import IcebergSnapshot._

/** Incremental reads over the v2 writer's snapshot chain — the
  * `spark.read.option("start-snapshot-id", …)` / `table.changes`
  * surface that turns an Iceberg table into a FEED: daily downstream
  * jobs consume only what the day's commits added, and CDC consumers
  * get per-snapshot insert/delete rows (reference north-star scope:
  * /root/reference/db2ice/converter.py:166 emits DDL for exactly
  * these tables).
  *
  * Two faces, mirroring Iceberg's own split:
  *  - [[incrementalAppendScan]] — the production fast path. Scans ONLY
  *    the data files whose manifest entries were ADDED (status 1) by a
  *    snapshot in `(fromSnapshotId, toSnapshotId]`, discriminated by
  *    the entry's own `snapshot_id` field (manifests are immutable and
  *    carried forward, so an old ADDED entry keeps its original
  *    committer id — a later snapshot's manifest list never re-claims
  *    it). Cost is O(rows added in range), independent of table size —
  *    at 100 TB the daily increment reads the day's files, not the
  *    table. REPLACE (compaction) snapshots are skipped: they move
  *    bytes, not rows. Snapshots that remove rows (delete/overwrite)
  *    abort the append-only contract loudly (opt out with
  *    `strict = false`, which then reports only the adds) — silent
  *    omission of deletes is how downstream mirrors diverge.
  *  - [[changesTable]] — the full CDC view: per-snapshot multiset diff
  *    (inserts AND deletes) built from [[IcebergSnapshot.readSnapshot]]
  *    at consecutive snapshot pairs, so it is correct for EVERY
  *    operation (append, delete, equality upsert, compaction — the
  *    last diffs to zero rows and emits nothing). Costs two snapshot
  *    scans per commit in range: the audit/backfill face, not the
  *    daily-feed face.
  *
  * Both add the Iceberg changelog metadata columns: `_change_type`
  * ('insert' | 'delete'), `_commit_snapshot_id`, and
  * `_change_ordinal` (the snapshot's position within the requested
  * range, 0-based — commit order, not timestamp order). */
object IcebergChanges {

  /** (chain, main head id) — the default `toSnapshotId` is the MAIN
    * head, not the array tail: a staged WAP branch snapshot must not
    * leak into an unbounded incremental read. */
  private def chainOf(spark: SparkSession, tablePath: String)
      : (Seq[IcebergMetadata.SnapshotMeta], Option[Long]) = {
    val conf = spark.sparkContext.hadoopConfiguration
    val metadataDir = new Path(tablePath, "metadata")
    val version = readVersionHint(metadataDir, conf)
    val metaText = readText(
      new Path(metadataDir, s"v$version.metadata.json"), conf)
    val chain = parseSnapshots(metaText)
    (chain, currentSnapshotOf(metaText, chain).map(_.snapshotId))
  }

  /** Snapshots strictly after `fromId` (None = table creation) up to
    * and including `toId` (None = current), in commit order — filtered
    * to the `toId` head's PARENT-LINK ancestry first, not array
    * position: with a WAP branch staged mid-chain ([A, B_staged,
    * C_main]) a read over (A, C] must not surface the unpublished B as
    * a committed insert. A caller that explicitly bounds at a staged
    * branch head gets that branch's coherent ancestry instead. */
  private def range(chain: Seq[IcebergMetadata.SnapshotMeta],
      fromId: Option[Long], toId: Option[Long])
      : Seq[IcebergMetadata.SnapshotMeta] = {
    val head = toId.map { id =>
      val s = chain.find(_.snapshotId == id)
      require(s.isDefined, s"to-snapshot $id not in the retained chain")
      s.get
    }.orElse(chain.lastOption)
    val byId = chain.map(s => s.snapshotId -> s).toMap
    val ancestry = Iterator.iterate(head)(_.flatMap(_.parentSnapshotId)
      .flatMap(byId.get)).takeWhile(_.isDefined)
      .map(_.get.snapshotId).toSet
    val upto = chain.filter(s => ancestry.contains(s.snapshotId))
    fromId.fold(upto) { id =>
      val i = upto.indexWhere(_.snapshotId == id)
      require(i >= 0, s"from-snapshot $id not in the retained chain's " +
        "to-head ancestry (expired, or on a different branch? " +
        "changesTable needs the parent of every snapshot in range)")
      upto.drop(i + 1)
    }
  }

  private def emptyLike(spark: SparkSession, table: TableDef): DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      graft.api.SchemaTranslator.toSparkSchema(table))

  /** Declared column order and types. Identity-restore appends its
    * columns at the END of the scan (string-surfaced on single-spec
    * tables), and the diffs below are POSITIONAL (`exceptAll`) — both
    * faces must present the declared schema, not scan order. */
  private def normalized(df: DataFrame, table: TableDef): DataFrame =
    df.select(graft.api.SchemaTranslator.toSparkSchema(table).fields
      .map(f => col(f.name).cast(f.dataType).as(f.name)).toSeq: _*)

  /** Rows appended in `(fromSnapshotId, toSnapshotId]` — see object
    * doc. Output: table columns + `_change_type` (always 'insert'),
    * `_commit_snapshot_id`, `_change_ordinal`. */
  def incrementalAppendScan(spark: SparkSession, tablePath: String,
      table: TableDef, fromSnapshotId: Option[Long],
      toSnapshotId: Option[Long] = None,
      strict: Boolean = true,
      pruning: Seq[IcebergPruning.ColumnBound] = Nil): DataFrame = {
    val conf = spark.sparkContext.hadoopConfiguration
    val (chain, mainId) = chainOf(spark, tablePath)
    val snaps = range(chain, fromSnapshotId, toSnapshotId.orElse(mainId))
    val considered = snaps.filterNot(_.operation == "replace")
    if (strict) {
      val bad = considered.filter(s =>
        s.deletedRecords > 0 || s.addedDeleteFiles > 0 ||
          s.operation == "delete" || s.operation == "overwrite")
      require(bad.isEmpty,
        s"snapshots ${bad.map(_.snapshotId).mkString(", ")} remove rows; " +
          "an append-only incremental scan would silently drop those " +
          "deletes — use changesTable for the full CDC view, or pass " +
          "strict = false to read only the adds")
    }
    val perSnap = considered.zipWithIndex.flatMap { case (s, ord) =>
      // files ADDED by s: its own manifest list, entries it committed
      val listRows = readManifestList(new Path(s.manifestList), conf)
      val files = listRows.filter(_.get("content").asInstanceOf[Int] == 0)
        .flatMap { m =>
          val mSpec = m.get("partition_spec_id").asInstanceOf[Int]
          val pf = partitionFieldsOf(table, mSpec)
          readAvroRows(new Path(m.get("manifest_path").toString), conf)
            .filter(e => e.get("status") == 1 &&
              e.get("snapshot_id") == s.snapshotId)
            .map { e =>
              val df = e.get("data_file")
                .asInstanceOf[org.apache.avro.generic.GenericRecord]
              IcebergSnapshot.decodeDataFileInfo(df, pf, mSpec)
            }
            // stats-based file pruning — an incremental consumer that
            // only wants one key range / partition skips the rest of
            // each commit's files exactly like readSnapshot does
            .filter(info => pruning.forall(b =>
              IcebergPruning.fileMayMatch(table, info, b)))
        }
      if (files.isEmpty) None
      else Some {
        val scanned = normalized(
          files.groupBy(_.specId).toSeq.sortBy(_._1).map { case (sid, fs) =>
            restoreIdentityColumnsFor(spark,
              scanDataFiles(spark, table, fs.map(_.path), sid),
              table, partitionFieldsOf(table, sid),
              dirEncodedIdentityCols(table, sid),
              fs.map(f => (f.path, f.partitionValues)),
              castToDeclared = table.partitionSpecs.nonEmpty)
          }.reduce(_ unionByName _), table)
        val filtered =
          if (pruning.isEmpty) scanned
          else scanned.where(
            IcebergPruning.residualFilter(scanned, table, pruning))
        filtered
          .withColumn("_change_type", lit("insert"))
          .withColumn("_commit_snapshot_id", lit(s.snapshotId))
          .withColumn("_change_ordinal", lit(ord))
      }
    }
    if (perSnap.isEmpty)
      emptyLike(spark, table)
        .withColumn("_change_type", lit("insert"))
        .withColumn("_commit_snapshot_id", lit(0L))
        .withColumn("_change_ordinal", lit(0))
        .limit(0)
    else perSnap.reduce(_ unionByName _)
  }

  /** Per-snapshot insert/delete rows for `(fromSnapshotId,
    * toSnapshotId]` — the CDC view; see object doc. Equal rows that
    * merely moved files (compaction) cancel in the multiset diff, so a
    * pure REPLACE emits nothing; an equality upsert emits the old row
    * as 'delete' and the new one as 'insert'. Requires the PARENT of
    * the first snapshot in range to still be retained (or the range to
    * start at table creation). */
  def changesTable(spark: SparkSession, tablePath: String, table: TableDef,
      fromSnapshotId: Option[Long],
      toSnapshotId: Option[Long] = None): DataFrame = {
    val (chain, mainId) = chainOf(spark, tablePath)
    val snaps = range(chain, fromSnapshotId, toSnapshotId.orElse(mainId))
    val byId = chain.map(s => s.snapshotId -> s).toMap
    def stateAt(id: Option[Long]): DataFrame = id match {
      case None => emptyLike(spark, table)
      case Some(s) =>
        require(byId.contains(s),
          s"snapshot $s expired — changesTable needs every parent in range")
        if (byId(s).totalRecords == 0 && byId(s).totalFiles == 0)
          emptyLike(spark, table)
        else normalized(
          readSnapshot(spark, tablePath, table, Some(s)), table)
    }
    val perSnap = snaps.zipWithIndex.map { case (s, ord) =>
      val cur = stateAt(Some(s.snapshotId))
      val prev = stateAt(s.parentSnapshotId)
      val ins = cur.exceptAll(prev).withColumn("_change_type", lit("insert"))
      val del = prev.exceptAll(cur).withColumn("_change_type", lit("delete"))
      ins.unionByName(del)
        .withColumn("_commit_snapshot_id", lit(s.snapshotId))
        .withColumn("_change_ordinal", lit(ord))
    }
    if (perSnap.isEmpty)
      emptyLike(spark, table)
        .withColumn("_change_type", lit("insert"))
        .withColumn("_commit_snapshot_id", lit(0L))
        .withColumn("_change_ordinal", lit(0))
        .limit(0)
    else perSnap.reduce(_ unionByName _)
  }
}
