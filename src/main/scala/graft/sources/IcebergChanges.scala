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
    // ordinals count REPLACE snapshots (which emit no rows but consume
    // a range position) so all three incremental faces — this one,
    // changesTable, incrementalChangesScan — number the same (from,to]
    // range identically when compaction interleaves
    val considered = snaps.zipWithIndex
      .filterNot(_._1.operation == "replace")
    if (strict) {
      val bad = considered.map(_._1).filter(s =>
        s.deletedRecords > 0 || s.addedDeleteFiles > 0 ||
          s.operation == "delete" || s.operation == "overwrite")
      require(bad.isEmpty,
        s"snapshots ${bad.map(_.snapshotId).mkString(", ")} remove rows; " +
          "an append-only incremental scan would silently drop those " +
          "deletes — use changesTable for the full CDC view, or pass " +
          "strict = false to read only the adds")
    }
    val perSnap = considered.flatMap { case (s, ord) =>
      addedDataRows(spark, table, s, pruning).map(
        _.withColumn("_change_type", lit("insert"))
          .withColumn("_commit_snapshot_id", lit(s.snapshotId))
          .withColumn("_change_ordinal", lit(ord)))
    }
    if (perSnap.isEmpty)
      emptyLike(spark, table)
        .withColumn("_change_type", lit("insert"))
        .withColumn("_commit_snapshot_id", lit(0L))
        .withColumn("_change_ordinal", lit(0))
        .limit(0)
    else perSnap.reduce(_ unionByName _)
  }

  /** The declared-schema rows ADDED by one snapshot — its own manifest
    * list, entries it committed (status 1 under its id; manifests are
    * immutable and carried forward, so an old ADDED entry keeps its
    * original committer id). None when the snapshot added no
    * matching files. Shared by the append scan and the O(changes) CDC
    * scan. */
  private def addedDataRows(spark: SparkSession, table: TableDef,
      s: IcebergMetadata.SnapshotMeta,
      pruning: Seq[IcebergPruning.ColumnBound]): Option[DataFrame] = {
    val conf = spark.sparkContext.hadoopConfiguration
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
      if (pruning.isEmpty) scanned
      else scanned.where(
        IcebergPruning.residualFilter(scanned, table, pruning))
    }
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

  /** The O(changes) CDC scan — [[changesTable]]'s rows at
    * [[incrementalAppendScan]]'s cost, for the snapshot shapes the
    * engine's writers produce (plain appends and equality-delete
    * overwrites — the three streaming sinks, `appendIncrement`,
    * `mergeUpsert`): per snapshot, INSERTS are the rows of exactly the
    * data files it added, and DELETES are the parent state restricted
    * to the equality-delete keys it committed — resolved by a
    * stats-PRUNED parent read (IN-set bounds over the key columns) plus
    * a broadcast semi-join, so the cost tracks the files that contain
    * the deleted keys, never the table. Same-content insert/delete
    * pairs cancel per snapshot (an upsert rewriting an identical row
    * emits nothing), making the output row-identical to
    * [[changesTable]]'s full-state diff. REPLACE snapshots are skipped
    * (bytes moved, no rows changed); a POSITION-delete snapshot refuses
    * loudly — its row identity is (file, offset), not a key, so the
    * state-diff face is the correct tool there.
    *
    * This is the streaming CDC tail's `getBatch` body
    * (`spark.readStream.format("graft-iceberg").option("mode","cdc")`):
    * at 100 TB the consumer reads each commit's added files and the
    * key-pruned slice of the parent — never a table rescan per batch.
    *
    * `maxInKeys` caps the driver-side key collection per delete file
    * (batch-sized by the sink contract); a larger delete file skips
    * the IN-bound file pruning and keeps the distributed semi-join. */
  def incrementalChangesScan(spark: SparkSession, tablePath: String,
      table: TableDef, fromSnapshotId: Option[Long],
      toSnapshotId: Option[Long] = None,
      maxInKeys: Int = 10000): DataFrame = {
    import org.apache.spark.sql.functions.broadcast
    val conf = spark.sparkContext.hadoopConfiguration
    val (chain, mainId) = chainOf(spark, tablePath)
    val snaps = range(chain, fromSnapshotId, toSnapshotId.orElse(mainId))
    val byId = chain.map(s => s.snapshotId -> s).toMap
    val idToName = table.columns.zipWithIndex.map { case (c, i) =>
      c.fieldId.getOrElse(i + 1) -> c.name
    }.toMap
    // ordinals count REPLACE snapshots like the state-diff face does
    // (they emit nothing there but consume a range position), so the
    // two faces stay row-identical including metadata columns
    val considered = snaps.zipWithIndex
      .filterNot(_._1.operation == "replace")
    val perSnap = considered.flatMap { case (s, ord) =>
      // delete files COMMITTED BY s (content-1 manifests, ADDED entries
      // under its id)
      val listRows = readManifestList(new Path(s.manifestList), conf)
      val addedDeletes = listRows
        .filter(_.get("content").asInstanceOf[Int] == 1)
        .flatMap { m =>
          readAvroRows(new Path(m.get("manifest_path").toString), conf)
            .filter(e => e.get("status") == 1 &&
              e.get("snapshot_id") == s.snapshotId)
            .map { e =>
              val df = e.get("data_file")
                .asInstanceOf[org.apache.avro.generic.GenericRecord]
              val ids = Option(df.get("equality_ids")).toSeq.flatMap { l =>
                val jl = l.asInstanceOf[java.util.List[Integer]]
                (0 until jl.size).map(jl.get(_).intValue)
              }
              (df.get("file_path").toString,
                df.get("content").asInstanceOf[Int], ids,
                df.get("record_count").asInstanceOf[Long])
            }
        }
      require(addedDeletes.forall(_._2 == 2),
        s"snapshot ${s.snapshotId} committed POSITION deletes — their row " +
          "identity is (file, offset), not a key; use changesTable for " +
          "the full state-diff CDC view of this range")
      val inserts = addedDataRows(spark, table, s, Nil)
        .getOrElse(emptyLike(spark, table))
      val deletes = addedDeletes.groupBy(_._3).toSeq.sortBy(_._1.mkString(","))
        .map { case (ids, dels) =>
          val keyCols = ids.map(id => idToName.getOrElse(id,
            throw new IllegalArgumentException(
              s"equality field id $id is not a current column — " +
                "read this range with changesTable")))
          val keys = dels.map(d => spark.read.parquet(d._1))
            .reduce(_ unionByName _)
            .select(keyCols.map(col): _*).distinct()
          val deleteRecords = dels.map(_._4).sum
          // file pruning: each key column's IN-set is a necessary
          // condition, so bounds compose conservatively; a delete file
          // beyond maxInKeys skips pruning, not correctness
          val bounds =
            if (deleteRecords > maxInKeys) Nil
            else keyCols.flatMap { c =>
              val vs = keys.select(c).distinct().collect().map(_.get(0))
              if (vs.isEmpty || vs.contains(null)) None
              else Some(IcebergPruning.ColumnBound.in(c, vs.toSeq))
            }
          val parentState = s.parentSnapshotId match {
            case None => emptyLike(spark, table)
            case Some(p) =>
              require(byId.contains(p),
                s"parent snapshot $p expired — the range's deletes can " +
                  "no longer be resolved; start after it or use a " +
                  "retained from-snapshot")
              if (byId(p).totalRecords == 0 && byId(p).totalFiles == 0)
                emptyLike(spark, table)
              else normalized(readSnapshot(spark, tablePath, table,
                Some(p), pruning = bounds), table)
          }
          // null-safe per-key equality (<=>), mirroring the read path's
          // equality-delete application (IcebergSnapshot applies deletes
          // null-safely) — a delete file carrying a null key must remove
          // the matching null-keyed rows from the CDC view too, or the
          // scan silently diverges from changesTable. The key set
          // broadcasts only when batch-sized; a purge-scale delete
          // commit (more records than maxInKeys) falls back to a
          // shuffled semi-join instead of OOMing driver/executors.
          val keysSide =
            if (deleteRecords > maxInKeys) keys else broadcast(keys)
          val joined = parentState.as("p").join(keysSide.as("k"),
            keyCols.map(c => col(s"p.$c") <=> col(s"k.$c")).reduce(_ && _),
            "left_semi")
          normalized(joined, table)
        }
        .reduceOption(_ unionByName _)
        .getOrElse(emptyLike(spark, table))
      // an upsert that rewrites a row to identical content nets to no
      // change — cancel per snapshot, like the state diff does; both
      // sides are commit-sized, so this is a batch-local shuffle
      val ins = inserts.exceptAll(deletes)
        .withColumn("_change_type", lit("insert"))
      val del = deletes.exceptAll(inserts)
        .withColumn("_change_type", lit("delete"))
      Some(ins.unionByName(del)
        .withColumn("_commit_snapshot_id", lit(s.snapshotId))
        .withColumn("_change_ordinal", lit(ord)))
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
