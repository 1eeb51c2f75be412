package graft.sources.v2

import org.apache.hadoop.fs.Path
import org.apache.spark.paths.SparkPath
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.expressions.Expressions
import org.apache.spark.sql.connector.read.{Batch, HasPartitionKey, InputPartition, PartitionReader, PartitionReaderFactory, Scan, SupportsReportPartitioning}
import org.apache.spark.sql.connector.read.partitioning.{KeyGroupedPartitioning, Partitioning}
import org.apache.spark.sql.execution.datasources.PartitionedFile
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.vectorized.ColumnarBatch

import graft.model.TableDef
import graft.sources.{IcebergPruning, IcebergSnapshot}

/** STORAGE-PARTITIONED JOIN face: a native DSv2 `Batch` scan over a
  * bucket-partitioned table that reports
  * `KeyGroupedPartitioning(bucket(N, key))` with one input partition
  * per bucket ordinal — so two bucket-aligned tables joined on the
  * bucket key plan with ZERO shuffle on the table sides (Spark's SPJ,
  * `spark.sql.sources.v2.bucketing.enabled`). At 100 TB fact-to-fact
  * join scale this is the single biggest avoidable exchange.
  *
  * Scope gate ([[GraftSpj.tryBuild]]): the table's layout must make a
  * PLAIN parquet read correct — one spec whose fields are exactly ONE
  * `bucket[N]` plus any non-identity transforms (their source columns
  * stay physical in data files; compound `(bucket(16,k), days(ts))`
  * fact layouts qualify — files group by the BUCKET ordinal alone),
  * no identity fields (directory-encoded: a plain read would lose
  * them), no schema evolution, every live file under the default spec
  * with a full partition tuple. BOTH row-level delete kinds are
  * APPLIED IN-READER (below) — a CDC table maintained by MERGE
  * (position deletes) or by the streaming upsert sink (equality
  * deletes) keeps its SPJ between compactions; equality deletes are
  * size-gated (`graft.spj.max-eq-delete-rows`, default 1M keys — past
  * it the per-task key set would strain executor memory) and
  * floating-point-keyed ones fall back (byte equality diverges from
  * null-safe equality on -0.0/NaN). The gate only ever SKIPS an
  * optimization, never changes results. File pruning and the
  * ScanReport surface behave exactly like the V1 path.
  *
  * Execution borrows Spark's own parquet machinery
  * ([[ParquetFileFormat.buildReaderWithPartitionValues]], the
  * function behind every FileSourceScanExec) — including VECTORIZED
  * reading: a delete-free partition passes ColumnarBatches straight
  * through. A partition WITH deletes reads row-wise with NO parquet
  * filter pushdown (row-group skipping would break file positions),
  * counts file-absolute row positions and drops the (file, pos) pairs
  * its position delete files name (delete seq ≥ data seq), then
  * probes each row's key tuple against the equality delete sets of
  * STRICTLY newer sequence (delete seq > data seq; keys read into
  * per-task UnsafeRow hash sets, reading through a SUPERSET schema so
  * pruned-away key columns are still probeable) — the same
  * merge-on-read the general reader applies with anti-joins, here as
  * per-task hash filters. */
private[v2] object GraftSpj {

  private val BucketN = """bucket\[(\d+)\]""".r

  private[v2] def normKey(p: String): String =
    p.replaceFirst("^[a-zA-Z0-9+.-]+:/+", "/")

  /** Build the key-grouped scan when the layout qualifies, else None. */
  def tryBuild(spark: SparkSession, path: String, tdef: TableDef,
      snapshotId: Option[Long], required: StructType,
      pushed: Array[Filter]): Option[Scan] = {
    // layout gate: ONE spec (legacy HASH shape or explicit spec 0 —
    // the loader presents catalog tables as the latter), no spec/
    // schema evolution (evolved tables read by field id through the
    // general path)
    if (tdef.partitionSpecs.size > 1 || tdef.priorSchemas.nonEmpty)
      return None
    val defaultSid = graft.sources.IcebergMetadata.defaultSpecIdOf(tdef)
    val colOfId = tdef.columns.zipWithIndex.map { case (c, i) =>
      c.fieldId.getOrElse(i + 1) -> c.name
    }.toMap
    val defs = graft.sources.IcebergMetadata.specFieldDefs(tdef, defaultSid)
    // exactly one bucket field; every other field a non-identity
    // transform (identity fields are directory-encoded — a plain
    // parquet read would lose the column)
    val bucketIdx = defs.indexWhere(f => BucketN.findFirstIn(f.transform).isDefined)
    if (bucketIdx < 0 ||
      defs.count(f => BucketN.findFirstIn(f.transform).isDefined) != 1 ||
      defs.exists(_.transform == "identity"))
      return None
    val (srcCol, nBuckets) = defs(bucketIdx).transform match {
      case BucketN(n) => (colOfId(defs(bucketIdx).sourceId), n.toInt)
      case _ => return None
    }
    val conf = spark.sparkContext.hadoopConfiguration
    val (_, listRows) =
      IcebergSnapshot.resolveSnapshot(path, tdef, snapshotId, conf)
    val deletes = IcebergSnapshot.liveDeleteFiles(listRows, conf)
    val (eqDels, posDels) = deletes.partition(_.content == 2)
    // equality deletes apply in-reader as per-task KEY SETS — the
    // streaming upsert sink's table shape keeps SPJ between
    // compactions. Size-gated: past `graft.spj.max-eq-delete-rows`
    // (default 1M keys) the per-task set would strain executor memory
    // — fall back to the general anti-join reader. Floating-point key
    // columns also fall back: the key probe compares UnsafeRow BYTES,
    // and -0.0/0.0 and NaN forms would diverge from the general
    // reader's null-safe-equality semantics.
    val eqIdSets: Seq[Seq[Int]] =
      eqDels.map(_.equalityIds).distinct.map(_.sorted)
    if (eqDels.nonEmpty) {
      val maxRows = spark.conf
        .get("graft.spj.max-eq-delete-rows", "1000000").toLong
      if (eqDels.map(_.recordCount).sum > maxRows) return None
      val nameOf = tdef.fieldIdOf.map(_.swap)
      val sparkSchema = graft.api.SchemaTranslator.toSparkSchema(tdef)
      val ok = eqDels.forall(_.equalityIds.nonEmpty) &&
        eqDels.flatMap(_.equalityIds).distinct.forall(id =>
          nameOf.get(id).exists(n =>
            sparkSchema.fields.find(_.name == n).exists(_.dataType match {
              case org.apache.spark.sql.types.FloatType |
                   org.apache.spark.sql.types.DoubleType => false
              case _ => true
            })))
      if (!ok) return None
    }
    val live = IcebergSnapshot.liveFilesWithSeq(listRows, tdef, conf)
    if (live.exists { case (f, _) =>
      f.specId != defaultSid || f.partitionValues.size != defs.size
    }) return None
    // the same stats/partition pruning + observable report the V1
    // path produces
    val bounds = GraftIcebergSource.translate(tdef, pushed.toSeq)
    val (kept, skipped) = live.partition { case (f, _) =>
      bounds.forall(b => IcebergPruning.fileMayMatch(tdef, f, b))
    }
    GraftIcebergScans.record(GraftIcebergScans.ScanReport(
      path, snapshotId, bounds, kept.map(_._1.path),
      skipped.map(_._1.path)))
    val groups = kept
      .groupBy(_._1.partitionValues(bucketIdx)
        .map(_.asInstanceOf[Number].intValue))
      .toSeq.sortBy(_._1.getOrElse(Int.MinValue))
    // delete scoping is an OPTIMIZATION only (each reader drops
    // entries naming none of its files): a tuple-scoped position
    // delete rides its bucket's partition; a global or foreign-shaped
    // tuple — and every equality delete (global by construction) —
    // rides every partition
    def posFor(ord: Option[Int]) = posDels.filter { d =>
      val scoped = d.partitionValues.size == defs.size
      !scoped || (d.partitionValues(bucketIdx)
        .map(_.asInstanceOf[Number].intValue) == ord)
    }.map(d => (d.path, d.sizeBytes, d.seq)).toArray
    val eqEntries = eqDels.map(d =>
      (d.path, d.sizeBytes, d.seq, eqIdSets.indexOf(d.equalityIds.sorted)))
      .toArray
    Some(new GraftIcebergBucketScan(spark, tdef, required, pushed,
      srcCol, nBuckets, eqIdSets, groups.map { case (ord, fs) =>
        GraftBucketInputPartition(ord,
          fs.map { case (f, seq) => (f.path, f.sizeBytes, seq) }.toArray,
          posFor(ord), eqEntries)
      }))
  }
}

private[v2] class GraftIcebergBucketScan(spark: SparkSession,
    tdef: TableDef, required: StructType, pushed: Array[Filter],
    srcCol: String, nBuckets: Int, eqIdSets: Seq[Seq[Int]],
    partitions: Seq[GraftBucketInputPartition])
    extends Scan with Batch with SupportsReportPartitioning {

  override def readSchema(): StructType = required

  override def toBatch: Batch = this

  override def description(): String =
    s"graft-iceberg key-grouped bucket[$nBuckets]($srcCol) " +
      s"groups=${partitions.size}"

  override def outputPartitioning(): Partitioning =
    new KeyGroupedPartitioning(
      Array(Expressions.bucket(nBuckets, srcCol)), partitions.size)

  override def planInputPartitions(): Array[InputPartition] =
    partitions.toArray

  override def createReaderFactory(): PartitionReaderFactory = {
    val fmt = new ParquetFileFormat
    val dataSchema = graft.api.SchemaTranslator.toSparkSchema(tdef)
    // vectorized when the session would vectorize a file scan of this
    // shape — the reader function then yields ColumnarBatches and the
    // factory passes them through columnar (FileSourceScanExec's own
    // contract)
    val returningBatch = fmt.supportBatch(spark, required)
    val batchFunc = fmt.buildReaderWithPartitionValues(
      spark, dataSchema, new StructType(), required,
      pushed.toIndexedSeq,
      // the format's own contract: the caller must declare whether it
      // will consume batches (FileSourceScanExec does the same)
      Map(org.apache.spark.sql.execution.datasources.FileFormat
        .OPTION_RETURNING_BATCH -> returningBatch.toString),
      spark.sessionState.newHadoopConf())
    // equality-delete key surfaces: one key schema + reader per
    // distinct equality-id set, and a SUPERSET data read schema so the
    // delete row path can probe key columns the query itself pruned
    // away (survivors project back down to `required`)
    val nameOf = tdef.fieldIdOf.map(_.swap)
    val keySchemas: Array[StructType] = eqIdSets.map(ids =>
      StructType(ids.map(id => dataSchema(nameOf(id))))).toArray
    val allKeyFields = eqIdSets.flatten.distinct.map(id =>
      dataSchema(nameOf(id)))
    val superset = StructType(required.fields ++
      allKeyFields.filterNot(f => required.fieldNames.contains(f.name)))
    // delete-partition data reads: row-wise, NO pushed filters —
    // parquet row-group/page skipping would desynchronize the counted
    // position from the file-absolute row index the delete files name
    // (Spark re-evaluates every filter post-scan regardless: pushFilters
    // returned them all as residuals)
    val rowFunc = new ParquetFileFormat().buildReaderWithPartitionValues(
      spark, dataSchema, new StructType(), superset, Nil,
      Map(org.apache.spark.sql.execution.datasources.FileFormat
        .OPTION_RETURNING_BATCH -> "false"),
      spark.sessionState.newHadoopConf())
    val posSchema = StructType(Seq(
      StructField("file_path", StringType), StructField("pos", LongType)))
    def rowRead(schema: StructType) =
      new ParquetFileFormat().buildReaderWithPartitionValues(
        spark, schema, new StructType(), schema, Nil,
        Map(org.apache.spark.sql.execution.datasources.FileFormat
          .OPTION_RETURNING_BATCH -> "false"),
        spark.sessionState.newHadoopConf())
    val posDeleteFunc = rowRead(posSchema)
    val eqDeleteFuncs = keySchemas.map(rowRead)
    new GraftBucketReaderFactory(batchFunc, rowFunc, posDeleteFunc,
      eqDeleteFuncs, superset, keySchemas,
      keySchemas.map(_.fieldNames.map(superset.fieldIndex)),
      required.fieldNames.map(superset.fieldIndex),
      returningBatch)
  }
}

/** One bucket ordinal's files (+ the delete files that can name their
  * rows); the partition KEY is the ordinal (the value `bucket(N, key)`
  * yields for every row in these files), which is what lets Spark
  * co-locate equal ordinals across tables. Files ride as
  * (path, length, dataSequenceNumber); position deletes as
  * (path, length, deleteSequenceNumber); equality deletes additionally
  * carry the index of their equality-id set in the scan's registry. */
private[v2] case class GraftBucketInputPartition(ordinal: Option[Int],
    files: Array[(String, Long, Long)],
    posDeletes: Array[(String, Long, Long)],
    eqDeletes: Array[(String, Long, Long, Int)]) extends InputPartition
    with HasPartitionKey {
  override def partitionKey(): InternalRow =
    new GenericInternalRow(Array[Any](ordinal.orNull))
}

private[v2] class GraftBucketReaderFactory(
    batchFunc: PartitionedFile => Iterator[InternalRow],
    rowFunc: PartitionedFile => Iterator[InternalRow],
    posDeleteFunc: PartitionedFile => Iterator[InternalRow],
    eqDeleteFuncs: Array[PartitionedFile => Iterator[InternalRow]],
    superset: StructType, keySchemas: Array[StructType],
    keyOrdinals: Array[Array[Int]], requiredOrdinals: Array[Int],
    returningBatch: Boolean) extends PartitionReaderFactory {

  private def pf(path: String, len: Long): PartitionedFile =
    new PartitionedFile(InternalRow.empty,
      SparkPath.fromPath(new Path(path)), 0, len, Array.empty,
      0L, len, Map.empty)

  private def reader[T](it: Iterator[T]): PartitionReader[T] =
    new PartitionReader[T] {
      private var current: T = _
      override def next(): Boolean =
        if (it.hasNext) { current = it.next(); true } else false
      override def get(): T = current
      override def close(): Unit = ()
    }

  private def hasDeletes(part: GraftBucketInputPartition): Boolean =
    part.posDeletes.nonEmpty || part.eqDeletes.nonEmpty

  // a delete-carrying partition must come back as rows (the position
  // counter / key probe walk them one by one); delete-free partitions
  // keep the vectorized batch hand-off
  override def supportColumnarReads(p: InputPartition): Boolean =
    returningBatch && !hasDeletes(p.asInstanceOf[GraftBucketInputPartition])

  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    import org.apache.spark.sql.catalyst.expressions.{BoundReference, UnsafeProjection, UnsafeRow}
    val part = p.asInstanceOf[GraftBucketInputPartition]
    if (!hasDeletes(part))
      return reader(part.files.iterator.flatMap { case (path, len, _) =>
        batchFunc(pf(path, len))
      })
    // load this bucket's POSITION delete entries ONCE per task:
    // (normalized target path, position, delete sequence); memory is
    // bounded by the bucket's own deletes, the same per-task locality
    // real Iceberg readers rely on
    val posEntries = part.posDeletes.iterator.flatMap { case (dp, dlen, dseq) =>
      posDeleteFunc(pf(dp, dlen)).map(r =>
        (GraftSpj.normKey(r.getUTF8String(0).toString), r.getLong(1), dseq))
    }.toArray
    val posByPath = posEntries.groupBy(_._1)
    // EQUALITY delete keys: per id-set, per delete-sequence, a hash
    // set of UnsafeRow keys (byte equality == null-safe equality for
    // the gated non-floating key types). Size-gated at plan time.
    val eqData: Map[Int, Array[(Long, java.util.HashSet[UnsafeRow])]] =
      part.eqDeletes.groupBy(_._4).map { case (idx, entries) =>
        val normalize = UnsafeProjection.create(
          keySchemas(idx).fields.zipWithIndex.map { case (f, i) =>
            BoundReference(i, f.dataType, f.nullable)
          }.toIndexedSeq)
        idx -> entries.groupBy(_._3).toSeq.sortBy(_._1).map {
          case (dseq, es) =>
            val set = new java.util.HashSet[UnsafeRow]()
            es.foreach { case (p0, len0, _, _) =>
              eqDeleteFuncs(idx)(pf(p0, len0)).foreach { r =>
                set.add(normalize(r).copy()); ()
              }
            }
            (dseq, set)
        }.toArray
      }
    val keyProjs = keyOrdinals.map(ords => UnsafeProjection.create(
      ords.map(i => BoundReference(i, superset(i).dataType,
        superset(i).nullable): org.apache.spark.sql.catalyst.expressions.Expression).toIndexedSeq))
    val identityOut = requiredOrdinals.sameElements(superset.indices) &&
      requiredOrdinals.length == superset.length
    val outProj = UnsafeProjection.create(
      requiredOrdinals.map(i => BoundReference(i, superset(i).dataType,
        superset(i).nullable): org.apache.spark.sql.catalyst.expressions.Expression).toIndexedSeq)
    val it = part.files.iterator.flatMap { case (path, len, fseq) =>
      // spec sequence rules: a position delete applies to data files
      // with dataSeq ≤ deleteSeq; an equality delete to STRICTLY older
      // files (dataSeq < deleteSeq)
      val dead = new java.util.HashSet[java.lang.Long]()
      posByPath.getOrElse(GraftSpj.normKey(path), Array.empty)
        .foreach { case (_, pos, dseq) =>
          if (dseq >= fseq) { dead.add(pos); () }
        }
      val eqApplicable: Seq[(Int, Array[java.util.HashSet[UnsafeRow]])] =
        eqData.toSeq.map { case (idx, bySeq) =>
          idx -> bySeq.collect { case (dseq, set) if dseq > fseq => set }
        }.filter(_._2.nonEmpty)
      val base = rowFunc(pf(path, len))
      val positioned =
        if (dead.isEmpty) base
        else {
          // file-absolute row position (Long — files can exceed 2^31
          // rows); rows arrive in file order because rowFunc reads the
          // whole file as one split with no pushdown
          var pos = -1L
          base.filter { _ => pos += 1; !dead.contains(pos) }
        }
      val surviving =
        if (eqApplicable.isEmpty) positioned
        else positioned.filter { row =>
          !eqApplicable.exists { case (idx, sets) =>
            val key = keyProjs(idx)(row)
            sets.exists(_.contains(key))
          }
        }
      if (identityOut) surviving else surviving.map(outProj)
    }
    reader(it)
  }

  override def createColumnarReader(p: InputPartition)
      : PartitionReader[ColumnarBatch] = {
    val part = p.asInstanceOf[GraftBucketInputPartition]
    reader(part.files.iterator.flatMap { case (path, len, _) =>
      batchFunc(pf(path, len))
    }.asInstanceOf[Iterator[ColumnarBatch]])
  }
}
