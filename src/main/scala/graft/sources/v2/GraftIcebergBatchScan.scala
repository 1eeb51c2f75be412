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
  * with a full partition tuple. Position delete files are APPLIED
  * IN-READER (below) — a CDC table maintained by MERGE keeps its SPJ
  * between compactions; only equality deletes (key semantics needing
  * the general anti-join) fall back to the V1 delegating scan. The
  * gate only ever SKIPS an optimization, never changes results. File
  * pruning and the ScanReport surface behave exactly like the V1 path.
  *
  * Execution borrows Spark's own parquet machinery
  * ([[ParquetFileFormat.buildReaderWithPartitionValues]], the
  * function behind every FileSourceScanExec) — including VECTORIZED
  * reading: a delete-free partition passes ColumnarBatches straight
  * through. A partition WITH position deletes reads row-wise with NO
  * parquet filter pushdown (row-group skipping would break file
  * positions), counts file-absolute row positions, and drops the
  * (file, pos) pairs its delete files name under the spec's sequence
  * rule (delete seq ≥ data seq) — the same merge-on-read the general
  * reader applies with an anti-join, here as a per-task hash filter
  * over deletes scoped to the bucket. */
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
    // equality deletes kill by KEY against strictly-older files — that
    // anti-join belongs to the general reader; position deletes apply
    // in-reader below
    if (deletes.exists(_.content != 1)) return None
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
    // entries naming none of its files): a tuple-scoped delete rides
    // its bucket's partition; a global or foreign-shaped tuple rides
    // every partition
    def deletesFor(ord: Option[Int]) = deletes.filter { d =>
      val scoped = d.partitionValues.size == defs.size
      !scoped || (d.partitionValues(bucketIdx)
        .map(_.asInstanceOf[Number].intValue) == ord)
    }.map(d => (d.path, d.sizeBytes, d.seq)).toArray
    Some(new GraftIcebergBucketScan(spark, tdef, required, pushed,
      srcCol, nBuckets, groups.map { case (ord, fs) =>
        GraftBucketInputPartition(ord,
          fs.map { case (f, seq) => (f.path, f.sizeBytes, seq) }.toArray,
          deletesFor(ord))
      }))
  }
}

private[v2] class GraftIcebergBucketScan(spark: SparkSession,
    tdef: TableDef, required: StructType, pushed: Array[Filter],
    srcCol: String, nBuckets: Int,
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
    // delete-partition data reads: row-wise, NO pushed filters —
    // parquet row-group/page skipping would desynchronize the counted
    // position from the file-absolute row index the delete files name
    // (Spark re-evaluates every filter post-scan regardless: pushFilters
    // returned them all as residuals)
    val rowFunc = new ParquetFileFormat().buildReaderWithPartitionValues(
      spark, dataSchema, new StructType(), required, Nil,
      Map(org.apache.spark.sql.execution.datasources.FileFormat
        .OPTION_RETURNING_BATCH -> "false"),
      spark.sessionState.newHadoopConf())
    val deleteSchema = StructType(Seq(
      StructField("file_path", StringType), StructField("pos", LongType)))
    val deleteFunc = new ParquetFileFormat().buildReaderWithPartitionValues(
      spark, deleteSchema, new StructType(), deleteSchema, Nil,
      Map(org.apache.spark.sql.execution.datasources.FileFormat
        .OPTION_RETURNING_BATCH -> "false"),
      spark.sessionState.newHadoopConf())
    new GraftBucketReaderFactory(batchFunc, rowFunc, deleteFunc,
      returningBatch)
  }
}

/** One bucket ordinal's files (+ the position delete files that can
  * name them); the partition KEY is the ordinal (the value
  * `bucket(N, key)` yields for every row in these files), which is
  * what lets Spark co-locate equal ordinals across tables. Files ride
  * as (path, length, dataSequenceNumber); deletes as
  * (path, length, deleteSequenceNumber). */
private[v2] case class GraftBucketInputPartition(ordinal: Option[Int],
    files: Array[(String, Long, Long)],
    deletes: Array[(String, Long, Long)]) extends InputPartition
    with HasPartitionKey {
  override def partitionKey(): InternalRow =
    new GenericInternalRow(Array[Any](ordinal.orNull))
}

private[v2] class GraftBucketReaderFactory(
    batchFunc: PartitionedFile => Iterator[InternalRow],
    rowFunc: PartitionedFile => Iterator[InternalRow],
    deleteFunc: PartitionedFile => Iterator[InternalRow],
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

  // a delete-carrying partition must come back as rows (the position
  // filter walks them one by one); delete-free partitions keep the
  // vectorized batch hand-off
  override def supportColumnarReads(p: InputPartition): Boolean =
    returningBatch &&
      p.asInstanceOf[GraftBucketInputPartition].deletes.isEmpty

  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val part = p.asInstanceOf[GraftBucketInputPartition]
    if (part.deletes.isEmpty)
      reader(part.files.iterator.flatMap { case (path, len, _) =>
        batchFunc(pf(path, len))
      })
    else {
      // load this bucket's delete entries ONCE per task: (normalized
      // target path, position, delete sequence); memory is bounded by
      // the bucket's own deletes, the same per-task locality real
      // Iceberg readers rely on
      val entries = part.deletes.iterator.flatMap { case (dp, dlen, dseq) =>
        deleteFunc(pf(dp, dlen)).map(r =>
          (GraftSpj.normKey(r.getUTF8String(0).toString), r.getLong(1), dseq))
      }.toArray
      val byPath = entries.groupBy(_._1)
      val it = part.files.iterator.flatMap { case (path, len, fseq) =>
        // spec sequence rule: a position delete applies to data files
        // with dataSeq ≤ deleteSeq
        val dead = new java.util.HashSet[java.lang.Long]()
        byPath.getOrElse(GraftSpj.normKey(path), Array.empty)
          .foreach { case (_, pos, dseq) =>
            if (dseq >= fseq) { dead.add(pos); () }
          }
        if (dead.isEmpty) rowFunc(pf(path, len))
        else {
          // file-absolute row position (Long — files can exceed 2^31
          // rows); rows arrive in file order because rowFunc reads the
          // whole file as one split with no pushdown
          var pos = -1L
          rowFunc(pf(path, len)).filter { _ =>
            pos += 1; !dead.contains(pos)
          }
        }
      }
      reader(it)
    }
  }

  override def createColumnarReader(p: InputPartition)
      : PartitionReader[ColumnarBatch] = {
    val part = p.asInstanceOf[GraftBucketInputPartition]
    reader(part.files.iterator.flatMap { case (path, len, _) =>
      batchFunc(pf(path, len))
    }.asInstanceOf[Iterator[ColumnarBatch]])
  }
}
