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
import org.apache.spark.sql.types.StructType
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
  * PLAIN parquet read correct — single-column bucket spec (all data
  * columns physical in files, nothing directory-restored), no
  * row-level delete files, no schema evolution, every live file under
  * spec 0 with a recorded bucket tuple. Everything else falls back to
  * the V1 delegating scan, whose readSnapshot handles the general
  * cases; the gate only ever SKIPS an optimization, never changes
  * results. File pruning and the ScanReport surface behave exactly
  * like the V1 path.
  *
  * Execution borrows Spark's own parquet machinery
  * ([[ParquetFileFormat.buildReaderWithPartitionValues]], the
  * function behind every FileSourceScanExec) — including VECTORIZED
  * reading: when the session's conf and schema support batches, the
  * reader factory reports columnar and passes the ColumnarBatch
  * iterator straight through. */
private[v2] object GraftSpj {

  private val BucketN = """bucket\[(\d+)\]""".r

  /** Build the key-grouped scan when the layout qualifies, else None. */
  def tryBuild(spark: SparkSession, path: String, tdef: TableDef,
      snapshotId: Option[Long], required: StructType,
      pushed: Array[Filter]): Option[Scan] = {
    // layout gate: ONE spec whose single field is bucket[N] (legacy
    // HASH shape or explicit spec 0 — the loader presents catalog
    // tables as the latter), no spec/schema evolution (evolved tables
    // read by field id through the general path)
    if (tdef.partitionSpecs.size > 1 || tdef.priorSchemas.nonEmpty)
      return None
    val defaultSid = graft.sources.IcebergMetadata.defaultSpecIdOf(tdef)
    val colOfId = tdef.columns.zipWithIndex.map { case (c, i) =>
      c.fieldId.getOrElse(i + 1) -> c.name
    }.toMap
    val (srcCol, nBuckets) =
      graft.sources.IcebergMetadata.specFieldDefs(tdef, defaultSid) match {
        case Seq(f) => f.transform match {
          case BucketN(n) => (colOfId(f.sourceId), n.toInt)
          case _ => return None
        }
        case _ => return None
      }
    val conf = spark.sparkContext.hadoopConfiguration
    val (_, listRows) =
      IcebergSnapshot.resolveSnapshot(path, tdef, snapshotId, conf)
    if (IcebergSnapshot.liveDeleteFiles(listRows, conf).nonEmpty) return None
    val live = IcebergSnapshot.liveFilesWithSeq(listRows, tdef, conf)
      .map(_._1)
    if (live.exists(f => f.specId != defaultSid || f.partitionValues.size != 1))
      return None
    // the same stats/partition pruning + observable report the V1
    // path produces
    val bounds = GraftIcebergSource.translate(tdef, pushed.toSeq)
    val (kept, skipped) = live.partition(f =>
      bounds.forall(b => IcebergPruning.fileMayMatch(tdef, f, b)))
    GraftIcebergScans.record(GraftIcebergScans.ScanReport(
      path, snapshotId, bounds, kept.map(_.path), skipped.map(_.path)))
    val groups = kept
      .groupBy(_.partitionValues.head.map(_.asInstanceOf[Number].intValue))
      .toSeq.sortBy(_._1.getOrElse(Int.MinValue))
    Some(new GraftIcebergBucketScan(spark, tdef, required, pushed,
      srcCol, nBuckets, groups))
  }
}

private[v2] class GraftIcebergBucketScan(spark: SparkSession,
    tdef: TableDef, required: StructType, pushed: Array[Filter],
    srcCol: String, nBuckets: Int,
    groups: Seq[(Option[Int], Seq[IcebergSnapshot.DataFileInfo])])
    extends Scan with Batch with SupportsReportPartitioning {

  override def readSchema(): StructType = required

  override def toBatch: Batch = this

  override def description(): String =
    s"graft-iceberg key-grouped bucket[$nBuckets]($srcCol) " +
      s"groups=${groups.size}"

  override def outputPartitioning(): Partitioning =
    new KeyGroupedPartitioning(
      Array(Expressions.bucket(nBuckets, srcCol)), groups.size)

  override def planInputPartitions(): Array[InputPartition] =
    groups.map { case (ord, files) =>
      GraftBucketInputPartition(ord,
        files.map(f => (f.path, f.sizeBytes)).toArray)
    }.toArray

  override def createReaderFactory(): PartitionReaderFactory = {
    val fmt = new ParquetFileFormat
    val dataSchema = graft.api.SchemaTranslator.toSparkSchema(tdef)
    // vectorized when the session would vectorize a file scan of this
    // shape — the reader function then yields ColumnarBatches and the
    // factory passes them through columnar (FileSourceScanExec's own
    // contract)
    val returningBatch = fmt.supportBatch(spark, required)
    val readFunc = fmt.buildReaderWithPartitionValues(
      spark, dataSchema, new StructType(), required,
      pushed.toIndexedSeq,
      // the format's own contract: the caller must declare whether it
      // will consume batches (FileSourceScanExec does the same)
      Map(org.apache.spark.sql.execution.datasources.FileFormat
        .OPTION_RETURNING_BATCH -> returningBatch.toString),
      spark.sessionState.newHadoopConf())
    new GraftBucketReaderFactory(readFunc, returningBatch)
  }
}

/** One bucket ordinal's files; the partition KEY is the ordinal (the
  * value `bucket(N, key)` yields for every row in these files), which
  * is what lets Spark co-locate equal ordinals across tables. */
private[v2] case class GraftBucketInputPartition(ordinal: Option[Int],
    files: Array[(String, Long)]) extends InputPartition
    with HasPartitionKey {
  override def partitionKey(): InternalRow =
    new GenericInternalRow(Array[Any](ordinal.orNull))
}

private[v2] class GraftBucketReaderFactory(
    readFunc: PartitionedFile => Iterator[InternalRow],
    returningBatch: Boolean) extends PartitionReaderFactory {

  private def rowsOf(p: InputPartition): Iterator[InternalRow] = {
    val files = p.asInstanceOf[GraftBucketInputPartition].files
    files.iterator.flatMap { case (path, len) =>
      readFunc(new PartitionedFile(InternalRow.empty,
        SparkPath.fromPath(new Path(path)), 0, len, Array.empty,
        0L, len, Map.empty))
    }
  }

  private def reader[T](it: Iterator[T]): PartitionReader[T] =
    new PartitionReader[T] {
      private var current: T = _
      override def next(): Boolean =
        if (it.hasNext) { current = it.next(); true } else false
      override def get(): T = current
      override def close(): Unit = ()
    }

  override def supportColumnarReads(p: InputPartition): Boolean =
    returningBatch

  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    reader(rowsOf(p))

  override def createColumnarReader(p: InputPartition)
      : PartitionReader[ColumnarBatch] =
    reader(rowsOf(p).asInstanceOf[Iterator[ColumnarBatch]])
}
