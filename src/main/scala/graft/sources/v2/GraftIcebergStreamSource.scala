package graft.sources.v2

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset => OffsetV1, Source}
import org.apache.spark.sql.execution.streaming.runtime.SerializedOffset
import org.apache.spark.sql.graftbridge.StreamBridge
import org.apache.spark.sql.types.StructType
import org.json4s._
import org.json4s.jackson.JsonMethods

import graft.model.TableDef
import graft.sources.{IcebergChanges, IcebergSnapshot, IcebergTableLoader}

/** Offset of the Iceberg table stream: the last CONSUMED snapshot id
  * (−1 = nothing consumed — the from-creation state). Snapshot ids
  * are not ordered, so the id itself is the cursor and the commit
  * chain supplies the order. */
case class GraftIcebergSourceOffset(snapshotId: Long) extends OffsetV1 {
  override def json: String =
    JsonMethods.compact(JsonMethods.render(
      JObject("snapshot-id" -> JInt(snapshotId))))
}

object GraftIcebergSourceOffset {
  def fromJson(s: String): GraftIcebergSourceOffset =
    GraftIcebergSourceOffset(
      (JsonMethods.parse(s) \ "snapshot-id").asInstanceOf[JInt].num.toLong)
  def from(o: OffsetV1): GraftIcebergSourceOffset = o match {
    case g: GraftIcebergSourceOffset => g
    case s: SerializedOffset => fromJson(s.json)
    case other => fromJson(other.json)
  }
}

/** STREAMING SOURCE over a migrated Iceberg table — the consumer half
  * of the warehouse CDC loop the sinks opened: `spark.readStream
  * .format("graft-iceberg").load(tablePath)` tails the table's
  * committed snapshots, each micro-batch = the rows APPENDED by the
  * snapshots between consecutive offsets
  * ([[IcebergChanges.incrementalAppendScan]] — O(rows added), never a
  * table rescan; at 100 TB the daily tail reads the day's files).
  *
  * Semantics and safety:
  *  - offsets are MAIN-head snapshot ids; a staged write-audit-publish
  *    branch snapshot never leaks into the stream (both the offset
  *    head and the range walk resolve through main's parent-link
  *    ancestry — the r10 ancestry rule);
  *  - STRICT by default: a snapshot in range that REMOVES rows
  *    (delete / upsert-overwrite) fails the batch loudly — an
  *    append-only tail silently dropping deletes is how downstream
  *    mirrors diverge. `option("strict", "false")` reads just the
  *    adds; full insert+delete CDC is [[IcebergChanges.changesTable]]
  *    territory (batch). REPLACE (compaction) snapshots move bytes,
  *    not rows, and are skipped either way;
  *  - exactly-once on restart: the checkpoint replays the committed
  *    offset json, and `(from, to]` ranges are deterministic over the
  *    immutable snapshot chain. Snapshot EXPIRY between restarts that
  *    drops an un-consumed range fails loudly (the range walk refuses
  *    a from-id outside the retained ancestry);
  *  - `starting-snapshot-id` option: first batch starts AFTER that
  *    snapshot (default: table creation — the full backfill).
  *
  * Output columns: the table schema plus the changelog metadata
  * `_change_type` ('insert'), `_commit_snapshot_id`, `_change_ordinal`
  * (position within the micro-batch's range) — byte-identical to the
  * batch incremental scan, which is exactly what StreamingSpec pins. */
class GraftIcebergStreamSource(spark: SparkSession,
    parameters: Map[String, String]) extends Source {

  private val path = parameters.getOrElse("path",
    throw new IllegalArgumentException(
      "graft-iceberg stream needs a table path: spark.readStream" +
        ".format(\"graft-iceberg\").load(<tablePath>)"))
  private val strict =
    parameters.get("strict").forall(_.toBoolean)
  private val startAfter = parameters.get("starting-snapshot-id").map(_.toLong)
  // "append" (default): adds only, strict about row removals;
  // "cdc": full insert+delete rows per commit via the O(changes) scan
  // (IcebergChanges.incrementalChangesScan) — the downstream-mirror
  // tail of the CDC loop the table sinks open
  private val mode = parameters.getOrElse("mode", "append")
  require(mode == "append" || mode == "cdc",
    s"graft-iceberg stream mode must be append|cdc, got $mode")

  private def conf = spark.sparkContext.hadoopConfiguration

  // the table is loaded per access, not cached: schema evolution
  // between micro-batches must be visible (the scan reads by field id)
  private def tdef: TableDef = IcebergTableLoader.load(path, conf)

  override val schema: StructType = GraftIcebergStreamSource.schemaOf(parameters)

  override def getOffset: Option[OffsetV1] =
    IcebergSnapshot.currentSnapshotId(path, conf)
      .map(GraftIcebergSourceOffset(_))

  override def getBatch(start: Option[OffsetV1], end: OffsetV1): DataFrame = {
    val from = start.map(GraftIcebergSourceOffset.from(_).snapshotId)
      .orElse(startAfter)
    val to = GraftIcebergSourceOffset.from(end).snapshotId
    val batch =
      if (mode == "cdc")
        IcebergChanges.incrementalChangesScan(spark, path, tdef,
          fromSnapshotId = from, toSnapshotId = Some(to))
      else IcebergChanges.incrementalAppendScan(spark, path, tdef,
        fromSnapshotId = from, toSnapshotId = Some(to), strict = strict)
    // MicroBatchExecution requires a streaming-flagged plan; the scan
    // itself is a batch plan over the range's immutable files. The
    // declared schema overrides nullability so empty and non-empty
    // ranges present identically.
    StreamBridge.asStreaming(batch, Some(schema))
  }

  override def stop(): Unit = ()
}

object GraftIcebergStreamSource {
  /** Table columns + the changelog metadata columns — resolved from
    * the table's own metadata, like the batch face. */
  def schemaOf(parameters: Map[String, String]): StructType = {
    val path = parameters.getOrElse("path",
      throw new IllegalArgumentException("graft-iceberg stream needs a path"))
    val conf = SparkSession.active.sparkContext.hadoopConfiguration
    val base = graft.api.SchemaTranslator.toSparkSchema(
      IcebergTableLoader.load(path, conf))
    StructType(base.fields ++ Seq(
      org.apache.spark.sql.types.StructField("_change_type",
        org.apache.spark.sql.types.StringType, nullable = false),
      org.apache.spark.sql.types.StructField("_commit_snapshot_id",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("_change_ordinal",
        org.apache.spark.sql.types.IntegerType, nullable = false)))
  }
}
