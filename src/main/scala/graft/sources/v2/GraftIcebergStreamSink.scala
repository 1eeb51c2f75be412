package graft.sources.v2

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.Sink
import org.apache.spark.sql.graftbridge.StreamBridge

import graft.streaming.StreamingOps

/** The idiomatic STREAMING WRITE face over the engine's exactly-once
  * Iceberg table sinks —
  * {{{
  *   df.writeStream.format("graft-iceberg")
  *     .option("checkpointLocation", ckpt)
  *     .option("mode", "upsert").option("key-cols", "K")
  *     .option("create-ddl", "CREATE TABLE S.T (...);")
  *     .start(tablePath)
  * }}}
  * — wrapping [[StreamingOps.icebergTableSink]] /
  * [[StreamingOps.icebergUpsertSink]] / [[StreamingOps.icebergCdcSink]]
  * (one per `mode` = append | upsert | cdc) so their exactly-once
  * machinery (per-batch overwrite data dirs, the txn property
  * committed atomically with each snapshot, post-commit replays
  * skipped) is reachable without hand-writing a `foreachBatch` body.
  *
  * Options:
  *  - `mode`: append (default) | upsert | cdc
  *  - `key-cols`: comma-separated equality keys (upsert/cdc)
  *  - `op-col`: the CDC op marker column (cdc; "D" = delete)
  *  - `create-ddl`: DB2 CREATE TABLE script — bootstraps the table on
  *    the first batch when the path holds none; ignored (metadata
  *    wins) once the table exists
  *  - `txn-app-id`: the exactly-once lineage id. Defaults to a UUID
  *    derived from `checkpointLocation` — the correct default, since
  *    the checkpoint IS the stream lineage: a replay under the same
  *    checkpoint replays the same appId, a fresh checkpoint is a
  *    fresh lineage
  *  - `maintain-every` (+ `keep-snapshots`, `target-file-bytes`):
  *    the [[StreamingOps.SinkMaintenance]] cadence
  */
private[v2] class GraftIcebergStreamSink(parameters: Map[String, String],
    partitionColumns: Seq[String]) extends Sink {

  require(partitionColumns.isEmpty,
    "graft-iceberg sinks take their layout from the table definition — " +
      "drop partitionBy() and declare PARTITION BY in the DDL")

  private val path = parameters.getOrElse("path",
    throw new IllegalArgumentException(
      "graft-iceberg sink needs a table path: .start(<tablePath>)"))
  private val mode = parameters.getOrElse("mode", "append")
  require(Set("append", "upsert", "cdc")(mode),
    s"graft-iceberg sink mode must be append|upsert|cdc, got $mode")
  private val keyCols = parameters.get("key-cols")
    .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
    .getOrElse(Nil)
  require(mode == "append" || keyCols.nonEmpty,
    s"mode=$mode needs option(\"key-cols\", \"k1,k2\")")
  private val opCol = parameters.get("op-col")
  require(mode != "cdc" || opCol.nonEmpty,
    "mode=cdc needs option(\"op-col\", <column>) (\"D\" rows delete)")
  private val txnAppId = parameters.get("txn-app-id")
    .orElse(parameters.get("checkpointLocation")
      .map(GraftIcebergStreamSink.lineageIdFor))
    .getOrElse(throw new IllegalArgumentException(
      "graft-iceberg sink needs checkpointLocation (or an explicit " +
        "txn-app-id) — the exactly-once lineage id derives from it"))
  private val maintenance = parameters.get("maintain-every").map(n =>
    StreamingOps.SinkMaintenance(
      everyBatches = n.toInt,
      targetFileBytes = parameters.get("target-file-bytes")
        .map(_.toLong).getOrElse(512L * 1024 * 1024),
      keepSnapshots = parameters.get("keep-snapshots")
        .map(_.toInt).getOrElse(10)))

  // the TableDef is resolved per batch so the bootstrap case flips to
  // metadata-resolution after the first commit, like the loader faces
  private def tdef = GraftIcebergSource.tableDefFor(path,
    new org.apache.spark.sql.util.CaseInsensitiveStringMap(
      scala.jdk.CollectionConverters.MapHasAsJava(parameters).asJava))

  private def body(table: graft.model.TableDef)
      : (DataFrame, Long) => Unit = mode match {
    case "append" => StreamingOps.icebergTableSink(table, path,
      txnAppId = txnAppId, maintenance = maintenance)
    case "upsert" => StreamingOps.icebergUpsertSink(table, path,
      keyCols = keyCols, txnAppId = txnAppId, maintenance = maintenance)
    case "cdc" => StreamingOps.icebergCdcSink(table, path,
      keyCols = keyCols, opCol = opCol.get, txnAppId = txnAppId,
      maintenance = maintenance)
  }

  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    // the incoming frame rides the streaming plan — re-root it as a
    // batch frame before handing to the batch-shaped sink bodies (the
    // standard V1-sink decoupling, reverse of StreamBridge.asStreaming)
    body(tdef)(StreamBridge.asBatch(data), batchId)
  }

  override def toString: String = s"GraftIcebergStreamSink($mode, $path)"
}

private[v2] object GraftIcebergStreamSink {
  /** The exactly-once lineage id for a checkpoint location. It must be
    * stable across restarts that SPELL the same checkpoint differently
    * (relative vs absolute, trailing slash, missing scheme) —
    * otherwise a replayed batch re-commits as a duplicate under a
    * fresh appId. Qualify through the checkpoint's FileSystem
    * (scheme + authority + absolute path; Hadoop Path normalizes
    * separators and `.`/`..` segments) before hashing. */
  private[v2] def lineageIdFor(checkpoint: String): String = {
    val conf = org.apache.spark.sql.SparkSession.active
      .sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(checkpoint)
    // rebuild from URI components: "file:/x" and "file:///x" (null vs
    // empty authority) must spell identically
    val u = p.getFileSystem(conf).makeQualified(p).toUri
    val auth = Option(u.getAuthority).filter(_.nonEmpty)
      .map("//" + _).getOrElse("")
    val canonical =
      s"${u.getScheme}:$auth${u.getPath}".stripSuffix("/")
    java.util.UUID.nameUUIDFromBytes(
      canonical.getBytes(java.nio.charset.StandardCharsets.UTF_8)).toString
  }
}
