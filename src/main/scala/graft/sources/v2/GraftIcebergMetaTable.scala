package graft.sources.v2

import scala.jdk.CollectionConverters._

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Row, SQLContext, SparkSession}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder, V1Scan}
import org.apache.spark.sql.sources.{BaseRelation, TableScan}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.sources.{IcebergInspect, IcebergTableLoader}

/** SQL metadata tables — Iceberg's `SELECT * FROM db.t.files`
  * convention, served by the catalog when an identifier's LAST
  * namespace element is a real table and the name is one of the
  * inspection views ([[IcebergInspect]]): `snapshots`, `history`,
  * `refs`, `manifests`, `files`, `partitions`. Read-only (no write
  * builder), computed fresh per scan from the table's CURRENT
  * metadata — driver-side O(manifests) like every inspection, so a
  * `WHERE` over them needs no pushdown machinery. */
private[v2] object GraftIcebergMetaTable {
  val Kinds: Set[String] =
    Set("snapshots", "history", "refs", "manifests", "files", "partitions")
}

private[v2] class GraftIcebergMetaTable(path: String, kind: String)
    extends Table with SupportsRead {

  // computed ONCE per table instance (the catalog loads a fresh
  // instance per query): schema() at plan time and buildScan() at
  // execution time serve the SAME driver-side inspection frame, so the
  // O(manifests) work happens once and a commit landing between
  // planning and execution cannot change the row shape mid-query
  private lazy val frame: org.apache.spark.sql.DataFrame = {
    val spark = SparkSession.active
    def tdef = IcebergTableLoader.load(
      path, spark.sparkContext.hadoopConfiguration)
    kind match {
      case "snapshots" => IcebergInspect.snapshotsTable(spark, path)
      case "history" => IcebergInspect.historyTable(spark, path)
      case "refs" => IcebergInspect.refsTable(spark, path)
      case "manifests" => IcebergInspect.manifestsTable(spark, path)
      case "files" => IcebergInspect.filesTable(spark, path, tdef)
      case _ => IcebergInspect.partitionsTable(spark, path, tdef)
    }
  }

  override def name(): String = s"graft-iceberg.`$path`.$kind"

  override def schema(): StructType = frame.schema

  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new V1Scan {
        override def readSchema(): StructType =
          GraftIcebergMetaTable.this.schema()
        override def description(): String = name()
        override def toV1TableScan[T <: BaseRelation with TableScan](
            context: SQLContext): T =
          new BaseRelation with TableScan {
            override def sqlContext: SQLContext = context
            override def schema: StructType =
              GraftIcebergMetaTable.this.schema()
            override def buildScan(): RDD[Row] = frame.rdd
          }.asInstanceOf[T]
      }
    }
}
