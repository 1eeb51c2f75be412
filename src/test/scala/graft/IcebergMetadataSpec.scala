package graft

import java.nio.file.{Files, Path => JPath}

import scala.io.Source

import org.json4s._
import org.json4s.jackson.JsonMethods
import org.scalatest.funsuite.AnyFunSuite

import graft.convert.{Db2Renderer, RenderConfig}
import graft.model.{Db2Column, PartitionSpecDef, TableDef}
import graft.parse.{Db2Parser, StatementSplitter}
import graft.sources.IcebergMetadata

/** DDL ↔ Iceberg-metadata round-trip: every column, type, NOT NULL,
  * PARTITION BY column and CLUSTER BY column in the DDL that
  * [[Db2Renderer]] emits must appear in the table-spec v2 metadata
  * JSON that [[IcebergMetadata]] writes for the same [[TableDef]] —
  * the two sinks describe one table and may never drift.
  *
  * The comparison side is extracted from the rendered DDL *text* (the
  * artifact a user actually deploys), not from the shared TableDef, so
  * a renderer/metadata disagreement cannot cancel out.
  */
class IcebergMetadataSpec extends AnyFunSuite {

  private val cfg = RenderConfig()

  private def fixtureTables(): Seq[TableDef] = {
    val src = Source.fromInputStream(
      getClass.getResourceAsStream("/golden/sample_db2.sql"), "UTF-8")
    val ddl = try src.mkString finally src.close()
    Db2Parser.parse(ddl).tables
  }

  /** (name, targetType, notNull) triples parsed back out of the DDL text. */
  private def ddlColumns(ddl: String): Seq[(String, String, Boolean)] = {
    val colLine = """^    ([A-Za-z0-9_"]+) ([A-Za-z0-9_]+(?:\([^)]*\))?)( NOT NULL)?,?$""".r
    ddl.linesIterator.collect {
      case colLine(name, tpe, notNull) if name != "PRIMARY" =>
        (name.replace("\"", ""), tpe, notNull != null)
    }.toSeq
  }

  private def ddlClause(ddl: String, clause: String): Seq[String] =
    ddl.linesIterator.collectFirst {
      case l if l.startsWith(s"$clause (") =>
        l.stripPrefix(s"$clause (").stripSuffix(")").split(",").map(_.trim).toSeq
    }.getOrElse(Nil)

  private def metaFields(json: JValue): Seq[(String, String, Boolean)] =
    (json \ "schemas")(0) \ "fields" match {
      case JArray(fs) => fs.map { f =>
        (
          (f \ "name").asInstanceOf[JString].s,
          (f \ "type").asInstanceOf[JString].s,
          (f \ "required").asInstanceOf[JBool].value)
      }
      case other => fail(s"schema fields not an array: $other")
    }

  test("round-trip: every DDL column/type/NOT NULL appears in the metadata") {
    val tables = fixtureTables().filterNot(t => t.volatileTable || t.globalTemporary)
    assert(tables.size >= 9)
    for (table <- tables) {
      val (ddl, _) = Db2Renderer.convertTable(table, cfg)
      val meta = JsonMethods.parse(IcebergMetadata.metadataJson(table, s"/warehouse/${table.fullName}"))
      val fromDdl = ddlColumns(ddl)
      val fromMeta = metaFields(meta)
      assert(fromDdl.map(_._1) === fromMeta.map(_._1),
        s"${table.fullName}: column names/order diverge")
      for (((dn, dt, dnn), (_, mt, mreq)) <- fromDdl.zip(fromMeta)) {
        assert(mt === IcebergMetadata.icebergType(dt),
          s"${table.fullName}.$dn: DDL type $dt vs metadata type $mt")
        assert(mreq === dnn, s"${table.fullName}.$dn: NOT NULL mismatch")
      }
      // field ids follow the table-spec initial-assignment rule: 1..n
      val ids = ((meta \ "schemas")(0) \ "fields").asInstanceOf[JArray].arr
        .map(f => (f \ "id").asInstanceOf[JInt].num.toInt)
      assert(ids === (1 to fromMeta.size).toList)
      assert((meta \ "last-column-id").asInstanceOf[JInt].num.toInt === fromMeta.size)
    }
  }

  test("round-trip: PARTITION BY columns become identity partition fields") {
    val tables = fixtureTables()
    val events = tables.find(_.fullName == "ANALYTICS.EVENTS").get
    val (ddl, _) = Db2Renderer.convertTable(events, cfg)
    assert(ddlClause(ddl, "PARTITION BY") === Seq("EVENT_DATE"))
    val meta = JsonMethods.parse(IcebergMetadata.metadataJson(events, "/w/e"))
    val fields = ((meta \ "partition-specs")(0) \ "fields").asInstanceOf[JArray].arr
    assert(fields.size === 1)
    val f = fields.head
    assert((f \ "transform").asInstanceOf[JString].s === "identity")
    assert((f \ "field-id").asInstanceOf[JInt].num.toInt === 1000)
    // source-id points at the EVENT_DATE schema field
    val srcId = (f \ "source-id").asInstanceOf[JInt].num.toInt
    val cols = metaFields(meta)
    assert(cols(srcId - 1)._1 === "EVENT_DATE")
    assert((meta \ "last-partition-id").asInstanceOf[JInt].num.toInt === 1000)
  }

  test("round-trip: CLUSTER BY column becomes the default sort order") {
    val table = TableDef(schema = Some("S"), name = "T",
      columns = Seq(
        Db2Column("K", "INTEGER", nullable = false),
        Db2Column("V", "VARCHAR", length = Some(10))),
      distributeByHash = Some("K"))
    val (ddl, _) = Db2Renderer.convertTable(table, cfg)
    assert(ddlClause(ddl, "CLUSTER BY") === Seq("K"))
    val meta = JsonMethods.parse(IcebergMetadata.metadataJson(table, "/w/t"))
    assert((meta \ "default-sort-order-id").asInstanceOf[JInt].num.toInt === 1)
    val fields = ((meta \ "sort-orders")(0) \ "fields").asInstanceOf[JArray].arr
    assert(fields.size === 1)
    assert((fields.head \ "source-id").asInstanceOf[JInt].num.toInt === 1) // K is field 1
    // no CLUSTER BY → order-id 0 (the spec's unsorted order)
    val plain = JsonMethods.parse(
      IcebergMetadata.metadataJson(table.copy(distributeByHash = None), "/w/t"))
    assert((plain \ "default-sort-order-id").asInstanceOf[JInt].num.toInt === 0)
  }

  test("HASH partition maps to bucket[16] transform") {
    val table = TableDef(name = "H",
      columns = Seq(Db2Column("K", "INTEGER", nullable = false)),
      partition = Some(PartitionSpecDef("HASH", Seq("K"))))
    val meta = JsonMethods.parse(IcebergMetadata.metadataJson(table, "/w/h"))
    val f = ((meta \ "partition-specs")(0) \ "fields").asInstanceOf[JArray].arr.head
    assert((f \ "transform").asInstanceOf[JString].s === "bucket[16]")
  }

  test("metadata document is deterministic and structurally valid") {
    val events = fixtureTables().find(_.fullName == "ANALYTICS.EVENTS").get
    val a = IcebergMetadata.metadataJson(events, "/w/e")
    val b = IcebergMetadata.metadataJson(events, "/w/e")
    assert(a === b)
    val meta = JsonMethods.parse(a)
    assert((meta \ "format-version").asInstanceOf[JInt].num.toInt === 2)
    assert((meta \ "location").asInstanceOf[JString].s === "/w/e")
    assert((meta \ "snapshots").asInstanceOf[JArray].arr.isEmpty)
    // UUID is name-derived, so stable across runs
    assert((meta \ "table-uuid") ===
      (JsonMethods.parse(IcebergMetadata.metadataJson(events, "/elsewhere")) \ "table-uuid"))
  }

  private def validateV2(meta: JValue, expectSnapshot: Boolean): Unit =
    IcebergV2Validation.validateV2(meta, expectSnapshot)

  test("metadata documents validate against the table-spec v2 structure, " +
      "CREATE state and snapshot state") {
    for (table <- fixtureTables().filterNot(t => t.volatileTable || t.globalTemporary)) {
      validateV2(JsonMethods.parse(
        IcebergMetadata.metadataJson(table, s"/w/${table.fullName}")), expectSnapshot = false)
      val snap = IcebergMetadata.SnapshotMeta(
        snapshotId = 42L, timestampMs = 1700000000000L,
        manifestList = "/w/t/metadata/snap-42-1-x.avro",
        addedFiles = 2L, addedRecords = 100L)
      validateV2(JsonMethods.parse(
        IcebergMetadata.metadataJson(table, s"/w/${table.fullName}",
          snapshot = Some(snap),
          metadataLog = Seq(0L -> "/w/t/metadata/v1.metadata.json"))),
        expectSnapshot = true)
    }
  }

  test("delete/overwrite snapshot metadata validates structurally and " +
      "round-trips the row-level-delete summary counters") {
    val events = fixtureTables().find(_.fullName == "ANALYTICS.EVENTS").get
    val append = IcebergMetadata.SnapshotMeta(
      snapshotId = 1L, timestampMs = 1L, manifestList = "/w/t/metadata/l1.avro",
      addedFiles = 4L, addedRecords = 100L)
    val del = IcebergMetadata.SnapshotMeta(
      snapshotId = 2L, timestampMs = 2L, manifestList = "/w/t/metadata/l2.avro",
      addedFiles = 0L, addedRecords = 0L, sequenceNumber = 2L,
      parentSnapshotId = Some(1L), totalFiles = 4L, totalRecords = 100L,
      operation = "delete", addedDeleteFiles = 2L, addedPositionDeletes = 17L,
      totalDeleteFiles = 2L, totalPositionDeletes = 17L)
    val up = IcebergMetadata.SnapshotMeta(
      snapshotId = 3L, timestampMs = 3L, manifestList = "/w/t/metadata/l3.avro",
      addedFiles = 1L, addedRecords = 10L, sequenceNumber = 3L,
      parentSnapshotId = Some(2L), totalFiles = 5L, totalRecords = 110L,
      operation = "overwrite", addedDeleteFiles = 1L, addedEqualityDeletes = 3L,
      totalDeleteFiles = 3L, totalPositionDeletes = 17L, totalEqualityDeletes = 3L)
    val doc = IcebergMetadata.metadataJsonChain(events, "/w/t",
      snapshots = Seq(append, del, up))
    val meta = JsonMethods.parse(doc)
    validateV2(meta, expectSnapshot = true)
    val snaps = (meta \ "snapshots").asInstanceOf[JArray].arr
    assert((snaps(1) \ "summary" \ "operation") === JString("delete"))
    assert((snaps(1) \ "summary" \ "added-position-deletes") === JString("17"))
    assert((snaps(1) \ "summary" \ "total-position-deletes") === JString("17"))
    assert((snaps(2) \ "summary" \ "operation") === JString("overwrite"))
    assert((snaps(2) \ "summary" \ "added-equality-deletes") === JString("3"))
    assert((snaps(2) \ "summary" \ "total-delete-files") === JString("3"))
    // the unpartitioned spec-1 global delete files ride is present
    val specs = (meta \ "partition-specs").asInstanceOf[JArray].arr
    assert(specs.exists(s => (s \ "spec-id") === JInt(1) &&
      (s \ "fields").asInstanceOf[JArray].arr.isEmpty))
  }

  test("writeTableMetadata lays out metadata/v1.metadata.json + version-hint") {
    val events = fixtureTables().find(_.fullName == "ANALYTICS.EVENTS").get
    val dir: JPath = Files.createTempDirectory("iceberg-meta")
    try {
      IcebergMetadata.writeTableMetadata(events, dir.toString)
      val metaFile = dir.resolve("metadata/v1.metadata.json")
      val hint = dir.resolve("metadata/version-hint.text")
      assert(Files.exists(metaFile) && Files.exists(hint))
      assert(new String(Files.readAllBytes(hint), "UTF-8") === "1\n")
      val meta = JsonMethods.parse(new String(Files.readAllBytes(metaFile), "UTF-8"))
      assert((meta \ "location").asInstanceOf[JString].s === dir.toString)
      assert(metaFields(meta).size === events.columns.size)
    } finally {
      import scala.jdk.CollectionConverters._
      Files.walk(dir).iterator().asScala.toSeq.reverse.foreach(Files.delete)
    }
  }
}
