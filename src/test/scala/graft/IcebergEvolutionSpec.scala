package graft

import org.apache.spark.sql.SparkSession
import org.json4s._
import org.json4s.jackson.JsonMethods
import org.scalatest.funsuite.AnyFunSuite

import graft.api.SchemaTranslator
import graft.model.Db2Column
import graft.parse.Db2Parser
import graft.sources.{IcebergEvolution, IcebergSnapshot}

/** Schema evolution against the v2 writer: add / rename / drop column
  * as metadata-only commits, with reads resolving BY FIELD ID across
  * files written under different schema versions — the property a real
  * Iceberg reader provides and the reason renames don't rewrite data.
  * The structural validator runs after every step. */
class IcebergEvolutionSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("iceberg-evolution-spec")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def currentMeta(out: String): JValue = {
    val v = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(out, "metadata", "version-hint.text")), "UTF-8").trim.toInt
    JsonMethods.parse(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(out, "metadata", s"v$v.metadata.json")), "UTF-8"))
  }

  private def metaInt(m: JValue, field: String): Int =
    (m \ field).asInstanceOf[JInt].num.toInt

  test("add → append → rename → drop: id-based reads span schema versions, " +
      "metadata keeps every schema, refusals guard spec invariants") {
    import spark.implicits._
    val t0 = Db2Parser.parse(
      """CREATE TABLE S.EVO (
        |  K BIGINT NOT NULL,
        |  V VARCHAR(10),
        |  N INTEGER
        |) PARTITION BY RANGE (V);""".stripMargin).tables.head
    val out = java.nio.file.Files.createTempDirectory("iceberg_evo").toString

    // snapshot 1 under schema 0
    SchemaTranslator.migrateTable(
      Seq((1L, "a", 10), (2L, "b", 20)).toDF("K", "V", "N"), t0, out)
    IcebergV2Validation.validateV2(currentMeta(out), expectSnapshot = true)

    // ---- ADD COLUMN M (metadata-only commit) ----
    val t1 = IcebergEvolution.commitEvolution(
      IcebergEvolution.addColumn(t0, Db2Column("M", "INTEGER")), out)
    val m1 = currentMeta(out)
    IcebergV2Validation.validateV2(m1, expectSnapshot = true)
    assert(metaInt(m1, "current-schema-id") === 1)
    assert(metaInt(m1, "last-column-id") === 4)
    assert((m1 \ "schemas").asInstanceOf[JArray].arr.size === 2,
      "both schema versions stay listed")

    // append rows that HAVE the new column
    SchemaTranslator.appendIncrement(
      Seq((3L, "a", 30, 300), (4L, "c", 40, 400)).toDF("K", "V", "N", "M"),
      t1, out)
    IcebergV2Validation.validateV2(currentMeta(out), expectSnapshot = true)
    val afterAdd = IcebergSnapshot.readSnapshot(spark, out, t1)
      .select("K", "V", "N", "M").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2),
        if (r.isNullAt(3)) None else Some(r.getInt(3)))).toSet
    assert(afterAdd === Set(
      (1L, "a", 10, None), (2L, "b", 20, None), // pre-ADD files null-fill
      (3L, "a", 30, Some(300)), (4L, "c", 40, Some(400))))

    // ---- RENAME N → QTY: old files must resolve BY ID ----
    val t2 = IcebergEvolution.commitEvolution(
      IcebergEvolution.renameColumn(t1, "N", "QTY"), out)
    val m2 = currentMeta(out)
    IcebergV2Validation.validateV2(m2, expectSnapshot = true)
    assert(metaInt(m2, "current-schema-id") === 2)
    assert(metaInt(m2, "last-column-id") === 4, "rename burns no new id")
    val afterRename = IcebergSnapshot.readSnapshot(spark, out, t2)
      .select("K", "QTY").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(afterRename === Map(1L -> 10, 2L -> 20, 3L -> 30, 4L -> 40),
      "files written before the rename must resolve through the field id")

    // appends under the new name keep working
    SchemaTranslator.appendIncrement(
      Seq((5L, "b", 50, 500)).toDF("K", "V", "QTY", "M"), t2, out)
    assert(IcebergSnapshot.readSnapshot(spark, out, t2)
      .select("K", "QTY").collect().map(r => r.getLong(0) -> r.getInt(1))
      .toMap === Map(1L -> 10, 2L -> 20, 3L -> 30, 4L -> 40, 5L -> 50))

    // time travel to snapshot 1 still reads (current schema's names)
    val chain = (currentMeta(out) \ "snapshots").asInstanceOf[JArray].arr
      .map(s => (s \ "snapshot-id").asInstanceOf[JInt].num.toLong)
    val tt = IcebergSnapshot.readSnapshot(spark, out, t2, Some(chain.head))
      .select("K", "QTY").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(tt === Map(1L -> 10, 2L -> 20))
    // each snapshot records the schema it committed under
    val snapSchemaIds = (currentMeta(out) \ "snapshots").asInstanceOf[JArray].arr
      .map(s => (s \ "schema-id").asInstanceOf[JInt].num.toInt)
    assert(snapSchemaIds === List(0, 1, 2))

    // ---- DROP M ----
    val t3 = IcebergEvolution.commitEvolution(
      IcebergEvolution.dropColumn(t2, "M"), out)
    val m3 = currentMeta(out)
    IcebergV2Validation.validateV2(m3, expectSnapshot = true)
    assert(metaInt(m3, "current-schema-id") === 3)
    assert(metaInt(m3, "last-column-id") === 4, "dropped ids stay burned")
    assert((m3 \ "schemas").asInstanceOf[JArray].arr.size === 4)
    val afterDrop = IcebergSnapshot.readSnapshot(spark, out, t3)
    assert(!afterDrop.columns.contains("M"))
    assert(afterDrop.select("K", "QTY").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
      === Map(1L -> 10, 2L -> 20, 3L -> 30, 4L -> 40, 5L -> 50))

    // a column re-added after a drop gets a FRESH id (no reuse)
    val t4 = IcebergEvolution.addColumn(t3, Db2Column("M", "INTEGER"))
    assert(t4.columns.find(_.name == "M").flatMap(_.fieldId) === Some(5))

    // ---- refusals ----
    intercept[IllegalArgumentException] { // added columns must be nullable
      IcebergEvolution.addColumn(t3, Db2Column("X", "INTEGER", nullable = false))
    }
    intercept[IllegalArgumentException] { // partition source column
      IcebergEvolution.renameColumn(t3, "V", "V2")
    }
    intercept[IllegalArgumentException] {
      IcebergEvolution.dropColumn(t3, "V")
    }
    intercept[IllegalArgumentException] { // duplicate name
      IcebergEvolution.addColumn(t3, Db2Column("QTY", "INTEGER"))
    }
  }

  test("evolution composes with row-level deletes and compaction: files a " +
      "compaction rewrites keep resolving by id through later renames") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    import graft.sources.IcebergDeletes
    val t0 = Db2Parser.parse(
      """CREATE TABLE S.EVC (
        |  K BIGINT NOT NULL,
        |  V VARCHAR(10),
        |  N INTEGER
        |) PARTITION BY RANGE (V);""".stripMargin).tables.head
    val out = java.nio.file.Files.createTempDirectory("iceberg_evc").toString
    SchemaTranslator.migrateTable(
      (1L to 6L).map(k => (k, s"p${k % 2}", k.toInt * 10)).toDF("K", "V", "N"),
      t0, out)
    // rename N→QTY, then upsert + delete UNDER THE EVOLVED SCHEMA
    val t1 = IcebergEvolution.commitEvolution(
      IcebergEvolution.renameColumn(t0, "N", "QTY"), out)
    SchemaTranslator.mergeUpsert(
      Seq((2L, "p0", 999), (7L, "p1", 70)).toDF("K", "V", "QTY"),
      t1, out, keyCols = Seq("K"))
    IcebergDeletes.commitPositionDeletes(spark, t1, out, col("K") === 5L)
    def read(t: graft.model.TableDef, qtyName: String) =
      IcebergSnapshot.readSnapshot(spark, out, t)
        .select(col("K"), col(qtyName)).collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val want = Map(1L -> 10, 2L -> 999, 3L -> 30, 4L -> 40, 6L -> 60, 7L -> 70)
    assert(read(t1, "QTY") === want)
    // compaction folds the deletes in and REWRITES files; the
    // rewritten files must still carry field ids…
    IcebergDeletes.compactWithDeletes(spark, t1, out)
    IcebergV2Validation.validateV2(currentMeta(out), expectSnapshot = true)
    assert(read(t1, "QTY") === want, "compaction changed the evolved read")
    // …which a FURTHER rename proves: QTY→AMOUNT resolves the
    // compaction-written files by id, not name
    val t2 = IcebergEvolution.commitEvolution(
      IcebergEvolution.renameColumn(t1, "QTY", "AMOUNT"), out)
    assert(read(t2, "AMOUNT") === want,
      "compaction-rewritten files must resolve through the next rename")
    // PLAIN compaction (inferred-schema read of the evolved files)
    // must also preserve ids: compact, then rename once more
    IcebergSnapshot.compactDataFiles(spark, t2, out, 1L << 30)
    assert(read(t2, "AMOUNT") === want)
    val t3 = IcebergEvolution.commitEvolution(
      IcebergEvolution.renameColumn(t2, "AMOUNT", "AMT"), out)
    assert(read(t3, "AMT") === want,
      "plain-compaction files must resolve through a further rename")
  }

  test("snapshot refs: tags pin snapshots through expiry, read by name, " +
      "and release on drop") {
    import spark.implicits._
    val t0 = Db2Parser.parse(
      "CREATE TABLE S.REFS (K BIGINT NOT NULL, N INTEGER);").tables.head
    val out = java.nio.file.Files.createTempDirectory("iceberg_refs").toString
    SchemaTranslator.migrateTable(
      Seq((1L, 10), (2L, 20)).toDF("K", "N"), t0, out)
    SchemaTranslator.appendIncrement(Seq((3L, 30)).toDF("K", "N"), t0, out)
    SchemaTranslator.appendIncrement(Seq((4L, 40)).toDF("K", "N"), t0, out)
    def ids = (currentMeta(out) \ "snapshots").asInstanceOf[JArray].arr
      .map(s => (s \ "snapshot-id").asInstanceOf[JInt].num.toLong)
    val first = ids.head
    val conf = spark.sparkContext.hadoopConfiguration
    // tag snapshot 1, then expire keeping only the last: the tagged
    // snapshot SURVIVES and still reads — by id and by name
    IcebergSnapshot.createRef(t0, out, "baseline", first, "tag", conf)
    IcebergV2Validation.validateV2(currentMeta(out), expectSnapshot = true)
    assert(IcebergSnapshot.listRefs(out, conf) ===
      Seq(("baseline", first, "tag")))
    IcebergSnapshot.expireSnapshots(t0, out, keepLast = 1, conf)
    assert(ids.contains(first), "tagged snapshot must survive expiry")
    assert(ids.size === 2) // the tag + the current head
    IcebergV2Validation.validateV2(currentMeta(out), expectSnapshot = true)
    val byRef = IcebergSnapshot.readSnapshotAtRef(spark, out, t0, "baseline")
      .select("K", "N").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(byRef === Map(1L -> 10, 2L -> 20))
    // refs survive ordinary commits
    SchemaTranslator.appendIncrement(Seq((5L, 50)).toDF("K", "N"), t0, out)
    assert(IcebergSnapshot.listRefs(out, conf).map(_._1) === Seq("baseline"))
    // dropping the tag releases the snapshot: the next expiry
    // physically deletes what only it reached
    IcebergSnapshot.dropRef(t0, out, "baseline", conf)
    assert(IcebergSnapshot.listRefs(out, conf).isEmpty)
    val (_, deleted) = IcebergSnapshot.expireSnapshots(t0, out, 1, conf)
    assert(!ids.contains(first), "dropped tag must expire")
    assert(deleted.nonEmpty)
    intercept[Exception] {
      IcebergSnapshot.readSnapshotAtRef(spark, out, t0, "baseline")
    }
    // guard rails
    intercept[IllegalArgumentException] {
      IcebergSnapshot.createRef(t0, out, "main", ids.last, "tag", conf)
    }
    intercept[IllegalArgumentException] {
      IcebergSnapshot.createRef(t0, out, "x", 123456L, "tag", conf)
    }
  }

  test("type promotion: int→long widens in place — files written as int32 " +
      "read back through the widened schema; illegal changes refuse") {
    import spark.implicits._
    val t0 = Db2Parser.parse(
      """CREATE TABLE S.WIDE (
        |  K BIGINT NOT NULL,
        |  N INTEGER,
        |  R REAL
        |);""".stripMargin).tables.head
    val out = java.nio.file.Files.createTempDirectory("iceberg_wide").toString
    SchemaTranslator.migrateTable(
      Seq((1L, 10, 1.5f), (2L, 20, 2.5f)).toDF("K", "N", "R"), t0, out)

    // promote N int→long and R float→double in two evolution commits
    val t1 = IcebergEvolution.commitEvolution(
      IcebergEvolution.promoteColumn(t0, "N", "BIGINT"), out)
    val t2 = IcebergEvolution.commitEvolution(
      IcebergEvolution.promoteColumn(t1, "R", "DOUBLE"), out)
    IcebergV2Validation.validateV2(currentMeta(out), expectSnapshot = true)
    assert(metaInt(currentMeta(out), "current-schema-id") === 2)
    assert(metaInt(currentMeta(out), "last-column-id") === 3,
      "promotion burns no new ids")

    // the int32/float files read back under the widened schema
    val widened = IcebergSnapshot.readSnapshot(spark, out, t2)
      .select("K", "N", "R").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(widened === Set((1L, 10L, 1.5), (2L, 20L, 2.5)))

    // appends under the widened schema coexist with the narrow files
    SchemaTranslator.appendIncrement(
      Seq((3L, 5000000000L, 3.25)).toDF("K", "N", "R"), t2, out)
    val mixed = IcebergSnapshot.readSnapshot(spark, out, t2)
      .select("K", "N", "R").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(mixed === Set((1L, 10L, 1.5), (2L, 20L, 2.5),
      (3L, 5000000000L, 3.25)))

    // refusals: narrowing, cross-family, decimal scale change
    intercept[IllegalArgumentException] {
      IcebergEvolution.promoteColumn(t2, "N", "INTEGER") // narrow
    }
    intercept[IllegalArgumentException] {
      IcebergEvolution.promoteColumn(t2, "K", "DOUBLE") // cross-family
    }
    // decimal widening is legal, scale change is not
    val td = Db2Parser.parse(
      "CREATE TABLE S.D (A DECIMAL(5,2), B BIGINT);").tables.head
    val wide = IcebergEvolution.promoteColumn(td, "A", "DECIMAL",
      precision = Some(10), scale = Some(2))
    assert(wide.columns.head.precision === Some(10))
    intercept[IllegalArgumentException] {
      IcebergEvolution.promoteColumn(td, "A", "DECIMAL",
        precision = Some(10), scale = Some(4))
    }
  }
}
