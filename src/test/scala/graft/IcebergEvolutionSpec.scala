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

  test("partition-spec evolution: add/drop/rename/re-add are metadata-only " +
      "commits; old files keep their spec and reads plan across specs; " +
      "field ids recycle; compaction migrates to the default spec") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    import graft.sources.IcebergDeletes
    val t0 = Db2Parser.parse(
      """CREATE TABLE S.SPE (
        |  K BIGINT NOT NULL,
        |  V VARCHAR(10),
        |  N INTEGER
        |) PARTITION BY RANGE (V);""".stripMargin).tables.head
    val out = java.nio.file.Files.createTempDirectory("iceberg_spe").toString

    // snapshot 1 under the original identity(V) spec 0
    SchemaTranslator.migrateTable(
      Seq((1L, "a", 10), (2L, "b", 20)).toDF("K", "V", "N"), t0, out)
    IcebergV2Validation.validateV2(currentMeta(out), expectSnapshot = true)

    def readAll(t: graft.model.TableDef): Set[(Long, String, Int)] =
      IcebergSnapshot.readSnapshot(spark, out, t)
        .select(col("K"), col("V"), col("N")).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet

    // ---- ADD bucket[16](K): spec 2 becomes the default ----
    val t1 = IcebergEvolution.commitEvolution(
      IcebergEvolution.addPartitionField(t0, "K", "bucket[16]"), out)
    val m1 = currentMeta(out)
    IcebergV2Validation.validateV2(m1, expectSnapshot = true)
    assert(metaInt(m1, "default-spec-id") === 2)
    assert(metaInt(m1, "last-partition-id") === 1001)
    assert((m1 \ "partition-specs").asInstanceOf[JArray].arr.size === 3,
      "spec 0, spec 2 and the reserved unpartitioned spec 1 all stay listed")
    // appends land under spec 2 (V and K_bucket both dir-encoded);
    // spec-0 files read alongside them
    SchemaTranslator.appendIncrement(
      Seq((3L, "a", 30), (4L, "c", 40)).toDF("K", "V", "N"), t1, out)
    IcebergV2Validation.validateV2(currentMeta(out), expectSnapshot = true)
    assert(readAll(t1) === Set(
      (1L, "a", 10), (2L, "b", 20), (3L, "a", 30), (4L, "c", 40)),
      "identity values must restore across BOTH specs")

    // time travel to snapshot 1 (pure spec-0 world) still reads
    val chain1 = (currentMeta(out) \ "snapshots").asInstanceOf[JArray].arr
      .map(s => (s \ "snapshot-id").asInstanceOf[JInt].num.toLong)
    assert(IcebergSnapshot.readSnapshot(spark, out, t1, Some(chain1.head))
      .select("K").collect().map(_.getLong(0)).toSet === Set(1L, 2L))

    // ---- DROP the identity V field: spec 3 = bucket(K) only ----
    val t2 = IcebergEvolution.commitEvolution(
      IcebergEvolution.dropPartitionField(t1, "V"), out)
    assert(metaInt(currentMeta(out), "default-spec-id") === 3)
    // new files carry V PHYSICALLY (no longer dir-encoded)
    SchemaTranslator.appendIncrement(
      Seq((5L, "b", 50)).toDF("K", "V", "N"), t2, out)
    IcebergV2Validation.validateV2(currentMeta(out), expectSnapshot = true)
    assert(readAll(t2) === Set(
      (1L, "a", 10), (2L, "b", 20), (3L, "a", 30), (4L, "c", 40),
      (5L, "b", 50)), "V must read from dirs (specs 0/2) AND files (spec 3)")

    // ---- RE-ADD identity V: the field id RECYCLES (spec rule) ----
    val t3 = IcebergEvolution.commitEvolution(
      IcebergEvolution.addPartitionField(t2, "V"), out)
    val reAdded = graft.sources.IcebergMetadata
      .specFieldDefs(t3, t3.defaultSpecId).find(_.name == "V").get
    assert(reAdded.fieldId === 1000,
      "re-added (source, transform) must resurface under its original id")
    assert(metaInt(currentMeta(out), "last-partition-id") === 1001,
      "recycling burns no new partition field id")
    SchemaTranslator.appendIncrement(
      Seq((6L, "c", 60)).toDF("K", "V", "N"), t3, out)
    assert(readAll(t3).size === 6)

    // ---- RENAME the identity field: dir name changes, column stays
    // physical in new files, field id retained ----
    val t4 = IcebergEvolution.commitEvolution(
      IcebergEvolution.renamePartitionField(t3, "V", "V_PART"), out)
    val renamed = graft.sources.IcebergMetadata
      .specFieldDefs(t4, t4.defaultSpecId).find(_.name == "V_PART").get
    assert(renamed.fieldId === 1000, "rename keeps the field id")
    SchemaTranslator.appendIncrement(
      Seq((7L, "d", 70)).toDF("K", "V", "N"), t4, out)
    IcebergV2Validation.validateV2(currentMeta(out), expectSnapshot = true)
    assert(readAll(t4) === Set(
      (1L, "a", 10), (2L, "b", 20), (3L, "a", 30), (4L, "c", 40),
      (5L, "b", 50), (6L, "c", 60), (7L, "d", 70)))

    // ---- row-level deletes compose: position delete across specs ----
    IcebergDeletes.commitPositionDeletes(spark, t4, out, col("K") === 4L)
    assert(readAll(t4).map(_._1) === Set(1L, 2L, 3L, 5L, 6L, 7L))

    // ---- compactWithDeletes migrates every live row to the default
    // spec; reads and another append still work after ----
    IcebergDeletes.compactWithDeletes(spark, t4, out)
    IcebergV2Validation.validateV2(currentMeta(out), expectSnapshot = true)
    assert(readAll(t4).map(_._1) === Set(1L, 2L, 3L, 5L, 6L, 7L))
    val listPath = (((currentMeta(out) \ "snapshots").asInstanceOf[JArray]
      .arr.last) \ "manifest-list").asInstanceOf[JString].s
    val postList = {
      val in = new org.apache.avro.mapred.FsInput(
        new org.apache.hadoop.fs.Path(listPath),
        spark.sparkContext.hadoopConfiguration)
      val rd = org.apache.avro.file.DataFileReader.openReader(in,
        new org.apache.avro.generic.GenericDatumReader[
          org.apache.avro.generic.GenericRecord]())
      try {
        val buf = scala.collection.mutable.ArrayBuffer
          .empty[org.apache.avro.generic.GenericRecord]
        while (rd.hasNext) buf += rd.next()
        buf.toSeq
      } finally rd.close()
    }
    val addedSpecs = postList
      .filter(_.get("content").asInstanceOf[Int] == 0)
      .filter(_.get("added_files_count").asInstanceOf[Int] > 0)
      .map(_.get("partition_spec_id").asInstanceOf[Int]).toSet
    assert(addedSpecs === Set(t4.defaultSpecId),
      "the rewrite must stamp every added file with the default spec")
    SchemaTranslator.appendIncrement(
      Seq((8L, "a", 80)).toDF("K", "V", "N"), t4, out)
    assert(readAll(t4).map(_._1) === Set(1L, 2L, 3L, 5L, 6L, 7L, 8L))

    // ---- refusals ----
    intercept[IllegalArgumentException] {
      IcebergEvolution.addPartitionField(t4, "NOPE")
    }
    intercept[IllegalArgumentException] { // already partitioned this way
      IcebergEvolution.addPartitionField(t4, "K", "bucket[16]")
    }
    intercept[IllegalArgumentException] {
      IcebergEvolution.dropPartitionField(t4, "GHOST")
    }
    intercept[IllegalArgumentException] {
      IcebergEvolution.renamePartitionField(t4, "GHOST", "X")
    }
    intercept[IllegalArgumentException] { // unknown transform
      IcebergEvolution.addPartitionField(t4, "N", "zorder")
    }
    intercept[IllegalArgumentException] { // zero-width truncate
      IcebergEvolution.addPartitionField(t4, "N", "truncate[0]")
    }
    intercept[IllegalArgumentException] { // illegal bucket source type
      val tf = Db2Parser.parse(
        """CREATE TABLE S.FLT (K BIGINT NOT NULL, F REAL);""")
        .tables.head
      IcebergEvolution.addPartitionField(tf, "F", "bucket[16]")
    }
    intercept[IllegalArgumentException] { // spec source columns protected
      IcebergEvolution.dropColumn(t4, "K")
    }
    // a generated partition field name that shadows a REAL schema
    // column refuses (the writer's withColumn would silently replace
    // the data column and then drop it from the files — data loss)
    val tc = Db2Parser.parse(
      """CREATE TABLE S.COLL (
        |  K BIGINT NOT NULL,
        |  TS TIMESTAMP,
        |  TS_DAY VARCHAR(10)
        |);""".stripMargin).tables.head
    val ec = intercept[IllegalArgumentException] {
      IcebergEvolution.addPartitionField(tc, "TS", "day")
    }
    assert(ec.getMessage.contains("collides"))
    val ec2 = intercept[IllegalArgumentException] {
      IcebergEvolution.initialSpec(tc, Seq(("TS", "day")))
    }
    assert(ec2.getMessage.contains("collides"))
    // the identity exemption: partitioning BY the column itself is fine
    IcebergEvolution.initialSpec(tc, Seq(("TS_DAY", "identity")))
    ()
  }

  test("a BIGINT/DATE identity partition column that evolves to PHYSICAL " +
      "keeps its declared type across the cross-spec union (restored " +
      "values cast to declared, not string-promoted)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types.{DateType, LongType}
    import graft.sources.IcebergDeletes
    // ---- BIGINT identity partition ----
    val t0 = Db2Parser.parse(
      """CREATE TABLE S.BIGP (
        |  K BIGINT NOT NULL,
        |  V VARCHAR(10)
        |) PARTITION BY RANGE (K);""".stripMargin).tables.head
    val out = java.nio.file.Files.createTempDirectory("iceberg_bigp").toString
    SchemaTranslator.migrateTable(
      Seq((1L, "a"), (2L, "b")).toDF("K", "V"), t0, out)
    // drop the sole identity field: later appends carry K PHYSICALLY
    // (int64 in-file) while spec-0 files restore it from manifests
    val t1 = IcebergEvolution.commitEvolution(
      IcebergEvolution.dropPartitionField(
        IcebergEvolution.withExplicitSpecs(t0), "K"), out)
    SchemaTranslator.appendIncrement(
      Seq((3L, "c"), (4L, "d")).toDF("K", "V"), t1, out)
    val df = IcebergSnapshot.readSnapshot(spark, out, t1)
    assert(df.schema("K").dataType === LongType,
      "the cross-spec union must surface the DECLARED bigint, not the " +
        "string the dir-restored group would promote the column to")
    assert(df.select(col("K"), col("V")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
      === Set((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")))
    // a typed predicate lands on BOTH groups (restored and physical)
    IcebergDeletes.commitPositionDeletes(spark, t1, out, col("K") % 2 === 0)
    assert(IcebergSnapshot.readSnapshot(spark, out, t1)
      .select("K").collect().map(_.getLong(0)).toSet === Set(1L, 3L))
    IcebergV2Validation.validateV2(currentMeta(out), expectSnapshot = true)

    // ---- DATE identity partition: restored epoch-day surface casts
    // back to a date column ----
    val d0 = Db2Parser.parse(
      """CREATE TABLE S.DATP (
        |  K BIGINT NOT NULL,
        |  D DATE
        |) PARTITION BY RANGE (D);""".stripMargin).tables.head
    val dOut = java.nio.file.Files.createTempDirectory("iceberg_datp").toString
    def d(s: String) = java.sql.Date.valueOf(s)
    SchemaTranslator.migrateTable(
      Seq((1L, d("2024-01-01")), (2L, d("2024-02-03"))).toDF("K", "D"),
      d0, dOut)
    val d1 = IcebergEvolution.commitEvolution(
      IcebergEvolution.dropPartitionField(
        IcebergEvolution.withExplicitSpecs(d0), "D"), dOut)
    SchemaTranslator.appendIncrement(
      Seq((3L, d("2024-03-05"))).toDF("K", "D"), d1, dOut)
    val dDf = IcebergSnapshot.readSnapshot(spark, dOut, d1)
    assert(dDf.schema("D").dataType === DateType)
    assert(dDf.select(col("K"), col("D")).collect()
      .map(r => (r.getLong(0), r.getDate(1).toString)).toSet
      === Set((1L, "2024-01-01"), (2L, "2024-02-03"), (3L, "2024-03-05")))
  }

  test("position deletes resolve RENAMED columns by field id: a predicate " +
      "over the current name must hit rows in PRE-rename files instead of " +
      "null-filling and silently skipping them") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    import graft.sources.IcebergDeletes
    val t0 = Db2Parser.parse(
      """CREATE TABLE S.RDEL (
        |  K BIGINT NOT NULL,
        |  V VARCHAR(10),
        |  N INTEGER
        |) PARTITION BY RANGE (V);""".stripMargin).tables.head
    val out = java.nio.file.Files.createTempDirectory("iceberg_rdel").toString
    // snapshot 1's files carry the column under its OLD physical name
    SchemaTranslator.migrateTable(
      Seq((1L, "a", 10), (2L, "b", 20)).toDF("K", "V", "N"), t0, out)
    val t1 = IcebergEvolution.commitEvolution(
      IcebergEvolution.renameColumn(t0, "N", "N2"), out)
    SchemaTranslator.appendIncrement(
      Seq((3L, "c", 30)).toDF("K", "V", "N2"), t1, out)
    // the delete predicate references the CURRENT name; rows 1 and 2
    // live in pre-rename files — an inference read would surface their
    // column as "N", null-fill "N2" and skip them
    IcebergDeletes.commitPositionDeletes(spark, t1, out, col("N2") <= 20)
    assert(IcebergSnapshot.readSnapshot(spark, out, t1)
      .select("K").collect().map(_.getLong(0)).toSet === Set(3L),
      "rows matching through their renamed column must be deleted")
    IcebergV2Validation.validateV2(currentMeta(out), expectSnapshot = true)
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

  test("inspection tables: snapshots/history/refs/files/partitions read the " +
      "writer's own metadata through a migrate→append→tag→delete→compact " +
      "chain; file stats cross-check the independent Avro reader") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    import graft.sources.{IcebergDeletes, IcebergInspect}
    val t0 = Db2Parser.parse(
      """CREATE TABLE S.INSP (
        |  K BIGINT NOT NULL,
        |  V VARCHAR(10),
        |  N INTEGER
        |) PARTITION BY RANGE (V);""".stripMargin).tables.head
    val out = java.nio.file.Files.createTempDirectory("iceberg_insp").toString
    SchemaTranslator.migrateTable(
      Seq((1L, "a", 10), (2L, "b", 20), (3L, "a", 30)).toDF("K", "V", "N"),
      t0, out)
    SchemaTranslator.appendIncrement(
      Seq((4L, "c", 40), (5L, "a", 50)).toDF("K", "V", "N"), t0, out)
    val conf = spark.sparkContext.hadoopConfiguration
    val idsAfterAppend = (currentMeta(out) \ "snapshots")
      .asInstanceOf[JArray].arr
      .map(s => (s \ "snapshot-id").asInstanceOf[JInt].num.toLong)
    IcebergSnapshot.createRef(t0, out, "rel1", idsAfterAppend.last, "tag", conf)
    IcebergDeletes.commitPositionDeletes(spark, t0, out, col("K") === 2L)
    IcebergDeletes.compactWithDeletes(spark, t0, out)

    // ---- snapshots: one row per commit, operations in order, parent
    // chain linked, summary carries the spec's counters ----
    val snaps = IcebergInspect.snapshotsTable(spark, out)
      .orderBy("snapshot_id").collect()
      .sortBy(_.getAs[java.sql.Timestamp]("committed_at").getTime)
    val chain = parseChainOps(out)
    assert(snaps.length === 4)
    assert(chain.map(_._2) === Seq("append", "append", "delete", "replace"))
    val byId = snaps.map(r => r.getAs[Long]("snapshot_id") -> r).toMap
    for (((id, op), i) <- chain.zipWithIndex) {
      val r = byId(id)
      assert(r.getAs[String]("operation") === op)
      val expectedParent = if (i == 0) None else Some(chain(i - 1)._1)
      assert(Option(r.getAs[java.lang.Long]("parent_id")).map(_.toLong)
        === expectedParent, s"parent of $op")
      assert(r.getAs[Map[String, String]]("summary")
        .contains("total-records"))
    }
    assert(byId(chain.last._1).getAs[Map[String, String]]("summary")(
      "total-records") === "4") // 5 appended − 1 deleted

    // ---- history: every retained entry is a current ancestor (main
    // only moves forward), timestamps non-decreasing ----
    val hist = IcebergInspect.historyTable(spark, out).collect()
    assert(hist.length === 4)
    assert(hist.forall(_.getAs[Boolean]("is_current_ancestor")))
    assert(hist.map(_.getAs[Long]("snapshot_id")).toSeq === chain.map(_._1))

    // ---- refs: main tracks the head, the tag pins its snapshot ----
    val refs = IcebergInspect.refsTable(spark, out).collect()
      .map(r => r.getString(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(refs("main") === (("branch", chain.last._1)))
    assert(refs("rel1") === (("tag", idsAfterAppend.last)))

    // ---- files at the DELETE snapshot: data files + ONE position
    // delete file carrying exactly the matched row ----
    val delSnapId = chain(2)._1
    val filesAtDelete = IcebergInspect.filesTable(spark, out, t0,
      Some(delSnapId)).collect()
    val posDeletes = filesAtDelete.filter(_.getAs[Int]("content") == 1)
    assert(posDeletes.length === 1)
    assert(posDeletes.head.getAs[Long]("record_count") === 1L)
    assert(filesAtDelete.filter(_.getAs[Int]("content") == 0)
      .map(_.getAs[Long]("record_count")).sum === 5L)

    // ---- files at HEAD (post-compaction): deletes folded in, live
    // record mass equals what readSnapshot actually returns ----
    val files = IcebergInspect.filesTable(spark, out, t0).collect()
    assert(files.forall(_.getAs[Int]("content") == 0),
      "compactWithDeletes must fold every delete file away")
    assert(files.map(_.getAs[Long]("record_count")).sum
      === IcebergSnapshot.readSnapshot(spark, out, t0).count())
    // partition tuples surface under the spec's field name
    assert(files.forall(r =>
      r.getAs[Map[String, String]]("partition").keySet === Set("V")))

    // ---- partitions: per-V rollup matches the model (K=2 under V=b
    // deleted; a: rows 1,3,5; c: row 4) ----
    val parts = IcebergInspect.partitionsTable(spark, out, t0).collect()
      .map(r => r.getAs[Map[String, String]]("partition")("V") ->
        ((r.getAs[Long]("record_count"), r.getAs[Long]("file_count"))))
      .toMap
    assert(parts("a")._1 === 3L && parts("c")._1 === 1L)
    assert(!parts.contains("b") || parts("b")._1 === 0L,
      "the fully-deleted partition must carry no live rows")

    // ---- independent Avro cross-check: read the HEAD manifest list
    // and its manifests directly; per-file record counts must equal
    // the files table row for row ----
    val listPath = byId(chain.last._1).getAs[String]("manifest_list")
    def avroRows(p: String): Seq[org.apache.avro.generic.GenericRecord] = {
      val in = new org.apache.avro.mapred.FsInput(
        new org.apache.hadoop.fs.Path(p), conf)
      val rd = org.apache.avro.file.DataFileReader.openReader(in,
        new org.apache.avro.generic.GenericDatumReader[
          org.apache.avro.generic.GenericRecord]())
      try {
        val buf = scala.collection.mutable.ArrayBuffer
          .empty[org.apache.avro.generic.GenericRecord]
        while (rd.hasNext) buf += rd.next()
        buf.toSeq
      } finally rd.close()
    }
    val avroFiles = avroRows(listPath)
      .filter(_.get("content").asInstanceOf[Int] == 0)
      .flatMap(m => avroRows(m.get("manifest_path").toString))
      .filter(_.get("status") != 2)
      .map(_.get("data_file").asInstanceOf[org.apache.avro.generic.GenericRecord])
      .map(df => df.get("file_path").toString ->
        df.get("record_count").asInstanceOf[Long]).toMap
    val tableFiles = files
      .map(r => r.getAs[String]("file_path") -> r.getAs[Long]("record_count"))
      .toMap
    assert(tableFiles === avroFiles,
      "files table must agree with the raw Avro manifests file-for-file")
  }

  private def parseChainOps(out: String): Seq[(Long, String)] =
    (currentMeta(out) \ "snapshots").asInstanceOf[JArray].arr.map { s =>
      ((s \ "snapshot-id").asInstanceOf[JInt].num.toLong,
        (s \ "summary" \ "operation").asInstanceOf[JString].s)
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
