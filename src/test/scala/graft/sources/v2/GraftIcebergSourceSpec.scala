package graft.sources.v2

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.api.SchemaTranslator
import graft.parse.Db2Parser
import graft.sources.{IcebergPruning, IcebergSnapshot, IcebergTableLoader}
import graft.sources.IcebergPruning.ColumnBound

/** The idiomatic DSv2 read face: `spark.read.format("graft-iceberg")`
  * with Catalyst filter pushdown driving file pruning. Pins:
  * file-list exactness (the DSv2 scan's kept set == the explicit
  * `readSnapshot(pruning=…)` plan for the same predicate), row
  * equality between both entry points, pushdown through snapshot-id /
  * ref time travel, nullness pushdown, column pruning, the loader's
  * type round-trip, and the filter translation table. */
class GraftIcebergSourceSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("graft-iceberg-dsv2-spec")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def hconf = spark.sparkContext.hadoopConfiguration

  private val table = Db2Parser.parse(
    """CREATE TABLE S.DSV2 (
      |  K BIGINT NOT NULL,
      |  V VARCHAR(10),
      |  N INTEGER
      |) PARTITION BY RANGE (V);""".stripMargin).tables.head

  private def rowsDf(rows: Seq[(Long, String, Integer)]) = {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("K", LongType, nullable = false),
      StructField("V", StringType), StructField("N", IntegerType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r =>
        org.apache.spark.sql.Row(r._1, r._2, r._3)), 2), schema)
  }

  private def mk(k: Long): (Long, String, Integer) =
    (k, s"p${k % 2}", Integer.valueOf((k * 7).toInt))

  /** migrate(1-5) → append(6-9) → append(10-12) → append(20-21 N-null),
    * then snapshot ids per commit for time travel. */
  private lazy val fixture: (String, Seq[Long]) = {
    val out = java.nio.file.Files.createTempDirectory("dsv2_fix").toString
    val ids = Seq.newBuilder[Long]
    SchemaTranslator.migrateTable(rowsDf((1L to 5L).map(mk)), table, out)
    ids += IcebergSnapshot.currentSnapshotId(out, hconf).get
    SchemaTranslator.appendIncrement(rowsDf((6L to 9L).map(mk)), table, out)
    ids += IcebergSnapshot.currentSnapshotId(out, hconf).get
    SchemaTranslator.appendIncrement(rowsDf((10L to 12L).map(mk)), table, out)
    ids += IcebergSnapshot.currentSnapshotId(out, hconf).get
    SchemaTranslator.appendIncrement(
      rowsDf(Seq((20L, "p0", null), (21L, "p1", null))), table, out)
    ids += IcebergSnapshot.currentSnapshotId(out, hconf).get
    (out, ids.result())
  }

  private def dsv2(path: String) =
    spark.read.format("graft-iceberg").load(path)

  private def keySet(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.select("K").collect().map(_.getLong(0)).toSet

  test("loader reconstructs the TableDef from metadata alone: types " +
      "round-trip, field ids and spec survive") {
    val (out, _) = fixture
    val loaded = IcebergTableLoader.load(out, hconf)
    assert(loaded.columns.map(_.name) === Seq("K", "V", "N"))
    for ((c, orig) <- loaded.columns.zip(table.columns)) {
      assert(IcebergPruning.icebergTypeOf(loaded, c.name) ===
        IcebergPruning.icebergTypeOf(table, c.name),
        s"${c.name} type must round-trip")
      assert(!c.nullable == !orig.nullable)
    }
    assert(loaded.fieldIdOf === table.fieldIdOf)
    // the derived spec-0 (identity on V) is recorded and reloads
    val sf = graft.sources.IcebergMetadata.specFieldDefs(loaded, 0)
    assert(sf.map(f => (f.name, f.transform)) === Seq(("V", "identity")))
    // declared Spark schema identical through both defs
    assert(SchemaTranslator.toSparkSchema(loaded) ===
      SchemaTranslator.toSparkSchema(table))
  }

  test("loader covers every loadable Iceberg type; timestamptz refuses") {
    val wide = Db2Parser.parse(
      """CREATE TABLE S.WIDE (
        |  A INTEGER, B BIGINT, C DOUBLE, D DATE, E BOOLEAN,
        |  F VARCHAR(40), G DECIMAL(12,2), H DECIMAL(20,4),
        |  T TIMESTAMP, R REAL
        |);""".stripMargin).tables.head
    val out = java.nio.file.Files.createTempDirectory("dsv2_wide").toString
    graft.sources.IcebergMetadata.writeTableMetadata(wide, out, hconf)
    val loaded = IcebergTableLoader.load(out, hconf)
    for (c <- wide.columns)
      assert(IcebergPruning.icebergTypeOf(loaded, c.name) ===
        IcebergPruning.icebergTypeOf(wide, c.name), s"${c.name}")
    val e = intercept[IllegalArgumentException] {
      IcebergTableLoader.columnOf("Z", "timestamptz", required = false, 1)
    }
    assert(e.getMessage.contains("no DB2 surface type"))
  }

  test("a plain .filter over the DSv2 relation prunes files EXACTLY " +
      "like the explicit pruning API, and rows agree") {
    val (out, _) = fixture
    GraftIcebergScans.clear()
    val df = dsv2(out).filter(col("V") === "p0" &&
      col("K") >= 6L && col("K") <= 9L)
    val got = keySet(df)
    // row equality with the explicit API
    val bounds = Seq(ColumnBound.eq("V", "p0"),
      ColumnBound("K", Some(6L), Some(9L)))
    val explicit = IcebergSnapshot.readSnapshot(spark, out, table,
      pruning = bounds)
    assert(got === keySet(explicit))
    assert(got === Set(6L, 8L))
    // file-list exactness: the DSv2 scan's kept set == planScan's
    val rep = GraftIcebergScans.lastReport.get
    val (kept, skipped) = IcebergPruning.planScan(hconf, out, table, bounds)
    assert(rep.keptFiles.toSet === kept.toSet)
    assert(rep.skippedFiles.toSet === skipped.toSet)
    assert(rep.skippedFiles.nonEmpty, "pruning must do real work")
    assert(rep.keptFiles.forall(_.contains("V=p0")))
    // and the pushdown is visible in the plan description
    assert(df.queryExecution.executedPlan.toString.contains("PushedFilters"))
  }

  test("IS NOT NULL / IS NULL pushdown prunes from null counts") {
    val (out, _) = fixture
    GraftIcebergScans.clear()
    assert(keySet(dsv2(out).filter(col("N").isNotNull)) ===
      (1L to 12L).toSet)
    val rep = GraftIcebergScans.lastReport.get
    assert(rep.skippedFiles.nonEmpty, "all-null-N increment must skip")
    GraftIcebergScans.clear()
    assert(keySet(dsv2(out).filter(col("N").isNull)) === Set(20L, 21L))
    assert(GraftIcebergScans.lastReport.get.skippedFiles.nonEmpty)
  }

  test("snapshot-id and ref options time-travel with pushdown intact") {
    val (out, ids) = fixture
    val atSecond = spark.read.format("graft-iceberg")
      .option("snapshot-id", ids(1).toString).load(out)
    assert(keySet(atSecond) === (1L to 9L).toSet)
    GraftIcebergScans.clear()
    assert(keySet(atSecond.filter(col("K") <= 5L)) === (1L to 5L).toSet)
    val rep = GraftIcebergScans.lastReport.get
    assert(rep.snapshotId === Some(ids(1)))
    assert(rep.skippedFiles.nonEmpty, "the 6-9 increment must be skipped")
    // ref addressing
    IcebergSnapshot.createRef(table, out, "audit", ids(2), "tag", hconf)
    val atRef = spark.read.format("graft-iceberg")
      .option("ref", "audit").load(out)
    assert(keySet(atRef) === (1L to 12L).toSet)
    val e = intercept[IllegalArgumentException] {
      spark.read.format("graft-iceberg").option("ref", "nope").load(out)
    }
    assert(e.getMessage.contains("no ref"))
  }

  test("column pruning reaches the scan; empty projections count rows") {
    val (out, _) = fixture
    val one = dsv2(out).select("N")
    assert(one.schema.fieldNames.toSeq === Seq("N"))
    assert(one.collect().length === 14)
    assert(dsv2(out).count() === 14L)
  }

  test("SQL over a temp view prunes too (the spark.sql path)") {
    val (out, _) = fixture
    dsv2(out).createOrReplaceTempView("dsv2_t")
    GraftIcebergScans.clear()
    val got = spark.sql(
      "SELECT K FROM dsv2_t WHERE V = 'p1' AND K IN (5, 7, 20)")
      .collect().map(_.getLong(0)).toSet
    assert(got === Set(5L, 7L))
    val rep = GraftIcebergScans.lastReport.get
    assert(rep.skippedFiles.nonEmpty)
    assert(rep.bounds.exists(_.values.isDefined), "IN must translate")
  }

  test("filter translation: supported shapes bound, unsupported fall " +
      "through untranslated (never wrong, only unpruned)") {
    import org.apache.spark.sql.sources._
    val t = table
    def tr(f: Filter) = GraftIcebergSource.translate(t, Seq(f))
    assert(tr(EqualTo("K", 5L)) === Seq(ColumnBound.eq("K", 5L)))
    // strict inequalities carry their strictness into the bound — the
    // day-boundary form `ts < d+1` must not keep the d+1 partition
    assert(tr(GreaterThan("K", 5L)) === Seq(ColumnBound.gt("K", 5L)))
    assert(tr(GreaterThanOrEqual("K", 5L)) ===
      Seq(ColumnBound("K", lower = Some(5L))))
    assert(tr(LessThan("K", 5L)) === Seq(ColumnBound.lt("K", 5L)))
    assert(tr(LessThanOrEqual("K", 5L)) ===
      Seq(ColumnBound("K", upper = Some(5L))))
    assert(tr(In("K", Array(1L, 2L))) ===
      Seq(ColumnBound.in("K", Seq(1L, 2L))))
    assert(tr(IsNull("N")) === Seq(ColumnBound.isNull("N")))
    assert(tr(IsNotNull("N")) === Seq(ColumnBound.notNull("N")))
    assert(tr(EqualNullSafe("V", null)) === Seq(ColumnBound.isNull("V")))
    assert(tr(And(EqualTo("V", "p0"), GreaterThan("K", 3L))).size === 2)
    // a prefix predicate is a string range [p, nextPrefix(p))
    assert(tr(StringStartsWith("V", "p0")) ===
      Seq(ColumnBound("V", Some("p0"), Some("p1"), upperExclusive = true)))
    assert(GraftIcebergSource.prefixUpper("a￿") === Some("b"))
    assert(GraftIcebergSource.prefixUpper("￿￿") === None)
    assert(tr(StringStartsWith("V", "￿")) ===
      Seq(ColumnBound("V", Some("￿"), None)))
    // unsupported: no bound, no throw
    assert(tr(Or(EqualTo("K", 1L), EqualTo("K", 2L))) === Nil)
    assert(tr(StringStartsWith("K", "1")) === Nil) // non-string column
    assert(tr(In("K", Array(1L, null))) === Nil)
    assert(tr(EqualTo("NOPE", 1)) === Nil)
  }

  test("StringStartsWith pushdown prunes partitions and rows agree") {
    val (out, _) = fixture
    GraftIcebergScans.clear()
    val got = dsv2(out).filter(col("V").startsWith("p1"))
      .collect().map(_.getLong(0)).toSet
    assert(got === Set(1L, 3L, 5L, 7L, 9L, 11L, 21L),
      "prefix rows must be exact")
    val rep = GraftIcebergScans.lastReport.get
    assert(rep.skippedFiles.nonEmpty, "the p0 partition files must skip")
    assert(rep.keptFiles.forall(_.contains("V=p1")))
  }

  test("batch WRITE face: overwrite bootstraps the table, append commits " +
      "increments, create-ddl bootstraps on first append, time travel " +
      "and pushdown read back through the same format") {
    val ddl =
      """CREATE TABLE S.DSV2 (
        |  K BIGINT NOT NULL,
        |  V VARCHAR(10),
        |  N INTEGER
        |) PARTITION BY RANGE (V);""".stripMargin
    val out = java.nio.file.Files.createTempDirectory("dsv2_write").toString

    // mode=overwrite on a fresh path = the full migration
    rowsDf((1L to 5L).map(mk)).write.format("graft-iceberg")
      .option("create-ddl", ddl).mode("overwrite").save(out)
    assert(keySet(dsv2(out)) === (1L to 5L).toSet)
    val snap1 = IcebergSnapshot.currentSnapshotId(out, hconf).get

    // append on the existing table: one parent-linked increment; the
    // create-ddl option is now ignored (metadata wins)
    rowsDf((6L to 9L).map(mk)).write.format("graft-iceberg")
      .mode("append").save(out)
    assert(keySet(dsv2(out)) === (1L to 9L).toSet)
    assert(keySet(spark.read.format("graft-iceberg")
      .option("snapshot-id", snap1.toString).load(out)) === (1L to 5L).toSet,
      "the pre-append snapshot still time-travels")

    // pushdown reads the written table like any other
    GraftIcebergScans.clear()
    assert(keySet(dsv2(out).filter(col("V") === "p1")) ===
      Set(1L, 3L, 5L, 7L, 9L))
    assert(GraftIcebergScans.lastReport.get.skippedFiles.nonEmpty)

    // append on an UNCREATED path bootstraps from create-ddl
    val out2 = java.nio.file.Files.createTempDirectory("dsv2_write2").toString
    rowsDf((1L to 3L).map(mk)).write.format("graft-iceberg")
      .option("create-ddl", ddl).mode("append").save(out2)
    assert(keySet(dsv2(out2)) === (1L to 3L).toSet)

    // no table, no ddl: loud
    val out3 = java.nio.file.Files.createTempDirectory("dsv2_write3").toString
    val e = intercept[Exception] {
      rowsDf(Seq(mk(1L))).write.format("graft-iceberg")
        .mode("append").save(out3)
    }
    assert(e.getMessage.contains("create-ddl") ||
      Option(e.getCause).exists(_.getMessage.contains("create-ddl")))

    // overwrite REPLACES: fresh chain, only the new rows
    rowsDf((100L to 101L).map(mk)).write.format("graft-iceberg")
      .mode("overwrite").save(out)
    assert(keySet(dsv2(out)) === Set(100L, 101L))
  }

  test("DSv2 read face composes with row-level deletes (merge-on-read)") {
    val (out0, _) = fixture
    // fresh table so the shared fixture stays pristine
    val out = java.nio.file.Files.createTempDirectory("dsv2_del").toString
    SchemaTranslator.migrateTable(rowsDf((1L to 8L).map(mk)), table, out)
    SchemaTranslator.mergeUpsert(
      rowsDf(Seq((3L, "p9", Integer.valueOf(999)))), table, out,
      keyCols = Seq("K"))
    assert(keySet(dsv2(out)) === (1L to 8L).toSet)
    assert(dsv2(out).filter(col("V") === "p9").collect()
      .map(_.getLong(0)).toSet === Set(3L))
    assert(out0.nonEmpty)
  }

  test("stream-sink lineage id is stable across checkpoint SPELLINGS " +
      "(trailing slash, explicit scheme) — a restart must not mint a " +
      "fresh exactly-once appId for the same checkpoint") {
    spark.sparkContext // ensure an active session for the FS lookup
    val dir = java.nio.file.Files.createTempDirectory("ckpt_spell").toString
    val base = GraftIcebergStreamSink.lineageIdFor(dir)
    assert(GraftIcebergStreamSink.lineageIdFor(dir + "/") === base,
      "trailing slash minted a new lineage")
    assert(GraftIcebergStreamSink.lineageIdFor("file:" + dir) === base,
      "explicit file: scheme minted a new lineage")
    assert(GraftIcebergStreamSink.lineageIdFor(dir + "//") === base,
      "doubled separator minted a new lineage")
    // a genuinely different checkpoint IS a different lineage
    assert(GraftIcebergStreamSink.lineageIdFor(dir + "_other") !== base)
  }
}
