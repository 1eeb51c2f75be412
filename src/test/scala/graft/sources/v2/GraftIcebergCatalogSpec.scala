package graft.sources.v2

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** The SQL-catalog face: CREATE / INSERT INTO / SELECT (with the same
  * file pruning every other face gets) / ALTER (add/rename/drop column
  * + properties, through the field-id evolution machinery) / DROP over
  * tables in the warehouse layout, plus the loud refusals (mixed
  * partition families, non-16 buckets, LTZ timestamps, column
  * type/comment changes, RENAME TABLE). */
class GraftIcebergCatalogSpec extends AnyFunSuite {

  private lazy val warehouse =
    java.nio.file.Files.createTempDirectory("graft_warehouse").toString

  // a DEDICATED session (create(), not getOrCreate): the untranslatable
  // DELETE leg needs the row-level rewrite, which is a BUILD-time
  // extension — inheriting whichever session an earlier suite left as
  // the JVM default made this suite's analyzer surface order-dependent
  private lazy val spark = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-iceberg-catalog-spec")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.catalog.graft",
        "graft.sources.v2.GraftIcebergCatalog")
      .config("spark.sql.catalog.graft.warehouse", warehouse)
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.api.GraftExtensions)
      .create()
    s.sql(s"CREATE NAMESPACE graft.db")
    s
  }

  test("CREATE TABLE / INSERT INTO / SELECT round-trips with file " +
      "pruning; a created table reads empty; increments time-travel") {
    spark.sql(
      """CREATE TABLE graft.db.orders (
        |  k BIGINT NOT NULL, status STRING, price DOUBLE
        |) PARTITIONED BY (status)""".stripMargin)
    assert(spark.sql("SELECT * FROM graft.db.orders").count() === 0L,
      "a freshly created table reads as zero rows")

    spark.sql(
      """INSERT INTO graft.db.orders VALUES
        |  (1, 'F', 10.5), (2, 'O', 20.5), (3, 'F', 30.5)""".stripMargin)
    spark.sql("INSERT INTO graft.db.orders VALUES (4, 'P', 40.5)")
    assert(spark.sql("SELECT sum(k) FROM graft.db.orders")
      .collect()(0).getLong(0) === 10L)

    // the same transparent pruning every face gets: the identity
    // partition filter reads only the F files
    GraftIcebergScans.clear()
    val f = spark.sql(
      "SELECT k FROM graft.db.orders WHERE status = 'F' ORDER BY k")
      .collect().map(_.getLong(0)).toSeq
    assert(f === Seq(1L, 3L))
    val rep = GraftIcebergScans.lastReport.get
    assert(rep.skippedFiles.nonEmpty, "O/P partition files must skip")
    assert(rep.keptFiles.forall(_.contains("status=F")))

    // each INSERT was one snapshot: time travel through the path face
    // (a catalog table IS a path table — the faces compose)
    val path = s"$warehouse/db/orders"
    val conf = spark.sparkContext.hadoopConfiguration
    val tdef = graft.sources.IcebergTableLoader.load(path, conf)
    val n = graft.sources.IcebergSnapshot.readSnapshot(spark, path, tdef)
      .count()
    assert(n === 4L)

    // DROP removes the table; the namespace survives
    spark.sql("DROP TABLE graft.db.orders")
    assert(spark.sql("SHOW TABLES IN graft.db").count() === 0L)
  }

  test("bucket(16, k) tables create, insert and point-prune") {
    spark.sql(
      """CREATE TABLE graft.db.keyed (
        |  k BIGINT NOT NULL, v STRING
        |) PARTITIONED BY (bucket(16, k))""".stripMargin)
    spark.sql("INSERT INTO graft.db.keyed " +
      "SELECT id AS k, concat('v', id) AS v FROM range(0, 200)")
    GraftIcebergScans.clear()
    val got = spark.sql("SELECT v FROM graft.db.keyed WHERE k = 57")
      .collect().map(_.getString(0)).toSeq
    assert(got === Seq("v57"))
    val rep = GraftIcebergScans.lastReport.get
    assert(rep.skippedFiles.nonEmpty,
      "a point lookup must skip the other buckets")
    spark.sql("DROP TABLE graft.db.keyed")
  }

  test("hidden partitioning DDL: days(ts) + truncate(2, tag) tables " +
      "create, insert across days, and a timestamp range SELECT prunes " +
      "files with no physical date column") {
    spark.sql(
      """CREATE TABLE graft.db.events (
        |  id BIGINT NOT NULL, ts TIMESTAMP_NTZ, tag STRING, v DOUBLE
        |) PARTITIONED BY (days(ts), truncate(2, tag))""".stripMargin)
    spark.sql(
      """INSERT INTO graft.db.events VALUES
        |  (1, TIMESTAMP_NTZ'2024-03-01 10:00:00', 'alpha', 1.0),
        |  (2, TIMESTAMP_NTZ'2024-03-01 23:59:59', 'alps',  2.0),
        |  (3, TIMESTAMP_NTZ'2024-03-02 00:00:00', 'beta',  3.0),
        |  (4, TIMESTAMP_NTZ'2024-03-03 05:00:00', 'gamma', 4.0)""".stripMargin)
    GraftIcebergScans.clear()
    val day1 = spark.sql(
      """SELECT id FROM graft.db.events
        |WHERE ts >= TIMESTAMP_NTZ'2024-03-01 00:00:00'
        |  AND ts <  TIMESTAMP_NTZ'2024-03-02 00:00:00'
        |ORDER BY id""".stripMargin).collect().map(_.getLong(0)).toSeq
    assert(day1 === Seq(1L, 2L))
    val rep = GraftIcebergScans.lastReport.get
    assert(rep.skippedFiles.nonEmpty,
      "the other days' files must skip on the day() partition value")
    assert(rep.keptFiles.forall(_.contains("ts_day=19783")),
      "2024-03-01 is epoch day 19783 — only its directory is read")
    // tag prefix family prunes through truncate(2)
    GraftIcebergScans.clear()
    val al = spark.sql(
      "SELECT id FROM graft.db.events WHERE tag IN ('alpha','alps') ORDER BY id")
      .collect().map(_.getLong(0)).toSeq
    assert(al === Seq(1L, 2L))
    assert(GraftIcebergScans.lastReport.get.keptFiles
      .forall(_.contains("tag_trunc=al")))
    spark.sql("DROP TABLE graft.db.events")
  }

  test("bucket(8, k) and mixed identity + bucket families create as one " +
      "explicit spec and point-prune") {
    spark.sql(
      """CREATE TABLE graft.db.mixed (
        |  k BIGINT NOT NULL, cat STRING, v DOUBLE
        |) PARTITIONED BY (cat, bucket(8, k))""".stripMargin)
    spark.sql("INSERT INTO graft.db.mixed " +
      "SELECT id AS k, concat('c', id % 2) AS cat, id * 1.5 AS v " +
      "FROM range(0, 100)")
    GraftIcebergScans.clear()
    val got = spark.sql(
      "SELECT v FROM graft.db.mixed WHERE cat = 'c1' AND k = 57")
      .collect().map(_.getDouble(0)).toSeq
    assert(got === Seq(85.5))
    val rep = GraftIcebergScans.lastReport.get
    assert(rep.skippedFiles.nonEmpty)
    assert(rep.keptFiles.forall(p =>
      p.contains("cat=c1") && p.contains("k_bucket=")))
    spark.sql("DROP TABLE graft.db.mixed")
  }

  test("SQL DELETE FROM: row-exact merge-on-read position deletes, " +
      "snapshot-visible, time travel keeps the pre-delete rows; " +
      "untranslatable predicates ride the row-level delta") {
    spark.sql(
      """CREATE TABLE graft.db.dels (
        |  k BIGINT NOT NULL, status STRING, price DOUBLE
        |) PARTITIONED BY (status)""".stripMargin)
    spark.sql("INSERT INTO graft.db.dels " +
      "SELECT id AS k, CASE WHEN id % 2 = 0 THEN 'F' ELSE 'O' END AS status, " +
      "id * 1.5 AS v FROM range(0, 40)")
    val path = s"$warehouse/db/dels"
    val conf = spark.sparkContext.hadoopConfiguration
    val before = graft.sources.IcebergSnapshot
      .currentSnapshotId(path, conf).get

    // partition-aligned AND row-level predicate in one statement —
    // no metadata-only cliff, the engine's delete machinery is exact
    spark.sql("DELETE FROM graft.db.dels WHERE status = 'F' AND k >= 20")
    val left = spark.sql("SELECT k FROM graft.db.dels ORDER BY k")
      .collect().map(_.getLong(0)).toSeq
    assert(left === ((0L until 20L) ++ (20L until 40L).filter(_ % 2 == 1)))
    // a second delete composes (the merge-on-read stack accumulates)
    spark.sql("DELETE FROM graft.db.dels WHERE k IN (1, 3) OR k = 5")
    assert(spark.sql("SELECT count(*) FROM graft.db.dels")
      .collect()(0).getLong(0) === 27L)
    // time travel through the path face still sees the pre-delete rows
    val tdef = graft.sources.IcebergTableLoader.load(path, conf)
    assert(graft.sources.IcebergSnapshot
      .readSnapshot(spark, path, tdef, Some(before)).count() === 40L)

    // an untranslatable predicate lowers to the row-level delta path
    // (GraftDeleteCommand) instead of failing analysis — row-exact
    // (the 27 survivors include 0,7,14,21,35 ≡ 0 mod 7: 5 rows die)
    spark.sql("DELETE FROM graft.db.dels WHERE k % 7 = 0")
    assert(spark.sql("SELECT count(*) FROM graft.db.dels")
      .collect()(0).getLong(0) === 22L)
    assert(spark.sql("SELECT count(*) FROM graft.db.dels WHERE k % 7 = 0")
      .collect()(0).getLong(0) === 0L)

    // TRUNCATE TABLE rides the same face (TruncatableTable →
    // deleteWhere(AlwaysTrue)); the emptied table still time-travels
    spark.sql("TRUNCATE TABLE graft.db.dels")
    assert(spark.sql("SELECT count(*) FROM graft.db.dels")
      .collect()(0).getLong(0) === 0L)
    assert(graft.sources.IcebergSnapshot
      .readSnapshot(spark, path, tdef, Some(before)).count() === 40L)
    // DELETE FROM an (effectively) empty table is a no-op, not an error
    spark.sql("DELETE FROM graft.db.dels WHERE k = 1")
    spark.sql("DROP TABLE graft.db.dels")
  }

  test("SQL time travel: VERSION AS OF takes a snapshot id or a tag; " +
      "TIMESTAMP AS OF resolves the main-ancestry commit clock; " +
      "pre-history timestamps refuse") {
    spark.sql(
      "CREATE TABLE graft.db.tt (k BIGINT NOT NULL, v STRING)")
    spark.sql("INSERT INTO graft.db.tt VALUES (1, 'a'), (2, 'b')")
    val path = s"$warehouse/db/tt"
    val conf = spark.sparkContext.hadoopConfiguration
    val firstId = graft.sources.IcebergSnapshot
      .currentSnapshotId(path, conf).get
    val tdef = graft.sources.IcebergTableLoader.load(path, conf)
    graft.sources.IcebergSnapshot.createRef(
      tdef, path, "v1-audit", firstId, "tag", conf)
    val tAfterFirst = System.currentTimeMillis()
    Thread.sleep(5)
    spark.sql("INSERT INTO graft.db.tt VALUES (3, 'c')")

    assert(spark.sql("SELECT count(*) FROM graft.db.tt")
      .collect()(0).getLong(0) === 3L)
    // snapshot id
    assert(spark.sql(
      s"SELECT count(*) FROM graft.db.tt VERSION AS OF $firstId")
      .collect()(0).getLong(0) === 2L)
    // named tag
    assert(spark.sql(
      "SELECT count(*) FROM graft.db.tt VERSION AS OF 'v1-audit'")
      .collect()(0).getLong(0) === 2L)
    // commit-clock resolution: between the inserts → the first commit
    // (java.sql.Timestamp renders in the JVM default tz, which is also
    // the session tz the literal parses under — instant-preserving)
    val lit = new java.sql.Timestamp(tAfterFirst).toString
    assert(spark.sql("SELECT count(*) FROM graft.db.tt " +
      s"TIMESTAMP AS OF TIMESTAMP'$lit'")
      .collect()(0).getLong(0) === 2L)
    // before the first commit: loud refusal
    val e = intercept[Exception] {
      spark.sql("SELECT count(*) FROM graft.db.tt " +
        "TIMESTAMP AS OF TIMESTAMP'2001-01-01 00:00:00'").collect()
    }
    assert((e.getMessage +: Iterator.iterate(e.getCause)(_.getCause)
      .takeWhile(_ != null).map(_.getMessage).toSeq).mkString(" | ")
      .contains("before the first commit"))
    // unknown tag: loud refusal
    val e2 = intercept[Exception] {
      spark.sql("SELECT * FROM graft.db.tt VERSION AS OF 'nope'").collect()
    }
    assert((e2.getMessage +: Iterator.iterate(e2.getCause)(_.getCause)
      .takeWhile(_ != null).map(_.getMessage).toSeq).mkString(" | ")
      .contains("no such"))
    // an ALL-DIGIT tag name stays reachable: the numeric interpretation
    // is tried first but falls back to ref resolution when no retained
    // snapshot has that id
    graft.sources.IcebergSnapshot.createRef(
      tdef, path, "20240101", firstId, "tag", conf)
    assert(spark.sql(
      "SELECT count(*) FROM graft.db.tt VERSION AS OF '20240101'")
      .collect()(0).getLong(0) === 2L)
    spark.sql("DROP TABLE graft.db.tt")
  }

  test("SQL metadata tables: db.t.snapshots/history/refs/manifests/" +
      "files/partitions serve the inspection views; unknown suffixes " +
      "still refuse as missing tables") {
    spark.sql(
      """CREATE TABLE graft.db.meta (
        |  k BIGINT NOT NULL, status STRING
        |) PARTITIONED BY (status)""".stripMargin)
    spark.sql("INSERT INTO graft.db.meta VALUES (1, 'F'), (2, 'O')")
    spark.sql("INSERT INTO graft.db.meta VALUES (3, 'F')")

    // three snapshots: the empty CREATE commit + two inserts
    assert(spark.sql("SELECT count(*) FROM graft.db.meta.snapshots")
      .collect()(0).getLong(0) === 3L)
    assert(spark.sql(
      "SELECT count(*) FROM graft.db.meta.history WHERE is_current_ancestor")
      .collect()(0).getLong(0) === 3L)
    assert(spark.sql(
      "SELECT count(*) FROM graft.db.meta.refs WHERE name = 'main'")
      .collect()(0).getLong(0) === 1L)
    assert(spark.sql("SELECT count(*) FROM graft.db.meta.manifests")
      .collect()(0).getLong(0) >= 2L)
    // files: 3 live data files (one per status per insert), record
    // counts sum to the row count — a WHERE works like any table
    val files = spark.sql(
      """SELECT sum(record_count) AS rows, count(*) AS n
        |FROM graft.db.meta.files""".stripMargin).collect()(0)
    assert(files.getLong(0) === 3L && files.getLong(1) === 3L)
    val parts = spark.sql(
      """SELECT partition['status'] AS s, record_count
        |FROM graft.db.meta.partitions ORDER BY 1""".stripMargin)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(parts === Map("F" -> 2L, "O" -> 1L))

    // unknown suffix refuses as a missing table, not a crash
    val e = intercept[Exception] {
      spark.sql("SELECT * FROM graft.db.meta.nope").collect()
    }
    assert(e.getMessage.toUpperCase.contains("TABLE_OR_VIEW_NOT_FOUND") ||
      e.getMessage.toLowerCase.contains("cannot be found") ||
      e.getMessage.toLowerCase.contains("not found"))
    spark.sql("DROP TABLE graft.db.meta")
  }

  test("write-audit-publish via pure SQL: graft.wap.branch stages " +
      "INSERTs on the audit branch, main is untouched until publish; " +
      "DELETE and overwrite refuse under the active conf") {
    spark.sql("CREATE TABLE graft.db.wap (k BIGINT NOT NULL, v STRING)")
    spark.sql("INSERT INTO graft.db.wap VALUES (1, 'a')")
    val path = s"$warehouse/db/wap"
    val conf = spark.sparkContext.hadoopConfiguration

    spark.conf.set("graft.wap.branch", "audit")
    try {
      spark.sql("INSERT INTO graft.db.wap VALUES (2, 'staged')")
      // main readers see nothing of the staged batch…
      assert(spark.sql("SELECT count(*) FROM graft.db.wap")
        .collect()(0).getLong(0) === 1L)
      // …the audit branch sees base + staged (the gate's read)
      assert(spark.sql(
        "SELECT count(*) FROM graft.db.wap VERSION AS OF 'audit'")
        .collect()(0).getLong(0) === 2L)
      // row-level deletes and overwrites refuse while staging
      val e = intercept[Exception] {
        spark.sql("DELETE FROM graft.db.wap WHERE k = 1")
      }
      assert((e.getMessage +: Iterator.iterate(e.getCause)(_.getCause)
        .takeWhile(_ != null).map(_.getMessage).toSeq).mkString(" | ")
        .contains("graft.wap.branch"))
      val e2 = intercept[Exception] {
        spark.sql("INSERT OVERWRITE graft.db.wap VALUES (9, 'x')")
      }
      assert((e2.getMessage +: Iterator.iterate(e2.getCause)(_.getCause)
        .takeWhile(_ != null).map(_.getMessage).toSeq).mkString(" | ")
        .contains("overwrite"))
    } finally spark.conf.unset("graft.wap.branch")

    // publish: main fast-forwards to the audited head
    val tdef = graft.sources.IcebergTableLoader.load(path, conf)
    graft.api.SchemaTranslator.publishBranch(spark, tdef, path, "audit")
    assert(spark.sql("SELECT k FROM graft.db.wap ORDER BY k")
      .collect().map(_.getLong(0)).toSeq === Seq(1L, 2L))
    spark.sql("DROP TABLE graft.db.wap")
  }

  test("types round-trip; refusals are loud") {
    spark.sql(
      """CREATE TABLE graft.db.typed (
        |  i INT, l BIGINT, f FLOAT, d DOUBLE, s STRING,
        |  dec DECIMAL(12,2), dt DATE, ts TIMESTAMP_NTZ, b BOOLEAN,
        |  bin BINARY)""".stripMargin)
    val schema = spark.table("graft.db.typed").schema
    import org.apache.spark.sql.types._
    assert(schema.fields.map(_.dataType).toSeq === Seq(IntegerType,
      LongType, FloatType, DoubleType, StringType, DecimalType(12, 2),
      DateType, TimestampNTZType, BooleanType, BinaryType))
    spark.sql("INSERT INTO graft.db.typed VALUES (1, 2, 3.5, 4.5, 'x', " +
      "12.34, DATE'2026-01-02', TIMESTAMP_NTZ'2026-01-02 03:04:05', " +
      "true, X'0BAD')")
    val r = spark.sql("SELECT * FROM graft.db.typed").collect()(0)
    assert(r.getInt(0) === 1 && r.getLong(1) === 2L &&
      r.getString(4) === "x" &&
      r.getDecimal(5) === new java.math.BigDecimal("12.34") &&
      r.getBoolean(8))
    spark.sql("DROP TABLE graft.db.typed")

    def sqlErr(q: String): String = {
      val e = intercept[Exception] { spark.sql(q) }
      (e.getMessage +: Iterator.iterate(e.getCause)(_.getCause)
        .takeWhile(_ != null).map(_.getMessage).toSeq).mkString(" | ")
    }
    assert(sqlErr("CREATE TABLE graft.db.bad1 (k BIGINT, ts TIMESTAMP)")
      .contains("TIMESTAMP_NTZ"))
    // transform/source mismatches refuse with the SOURCE-TYPE rule,
    // not a generic unsupported-transform message
    assert(sqlErr("CREATE TABLE graft.db.bad4 (k BIGINT) " +
      "PARTITIONED BY (days(k))").contains("not a date or timestamp"))
    assert(sqlErr("CREATE TABLE graft.db.bad5 (d DATE) " +
      "PARTITIONED BY (hours(d))").contains("hour"))
    assert(sqlErr("CREATE TABLE graft.db.bad6 (d DATE) " +
      "PARTITIONED BY (truncate(4, d))").contains("not int/long/string"))

    spark.sql("CREATE TABLE graft.db.alt (k BIGINT)")
    assert(sqlErr("ALTER TABLE graft.db.alt RENAME TO graft.db.alt2")
        .contains("manifests") ||
      sqlErr("ALTER TABLE graft.db.alt RENAME TO alt2").contains("manifests"))
    assert(sqlErr("ALTER TABLE graft.db.alt ALTER COLUMN k COMMENT 'x'")
      .contains("unsupported ALTER"))
    spark.sql("DROP TABLE graft.db.alt")
  }

  test("ALTER TABLE evolves through the field-id machinery: add/rename/" +
      "drop column and properties; old rows null-fill, inserts compose") {
    spark.sql("CREATE TABLE graft.db.evo (k BIGINT NOT NULL, v STRING)")
    spark.sql("INSERT INTO graft.db.evo VALUES (1, 'a'), (2, 'b')")

    spark.sql("ALTER TABLE graft.db.evo ADD COLUMN n INT")
    // pre-evolution rows read the new column as null
    val afterAdd = spark.sql("SELECT k, n FROM graft.db.evo ORDER BY k")
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1 else r.getInt(1)))
    assert(afterAdd.toSeq === Seq((1L, -1), (2L, -1)))
    spark.sql("INSERT INTO graft.db.evo VALUES (3, 'c', 30)")

    // rename is metadata-only: values written under the OLD name
    // resolve by field id under the new one
    spark.sql("ALTER TABLE graft.db.evo RENAME COLUMN n TO num")
    val renamed = spark.sql(
      "SELECT k, num FROM graft.db.evo WHERE num IS NOT NULL").collect()
    assert(renamed.map(r => (r.getLong(0), r.getInt(1))).toSeq ===
      Seq((3L, 30)))

    spark.sql("ALTER TABLE graft.db.evo DROP COLUMN v")
    assert(spark.table("graft.db.evo").schema.fieldNames.toSeq ===
      Seq("k", "num"))
    spark.sql("INSERT INTO graft.db.evo VALUES (4, 40)")
    assert(spark.sql("SELECT sum(k) FROM graft.db.evo")
      .collect()(0).getLong(0) === 10L)

    spark.sql("ALTER TABLE graft.db.evo SET TBLPROPERTIES ('graft.owner'='ops')")
    val path = s"$warehouse/db/evo"
    val conf = spark.sparkContext.hadoopConfiguration
    assert(graft.sources.IcebergSnapshot.tableProperties(path, conf)
      .get("graft.owner") === Some("ops"))
    spark.sql("ALTER TABLE graft.db.evo UNSET TBLPROPERTIES ('graft.owner')")
    assert(!graft.sources.IcebergSnapshot.tableProperties(path, conf)
      .contains("graft.owner"))
    spark.sql("DROP TABLE graft.db.evo")
  }

  test("CTAS lands the query result as the first increment") {
    spark.sql("CREATE TABLE graft.db.ctas PARTITIONED BY (p) AS " +
      "SELECT id AS k, CAST(id % 2 AS STRING) AS p FROM range(0, 10)")
    assert(spark.sql("SELECT count(*) FROM graft.db.ctas")
      .collect()(0).getLong(0) === 10L)
    GraftIcebergScans.clear()
    assert(spark.sql("SELECT count(*) FROM graft.db.ctas WHERE p = '1'")
      .collect()(0).getLong(0) === 5L)
    assert(GraftIcebergScans.lastReport.get.skippedFiles.nonEmpty)
    spark.sql("DROP TABLE graft.db.ctas")
  }
}
