package graft.sources.v2

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The REST of the SQL write surface a user reaches without thinking:
  * INSERT OVERWRITE (plans as truncate+append through the V1 write's
  * SupportsTruncate), TRUNCATE TABLE (SupportsDelete's TruncatableTable
  * face), and the DataFrameWriterV2 `writeTo(...).append()` path —
  * each must land atomic snapshots the other faces read back. */
class SqlSurfaceSpec extends AnyFunSuite {

  private lazy val warehouse =
    java.nio.file.Files.createTempDirectory("graft_sqlsurf_wh").toString

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("sql-surface-spec")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.catalog.graftsurf",
        "graft.sources.v2.GraftIcebergCatalog")
      .config("spark.sql.catalog.graftsurf.warehouse", warehouse)
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.api.GraftExtensions)
      .create()
    s.sql("CREATE NAMESPACE IF NOT EXISTS graftsurf.db")
    s
  }

  test("INSERT OVERWRITE commits ONE overwrite snapshot on the existing " +
      "ladder: history/tags survive, earlier snapshots time-travel, and " +
      "the table keeps working as a plain increment target") {
    spark.sql("CREATE TABLE graftsurf.db.iow (k BIGINT NOT NULL, v STRING)")
    spark.sql("INSERT INTO graftsurf.db.iow VALUES (1, 'a'), (2, 'b')")
    val path = s"$warehouse/db/iow"
    val hconf = spark.sparkContext.hadoopConfiguration
    val preOverwrite = graft.sources.IcebergSnapshot
      .currentSnapshotId(path, hconf).get
    spark.sql("ALTER TABLE graftsurf.db.iow CREATE TAG before_load")

    spark.sql("INSERT OVERWRITE graftsurf.db.iow VALUES (10, 'x'), (11, 'y')")
    assert(spark.sql("SELECT k FROM graftsurf.db.iow ORDER BY k")
      .collect().map(_.getLong(0)).toSeq === Seq(10L, 11L))
    // the overwrite is a SNAPSHOT, not a table generation: the prior
    // snapshot still time-travels and the tag still resolves (the old
    // wipe-and-recreate path destroyed both — and its delete-then-
    // recreate window was non-atomic)
    assert(spark.sql(
      s"SELECT k FROM graftsurf.db.iow VERSION AS OF $preOverwrite ORDER BY k")
      .collect().map(_.getLong(0)).toSeq === Seq(1L, 2L))
    assert(spark.sql(
      "SELECT k FROM graftsurf.db.iow VERSION AS OF 'before_load' ORDER BY k")
      .collect().map(_.getLong(0)).toSeq === Seq(1L, 2L))
    val meta = graft.sources.IcebergSnapshot
    val head = meta.currentSnapshotId(path, hconf).get
    assert(head !== preOverwrite)

    // the ladder continued: a plain INSERT INTO appends on top
    spark.sql("INSERT INTO graftsurf.db.iow VALUES (12, 'z')")
    assert(spark.sql("SELECT count(*) FROM graftsurf.db.iow")
      .collect()(0).getLong(0) === 3L)
    // a second overwrite folds the post-overwrite state away again
    spark.sql("INSERT OVERWRITE graftsurf.db.iow VALUES (20, 'w')")
    assert(spark.sql("SELECT k FROM graftsurf.db.iow")
      .collect().map(_.getLong(0)).toSeq === Seq(20L))
    spark.sql("DROP TABLE graftsurf.db.iow")
  }

  test("INSERT OVERWRITE folds row-level delete files away too: a " +
      "MoR table overwritten reads ONLY the new rows, and the retired " +
      "deletes never resurrect") {
    spark.sql("CREATE TABLE graftsurf.db.iowd (k BIGINT NOT NULL, v STRING)")
    spark.sql("INSERT INTO graftsurf.db.iowd VALUES (1,'a'),(2,'b'),(3,'c')")
    spark.sql("DELETE FROM graftsurf.db.iowd WHERE k = 2")
    assert(spark.sql("SELECT count(*) FROM graftsurf.db.iowd")
      .collect()(0).getLong(0) === 2L)
    spark.sql("INSERT OVERWRITE graftsurf.db.iowd VALUES (2, 'back')")
    assert(spark.sql("SELECT k, v FROM graftsurf.db.iowd").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq === Seq((2L, "back")),
      "the retired position delete must not apply to the NEW row")
    spark.sql("DROP TABLE graftsurf.db.iowd")
  }

  test("CTAS / RTAS / CREATE OR REPLACE: AS SELECT shapes create, " +
      "replace and read back through the catalog; partitioned CTAS " +
      "lays out and prunes like CREATE + INSERT") {
    spark.sql("CREATE TABLE graftsurf.db.ctas AS " +
      "SELECT id AS k, id * 2.0 AS v FROM range(0, 10)")
    assert(spark.sql("SELECT count(*), sum(k) FROM graftsurf.db.ctas")
      .collect()(0).toSeq === Seq(10L, 45L))
    // CTAS lands a real table: INSERT INTO appends, time travel works
    val path = s"$warehouse/db/ctas"
    val hconf = spark.sparkContext.hadoopConfiguration
    val v0 = graft.sources.IcebergSnapshot.currentSnapshotId(path, hconf).get
    spark.sql("INSERT INTO graftsurf.db.ctas VALUES (99, 0.0)")
    assert(spark.sql(
      s"SELECT count(*) FROM graftsurf.db.ctas VERSION AS OF $v0")
      .collect()(0).getLong(0) === 10L)

    // partitioned CTAS: the declared layout drives the write AND the
    // pruned read, exactly like CREATE + INSERT
    spark.sql("CREATE TABLE graftsurf.db.ctasp PARTITIONED BY (b) AS " +
      "SELECT id AS k, CAST(id % 3 AS STRING) AS b FROM range(0, 9)")
    GraftIcebergScans.clear()
    assert(spark.sql("SELECT k FROM graftsurf.db.ctasp WHERE b = '1'")
      .collect().map(_.getLong(0)).toSet === Set(1L, 4L, 7L))
    val rep = GraftIcebergScans.lastReport.get
    assert(rep.skippedFiles.nonEmpty && rep.keptFiles.forall(_.contains("b=1")),
      "partitioned CTAS output must prune like any identity layout")

    // RTAS / CREATE OR REPLACE: a replacement table, fresh generation
    // (Spark's non-staging ReplaceTableExec = drop + recreate)
    spark.sql("REPLACE TABLE graftsurf.db.ctas AS SELECT id AS k FROM range(0, 5)")
    assert(spark.sql("SELECT count(*) FROM graftsurf.db.ctas")
      .collect()(0).getLong(0) === 5L)
    spark.sql("CREATE OR REPLACE TABLE graftsurf.db.ctas AS " +
      "SELECT id AS k FROM range(0, 7)")
    assert(spark.sql("SELECT count(*) FROM graftsurf.db.ctas")
      .collect()(0).getLong(0) === 7L)
    spark.sql("DROP TABLE graftsurf.db.ctas")
    spark.sql("DROP TABLE graftsurf.db.ctasp")
  }

  test("TRUNCATE TABLE empties the table as one commit; INSERT after " +
      "truncate is a plain increment") {
    spark.sql("CREATE TABLE graftsurf.db.trunc (k BIGINT NOT NULL, v STRING)")
    spark.sql("INSERT INTO graftsurf.db.trunc VALUES (1, 'a'), (2, 'b')")
    spark.sql("TRUNCATE TABLE graftsurf.db.trunc")
    assert(spark.sql("SELECT count(*) FROM graftsurf.db.trunc")
      .collect()(0).getLong(0) === 0L)
    spark.sql("INSERT INTO graftsurf.db.trunc VALUES (3, 'c')")
    assert(spark.sql("SELECT k FROM graftsurf.db.trunc")
      .collect().map(_.getLong(0)).toSeq === Seq(3L))
    spark.sql("DROP TABLE graftsurf.db.trunc")
  }

  test("DataFrameWriterV2: writeTo(...).append() lands an increment " +
      "snapshot like INSERT INTO") {
    spark.sql("CREATE TABLE graftsurf.db.wt (k BIGINT NOT NULL, v STRING)")
    spark.sql("INSERT INTO graftsurf.db.wt VALUES (1, 'a')")
    spark.createDataFrame(Seq((2L, "b"), (3L, "c"))).toDF("k", "v")
      .writeTo("graftsurf.db.wt").append()
    assert(spark.sql("SELECT k FROM graftsurf.db.wt ORDER BY k")
      .collect().map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L))
    spark.sql("DROP TABLE graftsurf.db.wt")
  }
}
