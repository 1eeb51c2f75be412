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

  test("INSERT OVERWRITE replaces the table (a fresh generation); the " +
      "replaced table keeps working as a plain increment target") {
    spark.sql("CREATE TABLE graftsurf.db.iow (k BIGINT NOT NULL, v STRING)")
    spark.sql("INSERT INTO graftsurf.db.iow VALUES (1, 'a'), (2, 'b')")
    // overwrite routes through the migration writer: a fresh table
    // GENERATION (data + metadata + one committed snapshot) — prior
    // history is intentionally not retained, matching the batch-save
    // face's mode("overwrite") semantics
    spark.sql("INSERT OVERWRITE graftsurf.db.iow VALUES (10, 'x'), (11, 'y')")
    assert(spark.sql("SELECT k FROM graftsurf.db.iow ORDER BY k")
      .collect().map(_.getLong(0)).toSeq === Seq(10L, 11L))
    spark.sql("INSERT INTO graftsurf.db.iow VALUES (12, 'z')")
    assert(spark.sql("SELECT count(*) FROM graftsurf.db.iow")
      .collect()(0).getLong(0) === 3L)
    spark.sql("DROP TABLE graftsurf.db.iow")
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
