package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.api.SchemaTranslator
import graft.parse.Db2Parser
import graft.sources.{IcebergInspect, IcebergMaintenance, IcebergSnapshot}

/** Orphan-file removal: unreferenced files older than the cutoff are
  * swept, everything any snapshot of the current metadata references
  * (staged WAP branches and time-travel history included) survives,
  * fresh files are age-guarded, and the sweep closes the
  * crashed-append resurrection window of the incremental commit. */
class IcebergMaintenanceSpec extends AnyFunSuite {
  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("iceberg-maintenance-spec")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def mkTable(name: String) = Db2Parser.parse(
    s"""CREATE TABLE S.$name (
       |  K BIGINT NOT NULL,
       |  V VARCHAR(10),
       |  N INTEGER
       |) PARTITION BY RANGE (V);""".stripMargin).tables.head

  private def df(ks: Seq[Long]) = {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("K", LongType, nullable = false),
      StructField("V", StringType), StructField("N", IntegerType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        ks.map(k => org.apache.spark.sql.Row(k, s"p${k % 3}", (k * 7).toInt)), 2),
      schema)
  }

  private def ksOf(d: org.apache.spark.sql.DataFrame): Seq[Long] =
    d.select("K").collect().map(_.getLong(0)).sorted.toSeq

  private def plant(out: String, rel: String, bytes: Int = 64): String = {
    val p = java.nio.file.Paths.get(out, rel)
    java.nio.file.Files.createDirectories(p.getParent)
    java.nio.file.Files.write(p, Array.fill[Byte](bytes)(7))
    p.toString
  }

  test("sweep removes planted orphans only; every reachable face " +
      "(main, staged branch, time travel) reads identically; age " +
      "guard holds; idempotent") {
    val table = mkTable("ORPH1")
    val out = java.nio.file.Files.createTempDirectory("orph1").toString
    SchemaTranslator.migrateTable(df(1L to 4L), table, out)
    val snap1 = IcebergInspect.snapshotsTable(spark, out)
      .filter(org.apache.spark.sql.functions.col("parent_id").isNull)
      .collect().head.getLong(1)
    SchemaTranslator.appendIncrement(df(5L to 6L), table, out)
    SchemaTranslator.mergeUpsert(df(Seq(6L, 7L)), table, out, Seq("K"))
    SchemaTranslator.stageAppendToBranch(df(8L to 9L), table, out, "audit")

    val orphans = Seq(
      plant(out, "data/orphan-crashed.parquet"),
      plant(out, "deletes/orphan-del.parquet"),
      plant(out, "metadata/orphan-list.avro"),
      plant(out, "metadata/v99.metadata.json"))
    val before = ksOf(IcebergSnapshot.readSnapshot(spark, out, table))
    val beforeBranch =
      ksOf(IcebergSnapshot.readSnapshotAtRef(spark, out, table, "audit"))
    val beforeTravel =
      ksOf(IcebergSnapshot.readSnapshot(spark, out, table, Some(snap1)))

    // cutoff in the past: everything is too fresh, nothing is swept
    assert(IcebergMaintenance.removeOrphanFiles(out, olderThanMs = 1L) === Nil)
    orphans.foreach(p => assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(p)), s"age guard must keep $p"))

    // cutoff in the future: exactly the planted orphans go
    val swept = IcebergMaintenance.removeOrphanFiles(out, Long.MaxValue)
    assert(swept.map(p => p.substring(p.lastIndexOf('/') + 1)).sorted ===
      orphans.map(p => p.substring(p.lastIndexOf('/') + 1)).sorted)
    orphans.foreach(p => assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(p))))

    // every read face unchanged (upsert history, staged branch, travel)
    assert(ksOf(IcebergSnapshot.readSnapshot(spark, out, table)) === before)
    assert(ksOf(IcebergSnapshot.readSnapshotAtRef(spark, out, table, "audit"))
      === beforeBranch)
    assert(ksOf(IcebergSnapshot.readSnapshot(spark, out, table, Some(snap1)))
      === beforeTravel)

    // idempotent; facade face matches
    assert(IcebergMaintenance.removeOrphanFiles(out, Long.MaxValue) === Nil)
    assert(SchemaTranslator.removeOrphanFiles(spark, out, Long.MaxValue) === Nil)

    // a non-table directory is refused, not swept
    val stray = java.nio.file.Files.createTempDirectory("notatable").toString
    plant(stray, "precious.parquet")
    intercept[IllegalArgumentException] {
      IcebergMaintenance.removeOrphanFiles(stray, Long.MaxValue)
    }
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(stray, "precious.parquet")))
  }

  test("crashed-append leftovers: swept files cannot be resurrected " +
      "by the next incremental commit") {
    val table = mkTable("ORPH2")
    val out = java.nio.file.Files.createTempDirectory("orph2").toString
    SchemaTranslator.migrateTable(df(1L to 3L), table, out)

    // a crashed append: data files written, commit never happened.
    // Without a sweep the NEXT appendIncrement would commit these rows
    // as if they were its own — the resurrection window.
    SchemaTranslator.writeMigrated(df(Seq(100L)), table, s"$out/data",
      mode = "append")
    val swept = IcebergMaintenance.removeOrphanFiles(out, Long.MaxValue)
    assert(swept.nonEmpty)
    assert(swept.forall(_.contains("/data/")))

    SchemaTranslator.appendIncrement(df(4L to 5L), table, out)
    assert(ksOf(IcebergSnapshot.readSnapshot(spark, out, table))
      === (1L to 5L), "swept crashed rows must stay dead")
  }

  test("after expiry the sweep finds nothing: expiry's physical GC " +
      "is complete") {
    val table = mkTable("ORPH3")
    val out = java.nio.file.Files.createTempDirectory("orph3").toString
    SchemaTranslator.migrateTable(df(1L to 3L), table, out)
    SchemaTranslator.appendIncrement(df(4L to 5L), table, out)
    SchemaTranslator.appendIncrement(df(6L to 7L), table, out)
    IcebergSnapshot.expireSnapshots(table, out, keepLast = 1,
      spark.sparkContext.hadoopConfiguration)
    assert(IcebergMaintenance.removeOrphanFiles(out, Long.MaxValue) === Nil)
    assert(ksOf(IcebergSnapshot.readSnapshot(spark, out, table)) === (1L to 7L))
  }
}
