package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.api.SchemaTranslator
import graft.parse.Db2Parser
import graft.sources.{IcebergChanges, IcebergDeletes, IcebergSnapshot}

/** Deterministic pin of the lifecycle harness's FIFTH find: deleting
  * every row and compacting the deletes in yields a legal EMPTY
  * snapshot (a REPLACE with zero data files) — the read must return
  * zero rows under the usual column shape, not refuse; the table
  * must stay fully usable after (append, delete, compact), time
  * travel must still see the pre-compact rows, and the CDC changes
  * view must diff cleanly across the empty boundary. */
class IcebergEmptyTableSpec extends AnyFunSuite {
  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("iceberg-empty-table-spec")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("delete-all → compactWithDeletes → empty read, then life goes on") {
    val table = Db2Parser.parse(
      """CREATE TABLE S.LIFE (
        |  K BIGINT NOT NULL,
        |  V VARCHAR(10),
        |  N INTEGER
        |) PARTITION BY RANGE (V);""".stripMargin).tables.head
    val out = java.nio.file.Files.createTempDirectory("empty_repro").toString
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("K", LongType, nullable = false),
      StructField("V", StringType), StructField("N", IntegerType)))
    def df(ks: Seq[Long]) = spark.createDataFrame(
      spark.sparkContext.parallelize(
        ks.map(k => org.apache.spark.sql.Row(k, s"p${k % 3}", (k * 7).toInt)), 2),
      schema)
    def chainIds: Seq[Long] = {
      val v = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(out, "metadata", "version-hint.text")), "UTF-8")
        .trim.toInt
      val meta = org.json4s.jackson.JsonMethods.parse(
        new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(out, "metadata", s"v$v.metadata.json")), "UTF-8"))
      import org.json4s._
      (meta \ "snapshots").asInstanceOf[JArray].arr
        .map(s => (s \ "snapshot-id").asInstanceOf[JInt].num.toLong)
    }

    SchemaTranslator.migrateTable(df(1L to 5L), table, out)
    val shapeBefore = IcebergSnapshot.readSnapshot(spark, out, table).schema
    IcebergDeletes.commitPositionDeletes(spark, table, out, col("K") % 2 === 0)
    IcebergDeletes.commitPositionDeletes(spark, table, out, col("K") % 2 === 1)
    assert(IcebergSnapshot.readSnapshot(spark, out, table).count() === 0L)
    IcebergDeletes.compactWithDeletes(spark, table, out)
    // the empty snapshot reads as zero rows, SAME column shape
    val empty = IcebergSnapshot.readSnapshot(spark, out, table)
    assert(empty.count() === 0L)
    assert(empty.schema.map(f => (f.name, f.dataType)) ===
      shapeBefore.map(f => (f.name, f.dataType)))
    // time travel to the pre-compact snapshots still sees the rows
    val ids = chainIds
    assert(IcebergSnapshot.readSnapshot(spark, out, table, Some(ids(0)))
      .count() === 5L)
    // life after empty: append, read, delete, compact again
    SchemaTranslator.appendIncrement(df(6L to 8L), table, out)
    assert(IcebergSnapshot.readSnapshot(spark, out, table)
      .select("K").collect().map(_.getLong(0)).sorted.toSeq === Seq(6L, 7L, 8L))
    IcebergDeletes.commitPositionDeletes(spark, table, out, col("K") === 7L)
    IcebergDeletes.compactWithDeletes(spark, table, out)
    assert(IcebergSnapshot.readSnapshot(spark, out, table)
      .select("K").collect().map(_.getLong(0)).sorted.toSeq === Seq(6L, 8L))
    // the CDC view diffs cleanly across the empty boundary
    val changes = IcebergChanges.changesTable(spark, out, table,
      fromSnapshotId = Some(ids(0)))
    val byType = changes.groupBy("_change_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // deletes: 5 (two delete commits) + 1 (K=7); inserts: 3 (append)
    assert(byType === Map("delete" -> 6L, "insert" -> 3L))
  }
}
