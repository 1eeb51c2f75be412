package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.api.SchemaTranslator
import graft.model.Db2Column
import graft.parse.Db2Parser
import graft.sources.{IcebergDeletes, IcebergEvolution, IcebergPruning, IcebergSnapshot}
import graft.sources.IcebergPruning.ColumnBound

/** Stats-based file pruning on snapshot reads: the plan (kept/skipped
  * file lists) is asserted directly — every skipped file provably
  * contains no matching row, every kept∪skipped set equals the live
  * set — and the pruned read is row-equal to the unpruned read under
  * the same predicate, across identity partitions, bucket partitions,
  * row-level deletes, and field-id-keyed column renames. */
class IcebergPruningSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("iceberg-pruning-spec")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val table = Db2Parser.parse(
    """CREATE TABLE S.PRUNE (
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
      spark.sparkContext.parallelize(
        rows.map(r => org.apache.spark.sql.Row(r._1, r._2, r._3)), 2),
      schema)
  }

  private def mk(k: Long): (Long, String, Integer) =
    (k, s"p${k % 2}", Integer.valueOf((k * 7).toInt))

  private def hconf = spark.sparkContext.hadoopConfiguration

  /** migrate(1-5) → append(6-9) → append(10-12) → append(20-21, N null). */
  private lazy val fixture: String = {
    val out = java.nio.file.Files.createTempDirectory("iceberg_prune").toString
    SchemaTranslator.migrateTable(rowsDf((1L to 5L).map(mk)), table, out)
    SchemaTranslator.appendIncrement(rowsDf((6L to 9L).map(mk)), table, out)
    SchemaTranslator.appendIncrement(rowsDf((10L to 12L).map(mk)), table, out)
    SchemaTranslator.appendIncrement(
      rowsDf(Seq((20L, "p0", null), (21L, "p1", null))), table, out)
    out
  }

  private def keySet(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.select("K").collect().map(_.getLong(0)).toSet

  /** The exactness pin shared by every test: kept∪skipped covers the
    * live set exactly, every SKIPPED file holds no matching row (read
    * back raw), and the pruned read row-equals the unpruned read under
    * the same predicate. */
  private def assertPruned(out: String, t: graft.model.TableDef,
      pruning: Seq[ColumnBound],
      rowPred: org.apache.spark.sql.Column): (Seq[String], Seq[String]) = {
    val (kept, skipped) = IcebergPruning.planScan(hconf, out, t, pruning)
    val (all, none) = IcebergPruning.planScan(hconf, out, t, Nil)
    assert(none.isEmpty)
    assert((kept ++ skipped).toSet === all.toSet)
    val pruned = IcebergSnapshot.readSnapshot(spark, out, t, pruning = pruning)
    val full = IcebergSnapshot.readSnapshot(spark, out, t).where(rowPred)
    assert(keySet(pruned) === keySet(full))
    (kept, skipped)
  }

  test("identity partition value prunes whole partitions") {
    val out = fixture
    val (kept, skipped) = assertPruned(out, table,
      Seq(ColumnBound.eq("V", "p0")), col("V") === "p0")
    assert(skipped.nonEmpty, "p1 files must be skipped")
    assert(kept.forall(_.contains("V=p0")))
    assert(skipped.forall(_.contains("V=p1")))
  }

  test("column lower/upper bounds prune non-overlapping increments; " +
      "skipped files provably hold no matching row") {
    val out = fixture
    val (kept, skipped) = assertPruned(out, table,
      Seq(ColumnBound("K", Some(6L), Some(9L))),
      col("K") >= 6L && col("K") <= 9L)
    assert(skipped.nonEmpty)
    // every skipped file genuinely has no K in [6, 9]
    for (p <- skipped) {
      val ks = spark.read.parquet(p).select("K").collect().map(_.getLong(0))
      assert(!ks.exists(k => k >= 6L && k <= 9L), s"$p wrongly skipped")
    }
    // and pruning did real work: the 1-5 and 10-12 increments are gone
    assert(kept.size < (kept.size + skipped.size))
    val keptKs = kept.flatMap(p =>
      spark.read.parquet(p).select("K").collect().map(_.getLong(0)))
    assert(keptKs.exists(k => k >= 6L && k <= 9L))
  }

  test("an all-null column file is pruned by value/null counts") {
    val out = fixture
    val (_, skipped) = assertPruned(out, table,
      Seq(ColumnBound("N", Some(1), None)), col("N") >= 1)
    // the N-null increment's files (K=20, 21) carry no N values at all
    for (p <- skipped) {
      val rows = spark.read.parquet(p).select("N").collect()
      assert(rows.forall(_.isNullAt(0)), s"$p skipped but has N values")
    }
    assert(skipped.nonEmpty, "the all-null-N files must be skipped")
  }

  test("residual filter applies row-level inside kept files") {
    val out = fixture
    // K ∈ [7, 8] keeps the 6-9 increment's files but must not return 6/9
    val pruned = IcebergSnapshot.readSnapshot(spark, out, table,
      pruning = Seq(ColumnBound("K", Some(7L), Some(8L))))
    assert(keySet(pruned) === Set(7L, 8L))
  }

  test("a predicate matching nothing returns the empty shape") {
    val out = fixture
    val (kept, skipped) = IcebergPruning.planScan(hconf, out, table,
      Seq(ColumnBound("K", Some(1000L), Some(2000L))))
    assert(kept.isEmpty && skipped.nonEmpty)
    val df = IcebergSnapshot.readSnapshot(spark, out, table,
      pruning = Seq(ColumnBound("K", Some(1000L), Some(2000L))))
    assert(df.count() === 0L)
    assert(df.columns.toSeq ===
      IcebergSnapshot.readSnapshot(spark, out, table).columns.toSeq)
  }

  test("bucket partition value prunes on equality bounds") {
    val t = Db2Parser.parse(
      """CREATE TABLE S.PRB (
        |  K BIGINT NOT NULL,
        |  V VARCHAR(10)
        |) PARTITION BY HASH (K);""".stripMargin).tables.head
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("iceberg_prb").toString
    SchemaTranslator.migrateTable(
      (1L to 40L).map(k => (k, s"v$k")).toDF("K", "V"), t, out)
    val (kept, skipped) = IcebergPruning.planScan(hconf, out, t,
      Seq(ColumnBound.eq("K", 7L)))
    assert(skipped.nonEmpty, "other buckets must be skipped")
    // only files in K=7's bucket dir survive
    val bucket = {
      val h = graft.functions.IcebergBucketUtil.hashLong(7L)
      (h & Integer.MAX_VALUE) % 16
    }
    assert(kept.forall(_.contains(s"K_bucket=$bucket")))
    val pruned = IcebergSnapshot.readSnapshot(spark, out, t,
      pruning = Seq(ColumnBound.eq("K", 7L)))
    assert(keySet(pruned) === Set(7L))
  }

  test("pruned reads stay exact across position deletes and upserts") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("iceberg_prd").toString
    SchemaTranslator.migrateTable(rowsDf((1L to 8L).map(mk)), table, out)
    IcebergDeletes.commitPositionDeletes(spark, table, out, col("K") % 3 === 0)
    SchemaTranslator.mergeUpsert(
      rowsDf(Seq((2L, "p0", 9999), mk(30L))), table, out, keyCols = Seq("K"))
    // bound spans deleted (3, 6) and upserted (2) keys
    assertPruned(out, table, Seq(ColumnBound("K", Some(2L), Some(6L))),
      col("K") >= 2L && col("K") <= 6L)
    val got = IcebergSnapshot.readSnapshot(spark, out, table,
      pruning = Seq(ColumnBound("K", Some(2L), Some(6L))))
      .select("K", "N").collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(got === Set((2L, 9999), (4L, 28), (5L, 35))) // 3 and 6 deleted
  }

  test("bounds are field-id keyed: a renamed column still prunes old files") {
    import spark.implicits._
    val t0 = Db2Parser.parse(
      """CREATE TABLE S.PRR (
        |  K BIGINT NOT NULL,
        |  N INTEGER
        |);""".stripMargin).tables.head
    val out = java.nio.file.Files.createTempDirectory("iceberg_prr").toString
    SchemaTranslator.migrateTable(
      Seq((1L, 10), (2L, 20)).toDF("K", "N"), t0, out)
    val t1 = IcebergEvolution.commitEvolution(
      IcebergEvolution.renameColumn(t0, "N", "QTY"), out)
    SchemaTranslator.appendIncrement(
      Seq((3L, 300), (4L, 400)).toDF("K", "QTY"), t1, out)
    // QTY ≥ 100 must skip the pre-rename files via N's (same-id) bounds
    val (kept, skipped) = IcebergPruning.planScan(hconf, out, t1,
      Seq(ColumnBound("QTY", Some(100), None)))
    assert(skipped.nonEmpty, "pre-rename files must prune by field id")
    val pruned = IcebergSnapshot.readSnapshot(spark, out, t1,
      pruning = Seq(ColumnBound("QTY", Some(100), None)))
    assert(keySet(pruned) === Set(3L, 4L))
    assert(kept.nonEmpty)
  }

  test("date bounds accept LocalDate, ISO strings and epoch days") {
    val td = Db2Parser.parse(
      """CREATE TABLE S.PRD2 (
        |  K BIGINT NOT NULL,
        |  D DATE
        |);""".stripMargin).tables.head
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("iceberg_prdt").toString
    def d(s: String) = java.sql.Date.valueOf(s)
    SchemaTranslator.migrateTable(
      Seq((1L, d("2024-01-05")), (2L, d("2024-01-20"))).toDF("K", "D"), td, out)
    SchemaTranslator.appendIncrement(
      Seq((3L, d("2024-03-05")), (4L, d("2024-03-20"))).toDF("K", "D"), td, out)
    for (lo <- Seq[Any](java.time.LocalDate.parse("2024-03-01"), "2024-03-01",
        java.time.LocalDate.parse("2024-03-01").toEpochDay)) {
      val (kept, skipped) = IcebergPruning.planScan(hconf, out, td,
        Seq(ColumnBound("D", Some(lo), None)))
      assert(skipped.nonEmpty && kept.nonEmpty, s"bound form $lo")
      val pruned = IcebergSnapshot.readSnapshot(spark, out, td,
        pruning = Seq(ColumnBound("D", Some(lo), None)))
      assert(keySet(pruned) === Set(3L, 4L), s"bound form $lo")
    }
  }

  test("pruning threads through incremental scans and ref reads") {
    val out = fixture
    val ids = {
      val v = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(out, "metadata", "version-hint.text")),
        "UTF-8").trim.toInt
      val meta = org.json4s.jackson.JsonMethods.parse(
        new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
          out, "metadata", s"v$v.metadata.json")), "UTF-8"))
      (meta \ "snapshots").asInstanceOf[org.json4s.JArray].arr
        .map(s => (s \ "snapshot-id").asInstanceOf[org.json4s.JInt].num.toLong)
    }
    // incremental over the 6-9 and 10-12 commits, pruned to K ≤ 8:
    // rows 9-12 die (8 < K via residual, whole increment-3 files via
    // bounds), change metadata survives
    val inc = graft.sources.IcebergChanges.incrementalAppendScan(spark,
      out, table, fromSnapshotId = Some(ids(0)), toSnapshotId = Some(ids(2)),
      pruning = Seq(ColumnBound("K", None, Some(8L))))
    assert(keySet(inc) === Set(6L, 7L, 8L))
    assert(inc.select("_commit_snapshot_id").distinct().count() === 1L)
    // ref read with pruning
    graft.sources.IcebergSnapshot.createRef(table, out, "probe", ids(1),
      conf = hconf)
    val atRef = graft.sources.IcebergSnapshot.readSnapshotAtRef(spark, out,
      table, "probe", pruning = Seq(ColumnBound("K", Some(4L), Some(7L))))
    assert(keySet(atRef) === Set(4L, 5L, 6L, 7L))
  }

  test("IN-set bounds prune identity partitions by membership, bucket " +
      "partitions per value, and ranges via [min, max]") {
    val out = fixture
    // identity membership: only the p0 partition survives V IN (p0, pX)
    val (kept, skipped) = assertPruned(out, table,
      Seq(ColumnBound.in("V", Seq("p0", "pX"))), col("V").isin("p0", "pX"))
    assert(skipped.nonEmpty && kept.forall(_.contains("V=p0")))
    // range envelope on K: K IN (2, 11) keeps only files overlapping
    // [2, 11]; the residual kills everything but the two ids
    val pruned = IcebergSnapshot.readSnapshot(spark, out, table,
      pruning = Seq(ColumnBound.in("K", Seq(2L, 11L))))
    assert(keySet(pruned) === Set(2L, 11L))
    // bucket membership: a HASH table prunes to the candidate buckets
    val t = Db2Parser.parse(
      """CREATE TABLE S.PRBI (
        |  K BIGINT NOT NULL,
        |  V VARCHAR(10)
        |) PARTITION BY HASH (K);""".stripMargin).tables.head
    import spark.implicits._
    val outB = java.nio.file.Files.createTempDirectory("iceberg_prbi").toString
    SchemaTranslator.migrateTable(
      (1L to 40L).map(k => (k, s"v$k")).toDF("K", "V"), t, outB)
    val (keptB, skippedB) = IcebergPruning.planScan(hconf, outB, t,
      Seq(ColumnBound.in("K", Seq(7L, 9L))))
    assert(skippedB.nonEmpty)
    val buckets = Seq(7L, 9L).map(k =>
      (graft.functions.IcebergBucketUtil.hashLong(k) & Integer.MAX_VALUE) % 16)
    assert(keptB.forall(p => buckets.exists(b => p.contains(s"K_bucket=$b"))))
    assert(keySet(IcebergSnapshot.readSnapshot(spark, outB, t,
      pruning = Seq(ColumnBound.in("K", Seq(7L, 9L))))) === Set(7L, 9L))
    // empty IN set refuses loudly
    intercept[IllegalArgumentException] {
      ColumnBound.in("K", Nil)
    }
  }

  test("timestamp bounds prune on INT64-micros footer stats and accept " +
      "LocalDateTime, ISO strings and epoch micros") {
    val tt = Db2Parser.parse(
      """CREATE TABLE S.PRTS (
        |  K BIGINT NOT NULL,
        |  TS TIMESTAMP
        |);""".stripMargin).tables.head
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("iceberg_prts").toString
    def ldt(s: String) = java.time.LocalDateTime.parse(s)
    SchemaTranslator.migrateTable(
      Seq((1L, ldt("2024-01-05T10:00:00")), (2L, ldt("2024-01-20T11:30:00")))
        .toDF("K", "TS"), tt, out)
    SchemaTranslator.appendIncrement(
      Seq((3L, ldt("2024-03-05T09:15:00")), (4L, ldt("2024-03-20T23:59:59")))
        .toDF("K", "TS"), tt, out)
    for (lo <- Seq[Any](ldt("2024-03-01T00:00:00"), "2024-03-01T00:00:00",
        ldt("2024-03-01T00:00:00").toEpochSecond(
          java.time.ZoneOffset.UTC) * 1000000L)) {
      val (kept, skipped) = IcebergPruning.planScan(hconf, out, tt,
        Seq(ColumnBound("TS", Some(lo), None)))
      assert(skipped.nonEmpty && kept.nonEmpty, s"bound form $lo")
      val pruned = IcebergSnapshot.readSnapshot(spark, out, tt,
        pruning = Seq(ColumnBound("TS", Some(lo), None)))
      assert(keySet(pruned) === Set(3L, 4L), s"bound form $lo")
    }
    // residual applies inside the kept files too
    assert(keySet(IcebergSnapshot.readSnapshot(spark, out, tt,
      pruning = Seq(ColumnBound("TS",
        Some("2024-01-10T00:00:00"), Some("2024-03-10T00:00:00")))))
      === Set(2L, 3L))
  }

  test("unknown pruning columns and inverted ranges fail loudly") {
    val out = fixture
    intercept[IllegalArgumentException] {
      IcebergPruning.planScan(hconf, out, table,
        Seq(ColumnBound("NOPE", Some(1), None)))
    }
    intercept[IllegalArgumentException] {
      IcebergPruning.planScan(hconf, out, table,
        Seq(ColumnBound("K", Some(9L), Some(6L))))
    }
  }

  test("string bounds order by UNSIGNED UTF-8 BYTES (the parquet stat " +
      "writer's order), not UTF-16 — supplementary code points keep " +
      "their files") {
    val t = Db2Parser.parse(
      """CREATE TABLE S.UTFB (
        |  K BIGINT NOT NULL,
        |  S VARCHAR(10)
        |);""".stripMargin).tables.head
    val out = java.nio.file.Files.createTempDirectory("iceberg_utf8").toString
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("K", LongType, nullable = false),
      StructField("S", StringType)))
    def df(rows: Seq[(Long, String)]) = spark.createDataFrame(
      spark.sparkContext.parallelize(
        rows.map(r => org.apache.spark.sql.Row(r._1, r._2)), 1), schema)
    // one file mixing a supplementary code point (U+1F600, UTF-8
    // f0 9f 98 80) and a high-BMP char (U+FFFD, UTF-8 ef bf bd):
    // UTF-16 orders the surrogate pair (0xD83D…) BELOW U+FFFD while
    // their UTF-8 bytes order ABOVE — a UTF-16 max-vs-lower-bound
    // comparison wrongly prunes this file for bounds ≥ U+FFFD,
    // silently dropping the emoji row (Spark row comparison is
    // UTF8String binary, so the row genuinely matches)
    SchemaTranslator.migrateTable(
      df(Seq((1L, "😀"), (2L, "�"))), t, out)
    SchemaTranslator.appendIncrement(df(Seq((3L, "aaa"))), t, out)
    val (kept, skipped) = assertPruned(out, t,
      Seq(ColumnBound("S", Some("�"), None)),
      col("S") >= org.apache.spark.sql.functions.lit("�"))
    assert(skipped.nonEmpty, "the all-ASCII increment must still prune")
    // and the emoji row itself must survive the pruned read
    val got = IcebergSnapshot.readSnapshot(spark, out, t,
      pruning = Seq(ColumnBound("S", Some("�"), None)))
    assert(keySet(got) === Set(1L, 2L))
  }

  test("empty-string partition values (Hive null marker) fall through " +
      "to stats instead of pruning: tag = '' and IS NOT NULL keep rows") {
    // truncate[2] over a string source: '' truncates to '', which
    // dir-encodes as __HIVE_DEFAULT_PARTITION__ — indistinguishable
    // from null at the directory level, but the SOURCE column stays
    // physical in the data files, so the stats signal is exact
    val t = Db2Parser.parse(
      """CREATE TABLE S.PRUNE_ES (
        |  K BIGINT NOT NULL,
        |  V VARCHAR(10)
        |);""".stripMargin).tables.head
    val tdef = IcebergEvolution.initialSpec(t, Seq(("V", "truncate[2]")))
    val out = java.nio.file.Files.createTempDirectory("iceberg_es").toString
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("K", LongType, nullable = false),
      StructField("V", StringType)))
    def df(rows: Seq[(Long, String)]) = spark.createDataFrame(
      spark.sparkContext.parallelize(
        rows.map(r => org.apache.spark.sql.Row(r._1, r._2)), 1), schema)
    SchemaTranslator.migrateTable(
      df(Seq((1L, ""), (2L, ""))), tdef, out)
    SchemaTranslator.appendIncrement(df(Seq((3L, "abc"))), tdef, out)
    // V = '' must return the empty-string rows (pre-fix: the None
    // partition value hit the all-null fast path and pruned them away)
    val eq = IcebergSnapshot.readSnapshot(spark, out, tdef,
      pruning = Seq(ColumnBound.eq("V", "")))
    assert(keySet(eq) === Set(1L, 2L))
    // V IS NOT NULL keeps every row: '' is not null
    val nn = IcebergSnapshot.readSnapshot(spark, out, tdef,
      pruning = Seq(ColumnBound.notNull("V")))
    assert(keySet(nn) === Set(1L, 2L, 3L))
    // and a genuinely-null file still prunes for IS NOT NULL via counts
    SchemaTranslator.appendIncrement(df(Seq((4L, null))), tdef, out)
    val nn2 = IcebergSnapshot.readSnapshot(spark, out, tdef,
      pruning = Seq(ColumnBound.notNull("V")))
    assert(keySet(nn2) === Set(1L, 2L, 3L))
    val isNull = IcebergSnapshot.readSnapshot(spark, out, tdef,
      pruning = Seq(ColumnBound.isNull("V")))
    assert(keySet(isNull) === Set(4L))
  }
}
