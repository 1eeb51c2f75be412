package graft.sources

import java.time.LocalDateTime

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.api.SchemaTranslator
import graft.parse.Db2Parser
import graft.sources.IcebergPruning.ColumnBound

/** Pruning over the EXTENDED type surface: decimal bounds (the spec's
  * unscaled big-endian serialization, across all three parquet
  * physical encodings), decimal + timestamp bucket transforms,
  * timestamp identity partitions (string-surfaced in manifests),
  * nullness bounds, `Z`-suffixed instant ergonomics, and the loud
  * refusal on types with no comparison surface. DECIMAL is the
  * reference's canonical numeric (`/root/reference/db2ice/mapper.py:
  * 243-263`) — a migrated DB2 table keyed on it must file-prune. Lives
  * in `graft.sources` so the unit legs reach the private normalize/
  * decode surfaces the end-to-end legs ride. */
class IcebergPruningTypesSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("iceberg-pruning-types-spec")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def hconf = spark.sparkContext.hadoopConfiguration

  private def bd(s: String) = new java.math.BigDecimal(s)

  /** Shared exactness pin: kept∪skipped == live set, pruned read
    * row-equals the unpruned read under the row predicate. */
  private def assertPruned(out: String, t: graft.model.TableDef,
      pruning: Seq[ColumnBound], rowPred: org.apache.spark.sql.Column)
      : (Seq[String], Seq[String]) = {
    val (kept, skipped) = IcebergPruning.planScan(hconf, out, t, pruning)
    val (all, none) = IcebergPruning.planScan(hconf, out, t, Nil)
    assert(none.isEmpty)
    assert((kept ++ skipped).toSet === all.toSet)
    val pruned = IcebergSnapshot.readSnapshot(spark, out, t, pruning = pruning)
    val full = IcebergSnapshot.readSnapshot(spark, out, t).where(rowPred)
    val ks = (df: org.apache.spark.sql.DataFrame) =>
      df.select("K").collect().map(_.getLong(0)).toSet
    assert(ks(pruned) === ks(full))
    (kept, skipped)
  }

  // ------------------------------------------------- decimal fixtures

  // identity partition ON the decimal column (dir-encoded, string
  // surface in the manifests) + a high-precision FLBA decimal and an
  // NTZ timestamp carrying column bounds
  private val decTable = Db2Parser.parse(
    """CREATE TABLE S.PRUNE_DEC (
      |  K BIGINT NOT NULL,
      |  D DECIMAL(9,2),
      |  E DECIMAL(20,4),
      |  T TIMESTAMP
      |) PARTITION BY RANGE (D);""".stripMargin).tables.head

  private def decRowsDf(rows: Seq[(Long, String, String, LocalDateTime)]) = {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("K", LongType, nullable = false),
      StructField("D", DecimalType(9, 2)),
      StructField("E", DecimalType(20, 4)),
      StructField("T", TimestampNTZType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r =>
        org.apache.spark.sql.Row(r._1, bd(r._2), bd(r._3), r._4)), 2),
      schema)
  }

  private def ts(day: Int): LocalDateTime =
    LocalDateTime.of(2024, 1, day, 3, 4, 5)

  /** Three increments with disjoint D partitions / E ranges / T days:
    * the advisor's lexicographic trap is baked in — partition "9.50"
    * orders INSIDE [1.00, 20.00] numerically but outside it as a
    * string ("9.50" > "20.00"), so string comparison would silently
    * prune matching rows. */
  private lazy val decFixture: String = {
    val out = java.nio.file.Files.createTempDirectory("prune_dec").toString
    SchemaTranslator.migrateTable(decRowsDf(Seq(
      (1L, "9.50", "100.0001", ts(1)),
      (2L, "9.50", "101.2500", ts(1)))), decTable, out)
    SchemaTranslator.appendIncrement(decRowsDf(Seq(
      (3L, "3.75", "200.0001", ts(11)),
      (4L, "3.75", "205.5000", ts(11)))), decTable, out)
    SchemaTranslator.appendIncrement(decRowsDf(Seq(
      (5L, "100.00", "300.0001", ts(21)),
      (6L, "100.00", "305.1234", ts(21)))), decTable, out)
    out
  }

  test("decimal identity partition prunes NUMERICALLY, not lexically") {
    val out = decFixture
    // [1.00, 20.00] keeps partitions 9.50 and 3.75, skips 100.00 —
    // a string comparison would wrongly skip "9.50" (> "20.00")
    val (kept, skipped) = assertPruned(out, decTable,
      Seq(ColumnBound("D", Some(bd("1.00")), Some(bd("20.00")))),
      col("D") >= 1.00 && col("D") <= 20.00)
    assert(skipped.nonEmpty)
    assert(kept.exists(_.contains("D=9.50")), "9.50 must survive the range")
    assert(kept.exists(_.contains("D=3.75")))
    assert(skipped.forall(_.contains("D=100.00")))
  }

  test("decimal equality + IN-set prune identity partitions") {
    val out = decFixture
    val (kept, skipped) = assertPruned(out, decTable,
      Seq(ColumnBound.eq("D", "3.75")), col("D") === 3.75)
    assert(kept.forall(_.contains("D=3.75")) && skipped.nonEmpty)
    val (kept2, skipped2) = assertPruned(out, decTable,
      Seq(ColumnBound.in("D", Seq(bd("3.75"), bd("100.00")))),
      col("D") === 3.75 || col("D") === 100.00)
    assert(skipped2.forall(_.contains("D=9.50")) && skipped2.nonEmpty)
    assert(kept2.nonEmpty)
  }

  test("high-precision decimal (FLBA-backed) column bounds prune files") {
    val out = decFixture
    val (kept, skipped) = assertPruned(out, decTable,
      Seq(ColumnBound("E", Some(bd("200.0000")), Some(bd("206.0000")))),
      col("E") >= 200.0 && col("E") <= 206.0)
    assert(skipped.nonEmpty, "non-overlapping E increments must skip")
    for (p <- skipped) {
      val es = spark.read.parquet(p).select("E").collect()
        .map(_.getDecimal(0))
      assert(!es.exists(e => e.compareTo(bd("200.0000")) >= 0 &&
        e.compareTo(bd("206.0000")) <= 0), s"$p wrongly skipped")
    }
    assert(kept.nonEmpty)
  }

  test("timestamp column bounds prune files (INT64 micros stats)") {
    val out = decFixture
    val (_, skipped) = assertPruned(out, decTable,
      Seq(ColumnBound("T", Some(ts(10)), Some(ts(15)))),
      col("T") >= "2024-01-10" && col("T") <= "2024-01-15 23:59:59")
    assert(skipped.nonEmpty, "day-1 and day-21 increments must skip")
  }

  // --------------------------------------- timestamp identity fixture

  private val tsTable = Db2Parser.parse(
    """CREATE TABLE S.PRUNE_TS (
      |  K BIGINT NOT NULL,
      |  T TIMESTAMP
      |) PARTITION BY RANGE (T);""".stripMargin).tables.head

  private def tsRowsDf(rows: Seq[(Long, LocalDateTime)]) = {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("K", LongType, nullable = false),
      StructField("T", TimestampNTZType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r =>
        org.apache.spark.sql.Row(r._1, r._2)), 2), schema)
  }

  test("timestamp IDENTITY partition values (string-surfaced in " +
      "manifests) prune — no Number cast crash") {
    val out = java.nio.file.Files.createTempDirectory("prune_ts").toString
    SchemaTranslator.migrateTable(
      tsRowsDf(Seq((1L, ts(1)), (2L, ts(1)))), tsTable, out)
    SchemaTranslator.appendIncrement(
      tsRowsDf(Seq((3L, ts(15)), (4L, ts(15)))), tsTable, out)
    val (kept, skipped) = assertPruned(out, tsTable,
      Seq(ColumnBound("T", Some(ts(10)), None)), col("T") >= "2024-01-10")
    assert(skipped.nonEmpty, "the day-1 partition must be skipped")
    assert(kept.nonEmpty)
  }

  // -------------------------------------------------- bucket fixtures

  private val bucketTable = Db2Parser.parse(
    """CREATE TABLE S.PRUNE_BKT (
      |  K BIGINT NOT NULL,
      |  D DECIMAL(9,2),
      |  T TIMESTAMP
      |) PARTITION BY HASH (D, T);""".stripMargin).tables.head

  private def bktRowsDf(rows: Seq[(Long, String, LocalDateTime)]) = {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("K", LongType, nullable = false),
      StructField("D", DecimalType(9, 2)),
      StructField("T", TimestampNTZType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r =>
        org.apache.spark.sql.Row(r._1, bd(r._2), r._3)), 2), schema)
  }

  test("decimal and timestamp BUCKET partitions prune point lookups " +
      "through the spec murmur3 (vector 14.20 → bucket of −500754589)") {
    val out = java.nio.file.Files.createTempDirectory("prune_bkt").toString
    val data = (1L to 24L).map { k =>
      (k, new java.math.BigDecimal(
        java.math.BigInteger.valueOf(k * 711 + 17), 2).toPlainString,
        ts((k % 27 + 1).toInt))
    }
    SchemaTranslator.migrateTable(bktRowsDf(data), bucketTable, out)
    val probe = data(4) // K=5
    val (kept, skipped) = assertPruned(out, bucketTable,
      Seq(ColumnBound.eq("D", bd(probe._2))), col("D") === bd(probe._2))
    assert(skipped.nonEmpty, "other D buckets must be skipped")
    val dBucket = (graft.functions.IcebergBucketUtil.murmur3(
      bd(probe._2).unscaledValue.toByteArray, 0) & Int.MaxValue) % 16
    assert(kept.forall(_.contains(s"D_bucket=$dBucket")))
    // timestamp bucket: epoch-micros hash
    val micros = probe._3.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L
    val tBucket =
      (graft.functions.IcebergBucketUtil.hashLong(micros) & Int.MaxValue) % 16
    val (keptT, skippedT) = assertPruned(out, bucketTable,
      Seq(ColumnBound.eq("T", probe._3)), col("T") === probe._3)
    assert(skippedT.nonEmpty, "other T buckets must be skipped")
    assert(keptT.forall(_.contains(s"T_bucket=$tBucket")))
  }

  // ---------------------------------------------------- nullness bounds

  private val nullTable = Db2Parser.parse(
    """CREATE TABLE S.PRUNE_NULLS (
      |  K BIGINT NOT NULL,
      |  N INTEGER
      |);""".stripMargin).tables.head

  test("nullness bounds prune from value/null counts") {
    import org.apache.spark.sql.types._
    val out = java.nio.file.Files.createTempDirectory("prune_nulls").toString
    val schema = StructType(Seq(
      StructField("K", LongType, nullable = false),
      StructField("N", IntegerType)))
    def df(rows: Seq[(Long, Integer)]) = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r =>
        org.apache.spark.sql.Row(r._1, r._2)), 1), schema)
    SchemaTranslator.migrateTable(
      df(Seq((1L, Integer.valueOf(7)), (2L, Integer.valueOf(9)))),
      nullTable, out)
    SchemaTranslator.appendIncrement(
      df(Seq((3L, null), (4L, null))), nullTable, out)
    val (keptNN, skippedNN) = assertPruned(out, nullTable,
      Seq(ColumnBound.notNull("N")), col("N").isNotNull)
    assert(skippedNN.nonEmpty, "the all-null increment must skip")
    val (keptN, skippedN) = assertPruned(out, nullTable,
      Seq(ColumnBound.isNull("N")), col("N").isNull)
    assert(skippedN.nonEmpty, "the no-null file must skip under IS NULL")
    assert(keptN.nonEmpty && keptNN.nonEmpty)
  }

  // ------------------------------------------------- loud type refusal

  test("a bound on a type with no comparison surface refuses loudly") {
    import org.apache.spark.sql.types._
    val binTable = Db2Parser.parse(
      """CREATE TABLE S.PRUNE_BIN (
        |  K BIGINT NOT NULL,
        |  B CHAR(8) FOR BIT DATA
        |);""".stripMargin).tables.head
    val out = java.nio.file.Files.createTempDirectory("prune_bin").toString
    val schema = StructType(Seq(
      StructField("K", LongType, nullable = false),
      StructField("B", BinaryType)))
    SchemaTranslator.migrateTable(spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        org.apache.spark.sql.Row(1L, Array[Byte](1, 2))), 1), schema),
      binTable, out)
    val e = intercept[IllegalArgumentException] {
      IcebergPruning.planScan(hconf, out, binTable,
        Seq(ColumnBound.eq("B", "x")))
    }
    assert(e.getMessage.contains("no defined comparison surface"))
  }

  // ------------------------------------------------------- unit legs

  test("timestamptz bounds accept Z/offset-suffixed instants; NTZ refuses") {
    val zMicros = IcebergPruning.normalize(
      "timestamptz", "2024-01-02T03:04:05Z").asInstanceOf[Long]
    assert(zMicros === java.time.Instant.parse("2024-01-02T03:04:05Z")
      .getEpochSecond * 1000000L)
    val offMicros = IcebergPruning.normalize(
      "timestamptz", "2024-01-02T05:04:05+02:00").asInstanceOf[Long]
    assert(offMicros === zMicros, "+02:00 is the same instant")
    // space-separated form with offset also parses
    assert(IcebergPruning.normalize(
      "timestamptz", "2024-01-02 03:04:05Z") === zMicros)
    // plain local datetimes still work on both
    assert(IcebergPruning.normalize(
      "timestamptz", "2024-01-02T03:04:05") === zMicros)
    val e = intercept[IllegalArgumentException] {
      IcebergPruning.normalize("timestamp", "2024-01-02T03:04:05Z")
    }
    assert(e.getMessage.contains("ambiguous"))
  }

  test("decimal bound decode: unscaled big-endian two's complement") {
    val pos = IcebergPruning.decodeBound("decimal(9,2)",
      java.math.BigInteger.valueOf(1420).toByteArray)
    assert(pos === Some(bd("14.20")))
    val neg = IcebergPruning.decodeBound("decimal(20,4)",
      java.math.BigInteger.valueOf(-123456789L).toByteArray)
    assert(neg === Some(bd("-12345.6789")))
    assert(IcebergPruning.decodeBound("decimal(9,2)", Array.emptyByteArray)
      === None)
  }
}
