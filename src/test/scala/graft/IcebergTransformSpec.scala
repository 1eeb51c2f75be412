package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.api.SchemaTranslator
import graft.parse.Db2Parser
import graft.sources.IcebergPruning.ColumnBound

/** Hidden partitioning: the Iceberg spec's year/month/day/hour and
  * truncate[W] transforms — transform values computed by
  * [[graft.functions.IcebergTransform]] (spec example vectors, floored
  * pre-epoch negatives, code-point string truncation), directory-
  * encoded by the migration writer with the SOURCE column kept
  * physical, round-tripped through manifests, and pruned through the
  * monotonic-transform signal (pinned on synthetic stat-less files so
  * no other signal can mask it). */
class IcebergTransformSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("iceberg-transform-spec")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def hconf = spark.sparkContext.hadoopConfiguration

  // ---------------------------------------------------------------
  // transform value vectors
  // ---------------------------------------------------------------

  test("temporal transform vectors: the spec's 2017-11-16 examples, " +
      "floored negatives before the epoch, calendar (not 30-day) months") {
    import graft.functions.IcebergTransformUtil._
    val d = java.time.LocalDate.of(2017, 11, 16)
    val days = d.toEpochDay.toInt
    assert(days === 17486) // spec example: day(2017-11-16) = 17486
    assert(monthsOfDays(days) === 574) // (2017-1970)*12 + 10
    assert(yearsOfDays(days) === 47)
    val micros = java.time.LocalDateTime.of(2017, 11, 16, 22, 31, 8)
      .toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L
    assert(daysOfMicros(micros) === 17486)
    assert(hoursOfMicros(micros) === 17486 * 24 + 22)

    // pre-epoch: floored, not truncated toward zero
    val before = java.time.LocalDateTime.of(1969, 12, 31, 23, 30, 0)
      .toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L
    assert(daysOfMicros(before) === -1)
    assert(hoursOfMicros(before) === -1)
    assert(monthsOfDays(-1) === -1)
    assert(yearsOfDays(-1) === -1)
    // exact epoch boundary stays 0
    assert(daysOfMicros(0L) === 0 && hoursOfMicros(0L) === 0)
    assert(monthsOfDays(0) === 0 && yearsOfDays(0) === 0)
    // calendar months: 2000-02-29 is month (2000-1970)*12 + 1 = 361
    assert(monthsOfDays(java.time.LocalDate.of(2000, 2, 29)
      .toEpochDay.toInt) === 361)
  }

  test("truncate vectors: floored modulus for integrals, first W code " +
      "points for strings (supplementary characters count once)") {
    import graft.functions.IcebergTransformUtil._
    import org.apache.spark.unsafe.types.UTF8String.{fromString => u8}
    assert(truncateLong(0L, 10L) === 0L)
    assert(truncateLong(1L, 10L) === 0L)
    assert(truncateLong(9L, 10L) === 0L)
    assert(truncateLong(10L, 10L) === 10L)
    assert(truncateLong(-1L, 10L) === -10L) // spec: rounds away from zero
    assert(truncateLong(-10L, 10L) === -10L)
    assert(truncateInt(-12, 10) === -20)
    assert(truncateString(u8("iceberg"), 3).toString === "ice")
    assert(truncateString(u8("ab"), 5).toString === "ab") // shorter is kept
    assert(truncateString(u8("héllo"), 2).toString === "hé")
    // one 4-byte supplementary code point is ONE unit
    assert(truncateString(u8("😀xy"), 1).toString === "😀")
  }

  test("the codegen'd expression agrees with the vectors on a real scan") {
    import spark.implicits._
    val df = Seq(
      "2017-11-16T22:31:08", "1969-12-31T23:30:00", "1970-01-01T00:00:00")
      .toDF("s")
      .select(col("s").cast("timestamp_ntz").as("ts"))
    def vals(t: String): Seq[Int] =
      df.select(graft.functions.IcebergTransform(col("ts"), t))
        .collect().map(_.getInt(0)).toSeq
    assert(vals("day") === Seq(17486, -1, 0))
    assert(vals("hour") === Seq(17486 * 24 + 22, -1, 0))
    assert(vals("month") === Seq(574, -1, 0))
    assert(vals("year") === Seq(47, -1, 0))
    val tr = Seq(7L, -1L, 10L).toDF("v")
      .select(graft.functions.IcebergTransform(col("v"), "truncate[10]"))
      .collect().map(_.getLong(0)).toSeq
    assert(tr === Seq(0L, -10L, 10L))
    // transform/source mismatches refuse at analysis, loudly
    val e = intercept[Exception] {
      df.select(graft.functions.IcebergTransform(col("ts"), "truncate[4]"))
        .collect()
    }
    assert(e.getMessage.contains("truncate"))
  }

  // ---------------------------------------------------------------
  // the pruning signal, isolated
  // ---------------------------------------------------------------

  private val evTable = IcebergEvolution.initialSpec(
    Db2Parser.parse(
      """CREATE TABLE S.EV (
        |  ID BIGINT NOT NULL,
        |  TS TIMESTAMP,
        |  TAG VARCHAR(20),
        |  V DOUBLE
        |);""".stripMargin).tables.head,
    Seq("TS" -> "day", "TAG" -> "truncate[2]"))

  /** A manifest entry with NO column stats at all — only the partition
    * tuple can prune, so every verdict below pins the monotonic-
    * transform signal itself. */
  private def statlessFile(dayVal: Option[Int], tagVal: Option[String]) =
    IcebergSnapshot.DataFileInfo("synthetic.parquet", 1L, 1L,
      Seq(dayVal, tagVal), Map.empty, Map.empty, Map.empty, Map.empty,
      specId = 0)

  test("monotonic signal: a timestamp range predicate prunes through " +
      "day() partition values with floored boundary semantics") {
    def may(dayVal: Int, loTs: String, hiTs: String): Boolean =
      IcebergPruning.fileMayMatch(evTable, statlessFile(Some(dayVal), None),
        ColumnBound("TS", lower = Some(loTs), upper = Some(hiTs)))
    // file of day 17486; predicate inside that day keeps it
    assert(may(17486, "2017-11-16T00:00:00", "2017-11-16T23:59:59"))
    // predicate entirely the day before / after prunes it
    assert(!may(17486, "2017-11-15T00:00:00", "2017-11-15T23:59:59"))
    assert(!may(17486, "2017-11-17T00:00:00", "2017-11-17T23:59:59"))
    // boundary: upper at midnight OF the file's day keeps (floor puts
    // midnight IN the day); upper one microsecond before prunes
    assert(may(17486, "2017-11-10T00:00:00", "2017-11-16T00:00:00"))
    assert(!may(17486, "2017-11-10T00:00:00", "2017-11-15T23:59:59"))
    // pre-epoch file (day −1) against a pre-epoch range
    assert(may(-1, "1969-12-31T00:00:00", "1969-12-31T23:59:59"))
    assert(!may(-1, "1970-01-01T00:00:00", "1970-01-01T23:59:59"))
    // an all-null-TS file never matches a range predicate
    assert(!IcebergPruning.fileMayMatch(evTable, statlessFile(None, None),
      ColumnBound("TS", lower = Some("2017-11-16T00:00:00"), upper = None)))

    // STRICT bounds tighten through the transform: `ts < midnight of
    // day 17487` excludes day 17487 entirely (the canonical
    // `ts >= d AND ts < d+1` day-range shape), while the inclusive
    // upper keeps it for the single midnight row it may hold
    val nextMidnight = "2017-11-17T00:00:00"
    assert(IcebergPruning.fileMayMatch(evTable,
      statlessFile(Some(17487), None),
      ColumnBound("TS", upper = Some(nextMidnight))))
    assert(!IcebergPruning.fileMayMatch(evTable,
      statlessFile(Some(17487), None),
      ColumnBound("TS", upper = Some(nextMidnight), upperExclusive = true)))
    // strict lower just past the last micro of day 17486 excludes it
    assert(!IcebergPruning.fileMayMatch(evTable,
      statlessFile(Some(17486), None),
      ColumnBound("TS", lower = Some("2017-11-16T23:59:59.999999"),
        lowerExclusive = true)))
    assert(IcebergPruning.fileMayMatch(evTable,
      statlessFile(Some(17486), None),
      ColumnBound("TS", lower = Some("2017-11-16T23:59:59.999999"))))
  }

  test("monotonic signal: string equality and IN-sets prune through " +
      "truncate[2] partition values; nullness is exact through any " +
      "transform field") {
    def mayEq(tagVal: String, cand: String): Boolean =
      IcebergPruning.fileMayMatch(evTable,
        statlessFile(Some(17486), Some(tagVal)), ColumnBound.eq("TAG", cand))
    assert(mayEq("ab", "abc")) // truncate2("abc") = "ab" = file value
    assert(!mayEq("ab", "acx")) // "ac" ≠ "ab"
    assert(!mayEq("ab", "a")) // "a" ≠ "ab" (shorter stays itself)
    assert(IcebergPruning.fileMayMatch(evTable,
      statlessFile(Some(17486), Some("ab")),
      ColumnBound.in("TAG", Seq("zz9", "abX"))))
    assert(!IcebergPruning.fileMayMatch(evTable,
      statlessFile(Some(17486), Some("ab")),
      ColumnBound.in("TAG", Seq("zz9", "yy8"))))
    // range bound through truncate (order-preserving)
    assert(!IcebergPruning.fileMayMatch(evTable,
      statlessFile(Some(17486), Some("ab")),
      ColumnBound("TAG", lower = Some("ac"), upper = None)))
    assert(IcebergPruning.fileMayMatch(evTable,
      statlessFile(Some(17486), Some("ab")),
      ColumnBound("TAG", lower = Some("abz"), upper = None)))
    // nullness: exact from the day() field alone — no stats present
    assert(!IcebergPruning.fileMayMatch(evTable,
      statlessFile(Some(17486), Some("ab")), ColumnBound.isNull("TS")))
    assert(IcebergPruning.fileMayMatch(evTable,
      statlessFile(None, Some("ab")), ColumnBound.isNull("TS")))
    assert(!IcebergPruning.fileMayMatch(evTable,
      statlessFile(None, Some("ab")), ColumnBound.notNull("TS")))
  }

  // ---------------------------------------------------------------
  // end to end through the migration writer and the read path
  // ---------------------------------------------------------------

  private def evRows(rows: Seq[(Long, String, String, Double)]) = {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("ID", LongType, nullable = false),
      StructField("TS", TimestampNTZType),
      StructField("TAG", StringType),
      StructField("V", DoubleType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r =>
        org.apache.spark.sql.Row(r._1,
          Option(r._2).map(java.time.LocalDateTime.parse).orNull,
          r._3, r._4)), 2),
      schema)
  }

  test("day(ts) + truncate[2](tag) end to end: directories carry the " +
      "transform values, sources stay physical, pruned reads are " +
      "row-equal, appends and time travel compose") {
    val out = java.nio.file.Files.createTempDirectory("iceberg_hidden").toString
    SchemaTranslator.migrateTable(evRows(Seq(
      (1L, "2024-03-01T10:00:00", "alpha", 1.0),
      (2L, "2024-03-01T23:59:59", "alps", 2.0),
      (3L, "2024-03-02T00:00:00", "beta", 3.0))), evTable, out)
    SchemaTranslator.appendIncrement(evRows(Seq(
      (4L, "2024-03-03T05:00:00", "gamma", 4.0),
      (5L, null, "alpha", 5.0))), evTable, out)

    // the layout IS hidden partitioning: transform dirs, physical source
    val files = IcebergSnapshot.listDataFiles(
      new org.apache.hadoop.fs.Path(s"$out/data"), evTable, hconf)
    assert(files.forall(f => f.path.contains("TS_day=") &&
      f.path.contains("TAG_trunc=")))
    val full = IcebergSnapshot.readSnapshot(spark, out, evTable)
    assert(full.columns.toSeq === Seq("ID", "TS", "TAG", "V"),
      "transform fields are directory-only; the source columns are read " +
        "back physical, no _day/_trunc column surfaces")
    assert(full.count() === 5L)

    def ids(pruning: Seq[ColumnBound], pred: org.apache.spark.sql.Column)
        : Set[Long] = {
      val (kept, skipped) = IcebergPruning.planScan(hconf, out, evTable, pruning)
      assert((kept ++ skipped).toSet ===
        IcebergPruning.planScan(hconf, out, evTable, Nil)._1.toSet)
      assert(skipped.nonEmpty, "the transform signal must skip files")
      val pruned = IcebergSnapshot.readSnapshot(spark, out, evTable,
        pruning = pruning)
      val expect = full.where(pred).select("ID").collect()
        .map(_.getLong(0)).toSet
      val got = pruned.select("ID").collect().map(_.getLong(0)).toSet
      assert(got === expect)
      got
    }
    // one-day range: only 2024-03-01 rows
    assert(ids(
      Seq(ColumnBound("TS", lower = Some("2024-03-01T00:00:00"),
        upper = Some("2024-03-01T23:59:59"))),
      col("TS") >= "2024-03-01T00:00:00" && col("TS") <= "2024-03-01T23:59:59")
      === Set(1L, 2L))
    // prefix family: truncate[2] equality candidates
    assert(ids(Seq(ColumnBound.in("TAG", Seq("alpha", "alps"))),
      col("TAG").isin("alpha", "alps")) === Set(1L, 2L, 5L))
    // null timestamp rows live in the null-day directory and are
    // exactly addressable
    assert(ids(Seq(ColumnBound.isNull("TS")), col("TS").isNull) === Set(5L))

    // a REPLACE rewrite keeps partition tuples: probes identical after
    graft.sources.IcebergMaintenance.rewriteZorder(
      spark, evTable, out, "ID", "V")
    val again = IcebergSnapshot.readSnapshot(spark, out, evTable,
      pruning = Seq(ColumnBound("TS", lower = Some("2024-03-01T00:00:00"),
        upper = Some("2024-03-01T23:59:59"))))
      .select("ID").collect().map(_.getLong(0)).toSet
    assert(again === Set(1L, 2L))
  }

  test("spec-migrating compaction re-stamps TRANSFORM tuples from the " +
      "data: after row-level deletes + compactWithDeletes, day() and " +
      "truncate() pruning still plans exactly over the rewritten files") {
    val out = java.nio.file.Files
      .createTempDirectory("iceberg_hidden_compact").toString
    SchemaTranslator.migrateTable(evRows(Seq(
      (1L, "2024-03-01T10:00:00", "alpha", 1.0),
      (2L, "2024-03-01T12:00:00", "alps", 2.0),
      (3L, "2024-03-02T09:00:00", "beta", 3.0),
      (4L, "2024-03-03T05:00:00", "gamma", 4.0))), evTable, out)
    IcebergDeletes.commitPositionDeletes(spark, evTable, out,
      col("ID") === 2L)
    IcebergDeletes.compactWithDeletes(spark, evTable, out)
    // net rows survive with the right values
    val full = IcebergSnapshot.readSnapshot(spark, out, evTable)
    assert(full.select("ID").collect().map(_.getLong(0)).toSet ===
      Set(1L, 3L, 4L))
    // the rewritten files' manifest tuples must still prune: the
    // 2024-03-01 day keeps only its own file(s), and a truncate
    // candidate addresses its prefix — if compaction had stamped raw
    // source values, these plans would refuse or mis-prune
    val dayBound = Seq(ColumnBound("TS",
      lower = Some("2024-03-01T00:00:00"),
      upper = Some("2024-03-01T23:59:59")))
    val (kept, skipped) = IcebergPruning.planScan(
      hconf, out, evTable, dayBound)
    assert(skipped.nonEmpty, "other days' rewritten files must skip")
    assert(IcebergSnapshot.readSnapshot(spark, out, evTable,
      pruning = dayBound).select("ID").collect().map(_.getLong(0)).toSet
      === Set(1L))
    assert(IcebergSnapshot.readSnapshot(spark, out, evTable,
      pruning = Seq(ColumnBound.eq("TAG", "gamma9")))
      .select("ID").collect().map(_.getLong(0)).toSet === Set.empty[Long],
      "truncate tuple on rewritten files prunes ga-prefix but the " +
        "residual drops the non-match")
    assert(IcebergSnapshot.readSnapshot(spark, out, evTable,
      pruning = Seq(ColumnBound.eq("TAG", "gamma")))
      .select("ID").collect().map(_.getLong(0)).toSet === Set(4L))
    assert(kept.nonEmpty)
  }

  test("evolution: addPartitionField(day) on a live table — old files " +
      "keep their spec and stay readable, new files prune by day") {
    val base = Db2Parser.parse(
      """CREATE TABLE S.EVOLVE (
        |  ID BIGINT NOT NULL,
        |  TS TIMESTAMP,
        |  V DOUBLE
        |);""".stripMargin).tables.head
    def rows(r: Seq[(Long, String, Double)]) = {
      import org.apache.spark.sql.types._
      val schema = StructType(Seq(
        StructField("ID", LongType, nullable = false),
        StructField("TS", TimestampNTZType),
        StructField("V", DoubleType)))
      spark.createDataFrame(
        spark.sparkContext.parallelize(r.map(x =>
          org.apache.spark.sql.Row(x._1,
            java.time.LocalDateTime.parse(x._2), x._3)), 2), schema)
    }
    val out = java.nio.file.Files.createTempDirectory("iceberg_evolve_day").toString
    SchemaTranslator.migrateTable(
      rows(Seq((1L, "2024-01-01T01:00:00", 1.0))), base, out)
    val evolved = IcebergEvolution.addPartitionField(
      IcebergEvolution.withExplicitIds(base), "TS", "day")
    IcebergEvolution.commitEvolution(evolved, out, hconf)
    SchemaTranslator.appendIncrement(
      rows(Seq((2L, "2024-06-01T01:00:00", 2.0))), evolved, out)

    val full = IcebergSnapshot.readSnapshot(spark, out, evolved)
    assert(full.select("ID").collect().map(_.getLong(0)).toSet === Set(1L, 2L))
    // a June predicate prunes the June-only NEW file's complement; the
    // pre-evolution file has no day value and survives on stats alone
    val (kept, skipped) = IcebergPruning.planScan(hconf, out, evolved,
      Seq(ColumnBound("TS", lower = Some("2024-06-01T00:00:00"),
        upper = Some("2024-06-01T23:59:59"))))
    assert(kept.exists(_.contains("TS_day=")),
      "the post-evolution file is kept via its day partition value")
    val pruned = IcebergSnapshot.readSnapshot(spark, out, evolved,
      pruning = Seq(ColumnBound("TS", lower = Some("2024-06-01T00:00:00"),
        upper = Some("2024-06-01T23:59:59"))))
    assert(pruned.select("ID").collect().map(_.getLong(0)).toSet === Set(2L))
  }

  test("initialSpec refuses what the spec refuses") {
    val t = Db2Parser.parse(
      """CREATE TABLE S.BAD (
        |  ID BIGINT NOT NULL,
        |  D DATE,
        |  X DOUBLE
        |);""".stripMargin).tables.head
    assert(intercept[IllegalArgumentException] {
      IcebergEvolution.initialSpec(t, Seq("D" -> "hour"))
    }.getMessage.contains("hour"))
    assert(intercept[IllegalArgumentException] {
      IcebergEvolution.initialSpec(t, Seq("X" -> "day"))
    }.getMessage.contains("not a date or timestamp"))
    assert(intercept[IllegalArgumentException] {
      IcebergEvolution.initialSpec(t, Seq("D" -> "truncate[4]"))
    }.getMessage.contains("not int/long/string"))
    assert(intercept[IllegalArgumentException] {
      IcebergEvolution.initialSpec(t, Seq("X" -> "bucket[16]"))
    }.getMessage.contains("not a legal"))
    assert(intercept[IllegalArgumentException] {
      IcebergEvolution.initialSpec(t,
        Seq("D" -> "day", "D" -> "day"))
    }.getMessage.toLowerCase.contains("duplicate"))
    // year/month on date are legal; day-on-date is the identity int
    val ok = IcebergEvolution.initialSpec(t, Seq("D" -> "month"))
    assert(graft.sources.IcebergMetadata
      .specFieldDefs(ok, 0).map(_.name) === Seq("D_month"))
  }
}
