package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.api.Engine
import graft.assess.Assessor
import graft.convert.Db2Renderer
import graft.parse.Db2Parser

/** Distributed-pipeline parity: the Spark Engine must produce exactly
  * the local (pure-Scala) path's results, with ordering preserved
  * through the shuffle. */
class EngineSparkSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("engine-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  test("convertDb2 equals the local renderer byte-for-byte, per script") {
    val sample = Engine.sampleDdl("sample_db2.sql")
    val expected = Db2Renderer.convert(sample)
    val scripts = Engine.scriptsOf(spark, (0 until 6).map(i => (s"s$i", sample))).repartition(3)
    val out = Engine.convertDb2(Engine.parseDb2(scripts)).collect()
    assert(out.length === 6)
    for (row <- out) {
      assert(row.getAs[String]("iceberg_ddl") === expected.icebergDdl)
      assert(row.getAs[Int]("ewi_count") === expected.ewiCount)
      assert(row.getAs[Int]("tables_converted") === expected.tablesConverted)
    }
  }

  test("assessReport matches the local assessor's aggregate") {
    val sample = Engine.sampleDdl("sample_db2.sql")
    val local = Assessor.assess(sample)
    val scripts = Engine.scriptsOf(spark, Seq(("only", sample)))
    val row = Engine.assessReport(Engine.assessRows(Engine.parseDb2(scripts))).collect().head
    assert(row.getAs[Int]("tables_total") === local.tablesTotal)
    assert(row.getAs[Int]("tables_auto") === local.tablesAuto)
    assert(row.getAs[Int]("tables_blocked") === local.tablesBlocked)
    assert(row.getAs[Int]("total_columns") === local.totalColumns)
    assert(row.getAs[Int]("total_constraints") === local.totalConstraints)
    assert(row.getAs[Int]("critical_issues") === local.criticalIssues.length)
    assert(row.getAs[Int]("warning_issues") === local.warnings.length)
    assert(row.getAs[Int]("info_issues") === local.infoItems.length)
    assert(math.abs(row.getAs[Double]("overall_score") - local.overallScore) < 1e-9)
    assert(row.getAs[String]("overall_level") === local.overallLevel)
  }

  test("assessRollup: per-table level reproduces AssessRows; script level equals assessReport") {
    val sample = Engine.sampleDdl("sample_db2.sql")
    val scripts = Engine.scriptsOf(spark, Seq(("only", sample)))
    val assessRows = Engine.assessRows(Engine.parseDb2(scripts))
    val rolled = Engine.assessRollup(assessRows).collect()

    // level 0 = per-table: one row per assessed table, scores verbatim
    val perTable = rolled.filter(_.getAs[Int]("agg_level") == 0)
    val rows = assessRows.collect()
    assert(perTable.length === rows.length)
    val byName = perTable.map(r => r.getAs[String]("table_name") -> r).toMap
    for (ar <- rows) {
      val r = byName(ar.tableName)
      assert(r.getAs[Int]("tables_total") === 1)
      assert(r.getAs[Double]("datatype_score") === ar.datatypeScore)
      assert(r.getAs[Double]("special_features_score") === ar.specialScore)
      assert(r.getAs[Int]("critical_issues") === ar.nCritical)
      assert(r.getAs[Int]("total_columns") === ar.columnCount)
    }
    // level 1 = per-schema: table counts partition the total
    val perSchema = rolled.filter(_.getAs[Int]("agg_level") == 1)
    assert(perSchema.map(_.getAs[Int]("tables_total")).sum === rows.length)
    // level 3 = per-script: identical to the dedicated assessReport rollup
    val script = rolled.filter(_.getAs[Int]("agg_level") == 3)
    assert(script.length === 1)
    val report = Engine.assessReport(assessRows).collect().head
    for (c <- Seq("tables_total", "tables_auto", "tables_manual", "tables_blocked",
        "total_columns", "total_constraints", "critical_issues", "warning_issues",
        "info_issues"))
      assert(script.head.getAs[Int](c) === report.getAs[Int](c), c)
    for (c <- Seq("datatype_score", "constraint_score", "partition_score",
        "special_features_score", "overall_score"))
      assert(math.abs(script.head.getAs[Double](c) - report.getAs[Double](c)) < 1e-9, c)
    assert(script.head.getAs[String]("overall_level") === report.getAs[String]("overall_level"))
    // level 7 = grand total over every script (single script here)
    assert(rolled.count(_.getAs[Int]("agg_level") == 7) === 1)
  }

  test("typeDistribution rollup matches local; featureUsage matches local") {
    val sample = Engine.sampleDdl("sample_db2.sql")
    val local = Assessor.assess(sample)
    val tables = Engine.parseDb2(Engine.scriptsOf(spark, Seq(("only", sample))))
    val dist = Engine.typeDistribution(Engine.assessRows(tables)).collect()
      .map(r => r.getAs[String]("base_type") -> r.getAs[Int]("n_columns")).toMap
    assert(dist === local.typeDistribution)
    val feats = Engine.featureUsage(tables).collect().head
    val localFeats = Assessor.aggregateFeatures(Db2Parser.parse(sample).tables)
    for ((k, v) <- localFeats) assert(feats.getAs[Int](k) === v, k)
  }

  test("snowflake path per-script results match local renderer") {
    val sample = Engine.sampleDdl("sample_snowflake.sql")
    val local = graft.snowflake.SnowflakeRenderer.convert(sample)
    val out = Engine.convertSnowflake(
      Engine.scriptsOf(spark, Seq(("a", sample), ("b", sample)))).collect()
    assert(out.length === 2)
    for (row <- out) {
      assert(row.getAs[String]("iceberg_ddl") === local.icebergDdl)
      assert(row.getAs[Int]("ewi_count") === local.ewiCount)
      assert(row.getAs[Int]("tables_converted") === local.tablesConverted)
    }
  }
}
