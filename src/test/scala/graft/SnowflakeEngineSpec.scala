package graft

import scala.io.Source

import org.json4s._
import org.json4s.jackson.JsonMethods
import org.scalatest.funsuite.AnyFunSuite

import graft.convert.RenderConfig
import graft.model.IssueSeverity
import graft.snowflake.{SnowflakeParser, SnowflakeRenderer}

/** Golden-parity tests for the Snowflake→Iceberg path against outputs
  * produced by the reference implementation on its own sample DDL
  * (cited from /root/reference/app.py:917-1086, README.md:499-526). */
class SnowflakeEngineSpec extends AnyFunSuite {

  private def res(name: String): String = {
    val src = Source.fromInputStream(getClass.getResourceAsStream(s"/golden/$name"), "UTF-8")
    try src.mkString finally src.close()
  }

  test("parser: sample parses 9 tables with correct kinds") {
    val tables = SnowflakeParser.parse(res("sample_snowflake.sql"))
    assert(tables.length === 9)
    assert(tables.map(_.fullName) === Vector(
      "ANALYTICS.DIM_CUSTOMER", "ANALYTICS.FACT_SALES", "CATALOG.PRODUCTS",
      "ANALYTICS.DIM_DATE", "STAGING.SESSION_CART", "STAGING.STG_ORDERS",
      "ANALYTICS.DAILY_SALES_SUMMARY", "RAW.EXT_CUSTOMER_EVENTS",
      "OPERATIONAL.INVENTORY_LEVELS"))
    val dim = tables.head
    assert(dim.clusterBy === Seq("CUSTOMER_KEY"))
    assert(dim.dataRetentionDays === Some(90))
    assert(dim.changeTracking)
    assert(dim.comment === Some("Customer dimension table"))
    assert(dim.columns.head.identity === Some("1,1"))
    assert(dim.primaryKey === Seq("CUSTOMER_ID"))
    assert(dim.uniqueKeys === Seq(Seq("CUSTOMER_KEY")))
    assert(tables(4).temporary && tables(5).transient)
    assert(tables(6).dynamic && tables(7).external && tables(8).hybrid)
    val fact = tables(1)
    assert(fact.foreignKeys.length === 1)
    assert(fact.foreignKeys.head.refTable === "ANALYTICS.DIM_CUSTOMER")
    assert(fact.clusterBy === Seq("SALE_DATE", "REGION"))
  }

  test("golden: sample converts byte-identically to reference output") {
    val got = SnowflakeRenderer.convert(res("sample_snowflake.sql"))
    assert(got.tablesConverted === 9)
    assert(got.ewiCount === 9)
    assert(got.issues.length === 13)
    assert(got.icebergDdl === res("sample_snowflake.iceberg.sql"))
  }

  test("golden: issue list matches the reference") {
    val got = SnowflakeRenderer.convert(res("sample_snowflake.sql"))
    val expected = JsonMethods.parse(res("sample_snowflake.issues.json")) match {
      case JArray(items) => items
      case _ => fail("expected array")
    }
    assert(got.issues.length === expected.length)
    for ((gi, ei) <- got.issues.zip(expected)) {
      val eo = ei.asInstanceOf[JObject].obj.toMap
      def str(k: String): Option[String] = eo.get(k).collect { case JString(s) => s }
      assert(Some(gi.code) === str("code"))
      assert(Some(gi.severity) === str("severity"))
      assert(gi.message === str("message"))
      assert(gi.tableName === str("table_name"))
      assert(gi.columnName === str("column_name"))
      assert(gi.suggestion === str("suggestion"))
    }
  }

  test("golden: README snowflake example") {
    val ddl =
      """CREATE TABLE analytics.events (
        |    event_id INTEGER,
        |    event_data VARIANT,
        |    location GEOGRAPHY,
        |    created_at TIMESTAMP_NTZ(9)
        |);""".stripMargin
    val got = SnowflakeRenderer.convert(ddl, RenderConfig(externalVolume = "my_iceberg_volume"))
    // Code-truth output (README's shortened EWI text differs from code)
    assert(got.icebergDdl.contains("CREATE OR REPLACE ICEBERG TABLE ANALYTICS.EVENTS ("))
    assert(got.icebergDdl.contains("EVENT_DATA VARCHAR"))
    assert(got.icebergDdl.contains("SSC-EWI-SF2ICE-0001"))
    assert(got.icebergDdl.contains("LOCATION VARCHAR"))
    assert(got.icebergDdl.contains("SSC-EWI-SF2ICE-0004"))
    assert(got.icebergDdl.contains("CREATED_AT TIMESTAMP_NTZ(6)"))
    assert(got.icebergDdl.contains("SSC-EWI-SF2ICE-0007"))
    assert(got.icebergDdl.contains("BASE_LOCATION = 'analytics/events'"))
    assert(got.ewiCount === 3)
  }

  test("assessment report: scores, categories, issue re-attachment") {
    val ddl = res("sample_snowflake.sql")
    val conv = SnowflakeRenderer.convert(ddl)
    val rep = SnowflakeRenderer.assessmentReport(conv, ddl)
    assert(rep.tablesTotal === 9)
    // blocked: dynamic+external+hybrid = 3; manual: temp+transient+2 clustered = 4
    assert(rep.tablesBlocked === 3)
    assert(rep.tablesManual === 4)
    assert(rep.tablesAuto === 2)
    val crit = conv.issues.count(_.severity == IssueSeverity.Critical)
    val warn = conv.issues.count(_.severity == IssueSeverity.Warning)
    assert(rep.overallScore === math.max(0, math.min(100, 95 - crit * 15 - warn * 5)).toDouble)
    assert(rep.partitionScore === 100.0)
    val dimDate = rep.tableAssessments.find(_.tableName == "DIM_DATE").get
    assert(dimDate.readinessScore === 95.0 && dimDate.readinessLevel === "green")
    val dyn = rep.tableAssessments.find(_.tableName == "DAILY_SALES_SUMMARY").get
    assert(dyn.readinessScore === 0.0 && dyn.readinessLevel === "red")
  }
}
