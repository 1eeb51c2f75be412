package graft.snowflake

import java.util.regex.Pattern

import graft.convert.RenderConfig
import graft.model._

/** Snowflake Standard → Iceberg conversion (SURVEY.md §2.5 M18-M20,
  * §2.4 F3 routing) plus the derived assessment report (A11-A12).
  *
  * Semantics mirror `/root/reference/db2ice/snowflake_converter.py:340-775`
  * and the report builder at `/root/reference/app.py:414-525`:
  * TEMPORARY/TRANSIENT are kept as Standard tables (issues but zero EWI
  * markers), DYNAMIC/EXTERNAL/HYBRID are skipped (critical issue, exactly
  * one EWI each), everything else renders as an Iceberg table with the
  * VARIANT/OBJECT/ARRAY/GEOGRAPHY/GEOMETRY → VARCHAR rewrites and
  * timestamp-precision forcing.
  */
object SnowflakeRenderer {

  val EwiTemplate = "!!!RESOLVE EWI!!! /*** %s - %s ***/!!!"

  private val IdentPattern = Pattern.compile("^[A-Za-z_][A-Za-z0-9_]*$")
  private val Reserved = Set(
    "ORDER", "GROUP", "SELECT", "FROM", "WHERE", "TABLE", "INDEX",
    "CREATE", "DROP", "ALTER", "INSERT", "UPDATE", "DELETE", "VALUES",
    "AND", "OR", "NOT", "NULL", "TRUE", "FALSE", "DATE", "TIME", "TIMESTAMP")
  private val WordPattern = Pattern.compile("""(\w+)""")
  private val PrecisionPattern = Pattern.compile("""\((\d+)\)""")

  // snowflake_converter.py:357-366
  val TypeConversions: Map[String, (String, String, String)] = Map(
    "VARIANT" -> (("VARCHAR", "SSC-EWI-SF2ICE-0001",
      "VARIANT not supported in Iceberg - converted to VARCHAR. Parse JSON at query time or use structured types")),
    "OBJECT" -> (("VARCHAR", "SSC-EWI-SF2ICE-0002",
      "Semi-structured OBJECT not supported in Iceberg - converted to VARCHAR. Use structured OBJECT with defined schema instead")),
    "ARRAY" -> (("VARCHAR", "SSC-EWI-SF2ICE-0003",
      "Semi-structured ARRAY not supported in Iceberg - converted to VARCHAR. Use structured ARRAY with defined element type instead")),
    "GEOGRAPHY" -> (("VARCHAR", "SSC-EWI-SF2ICE-0004",
      "GEOGRAPHY not supported in Iceberg - converted to VARCHAR. Store as WKT/GeoJSON string")),
    "GEOMETRY" -> (("VARCHAR", "SSC-EWI-SF2ICE-0005",
      "GEOMETRY not supported in Iceberg - converted to VARCHAR. Store as WKT/GeoJSON string")))

  // snowflake_converter.py:369-376
  val TimestampTypes: Map[String, (String, String, String)] = Map(
    "TIME" -> (("TIME(6)", "SSC-EWI-SF2ICE-0006",
      "TIME precision adjusted to 6 (microseconds) for Iceberg compatibility")),
    "TIMESTAMP" -> (("TIMESTAMP_NTZ(6)", "SSC-EWI-SF2ICE-0007",
      "TIMESTAMP precision adjusted to 6 (microseconds) for Iceberg compatibility")),
    "TIMESTAMP_NTZ" -> (("TIMESTAMP_NTZ(6)", "SSC-EWI-SF2ICE-0007",
      "TIMESTAMP_NTZ precision adjusted to 6 for Iceberg compatibility")),
    "TIMESTAMP_LTZ" -> (("TIMESTAMP_LTZ(6)", "SSC-EWI-SF2ICE-0008",
      "TIMESTAMP_LTZ precision adjusted to 6 for Iceberg compatibility")),
    "TIMESTAMP_TZ" -> (("TIMESTAMP_LTZ(6)", "SSC-EWI-SF2ICE-0009",
      "TIMESTAMP_TZ converted to TIMESTAMP_LTZ(6) for Iceberg compatibility")),
    "DATETIME" -> (("TIMESTAMP_NTZ(6)", "SSC-EWI-SF2ICE-0007",
      "DATETIME converted to TIMESTAMP_NTZ(6) for Iceberg compatibility")))

  // snowflake_converter.py:379-388
  val UnsupportedFeatures: Map[String, (String, String)] = Map(
    "transient" -> (("SSC-EWI-SF2ICE-0010", "TRANSIENT tables not supported in Iceberg - will be persistent")),
    "temporary" -> (("SSC-EWI-SF2ICE-0011", "TEMPORARY tables not supported in Iceberg")),
    "cluster_by" -> (("SSC-EWI-SF2ICE-0012", "CLUSTER BY not directly supported - Iceberg uses different optimization")),
    "data_retention" -> (("SSC-EWI-SF2ICE-0013", "DATA_RETENTION_TIME_IN_DAYS not applicable to Iceberg tables")),
    "change_tracking" -> (("SSC-EWI-SF2ICE-0014", "CHANGE_TRACKING not applicable to Iceberg tables")),
    "identity" -> (("SSC-EWI-SF2ICE-0015", "IDENTITY/AUTOINCREMENT not supported in Iceberg tables")),
    "masking_policy" -> (("SSC-EWI-SF2ICE-0016", "Masking policies need to be re-applied after conversion")),
    "collate" -> (("SSC-EWI-SF2ICE-0017", "COLLATE clause not supported in Iceberg tables")))

  /** Convert a whole script (snowflake_converter.py:401-425). */
  def convert(ddl: String, cfg: RenderConfig = RenderConfig()): SnowflakeConversionResult = {
    val tables = SnowflakeParser.parse(ddl)
    if (tables.isEmpty)
      return SnowflakeConversionResult("", success = false,
        errorMessage = Some("No valid CREATE TABLE statements found"))
    val rendered = tables.map(t => convertTable(t, cfg))
    SnowflakeConversionResult(
      icebergDdl = rendered.map(_._1).mkString("\n\n"),
      tablesConverted = tables.length,
      ewiCount = rendered.map(_._2).sum,
      issues = rendered.flatMap(_._3))
  }

  /** One table: route by kind then render (snowflake_converter.py:427-545). */
  def convertTable(table: SnowflakeTable, cfg: RenderConfig): (String, Int, Seq[Issue]) = {
    if (table.temporary) return keepAsStandard(table, "TEMPORARY", cfg)
    if (table.transient) return keepAsStandard(table, "TRANSIENT", cfg)
    if (table.dynamic) return skipUnsupported(table, "DYNAMIC",
      "Dynamic tables auto-refresh from a query and cannot be converted to Iceberg. " +
        "Consider creating the underlying source tables as Iceberg instead.", cfg)
    if (table.external) return skipUnsupported(table, "EXTERNAL",
      "External tables reference data in external stages. " +
        "Consider using Iceberg tables with the same external volume instead.", cfg)
    if (table.hybrid) return skipUnsupported(table, "HYBRID",
      "Hybrid tables are optimized for HTAP workloads. " +
        "Iceberg tables have different performance characteristics for mixed workloads.", cfg)

    val lines = Vector.newBuilder[String]
    var ewiCount = 0
    val issues = Vector.newBuilder[Issue]

    if (cfg.includeComments) lines += s"-- Converted from Snowflake Standard: ${table.fullName}"
    lines += s"CREATE OR REPLACE ICEBERG TABLE ${table.fullName.toUpperCase} ("

    for ((col, i) <- table.columns.zipWithIndex) {
      val (colLine, colEwi, colIssues) = convertColumn(col, table.fullName, cfg)
      ewiCount += colEwi
      issues ++= colIssues
      val comma = if (i < table.columns.length - 1 || table.primaryKey.nonEmpty) "," else ""
      lines += (colLine + comma)
    }
    if (table.primaryKey.nonEmpty)
      lines += s"    PRIMARY KEY (${table.primaryKey.map(formatIdentifier).mkString(", ")})"

    lines += ")"
    lines += "CATALOG = 'SNOWFLAKE'"
    lines += s"EXTERNAL_VOLUME = '${cfg.externalVolume}'"
    lines += s"BASE_LOCATION = '${baseLocation(table, cfg)}'"

    if (cfg.includeComments) {
      val comments = Vector.newBuilder[String]
      if (table.clusterBy.nonEmpty) {
        comments += s"-- Original CLUSTER BY: (${table.clusterBy.mkString(", ")})"
        comments += "-- NOTE: Iceberg uses automatic optimization instead of explicit clustering"
        if (cfg.includeEwi) {
          val (code, msg) = UnsupportedFeatures("cluster_by")
          issues += Issue(code, IssueSeverity.Info, Some(msg),
            tableName = Some(table.fullName),
            suggestion = Some("Consider Iceberg table optimization strategies"))
        }
      }
      // Python truthiness: retention 0 is falsy — comment omitted
      table.dataRetentionDays.filter(_ != 0).foreach(d =>
        comments += s"-- Original DATA_RETENTION_TIME_IN_DAYS: $d")
      if (table.changeTracking) comments += "-- Original CHANGE_TRACKING: TRUE"
      for (fk <- table.foreignKeys) {
        comments += s"-- FOREIGN KEY (${fk.columns.mkString(", ")}) REFERENCES ${fk.refTable}(${fk.refColumns.mkString(", ")})"
        comments += "-- NOTE: Foreign keys are not enforced in Iceberg tables"
      }
      for (uk <- table.uniqueKeys) {
        comments += s"-- UNIQUE (${uk.mkString(", ")})"
        comments += "-- NOTE: UNIQUE constraints are not enforced in Iceberg tables"
      }
      table.comment.foreach(c => comments += s"-- Table comment: $c")
      val cs = comments.result()
      if (cs.nonEmpty) { lines += ""; cs.foreach(lines += _) }
    }

    lines += ";"
    (lines.result().mkString("\n"), ewiCount, issues.result())
  }

  /** TEMPORARY/TRANSIENT kept as Standard — issues but ZERO EWI markers
    * (snowflake_converter.py:547-613). */
  def keepAsStandard(table: SnowflakeTable, tableType: String,
      cfg: RenderConfig): (String, Int, Seq[Issue]) = {
    val (reasonMain, reasonDetail, ewiCode, suggestion) = tableType match {
      case "TRANSIENT" => (
        "Iceberg tables always have durability (no transient option)",
        "The table will remain without Fail-safe as originally intended",
        "SSC-EWI-SF2ICE-0021",
        "Table will remain transient (no Fail-safe). Consider if transient behavior is needed or if Iceberg durability is acceptable.")
      case _ => (
        "Iceberg does not support temporary tables",
        "The table will remain session-scoped as originally intended",
        "SSC-EWI-SF2ICE-0020",
        "Table will remain session-scoped. Consider if temporary table is needed in target architecture.")
    }

    val lines = Vector.newBuilder[String]
    if (cfg.includeComments) {
      lines += s"-- $tableType table kept as Snowflake Standard (not converted to Iceberg)"
      lines += s"-- Reason: $reasonMain"
      lines += s"-- $reasonDetail"
    }
    lines += s"CREATE OR REPLACE $tableType TABLE ${table.fullName.toUpperCase} ("
    for ((col, i) <- table.columns.zipWithIndex) {
      val comma = if (i < table.columns.length - 1 || table.primaryKey.nonEmpty) "," else ""
      lines += (formatStandardColumn(col) + comma)
    }
    if (table.primaryKey.nonEmpty)
      lines += s"    PRIMARY KEY (${table.primaryKey.map(formatIdentifier).mkString(", ")})"
    lines += ");"

    val issue = Issue(ewiCode, IssueSeverity.Info,
      Some(s"$tableType table kept as Snowflake Standard - $reasonMain"),
      tableName = Some(table.fullName), suggestion = Some(suggestion))
    (lines.result().mkString("\n"), 0, Seq(issue))
  }

  /** DYNAMIC/EXTERNAL/HYBRID skipped — comment block only, one EWI
    * (snowflake_converter.py:615-649). */
  def skipUnsupported(table: SnowflakeTable, tableType: String, reason: String,
      cfg: RenderConfig): (String, Int, Seq[Issue]) = {
    val ewiCodes = Map("DYNAMIC" -> "SSC-EWI-SF2ICE-0022",
      "EXTERNAL" -> "SSC-EWI-SF2ICE-0023", "HYBRID" -> "SSC-EWI-SF2ICE-0024")
    val lines = Vector.newBuilder[String]
    if (cfg.includeComments) {
      lines += s"-- !!!! $tableType TABLE SKIPPED - Cannot convert to Iceberg !!!!"
      lines += s"-- Table: ${table.fullName}"
      lines += s"-- Reason: $reason"
      lines += "-- Action required: Review and handle this table manually"
    }
    val issue = Issue(ewiCodes.getOrElse(tableType, "SSC-EWI-SF2ICE-0025"),
      IssueSeverity.Critical,
      Some(s"$tableType table cannot be converted to Iceberg: ${table.fullName}"),
      tableName = Some(table.fullName), suggestion = Some(reason))
    (lines.result().mkString("\n"), 1, Seq(issue))
  }

  /** snowflake_converter.py:651-665. */
  def formatStandardColumn(col: SnowflakeColumn): String = {
    val parts = Vector.newBuilder[String]
    parts += s"    ${formatIdentifier(col.name)}"
    parts += col.dataType
    if (!col.nullable) parts += "NOT NULL"
    if (col.identity.isDefined) parts += "AUTOINCREMENT"
    col.defaultValue.foreach(d => parts += s"DEFAULT $d")
    parts.result().mkString(" ")
  }

  /** One column → Iceberg (snowflake_converter.py:667-748). */
  def convertColumn(col: SnowflakeColumn, tableName: String,
      cfg: RenderConfig): (String, Int, Seq[Issue]) = {
    var ewiCount = 0
    val issues = Vector.newBuilder[Issue]
    val markers = Vector.newBuilder[String]
    val parts = Vector.newBuilder[String]

    parts += s"    ${formatIdentifier(col.name)}"

    var dataType = col.dataType
    val bm = WordPattern.matcher(dataType)
    val baseType = if (dataType.nonEmpty && bm.lookingAt()) bm.group(1).toUpperCase else "VARCHAR"

    if (TypeConversions.contains(baseType)) {
      val (newType, code, msg) = TypeConversions(baseType)
      dataType = newType
      if (cfg.includeEwi) {
        markers += formatEwi(code, msg)
        issues += Issue(code, IssueSeverity.Critical, Some(msg),
          tableName = Some(tableName), columnName = Some(col.name))
        ewiCount += 1
      }
    } else if (TimestampTypes.contains(baseType)) {
      val pm = PrecisionPattern.matcher(col.dataType)
      val currentPrecision = if (pm.find()) Some(pm.group(1).toInt) else None
      val (newType, code, msg) = TimestampTypes(baseType)
      dataType = newType
      if (currentPrecision.exists(_ != 6) && cfg.includeEwi) {
        markers += formatEwi(code, msg)
        issues += Issue(code, IssueSeverity.Info, Some(msg),
          tableName = Some(tableName), columnName = Some(col.name))
        ewiCount += 1
      }
    }

    parts += dataType
    if (!col.nullable) parts += "NOT NULL"

    if (col.identity.isDefined && cfg.includeEwi) {
      val (code, msg) = UnsupportedFeatures("identity")
      markers += formatEwi(code, msg)
      issues += Issue(code, IssueSeverity.Warning, Some(msg),
        tableName = Some(tableName), columnName = Some(col.name),
        suggestion = Some("Use application-generated IDs or sequences"))
      ewiCount += 1
    }
    col.maskingPolicy.foreach { mp =>
      if (cfg.includeEwi) {
        val (code, msg) = UnsupportedFeatures("masking_policy")
        markers += formatEwi(code, s"$msg: $mp")
        issues += Issue(code, IssueSeverity.Warning, Some(msg),
          tableName = Some(tableName), columnName = Some(col.name),
          suggestion = Some(s"Re-apply masking policy $mp after conversion"))
        ewiCount += 1
      }
    }
    col.collate.foreach { cl =>
      if (cfg.includeEwi) {
        val (code, msg) = UnsupportedFeatures("collate")
        markers += formatEwi(code, s"$msg: $cl")
        issues += Issue(code, IssueSeverity.Info, Some(msg),
          tableName = Some(tableName), columnName = Some(col.name))
        ewiCount += 1
      }
    }

    val base = parts.result().mkString(" ")
    val ms = markers.result()
    val line = if (ms.nonEmpty) base + "\n" + ms.map("        " + _).mkString("\n") else base
    (line, ewiCount, issues.result())
  }

  def formatEwi(code: String, message: String): String = EwiTemplate.format(code, message)

  /** snowflake_converter.py:754-763 — note: the whole dotted table name is
    * upper-cased wholesale by _format_name; identifiers individually. */
  def formatIdentifier(id: String): String =
    if (Reserved.contains(id.toUpperCase) || !IdentPattern.matcher(id).matches())
      "\"" + id + "\""
    else id.toUpperCase

  /** snowflake_converter.py:769-775. */
  def baseLocation(table: SnowflakeTable, cfg: RenderConfig): String =
    cfg.baseLocationPattern
      .replace("{schema}", table.schema.getOrElse("default").toLowerCase)
      .replace("{table}", table.name.toLowerCase)

  // ---------------------------------------------------------------- A11/A12

  /** Assessment report derived from a conversion result
    * (reference: app.py:414-525). */
  def assessmentReport(result: SnowflakeConversionResult, ddl: String): AssessmentReport = {
    val tables = SnowflakeParser.parse(ddl)

    val crit = result.issues.filter(_.severity == IssueSeverity.Critical)
    val warn = result.issues.filter(_.severity == IssueSeverity.Warning)
    val info = result.issues.filter(i =>
      i.severity != IssueSeverity.Critical && i.severity != IssueSeverity.Warning)

    val overall = math.max(0, math.min(100, 95 - crit.length * 15 - warn.length * 5)).toDouble

    val anyTypeIssue = result.issues.exists(_.message.exists(_.toLowerCase.contains("type")))
    val blocked = tables.count(t => t.dynamic || t.external || t.hybrid)
    val manual = tables.count(t => t.temporary || t.transient || t.clusterBy.nonEmpty)

    val tas = tables.map { t =>
      val (level, score) =
        if (t.dynamic || t.external || t.hybrid) (ReadinessLevel.Red, 0.0)
        else if (t.temporary || t.transient) (ReadinessLevel.Yellow, 70.0)
        else if (t.clusterBy.nonEmpty) (ReadinessLevel.Yellow, 85.0)
        else (ReadinessLevel.Green, 95.0)
      val attached = (crit ++ warn ++ info).filter(i =>
        i.tableName.exists(tn => tn.toUpperCase.contains(t.name.toUpperCase)))
      TableAssessment(
        tableName = t.name,
        schema = Some(t.schema.getOrElse("default")),
        columnCount = t.columns.length,
        constraintCount = (if (t.primaryKey.nonEmpty) 1 else 0) + t.foreignKeys.length + t.uniqueKeys.length,
        readinessScore = score,
        readinessLevel = level,
        issues = attached)
    }

    AssessmentReport(
      tablesTotal = tables.length,
      tablesAuto = tables.length - blocked - manual,
      tablesManual = manual,
      tablesBlocked = blocked,
      overallScore = overall,
      overallLevel =
        if (overall >= 80) ReadinessLevel.Green
        else if (overall >= 50) ReadinessLevel.Yellow
        else ReadinessLevel.Red,
      datatypeScore = if (anyTypeIssue) 85.0 else 98.0,
      constraintScore = 95.0,
      partitionScore = 100.0,
      specialFeaturesScore = if (warn.nonEmpty) 80.0 else 95.0,
      totalColumns = tables.map(_.columns.length).sum,
      criticalIssues = crit, warnings = warn, infoItems = info,
      tableAssessments = tas)
  }
}
