package graft.assess

import scala.collection.mutable

import graft.mapping.TypeMapper
import graft.model._
import graft.parse.Db2Parser

/** Migration-readiness assessment (SURVEY.md §2.6 A1-A9).
  *
  * Semantics mirror `/root/reference/db2ice/assessor.py:152-517`:
  * per-column type-map issues with penalty accrual, per-table readiness
  * `max(0, 100 - Σpenalty)`, four component scores, a weighted overall
  * score, traffic-light levels and feature-usage counts.
  *
  * [[assessTable]] is a pure per-table function: in the distributed
  * engine it runs map-side after parsing, and only the tiny per-table
  * aggregate rows (not raw DDL) reach the final global rollup — the
  * global reduce is O(#tables), never O(#columns).
  */
object Assessor {

  // assessor.py:159-164
  val Weights: Map[String, Double] = Map(
    "datatype" -> 0.40, "constraint" -> 0.20, "partition" -> 0.15, "special" -> 0.25)

  // assessor.py:166-180
  val Penalties: Map[String, Int] = Map(
    "unsupported_type" -> 25,
    "lossy_conversion" -> 10,
    "compatible_type" -> 2,
    "editproc" -> 50,
    "validproc" -> 40,
    "fieldproc" -> 50,
    "xml_column" -> 30,
    "foreign_key" -> 5,
    "check_constraint" -> 5,
    "complex_partition" -> 20,
    "generated_column" -> 15,
    "large_lob" -> 10)

  def scoreToLevel(score: Double): String =
    if (score >= 80) ReadinessLevel.Green
    else if (score >= 50) ReadinessLevel.Yellow
    else ReadinessLevel.Red

  /** Assess a whole script (reference: assessor.py:186-274). */
  def assess(ddl: String): AssessmentReport = {
    val tables = Db2Parser.parse(ddl).tables
    if (tables.isEmpty)
      return AssessmentReport(criticalIssues = Seq(Issue(
        code = "SSC-EWI-DB2ICE-0000",
        severity = IssueSeverity.Critical,
        message = Some("No valid CREATE TABLE statements found in input"))))
    aggregate(tables.map(assessTable), tables)
  }

  /** Global rollup over per-table assessments (assessor.py:209-273). */
  def aggregate(assessments: Seq[TableAssessment], tables: Seq[TableDef]): AssessmentReport = {
    val typeDist = mutable.LinkedHashMap.empty[String, Int]
    var totalCols = 0
    var totalCons = 0
    var auto = 0; var manual = 0; var blocked = 0
    val crit = Vector.newBuilder[Issue]
    val warn = Vector.newBuilder[Issue]
    val info = Vector.newBuilder[Issue]
    val dts = Vector.newBuilder[Double]; val cts = Vector.newBuilder[Double]
    val pts = Vector.newBuilder[Double]; val sts = Vector.newBuilder[Double]

    for (ta <- assessments) {
      totalCols += ta.columnCount
      totalCons += ta.constraintCount
      for ((t, n) <- ta.typeDistribution) typeDist(t) = typeDist.getOrElse(t, 0) + n
      for (i <- ta.issues) i.severity match {
        case IssueSeverity.Critical => crit += i
        case IssueSeverity.Warning => warn += i
        case _ => info += i
      }
      if (!ta.canAutoConvert) {
        if (ta.issues.exists(_.severity == IssueSeverity.Critical)) blocked += 1
        else manual += 1
      } else auto += 1
      val cs = componentScores(ta)
      dts += cs("datatype"); cts += cs("constraint")
      pts += cs("partition"); sts += cs("special")
    }

    def mean(xs: Vector[Double]): Double = if (xs.nonEmpty) xs.sum / xs.length else 100.0
    val dScore = mean(dts.result()); val cScore = mean(cts.result())
    val pScore = mean(pts.result()); val sScore = mean(sts.result())
    val overall = dScore * Weights("datatype") + cScore * Weights("constraint") +
      pScore * Weights("partition") + sScore * Weights("special")

    AssessmentReport(
      tablesTotal = assessments.length,
      tablesAuto = auto, tablesManual = manual, tablesBlocked = blocked,
      overallScore = overall,
      overallLevel = scoreToLevel(overall),
      datatypeScore = dScore, constraintScore = cScore,
      partitionScore = pScore, specialFeaturesScore = sScore,
      totalColumns = totalCols, totalConstraints = totalCons,
      criticalIssues = crit.result(), warnings = warn.result(), infoItems = info.result(),
      tableAssessments = assessments,
      typeDistribution = typeDist.toMap,
      featuresUsed = aggregateFeatures(tables))
  }

  /** Per-table assessment (reference: assessor.py:276-430). */
  def assessTable(table: TableDef): TableAssessment = {
    val issues = Vector.newBuilder[Issue]
    val typeDist = mutable.LinkedHashMap.empty[String, Int]
    var penalties = 0
    var canAuto = true
    val fullName = table.fullName

    for (col <- table.columns) {
      val baseType = col.dataType.split('(')(0).trim
      typeDist(baseType) = typeDist.getOrElse(baseType, 0) + 1

      val mapping = TypeMapper.mapType(col.dataType, col.length, col.precision,
        col.scale, col.forBitData, col.ccsid)

      mapping.status match {
        case ConversionStatus.Unsupported =>
          penalties += Penalties("unsupported_type")
          canAuto = false
          issues += Issue(
            code = mapping.ewiCode.getOrElse("SSC-EWI-DB2ICE-0099"),
            severity = IssueSeverity.Critical,
            message = Some(mapping.ewiMessage.getOrElse(s"Unsupported type: ${col.dataType}")),
            tableName = Some(fullName), columnName = Some(col.name),
            suggestion = Some("Manual conversion required - consider alternative data model"))
        case ConversionStatus.Lossy =>
          penalties += Penalties("lossy_conversion")
          issues += Issue(
            code = mapping.ewiCode.getOrElse("SSC-EWI-DB2ICE-0098"),
            severity = IssueSeverity.Warning,
            message = Some(mapping.ewiMessage.getOrElse(s"Lossy conversion: ${col.dataType}")),
            tableName = Some(fullName), columnName = Some(col.name),
            suggestion = Some("Review data to ensure no precision/data loss"))
        case ConversionStatus.Compatible if mapping.ewiCode.isDefined =>
          penalties += Penalties("compatible_type")
          issues += Issue(
            code = mapping.ewiCode.get,
            severity = IssueSeverity.Info,
            message = mapping.ewiMessage,
            tableName = Some(fullName), columnName = Some(col.name))
        case _ => ()
      }

      col.fieldproc.foreach { fp =>
        penalties += Penalties("fieldproc")
        canAuto = false
        issues += Issue("SSC-EWI-DB2ICE-0011", IssueSeverity.Critical,
          Some(s"FIELDPROC $fp - column data may be encrypted/transformed"),
          Some(fullName), Some(col.name),
          Some("Review FIELDPROC logic - data transformation required before migration"))
      }
      col.generated.foreach { g =>
        penalties += Penalties("generated_column")
        issues += Issue("SSC-EWI-DB2ICE-0014", IssueSeverity.Warning,
          Some(s"GENERATED $g column - Iceberg does not support generated columns"),
          Some(fullName), Some(col.name),
          Some("Remove GENERATED clause or compute values during ETL"))
      }
    }

    for (c <- table.constraints) c.ctype match {
      case "FOREIGN KEY" =>
        penalties += Penalties("foreign_key")
        issues += Issue("SSC-EWI-DB2ICE-0016", IssueSeverity.Info,
          Some("Foreign key constraint - not enforced in Iceberg tables"),
          Some(fullName), None,
          Some("Foreign key will be documented but not enforced"))
      case "CHECK" =>
        penalties += Penalties("check_constraint")
        issues += Issue("SSC-EWI-DB2ICE-0015", IssueSeverity.Info,
          Some("CHECK constraint - not enforced in Iceberg tables"),
          Some(fullName), None,
          Some("CHECK constraint will be documented but not enforced"))
      case _ => ()
    }

    table.editproc.foreach { e =>
      penalties += Penalties("editproc")
      canAuto = false
      issues += Issue("SSC-EWI-DB2ICE-0012", IssueSeverity.Critical,
        Some(s"EDITPROC $e - table uses edit procedure for data transformation"),
        Some(fullName), None,
        Some("Review EDITPROC logic - data may require transformation before migration"))
    }
    table.validproc.foreach { v =>
      penalties += Penalties("validproc")
      canAuto = false
      issues += Issue("SSC-EWI-DB2ICE-0013", IssueSeverity.Critical,
        Some(s"VALIDPROC $v - table uses validation procedure"),
        Some(fullName), None,
        Some("Implement validation logic in application layer or Snowflake procedures"))
    }
    table.partition.foreach { p =>
      if (p.ptype == "HASH") {
        penalties += Penalties("complex_partition")
        issues += Issue("SSC-EWI-DB2ICE-0017", IssueSeverity.Warning,
          Some("HASH partitioning not directly supported - will be removed"),
          Some(fullName), None,
          Some("Iceberg uses automatic micro-partitioning"))
      } else if (p.ptype == "RANGE") {
        issues += Issue("SSC-EWI-DB2ICE-0017", IssueSeverity.Info,
          Some("RANGE partitioning will be removed - Iceberg uses automatic partitioning"),
          Some(fullName), None,
          Some("Consider Iceberg partition transforms if needed"))
      }
    }

    val score = math.max(0, 100 - penalties).toDouble
    TableAssessment(
      tableName = table.name,
      schema = table.schema,
      columnCount = table.columns.length,
      constraintCount = table.constraints.length,
      readinessScore = score,
      readinessLevel = scoreToLevel(score),
      canAutoConvert = canAuto,
      issues = issues.result(),
      typeDistribution = typeDist.toMap)
  }

  // EWI-code sets driving component scoring (assessor.py:432-465)
  private val DatatypeCodes = (1 to 10).map(i => f"SSC-EWI-DB2ICE-$i%04d").toSet
  private val ConstraintCodes = Set("SSC-EWI-DB2ICE-0015", "SSC-EWI-DB2ICE-0016")
  private val SpecialCodes = Set("SSC-EWI-DB2ICE-0011", "SSC-EWI-DB2ICE-0012",
    "SSC-EWI-DB2ICE-0013", "SSC-EWI-DB2ICE-0014")

  /** Four component scores for one table (assessor.py:432-465). */
  def componentScores(ta: TableAssessment): Map[String, Double] = {
    var datatype = 100.0; var constraint = 100.0; var partition = 100.0; var special = 100.0
    for (issue <- ta.issues) {
      val code = issue.code
      if (code.contains("DATATYPE") || DatatypeCodes.contains(code)) {
        val p = issue.severity match {
          case IssueSeverity.Info => 5
          case IssueSeverity.Warning => 15
          case _ => 30
        }
        datatype = math.max(0, datatype - p)
      } else if (ConstraintCodes.contains(code)) {
        val p = if (issue.severity == IssueSeverity.Info) 5 else 10
        constraint = math.max(0, constraint - p)
      } else if (code == "SSC-EWI-DB2ICE-0017") {
        val p = if (issue.severity == IssueSeverity.Info) 10 else 20
        partition = math.max(0, partition - p)
      } else if (SpecialCodes.contains(code)) {
        val p = issue.severity match {
          case IssueSeverity.Info => 10
          case IssueSeverity.Warning => 25
          case _ => 50
        }
        special = math.max(0, special - p)
      }
    }
    Map("datatype" -> datatype, "constraint" -> constraint,
      "partition" -> partition, "special" -> special)
  }

  /** Feature-usage counts across tables (assessor.py:476-517). */
  def aggregateFeatures(tables: Seq[TableDef]): Map[String, Int] = {
    var editproc = 0; var validproc = 0; var fieldproc = 0; var partitioning = 0
    var generated = 0; var fks = 0; var checks = 0; var xml = 0; var graphic = 0; var lob = 0
    for (t <- tables) {
      if (t.editproc.isDefined) editproc += 1
      if (t.validproc.isDefined) validproc += 1
      if (t.partition.isDefined) partitioning += 1
      for (c <- t.columns) {
        if (c.fieldproc.isDefined) fieldproc += 1
        if (c.generated.isDefined) generated += 1
        val dt = c.dataType.toUpperCase
        if (dt == "XML") xml += 1
        if (Set("GRAPHIC", "VARGRAPHIC", "DBCLOB", "LONG VARGRAPHIC").contains(dt)) graphic += 1
        if (Set("CLOB", "BLOB", "DBCLOB").contains(dt)) lob += 1
      }
      for (c <- t.constraints) {
        if (c.ctype == "FOREIGN KEY") fks += 1
        else if (c.ctype == "CHECK") checks += 1
      }
    }
    Map(
      "editproc" -> editproc, "validproc" -> validproc, "fieldproc" -> fieldproc,
      "partitioning" -> partitioning, "generated_columns" -> generated,
      "foreign_keys" -> fks, "check_constraints" -> checks,
      "xml_columns" -> xml, "graphic_columns" -> graphic, "lob_columns" -> lob)
  }

  /** Report → JSON matching the reference's to_dict structure
    * (assessor.py:95-149). Scores rounded half-even to 1 decimal like
    * Python's round(). */
  def toJson(r: AssessmentReport): String = {
    def jstr(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    def jopt(o: Option[String]): String = o.map(jstr).getOrElse("null")
    def round1(d: Double): String = {
      // Python's round() rounds the EXACT binary double (74.35 is really
      // 74.3499…, so it rounds DOWN). Scala's BigDecimal(Double) goes
      // through Double.toString ("74.35") and would round up — use the
      // exact-value constructor for parity.
      val bd = new java.math.BigDecimal(d)
        .setScale(1, java.math.RoundingMode.HALF_EVEN)
      bd.toPlainString
    }
    def issueJson(i: Issue): String =
      s"""{"code": ${jstr(i.code)}, "severity": ${jstr(i.severity)}, "message": ${jopt(i.message)}, "table": ${jopt(i.tableName)}, "column": ${jopt(i.columnName)}, "suggestion": ${jopt(i.suggestion)}}"""
    def taJson(t: TableAssessment): String =
      s"""{"name": ${jstr(t.fullName)}, "columns": ${t.columnCount}, "constraints": ${t.constraintCount}, "score": ${round1(t.readinessScore)}, "level": ${jstr(t.readinessLevel)}, "can_auto_convert": ${t.canAutoConvert}, "issues": [${t.issues.map(issueJson).mkString(", ")}]}"""
    def mapJson(m: Map[String, Int]): String =
      "{" + m.map { case (k, v) => s"${jstr(k)}: $v" }.mkString(", ") + "}"

    s"""{"summary": {"tables_total": ${r.tablesTotal}, "tables_auto_convert": ${r.tablesAuto}, "tables_manual_review": ${r.tablesManual}, "tables_blocked": ${r.tablesBlocked}}, """ +
      s""""readiness": {"overall_score": ${round1(r.overallScore)}, "overall_level": ${jstr(r.overallLevel)}, "datatype_score": ${round1(r.datatypeScore)}, "constraint_score": ${round1(r.constraintScore)}, "partition_score": ${round1(r.partitionScore)}, "special_features_score": ${round1(r.specialFeaturesScore)}}, """ +
      s""""inventory": {"total_columns": ${r.totalColumns}, "total_constraints": ${r.totalConstraints}}, """ +
      s""""issues": {"critical": [${r.criticalIssues.map(issueJson).mkString(", ")}], "warnings": [${r.warnings.map(issueJson).mkString(", ")}], "info": [${r.infoItems.map(issueJson).mkString(", ")}]}, """ +
      s""""type_distribution": ${mapJson(r.typeDistribution)}, """ +
      s""""features_used": ${mapJson(r.featuresUsed)}, """ +
      s""""tables": [${r.tableAssessments.map(taJson).mkString(", ")}]}"""
  }
}
