package graft.assess

import graft.model.{AssessmentReport, Issue, ReadinessLevel, TableAssessment}

/** S8 report sink: renders an [[AssessmentReport]] to the reference
  * PDF's textual content, page-structured (reference:
  * `app.py:49-263` `generate_assessment_pdf` — every `pdf.cell` text
  * in order, cells joined into visual lines, `add_page` boundaries as
  * page headers/footers). No PDF library exists in this environment,
  * so the sink emits the paginated TEXT the PDF would carry; the
  * golden test pins it byte-identically against output produced by
  * EXECUTING the reference's own generator with a text-recording
  * FPDF stand-in (`tools/gen_report_golden.py`).
  *
  * Faithfulness notes:
  *  - `{score:.0f}` formatting is Python's correctly-rounded
  *    half-to-even on the binary double → `new java.math.BigDecimal`
  *    + HALF_EVEN (NOT Scala's BigDecimal(Double), which rounds the
  *    shortest-decimal string — a parity trap found in round 2).
  *  - message/suggestion truncation widths (100/80/110/90) and the
  *    prefix-inclusion rules differ per section exactly as in the
  *    reference (e.g. page-1 suggestions truncate the suggestion
  *    alone; per-table suggestions truncate prefix+suggestion).
  */
object ReportRenderer {

  private def fmt0(d: Double): String =
    new java.math.BigDecimal(d)
      .setScale(0, java.math.RoundingMode.HALF_EVEN)
      .toBigInteger.toString

  private def trunc(s: String, max: Int, keep: Int): String =
    if (s.length > max) s.substring(0, keep) + "..." else s

  private def overallStatus(level: String): String = level match {
    case ReadinessLevel.Green  => "Ready to Convert"
    case ReadinessLevel.Yellow => "Review Recommended"
    case _                     => "Action Required"
  }

  private def tableStatus(level: String): String = level match {
    case ReadinessLevel.Green  => "Auto-convertible"
    case ReadinessLevel.Yellow => "Needs Review"
    case _                     => "Blocked"
  }

  /** app.py:131-158 / 168-193: one issue in the Critical/Warnings
    * sections — code line, message (truncated at 100), optional
    * location, optional suggestion (truncated at 80). */
  private def issueLines(i: Issue): Seq[String] = {
    val msg = i.message.getOrElse("")
    Seq(s"[${i.code}]", "  " + trunc(msg, 100, 97)) ++
      i.tableName.map { t =>
        "  Location: " + t + i.columnName.map(c => s" -> $c").getOrElse("")
      }.toSeq ++
      i.suggestion.map(s => "  Suggestion: " + trunc(s, 80, 77)).toSeq
  }

  private def header(generatedAt: String): Seq[String] =
    Seq("DB2ICE Assessment Report", s"Generated: $generatedAt")

  /** The full paginated report text: page lines in order, each page
    * closed by its `Page i/nb` footer. */
  def renderAssessment(r: AssessmentReport, generatedAt: String): Seq[String] = {
    val p1 = Vector.newBuilder[String]
    p1 ++= header(generatedAt)
    p1 += "Migration Readiness Score"
    p1 += fmt0(r.overallScore) + "%" + s"  ${overallStatus(r.overallLevel)}"
    p1 += "Score Breakdown:"
    Seq(
      "Data Types" -> r.datatypeScore,
      "Constraints" -> r.constraintScore,
      "Partitions" -> r.partitionScore,
      "Special Features" -> r.specialFeaturesScore,
    ).foreach { case (n, s) => p1 += s"  $n:" + fmt0(s) + "%" }
    p1 += "Summary Statistics"
    Seq(
      "Total Tables" -> r.tablesTotal,
      "Auto-convertible (Green)" -> r.tablesAuto,
      "Need Review (Yellow)" -> r.tablesManual,
      "Blocked (Red)" -> r.tablesBlocked,
      "Total Columns" -> r.totalColumns,
      "Total Constraints" -> r.totalConstraints,
    ).foreach { case (n, v) => p1 += s"  $n:" + v }
    if (r.criticalIssues.nonEmpty) {
      p1 += s"Critical Issues (${r.criticalIssues.length})"
      p1 += "These must be resolved before migration"
      r.criticalIssues.foreach(i => p1 ++= issueLines(i))
    }
    if (r.warnings.nonEmpty) {
      p1 += s"Warnings (${r.warnings.length})"
      r.warnings.foreach(i => p1 ++= issueLines(i))
    }
    if (r.infoItems.nonEmpty) {
      p1 += s"Information (${r.infoItems.length})"
      r.infoItems.foreach { i =>
        p1 += trunc(s"[${i.code}] ${i.message.getOrElse("")}", 110, 107)
      }
    }
    val pages = Vector.newBuilder[Seq[String]]
    pages += p1.result()
    if (r.tableAssessments.nonEmpty) {
      val p2 = Vector.newBuilder[String]
      p2 ++= header(generatedAt)
      p2 += "Table-by-Table Analysis"
      r.tableAssessments.foreach { ta: TableAssessment =>
        p2 += s"  ${ta.fullName}"
        p2 += s"    Score: ${fmt0(ta.readinessScore)}% | Status: " +
          s"${tableStatus(ta.readinessLevel)} | Columns: ${ta.columnCount} | " +
          s"Constraints: ${ta.constraintCount}"
        if (ta.issues.nonEmpty) {
          p2 += s"    Issues (${ta.issues.length}):"
          ta.issues.foreach { i =>
            p2 += trunc(s"      - [${i.code}] ${i.message.getOrElse("")}", 90, 87)
            i.suggestion.foreach(s => p2 += trunc(s"        Suggestion: $s", 80, 77))
          }
        }
      }
      pages += p2.result()
    }
    val all = pages.result()
    paginate(all)
  }

  /** Conversion report (reference: `app.py:266-411`
    * `generate_conversion_pdf`): conversion summary + assessment
    * summary + critical issues on page 1, the converted DDL (one line
    * per cell, 130-char truncation) on page 2. */
  def renderConversion(result: graft.model.ConversionResult,
      r: AssessmentReport, generatedAt: String): Seq[String] = {
    val p1 = Vector.newBuilder[String]
    p1 ++= header(generatedAt)
    p1 += "Conversion Summary"
    p1 += s"Status: ${if (result.success) "Success" else "Failed"}"
    p1 += s"Tables Converted: ${result.tablesConverted}"
    p1 += s"EWI Markers: ${result.ewiCount}"
    if (result.ewiCount > 0)
      p1 += "Note: Search for \"!!!RESOLVE EWI!!!\" in the DDL output"
    p1 += "Assessment Summary"
    p1 += fmt0(r.overallScore) + "%" + s"  ${overallStatus(r.overallLevel)}"
    p1 += s"Data Types Score: ${fmt0(r.datatypeScore)}%"
    p1 += s"Constraints Score: ${fmt0(r.constraintScore)}%"
    p1 += s"Partitions Score: ${fmt0(r.partitionScore)}%"
    p1 += s"Special Features Score: ${fmt0(r.specialFeaturesScore)}%"
    p1 += "Table Statistics:"
    p1 += s"  Total Tables: ${r.tablesTotal}"
    p1 += s"  Auto-convertible: ${r.tablesAuto}"
    p1 += s"  Need Review: ${r.tablesManual}"
    p1 += s"  Blocked: ${r.tablesBlocked}"
    val totalIssues =
      r.criticalIssues.length + r.warnings.length + r.infoItems.length
    if (totalIssues > 0) {
      p1 += s"Issues Summary ($totalIssues total):"
      if (r.criticalIssues.nonEmpty) p1 += s"  Critical: ${r.criticalIssues.length}"
      if (r.warnings.nonEmpty) p1 += s"  Warnings: ${r.warnings.length}"
      if (r.infoItems.nonEmpty) p1 += s"  Information: ${r.infoItems.length}"
      if (r.criticalIssues.nonEmpty) {
        p1 += "Critical Issues:"
        r.criticalIssues.foreach { i =>
          p1 += s"[${i.code}]"
          p1 += "  " + trunc(i.message.getOrElse(""), 100, 97)
          i.suggestion.foreach(s => p1 += "  -> " + trunc(s, 80, 77))
        }
      }
    }
    val p2 = Vector.newBuilder[String]
    p2 ++= header(generatedAt)
    p2 += "Converted Snowflake Iceberg DDL"
    p2 += "Ready to execute in Snowflake"
    // Python's split('\n') keeps trailing empties → limit -1.
    result.icebergDdl.split("\n", -1).foreach(l => p2 += trunc(l, 130, 127))
    paginate(Vector(p1.result(), p2.result()))
  }

  private def paginate(pages: Seq[Seq[String]]): Seq[String] =
    pages.zipWithIndex.flatMap { case (page, i) =>
      page :+ s"Page ${i + 1}/${pages.length} - DB2ICE by Snowflake Cortex Code"
    }
}
