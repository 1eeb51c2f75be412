package graft.convert

import java.util.regex.Pattern

import graft.mapping.TypeMapper
import graft.model._
import graft.parse.Db2Parser

/** Converter configuration (reference: converter.py:39-56). */
final case class RenderConfig(
    externalVolume: String = "<EXTERNAL_VOLUME>",
    baseLocationPattern: String = "{schema}/{table}",
    includeComments: Boolean = true,
    includeEwi: Boolean = true)

/** DB2 → Snowflake-Iceberg DDL rendering (SURVEY.md §2.7 O1-O3, §2.4 F3).
  *
  * Semantics mirror `/root/reference/db2ice/converter.py:25-394`:
  * VOLATILE/GTT route to TEMPORARY tables, everything else to
  * `CREATE OR REPLACE ICEBERG TABLE` with EWI markers for
  * UNSUPPORTED/LOSSY type maps, FIELDPROC and GENERATED columns, PK
  * inline, RANGE partition → PARTITION BY, DISTRIBUTE BY HASH →
  * CLUSTER BY, and non-PK constraints as documentation comments.
  *
  * Rendering one table is a pure `TableDef => (String, Int)` — in the
  * distributed engine it runs inside a per-table map after the parse
  * stage, and whole-script assembly is an ordered string aggregation.
  */
object Db2Renderer {

  val EwiTemplate = "!!!RESOLVE EWI!!! /*** %s - %s ***/!!!"

  private val IdentPattern = Pattern.compile("^[A-Za-z_][A-Za-z0-9_]*$")
  private val Reserved = Set(
    "ORDER", "GROUP", "SELECT", "FROM", "WHERE", "TABLE", "INDEX",
    "CREATE", "DROP", "ALTER", "INSERT", "UPDATE", "DELETE", "VALUES",
    "AND", "OR", "NOT", "NULL", "TRUE", "FALSE", "DATE", "TIME", "TIMESTAMP")

  /** Convert a whole script (reference: converter.py:62-101). */
  def convert(ddl: String, cfg: RenderConfig = RenderConfig()): ConversionResult = {
    val tables = Db2Parser.parse(ddl).tables
    if (tables.isEmpty)
      return ConversionResult("", success = false,
        errorMessage = Some("No valid CREATE TABLE statements found"))

    val rendered = tables.map(t => convertTable(t, cfg))
    ConversionResult(
      icebergDdl = rendered.map(_._1).mkString("\n\n"),
      ewiCount = rendered.map(_._2).sum,
      tablesConverted = tables.length)
  }

  /** Convert one table (reference: converter.py:103-183). */
  def convertTable(table: TableDef, cfg: RenderConfig): (String, Int) = {
    if (table.volatileTable || table.globalTemporary) return convertTempTable(table, cfg)

    val lines = Vector.newBuilder[String]
    var ewiCount = 0

    if (cfg.includeComments) {
      lines += s"-- Converted from DB2: ${table.fullName}"
      table.editproc.foreach(e => lines += s"-- WARNING: Original table had EDITPROC: $e")
      table.validproc.foreach(v => lines += s"-- WARNING: Original table had VALIDPROC: $v")
    }

    lines += s"CREATE OR REPLACE ICEBERG TABLE ${formatIdentifier(table.fullName)} ("

    val hasPk = table.constraints.exists(_.ctype == "PRIMARY KEY")
    for ((col, i) <- table.columns.zipWithIndex) {
      val (colLine, colEwis) = convertColumn(col, cfg)
      ewiCount += colEwis
      val comma = if (i < table.columns.length - 1 || hasPk) "," else ""
      lines += (colLine + comma)
    }

    table.constraints.find(_.ctype == "PRIMARY KEY").foreach { pk =>
      val pkCols = pk.columns.map(formatIdentifier).mkString(", ")
      lines += s"    PRIMARY KEY ($pkCols)"
    }

    lines += ")"

    table.partition.filter(_.columns.nonEmpty).foreach { p =>
      lines += s"PARTITION BY (${p.columns.map(formatIdentifier).mkString(", ")})"
    }
    table.distributeByHash.foreach { c =>
      lines += s"CLUSTER BY (${formatIdentifier(c)})"
    }

    lines += "CATALOG = 'SNOWFLAKE'"
    lines += s"EXTERNAL_VOLUME = '${cfg.externalVolume}'"
    lines += s"BASE_LOCATION = '${baseLocation(table.schema, table.name, cfg)}'"

    if (cfg.includeComments) {
      val cc = constraintComments(table.constraints)
      if (cc.nonEmpty) { lines += ""; cc.foreach(lines += _) }
    }

    lines += ";"
    (lines.result().mkString("\n"), ewiCount)
  }

  /** VOLATILE / GLOBAL TEMPORARY route (reference: converter.py:185-242). */
  def convertTempTable(table: TableDef, cfg: RenderConfig): (String, Int) = {
    val lines = Vector.newBuilder[String]
    var ewiCount = 0
    val originalType = if (table.volatileTable) "VOLATILE" else "GLOBAL TEMPORARY"

    if (cfg.includeComments) {
      lines += s"-- Converted from DB2 $originalType table: ${table.fullName}"
      lines += "-- Kept as Snowflake TEMPORARY (Iceberg doesn't support temporary tables)"
      lines += "-- Table will remain session-scoped as originally intended"
    }

    lines += s"CREATE OR REPLACE TEMPORARY TABLE ${formatIdentifier(table.fullName)} ("

    val hasPk = table.constraints.exists(_.ctype == "PRIMARY KEY")
    for ((col, i) <- table.columns.zipWithIndex) {
      val (colLine, colEwis) = convertColumn(col, cfg)
      ewiCount += colEwis
      val comma = if (i < table.columns.length - 1 || hasPk) "," else ""
      lines += (colLine + comma)
    }
    table.constraints.find(_.ctype == "PRIMARY KEY").foreach { pk =>
      lines += s"    PRIMARY KEY (${pk.columns.map(formatIdentifier).mkString(", ")})"
    }
    lines += ");"

    if (cfg.includeEwi) {
      val msg = EwiTemplate.format("SSC-EWI-DB2ICE-0030",
        s"$originalType table kept as Snowflake TEMPORARY - Iceberg doesn't support temporary tables")
      lines += ""
      lines += s"-- $msg"
      ewiCount += 1
    }
    (lines.result().mkString("\n"), ewiCount)
  }

  /** One column (reference: converter.py:244-307). Markers only for
    * UNSUPPORTED/LOSSY maps; FIELDPROC/GENERATED always marked. */
  def convertColumn(col: Db2Column, cfg: RenderConfig): (String, Int) = {
    var ewiCount = 0
    val parts = Vector.newBuilder[String]
    val markers = Vector.newBuilder[String]

    parts += s"    ${formatIdentifier(col.name)}"

    val mapping = TypeMapper.mapType(col.dataType, col.length, col.precision,
      col.scale, col.forBitData, col.ccsid)
    parts += mapping.targetType

    if (mapping.ewiCode.isDefined && cfg.includeEwi &&
        (mapping.status == ConversionStatus.Unsupported || mapping.status == ConversionStatus.Lossy)) {
      markers += formatEwi(mapping.ewiCode.get, mapping.ewiMessage.getOrElse(""))
      ewiCount += 1
    }

    if (!col.nullable) parts += "NOT NULL"

    if (col.fieldproc.isDefined && cfg.includeEwi) {
      markers += formatEwi("SSC-EWI-DB2ICE-0011",
        s"FIELDPROC ${col.fieldproc.get} - data may be encrypted/transformed")
      ewiCount += 1
    }
    if (col.generated.isDefined && cfg.includeEwi) {
      markers += formatEwi("SSC-EWI-DB2ICE-0014",
        s"GENERATED ${col.generated.get} not supported in Iceberg")
      ewiCount += 1
    }

    val base = parts.result().mkString(" ")
    val ms = markers.result()
    val line = if (ms.nonEmpty) base + "\n" + ms.map("        " + _).mkString("\n") else base
    (line, ewiCount)
  }

  def formatEwi(code: String, message: String): String = EwiTemplate.format(code, message)

  /** Identifier quoting (reference: converter.py:313-343): schema and
    * table formatted separately; unquoted identifiers upper-cased. */
  def formatIdentifier(identifier: String): String =
    if (identifier.contains(".")) {
      val Array(a, b) = identifier.split("\\.", 2)
      s"${formatSingle(a)}.${formatSingle(b)}"
    } else formatSingle(identifier)

  private def formatSingle(id: String): String =
    if (needsQuoting(id)) "\"" + id + "\"" else id.toUpperCase

  def needsQuoting(id: String): Boolean =
    Reserved.contains(id.toUpperCase) || !IdentPattern.matcher(id).matches()

  /** `{schema}/{table}` fill, lower-cased, schema defaulting to
    * "default" (reference: converter.py:345-353). */
  def baseLocation(schema: Option[String], name: String, cfg: RenderConfig): String =
    cfg.baseLocationPattern
      .replace("{schema}", schema.getOrElse("default").toLowerCase)
      .replace("{table}", name.toLowerCase)

  /** Non-PK constraints as comments (reference: converter.py:366-394). */
  def constraintComments(constraints: Seq[ConstraintDef]): Seq[String] =
    constraints.flatMap {
      case c if c.ctype == "PRIMARY KEY" => Nil
      case c if c.ctype == "FOREIGN KEY" =>
        val name = c.name.map(" " + _).getOrElse("")
        Seq(
          s"-- FOREIGN KEY$name: (${c.columns.mkString(", ")}) REFERENCES ${c.referenceTable.getOrElse("None")}(${c.referenceColumns.mkString(", ")})",
          "-- NOTE: Foreign keys are not enforced in Iceberg tables")
      case c if c.ctype == "UNIQUE" =>
        val name = c.name.map(" " + _).getOrElse("")
        Seq(s"-- UNIQUE$name: (${c.columns.mkString(", ")})",
          "-- NOTE: UNIQUE constraints are not enforced in Iceberg tables")
      case c if c.ctype == "CHECK" =>
        val name = c.name.map(" " + _).getOrElse("")
        Seq(s"-- CHECK$name: ${c.checkCondition.getOrElse("None")}",
          "-- NOTE: CHECK constraints are not enforced in Iceberg tables")
      case _ => Nil
    }
}
