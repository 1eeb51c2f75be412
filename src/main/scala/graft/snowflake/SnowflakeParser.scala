package graft.snowflake

import java.util.regex.Pattern

import graft.model._
import graft.parse.StatementSplitter.splitDefsNoStrings

/** Snowflake Standard DDL parser (SURVEY.md §2.2 P11-P16).
  *
  * Mirrors `/root/reference/db2ice/snowflake_converter.py:87-337`: a
  * finditer-driven multi-table scan over the whole script (no statement
  * splitting, and — deliberately — no string-literal awareness in the
  * paren scan/def splitter, matching the reference). Pure Scala; runs
  * map-side in the distributed engine.
  */
object SnowflakeParser {

  private val CI = Pattern.CASE_INSENSITIVE

  // snowflake_converter.py:96
  private val CreatePattern = Pattern.compile(
    """CREATE\s+(?:OR\s+REPLACE\s+)?(?:(TRANSIENT|TEMPORARY|DYNAMIC|EXTERNAL|HYBRID)\s+)?TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?([^\s(]+)\s*\(""",
    CI)

  private val QuotedNamePattern = Pattern.compile("\"([^\"]+)\"\\s+(.*)")
  private val TypePattern = Pattern.compile("""(\w+(?:\s*\([^)]+\))?)""", CI)
  private val DefaultPattern = Pattern.compile("""DEFAULT\s+([^\s,]+(?:\([^)]*\))?)""", CI)
  private val IdentityPattern = Pattern.compile("""(?:IDENTITY|AUTOINCREMENT)\s*(?:\(([^)]+)\))?""", CI)
  private val CommentColPattern = Pattern.compile("""COMMENT\s+'([^']*)'""", CI)
  private val CollatePattern = Pattern.compile("""COLLATE\s+([^\s,]+)""", CI)
  private val MaskPattern = Pattern.compile("""WITH\s+MASKING\s+POLICY\s+([^\s,]+)""", CI)

  private val FirstParenPattern = Pattern.compile("""\((.*?)\)""")
  private val PkColsPattern = Pattern.compile("""PRIMARY\s+KEY\s*\((.*?)\)""", CI)
  private val FkPattern = Pattern.compile(
    """FOREIGN\s+KEY\s*\((.*?)\)\s*REFERENCES\s+([^\s(]+)\s*\((.*?)\)""", CI)
  private val UniqueColsPattern = Pattern.compile("""UNIQUE\s*\((.*?)\)""", CI)

  private val ClusterByPattern = Pattern.compile("""CLUSTER\s+BY\s*\((.*?)\)""", CI)
  private val CommentTablePattern = Pattern.compile("""COMMENT\s*=\s*'([^']*)'""", CI)
  private val RetentionPattern = Pattern.compile("""DATA_RETENTION_TIME_IN_DAYS\s*=\s*(\d+)""", CI)
  private val ChangeTrackingPattern = Pattern.compile("""CHANGE_TRACKING\s*=\s*(TRUE|FALSE)""", CI)

  /** Python `.strip('"')` semantics: remove ALL leading/trailing
    * double-quotes. */
  private def stripQuotes(s: String): String = {
    var a = 0; var b = s.length
    while (a < b && s.charAt(a) == '"') a += 1
    while (b > a && s.charAt(b - 1) == '"') b -= 1
    s.substring(a, b)
  }

  /** Parse all CREATE TABLE statements in a script
    * (snowflake_converter.py:90-118). */
  def parse(ddl: String): Vector[SnowflakeTable] = {
    val tables = Vector.newBuilder[SnowflakeTable]
    val m = CreatePattern.matcher(ddl)
    while (m.find()) {
      val modifier = Option(m.group(1)).map(_.toUpperCase)
      val tableName = m.group(2).trim
      val startPos = m.end() - 1 // position of opening paren
      extractParenContent(ddl, startPos).foreach { case (columnDefs, endPos) =>
        val rest = ddl.substring(endPos).trim
        val semi = rest.indexOf(';')
        val tableOptions = if (semi >= 0) rest.substring(0, semi) else rest
        tables += parseTable(tableName, columnDefs, tableOptions, modifier)
      }
    }
    tables.result()
  }

  /** Paren matcher WITHOUT string awareness (snowflake_converter.py:120-137). */
  def extractParenContent(text: String, startPos: Int): Option[(String, Int)] = {
    if (startPos >= text.length || text.charAt(startPos) != '(') return None
    var depth = 0
    var i = startPos
    while (i < text.length) {
      val c = text.charAt(i)
      if (c == '(') depth += 1
      else if (c == ')') {
        depth -= 1
        if (depth == 0) return Some((text.substring(startPos + 1, i), i + 1))
      }
      i += 1
    }
    None
  }

  /** snowflake_converter.py:139-164. */
  private def parseTable(fullName: String, columnDefs: String, options: String,
      modifier: Option[String]): SnowflakeTable = {
    val nameParts = fullName.replace("\"", "").split("\\.", -1)
    val base = SnowflakeTable(
      name = nameParts.last,
      schema = if (nameParts.length >= 2) Some(nameParts(nameParts.length - 2)) else None,
      database = if (nameParts.length >= 3) Some(nameParts(nameParts.length - 3)) else None,
      transient = modifier.contains("TRANSIENT"),
      temporary = modifier.contains("TEMPORARY"),
      dynamic = modifier.contains("DYNAMIC"),
      external = modifier.contains("EXTERNAL"),
      hybrid = modifier.contains("HYBRID"))
    parseTableOptions(parseColumnsAndConstraints(base, columnDefs), options)
  }

  /** snowflake_converter.py:166-220. */
  private def parseColumnsAndConstraints(table0: SnowflakeTable, columnDefs: String): SnowflakeTable = {
    var t = table0
    def splitCols(s: String): Seq[String] =
      s.split(",", -1).toSeq.map(c => stripQuotes(c.trim))
    for (p0 <- splitDefsNoStrings(columnDefs); p = p0.trim if p.nonEmpty) {
      val upper = p.toUpperCase
      if (upper.startsWith("PRIMARY KEY")) {
        findIn(FirstParenPattern, p).foreach(m => t = t.copy(primaryKey = splitCols(m.group(1))))
      } else if (upper.startsWith("FOREIGN KEY")) {
        findIn(FkPattern, p).foreach(m => t = t.copy(foreignKeys = t.foreignKeys :+
          ForeignKeyDef(splitCols(m.group(1)), m.group(2).trim, splitCols(m.group(3)))))
      } else if (upper.startsWith("UNIQUE")) {
        findIn(FirstParenPattern, p).foreach(m =>
          t = t.copy(uniqueKeys = t.uniqueKeys :+ splitCols(m.group(1))))
      } else if (upper.startsWith("CONSTRAINT")) {
        if (upper.contains("PRIMARY KEY"))
          findIn(PkColsPattern, p).foreach(m => t = t.copy(primaryKey = splitCols(m.group(1))))
        else if (upper.contains("FOREIGN KEY"))
          findIn(FkPattern, p).foreach(m => t = t.copy(foreignKeys = t.foreignKeys :+
            ForeignKeyDef(splitCols(m.group(1)), m.group(2).trim, splitCols(m.group(3)))))
        else if (upper.contains("UNIQUE"))
          findIn(UniqueColsPattern, p).foreach(m =>
            t = t.copy(uniqueKeys = t.uniqueKeys :+ splitCols(m.group(1))))
      } else {
        parseColumn(p).foreach(c => t = t.copy(columns = t.columns :+ c))
      }
    }
    t
  }

  /** snowflake_converter.py:222-285. */
  def parseColumn(colDef: String): Option[SnowflakeColumn] = {
    val (name, rest) =
      if (colDef.startsWith("\"")) {
        val m = QuotedNamePattern.matcher(colDef)
        if (!m.lookingAt()) return None
        (m.group(1), m.group(2))
      } else {
        val parts = colDef.split("\\s+", 2)
        if (parts.length < 2) return None
        (parts(0), parts(1))
      }

    val tm = TypePattern.matcher(rest)
    if (!tm.lookingAt()) return None
    val dataType = tm.group(1).toUpperCase
    val restOfDef = rest.substring(tm.end()).trim
    val upper = restOfDef.toUpperCase

    Some(SnowflakeColumn(
      name = stripQuotes(name),
      dataType = dataType,
      nullable = !upper.contains("NOT NULL"),
      defaultValue = findIn(DefaultPattern, restOfDef).map(_.group(1)),
      identity =
        if (upper.contains("IDENTITY") || upper.contains("AUTOINCREMENT"))
          findIn(IdentityPattern, restOfDef).flatMap(m => Option(m.group(1))).orElse(Some("1,1"))
        else None,
      comment = findIn(CommentColPattern, restOfDef).map(_.group(1)),
      collate = findIn(CollatePattern, restOfDef).map(_.group(1)),
      maskingPolicy = findIn(MaskPattern, restOfDef).map(_.group(1))))
  }

  /** snowflake_converter.py:287-313. */
  private def parseTableOptions(table0: SnowflakeTable, options: String): SnowflakeTable = {
    if (options == null || options.isEmpty) return table0
    var t = table0
    findIn(ClusterByPattern, options).foreach(m => t = t.copy(clusterBy =
      m.group(1).split(",", -1).toSeq.map(c => stripQuotes(c.trim))))
    findIn(CommentTablePattern, options).foreach(m => t = t.copy(comment = Some(m.group(1))))
    findIn(RetentionPattern, options).foreach(m =>
      t = t.copy(dataRetentionDays = Some(m.group(1).toInt)))
    if (options.toUpperCase.contains("CHANGE_TRACKING"))
      findIn(ChangeTrackingPattern, options).foreach(m =>
        t = t.copy(changeTracking = m.group(1).equalsIgnoreCase("TRUE")))
    t
  }

  private def findIn(p: Pattern, s: String): Option[java.util.regex.Matcher] = {
    val m = p.matcher(s)
    if (m.find()) Some(m) else None
  }
}
