package graft.parse

import scala.collection.mutable.ArrayBuffer

/** Statement-level lexing shared by the parsers (SURVEY.md §2.1 S2-S4).
  *
  * Behavior mirrors the reference's character state machines
  * (`/root/reference/db2ice/parser.py:276-331, 412-448, 472-498`),
  * including their quirks — e.g. an apostrophe inside a `--` comment
  * toggles string state during splitting (comments are only stripped
  * per-statement, AFTER the split), which can merge statements. Golden
  * parity requires this.
  *
  * All functions are pure `String => _` — usable from plain Scala, from
  * `Dataset.flatMap`, or wrapped as a UDF. At 100 TB the unit of work is
  * one script file per task: split happens before any shuffle, and each
  * statement is stamped with its ordinal so downstream order-sensitive
  * steps (ALTER linkage, rendering) never depend on partition order.
  */
object StatementSplitter {

  /** Split a DDL script on `;` / `@` terminators, tracking single-quote
    * strings (with backslash-escape lookback) and paren depth.
    * Reference: parser.py:292-331. */
  def split(ddl: String): Vector[String] = {
    val statements = Vector.newBuilder[String]
    val current = new StringBuilder
    var inString = false
    var parenDepth = 0
    var i = 0
    while (i < ddl.length) {
      val c = ddl.charAt(i)
      if (c == '\'' && (i == 0 || ddl.charAt(i - 1) != '\\')) inString = !inString
      if (!inString) {
        if (c == '(') parenDepth += 1
        else if (c == ')') parenDepth -= 1
      }
      if ((c == ';' || c == '@') && !inString && parenDepth == 0) {
        val stmt = current.result().trim
        if (stmt.nonEmpty) statements += stmt
        current.clear()
      } else current.append(c)
      i += 1
    }
    val last = current.result().trim
    if (last.nonEmpty) statements += last
    statements.result()
  }

  /** Drop comment-only/blank lines before the first code line.
    * Reference: parser.py:276-290. */
  def stripLeadingComments(stmt: String): String = {
    val lines = stmt.split("\n", -1)
    var foundCode = false
    val kept = lines.filter { line =>
      val s = line.trim
      if (!foundCode && (s.startsWith("--") || s.isEmpty)) false
      else { foundCode = true; true }
    }
    kept.mkString("\n")
  }

  /** Truncate `-- …` per line unless the dashes sit inside a string
    * literal. Reference: parser.py:433-448. */
  def stripInlineComments(s: String): String =
    s.split("\n", -1).map { line =>
      var inString = false
      var cut = -1
      var i = 0
      while (cut < 0 && i < line.length) {
        val c = line.charAt(i)
        if (c == '\'' && (i == 0 || line.charAt(i - 1) != '\\')) inString = !inString
        else if (c == '-' && i + 1 < line.length && line.charAt(i + 1) == '-' && !inString)
          cut = i
        i += 1
      }
      if (cut >= 0) line.substring(0, cut) else line
    }.mkString("\n")

  /** Index of the `)` matching the `(` at `start`, string-literal aware;
    * -1 when unbalanced. Reference: parser.py:412-431. */
  def findMatchingParen(s: String, start: Int): Int = {
    var depth = 0
    var inString = false
    var i = start
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\'' && (i == 0 || s.charAt(i - 1) != '\\')) inString = !inString
      if (!inString) {
        if (c == '(') depth += 1
        else if (c == ')') {
          depth -= 1
          if (depth == 0) return i
        }
      }
      i += 1
    }
    -1
  }

  /** Split a column-definition body on top-level commas (paren/string
    * aware). Faithful to the reference's variant that checks the last
    * *accumulated* character for the escape lookback (parser.py:472-498:
    * `not current or current[-1] != '\\'`). */
  def splitColumnDefs(s: String): Vector[String] = {
    val parts = Vector.newBuilder[String]
    val current = new ArrayBuffer[Char]
    var parenDepth = 0
    var inString = false
    for (c <- s) {
      if (c == '\'' && (current.isEmpty || current.last != '\\')) inString = !inString
      var consumed = false
      if (!inString) {
        if (c == '(') parenDepth += 1
        else if (c == ')') parenDepth -= 1
        else if (c == ',' && parenDepth == 0) {
          parts += current.mkString
          current.clear()
          consumed = true
        }
      }
      if (!consumed) current += c
    }
    if (current.nonEmpty) parts += current.mkString
    parts.result()
  }

  /** Split on top-level commas WITHOUT string awareness — the Snowflake
    * parser's variant (snowflake_converter.py:315-337). Its lack of
    * string handling is reproduced deliberately. */
  def splitDefsNoStrings(text: String): Vector[String] = {
    val parts = Vector.newBuilder[String]
    val current = new StringBuilder
    var depth = 0
    for (c <- text) {
      if (c == '(') { depth += 1; current.append(c) }
      else if (c == ')') { depth -= 1; current.append(c) }
      else if (c == ',' && depth == 0) { parts += current.result(); current.clear() }
      else current.append(c)
    }
    if (current.nonEmpty) parts += current.result()
    parts.result()
  }

  /** Strip `"`, `'`, `` ` `` from both ends (reference: parser.py:680-684,
    * python `str.strip` semantics per quote class, applied in order). */
  def cleanIdentifier(identifier: String): String = {
    if (identifier == null) return ""
    def stripChar(s: String, c: Char): String = {
      var a = 0
      var b = s.length
      while (a < b && s.charAt(a) == c) a += 1
      while (b > a && s.charAt(b - 1) == c) b -= 1
      s.substring(a, b)
    }
    stripChar(stripChar(stripChar(identifier, '"'), '\''), '`')
  }
}
