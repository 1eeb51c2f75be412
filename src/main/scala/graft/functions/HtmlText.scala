package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Static helper for [[HtmlText]] — top-level object so the
  * Janino-generated code can call it directly (the [[SimHashUtil]]
  * pattern). */
object HtmlTextUtil {
  // (?is): case-insensitive, dot-matches-newline. The backreference
  // \1 pairs each opening script/style with ITS closing tag.
  private val ScriptStyle =
    Pattern.compile("(?is)<(script|style)[^>]*>.*?</\\1\\s*>")
  private val Comment = Pattern.compile("(?s)<!--.*?-->")
  private val Tag = Pattern.compile("(?s)<[^>]*>")
  private val Entity =
    Pattern.compile("&(#[0-9]{1,7}|#[xX][0-9a-fA-F]{1,6}|[a-zA-Z][a-zA-Z0-9]{1,31});")
  private val Whitespace = Pattern.compile("\\s+")

  /** The named entities worth decoding without an entity table: the
    * five XML predefineds plus nbsp (which must become a PLAIN space
    * — U+00A0 would survive tokenizers' `split(' ')` and glue words
    * together). Unknown names pass through untouched. */
  private val Named = Map(
    "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"",
    "apos" -> "'", "nbsp" -> " ")

  private def decodeEntities(s: String): String = {
    val m = Entity.matcher(s)
    if (!m.find()) return s
    val sb = new java.lang.StringBuilder(s.length)
    var done = false
    while (!done) {
      val name = m.group(1)
      val rep: String =
        if (name.startsWith("#x") || name.startsWith("#X"))
          codePointOrNull(java.lang.Long.parseLong(name.substring(2), 16))
        else if (name.startsWith("#"))
          codePointOrNull(java.lang.Long.parseLong(name.substring(1)))
        else Named.getOrElse(name, null)
      m.appendReplacement(sb,
        java.util.regex.Matcher.quoteReplacement(
          if (rep != null) rep else m.group(0)))
      done = !m.find()
    }
    m.appendTail(sb)
    sb.toString
  }

  /** [[decodeEntities]] for sibling extractors ([[MainContentUtil]]
    * shares the exact entity surface so `main_content` output is a
    * sub-sequence of `html_text` output under one normalization). */
  def decodeEntitiesPublic(s: String): String = decodeEntities(s)

  private def codePointOrNull(cp: Long): String =
    if (cp >= 0x20 && cp <= 0x10FFFF && !(cp >= 0xD800 && cp <= 0xDFFF))
      new String(Character.toChars(cp.toInt))
    else if (cp == '\n' || cp == '\t') " "
    else null // control chars / invalid code points: keep the raw entity

  /** HTML → whitespace-normalized plain text: script/style blocks and
    * comments removed, every remaining tag replaced by a space,
    * entities decoded AFTER tag stripping (so `&lt;script&gt;` can
    * never reconstitute a tag), whitespace runs collapsed to single
    * spaces and trimmed (the downstream tokenizers split on spaces).
    * Never throws: this runs over crawled garbage by design. */
  def extract(html: UTF8String): UTF8String = {
    var s = html.toString
    s = ScriptStyle.matcher(s).replaceAll(" ")
    s = Comment.matcher(s).replaceAll(" ")
    s = Tag.matcher(s).replaceAll(" ")
    s = decodeEntities(s)
    s = Whitespace.matcher(s).replaceAll(" ").trim
    UTF8String.fromString(s)
  }
}

/** Native Catalyst expression: HTML → plain text (SURVEY.md §7.3
  * layer (b)). The regex passes and the entity decode are one tight
  * per-row call inside the scan's projection — the built-in
  * formulation would chain five interpreted regexp_replace calls and
  * still need a UDF for numeric entities. Paired with
  * [[graft.sources.Warc]] this closes the crawl-to-text ingest path:
  * WARC records → html_text(body) → the q16/q17/q53 quality gates. */
case class HtmlText(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case _: StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case dt =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"html_text requires a string input, got ${dt.catalogString}")
    }

  override def nullSafeEval(s: Any): Any =
    HtmlTextUtil.extract(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HtmlTextUtil.extract($c)")

  override protected def withNewChildInternal(newChild: Expression): HtmlText =
    copy(child = newChild)
}

object HtmlText {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Column API: `htmlText(html)`. */
  def apply(html: Column): Column =
    ColumnBridge.column(HtmlText(ColumnBridge.expression(html)))
}
