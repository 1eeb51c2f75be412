package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Static helper for [[HtmlMainContent]] — top-level object so the
  * Janino-generated code can call it directly (the [[HtmlTextUtil]]
  * pattern, whose tag/entity/whitespace machinery it shares). */
object MainContentUtil {
  // semantic boilerplate containers removed WHOLESALE, tags + content
  // (the backreference pairs each opener with ITS closing tag; nested
  // same-tag containers — rare and invalid-ish — keep the outer tail,
  // which the block scorer below then judges on its own merits)
  private val BoilerContainer =
    Pattern.compile("(?is)<(nav|header|footer|aside)[^>]*>.*?</\\1\\s*>")
  private val ScriptStyle =
    Pattern.compile("(?is)<(script|style)[^>]*>.*?</\\1\\s*>")
  private val Comment = Pattern.compile("(?s)<!--.*?-->")
  // block-level boundaries the page splits into scoring units at
  private val BlockTag = Pattern.compile(
    "(?is)</?(p|div|section|article|main|ul|ol|li|table|thead|tbody|tr|td|th|h[1-6]|blockquote|pre|form|br|hr)(\\s[^>]*)?/?>")
  private val Anchor = Pattern.compile("(?is)<a[\\s>][^>]*>(.*?)</a\\s*>")
  private val Tag = Pattern.compile("(?s)<[^>]*>")
  private val Whitespace = Pattern.compile("\\s+")

  /** A block this short can't be judged by density and is dropped:
    * titles, breadcrumbs, timestamps, "read more" stubs. Real
    * paragraphs clear it trivially. */
  val MinBlockChars = 25

  private def plainText(fragment: String): String =
    Whitespace.matcher(
      HtmlTextUtil.decodeEntitiesPublic(
        Tag.matcher(fragment).replaceAll(" ")))
      .replaceAll(" ").trim

  /** Readability-style MAIN-CONTENT extraction: boilerplate containers
    * (`nav`/`header`/`footer`/`aside`) plus script/style/comments are
    * removed wholesale, the remainder splits into blocks at block-level
    * tags, and each block survives only if its plain text is at least
    * [[MinBlockChars]] chars with link density below 1/3 (anchor-text
    * chars × 3 < total chars) — the classic text-vs-link-density block
    * scorer. Survivors join with single spaces under the same
    * entity/whitespace normalization as [[HtmlTextUtil.extract]], so
    * downstream tokenizers see the identical surface. A page with no
    * surviving block returns the EMPTY string (link farms and
    * nav-only pages should die at the quality gate, not sneak through
    * as boilerplate soup). Never throws — this runs over crawled
    * garbage by design. Deterministic: fixed thresholds, no model. */
  def extract(html: UTF8String): UTF8String = {
    var s = html.toString
    s = ScriptStyle.matcher(s).replaceAll(" ")
    s = Comment.matcher(s).replaceAll(" ")
    s = BoilerContainer.matcher(s).replaceAll(" ")
    val blocks = BlockTag.split(s)
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < blocks.length) {
      val b = blocks(i)
      if (b.nonEmpty) {
        val text = plainText(b)
        if (text.length >= MinBlockChars) {
          // anchor-text chars under the SAME normalization the total
          // uses, so the ratio compares like with like
          var linkLen = 0
          val m = Anchor.matcher(b)
          while (m.find()) {
            val t = plainText(m.group(1))
            if (t.nonEmpty) linkLen += t.length + 1 // +1: joining space
          }
          if (linkLen.toLong * 3 < text.length.toLong) {
            if (sb.length > 0) sb.append(' ')
            sb.append(text)
          }
        }
      }
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }
}

/** Native Catalyst expression: HTML → MAIN-CONTENT plain text —
  * [[HtmlText]]'s boilerplate-aware sibling for the crawl front: where
  * `html_text` keeps every tag's text (nav menus, footers, link
  * farms), `main_content` keeps only content-dense blocks, which is
  * what decides quality gates and dedup keys in real CommonCrawl
  * curation (nav/footer churn must not split near-duplicates). One
  * tight per-row call inside the scan's projection; composes with
  * [[graft.sources.Warc]] + `decode_text` exactly like `html_text`. */
case class HtmlMainContent(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case _: StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case dt =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"main_content requires a string input, got ${dt.catalogString}")
    }

  override def nullSafeEval(s: Any): Any =
    MainContentUtil.extract(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MainContentUtil.extract($c)")

  override protected def withNewChildInternal(newChild: Expression): HtmlMainContent =
    copy(child = newChild)
}

object HtmlMainContent {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Column API: `mainContent(html)`. */
  def apply(html: Column): Column =
    ColumnBridge.column(HtmlMainContent(ColumnBridge.expression(html)))
}
