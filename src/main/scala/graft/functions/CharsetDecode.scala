package graft.functions

import java.nio.{ByteBuffer, CharBuffer}
import java.nio.charset.{Charset, CodingErrorAction, StandardCharsets}
import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Static helper for [[CharsetDecode]] — top-level object so the
  * Janino-generated code can call it directly (the [[HtmlTextUtil]]
  * pattern). */
object CharsetDecodeUtil {

  private val CharsetParam =
    Pattern.compile("(?i)charset\\s*=\\s*\"?'?([A-Za-z0-9_.:\\-]+)")
  // bounded <meta charset=…> / <meta http-equiv content="…charset=…">
  // sniff: both HTML5 and HTML4 forms share the charset= shape, so one
  // pattern covers them. Applied to an ASCII-projected prefix only.
  private val MetaCharset = Pattern.compile(
    "(?i)<meta[^>]{0,256}?charset\\s*=\\s*[\"']?([A-Za-z0-9_.:\\-]+)")

  /** How many leading body bytes the `<meta>` sniff inspects — HTML5
    * requires the meta element within the first 1024 bytes. */
  val SniffBytes: Int = 1024

  /** Resolve the charset for a crawled page: the Content-Type header's
    * `charset=` parameter wins; otherwise a bounded `<meta charset>`
    * sniff over the first [[SniffBytes]] body bytes (projected to
    * ASCII — every charset this matters for is ASCII-transparent in
    * the header region); otherwise UTF-8. Unknown or unsupported
    * names fall back to UTF-8 — a crawl is full of typo'd charsets and
    * the job must not die on one. */
  def resolveCharset(contentType: String, body: Array[Byte]): Charset = {
    def lookup(name: String): Charset =
      try { if (Charset.isSupported(name)) Charset.forName(name) else null }
      catch { case _: IllegalArgumentException => null }
    if (contentType != null && contentType.nonEmpty) {
      val m = CharsetParam.matcher(contentType)
      if (m.find()) {
        val cs = lookup(m.group(1))
        if (cs != null) return cs
      }
    }
    val n = math.min(SniffBytes, body.length)
    if (n > 0) {
      val prefix = new String(body, 0, n, StandardCharsets.US_ASCII)
      val m = MetaCharset.matcher(prefix)
      if (m.find()) {
        val cs = lookup(m.group(1))
        if (cs != null) return cs
      }
    }
    StandardCharsets.UTF_8
  }

  /** Decode `body` under the resolved charset with REPLACEMENT
    * accounting: malformed/unmappable sequences become U+FFFD and are
    * COUNTED (the truncation-flag philosophy — degrade loudly, never
    * silently). Returns struct(text, charset, decode_errors). */
  def decode(body: Array[Byte], contentType: UTF8String): InternalRow = {
    val ct = if (contentType == null) null else contentType.toString
    val cs = resolveCharset(ct, body)
    val dec = cs.newDecoder()
      .onMalformedInput(CodingErrorAction.REPORT)
      .onUnmappableCharacter(CodingErrorAction.REPORT)
    val bb = ByteBuffer.wrap(body)
    val cb = CharBuffer.allocate(4096)
    val sb = new java.lang.StringBuilder(body.length)
    var errors = 0
    var flushing = false
    var done = false
    while (!done) {
      val cr = if (flushing) dec.flush(cb) else dec.decode(bb, cb, true)
      if (cr.isMalformed || cr.isUnmappable) {
        cb.flip(); sb.append(cb); cb.clear()
        sb.append('\uFFFD')
        errors += 1
        bb.position(bb.position() + cr.length())
        dec.reset()
        // reset discards flush obligations; re-enter the decode loop
        flushing = false
      } else if (cr.isOverflow) {
        cb.flip(); sb.append(cb); cb.clear()
      } else { // underflow: input consumed (or flush complete)
        if (flushing) {
          cb.flip(); sb.append(cb); cb.clear()
          done = true
        } else flushing = true
      }
    }
    new GenericInternalRow(Array[Any](
      UTF8String.fromString(sb.toString),
      UTF8String.fromString(cs.name().toLowerCase(java.util.Locale.ROOT)),
      errors))
  }
}

/** Native Catalyst expression: crawled page bytes + the HTTP
  * Content-Type header → struct(text STRING, charset STRING,
  * decode_errors INT) — charset-aware payload decode for the WARC
  * ingest path (SURVEY.md §7.3 layer (b)). A real CommonCrawl segment
  * mixes Windows-1252, Shift-JIS, ISO-8859-1 and typo'd labels;
  * `cast(body AS STRING)` (UTF-8 with silent replacement) garbles all
  * of them invisibly. This decode honors the header's `charset=`
  * parameter, falls back to a bounded `<meta charset>` sniff (HTML5's
  * first-1024-bytes rule), defaults to UTF-8, and SURFACES both the
  * charset it used and the replacement count, so a quality gate can
  * drop pages whose bytes didn't actually decode.
  *
  * Runs as one generated per-row call inside the scan projection —
  * no UDF, no driver round-trip; pairs with [[HtmlText]] as
  * `html_text(decode_text(body, http_content_type).text)`. */
case class CharsetDecode(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("text", StringType, nullable = false),
    StructField("charset", StringType, nullable = false),
    StructField("decode_errors", IntegerType, nullable = false)))

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, _: StringType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"decode_text requires (binary, string), got " +
            s"(${l.catalogString}, ${r.catalogString})")
    }

  override def nullSafeEval(body: Any, ct: Any): Any =
    CharsetDecodeUtil.decode(body.asInstanceOf[Array[Byte]],
      ct.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (b, c) =>
      s"graft.functions.CharsetDecodeUtil.decode($b, $c)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CharsetDecode =
    copy(left = newLeft, right = newRight)
}

object CharsetDecode {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Column API: `decodeText(body, contentType)`. A null content-type
    * (non-HTTP records) is treated as absent — the sniff/default path
    * — rather than nulling the row out. */
  def apply(body: Column, contentType: Column): Column =
    ColumnBridge.column(CharsetDecode(
      ColumnBridge.expression(body),
      ColumnBridge.expression(
        org.apache.spark.sql.functions.coalesce(
          contentType, org.apache.spark.sql.functions.lit("")))))
}
