package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Static helper for [[RepetitionStats]] — top-level object so
  * Janino-generated code can call the static forwarder directly. */
object RepetitionStatsUtil {
  private val Spaces = Pattern.compile(" +")

  /** (top_token, top_token_n, dup_ngram_n) over the tokens of
    * lower(trim(text)) split on space runs — semantics identical to the
    * HOF formulation in [[TextFunctions.topTokenStats]] /
    * [[TextFunctions.dupNgramCount]] (spec-asserted): the most frequent
    * token with ties broken to the binary-smallest token, plus the
    * count of n-grams whose identical gram appeared earlier in the doc
    * (total − distinct). One hash-count pass for the mode, one
    * rolling-window pass for the grams. */
  def compute(text: UTF8String, n: Int): InternalRow = {
    val words = Spaces.split(text.toLowerCase.trim().toString, -1)
    val counts = new java.util.HashMap[String, Integer](words.length * 2)
    var i = 0
    while (i < words.length) {
      val prev = counts.get(words(i))
      counts.put(words(i), if (prev == null) 1 else prev.intValue() + 1)
      i += 1
    }
    var best: String = null
    var bn = 0
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val c = e.getValue.intValue()
      // binary UTF-8 order on ties (matches Spark/DuckDB string ORDER BY)
      if (c > bn || (c == bn && UTF8String.fromString(e.getKey)
          .binaryCompare(UTF8String.fromString(best)) < 0)) {
        best = e.getKey
        bn = c
      }
    }
    var dup = 0
    val m = words.length - (n - 1)
    if (m > 0) {
      val seen = new java.util.HashSet[String](m * 2)
      val sb = new java.lang.StringBuilder
      i = 0
      while (i < m) {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(words(i + j))
          j += 1
        }
        if (!seen.add(sb.toString)) dup += 1
        i += 1
      }
    }
    new GenericInternalRow(Array[Any](UTF8String.fromString(best), bn, dup))
  }
}

/** Native Catalyst expression: text → struct(top_token, top_token_n,
  * dup_ngram_n) — the per-document repetition signals behind
  * Gopher-style quality filters (SURVEY.md §7.3 layer (b), same
  * rationale as [[ShingleHashes]]).
  *
  * Why not built-ins: higher-order functions evaluate their lambdas
  * INTERPRETED per element. The `aggregate`-fold formulation costs
  * ~0.4 s and the bigram construction (`transform` + `slice` +
  * `array_join`) ~2.6 s at sf0.1 — ~3 s of a 7.5 s query, vs one
  * generated call per row here (measured ~0.3 s). Exact string
  * semantics are preserved (no hashing), so the DuckDB oracle match is
  * unconditional, not probabilistic. */
case class RepetitionStats(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "n-gram size must be >= 1")

  override def dataType: DataType = StructType(Seq(
    StructField("top_token", StringType, nullable = true),
    StructField("top_token_n", IntegerType, nullable = false),
    StructField("dup_ngram_n", IntegerType, nullable = false)))

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case _: StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case dt =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"repetition_stats requires a string input, got ${dt.catalogString}")
    }

  override def nullSafeEval(s: Any): Any =
    RepetitionStatsUtil.compute(s.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.RepetitionStatsUtil.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): RepetitionStats =
    copy(child = newChild)
}

object RepetitionStats {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Column API: `repetition_stats(text, n)`. */
  def apply(text: Column, n: Int): Column =
    ColumnBridge.column(RepetitionStats(ColumnBridge.expression(text), n))
}
