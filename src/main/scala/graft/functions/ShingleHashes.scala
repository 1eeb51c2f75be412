package graft.functions

import java.nio.charset.StandardCharsets
import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Static helper for [[ShingleHashes]] — kept in its own top-level
  * object so Janino-generated code can call the static forwarder
  * `graft.functions.ShingleHashUtil.compute(...)` directly. */
object ShingleHashUtil {
  private val Spaces = Pattern.compile(" +")
  private val Seed = 42L

  /** Distinct 64-bit hashes of the k-word shingles of
    * lower(trim(text)) split on runs of spaces — semantics identical
    * to the former HOF formulation (split(lower(trim(text)), " +") →
    * k-gram → distinct), but hashed without materializing shingle
    * strings: the window hash chains XXH64 over each word's bytes, so
    * word boundaries stay significant ("a b"+"c" ≠ "a"+"b c"). */
  def compute(text: UTF8String, k: Int): ArrayData = {
    val words = Spaces.split(text.toLowerCase.trim().toString, -1)
    val n = words.length - (k - 1)
    if (n <= 0) return new GenericArrayData(Array.empty[Long])
    val wb = new Array[Array[Byte]](words.length)
    var i = 0
    while (i < words.length) {
      wb(i) = words(i).getBytes(StandardCharsets.UTF_8)
      i += 1
    }
    val seen = new java.util.HashSet[java.lang.Long](n * 2)
    val out = new Array[Long](n)
    var m = 0
    i = 0
    while (i < n) {
      var h = Seed
      var j = 0
      while (j < k) {
        val b = wb(i + j)
        h = XXH64.hashUnsafeBytes(b, Platform.BYTE_ARRAY_OFFSET, b.length, h)
        j += 1
      }
      if (seen.add(h)) { out(m) = h; m += 1 }
      i += 1
    }
    new GenericArrayData(if (m == n) out else java.util.Arrays.copyOf(out, m))
  }
}

/** Native Catalyst expression: text → array of distinct k-word-shingle
  * hashes (SURVEY.md §7.3 layer (b), same rationale as [[VectorDot]]).
  *
  * Why not built-ins: `transform(sequence(...), i -> xxhash64(
  * concat_ws(...element_at...)))` evaluates its lambda INTERPRETED per
  * shingle and materializes every shingle string; profiled at 8.4 s of
  * q19's 10.5 s at sf0.1. This expression is one generated call per
  * row — no lambda dispatch, no shingle strings, no array_distinct
  * pass — and downstream joins/aggregations carry 8-byte longs.
  *
  * Hash values are engine-internal (only distinctness matters for the
  * Jaccard/MinHash math), so the chained-XXH64 scheme needs no oracle
  * counterpart; collision odds at n distinct shingles are n²/2⁶⁵. */
case class ShingleHashes(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, "shingle size must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case _: StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case dt =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"shingle_hashes requires a string input, got ${dt.catalogString}")
    }

  override def nullSafeEval(s: Any): Any =
    ShingleHashUtil.compute(s.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleHashUtil.compute($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

object ShingleHashes {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Column API: `shingle_hashes(text, k)`. */
  def apply(text: Column, k: Int): Column =
    ColumnBridge.column(ShingleHashes(ColumnBridge.expression(text), k))
}
