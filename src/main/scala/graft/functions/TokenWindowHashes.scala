package graft.functions

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Static helper for [[TokenWindowHashes]] — own top-level object so
  * Janino-generated code can call the static forwarder directly (the
  * [[ShingleHashUtil]] pattern). */
object TokenWindowHashUtil {
  private val Seed = 42L

  /** ORDER-PRESERVING, duplicate-keeping 64-bit hashes of the stride-1
    * k-token windows of `text` split on single spaces with empty
    * tokens dropped — the exact token stream of
    * [[graft.operators.Chunking.tokens]] (case-sensitive, no trim/
    * lower), hashed without materializing window strings: the window
    * hash chains XXH64 over each token's bytes, so token boundaries
    * stay significant. Element i is the window starting at token i+1
    * (1-based), mirroring the HOF formulation
    * `transform(sequence(1, n-k+1), i -> concat_ws(" ", slice(w,i,k)))`
    * exactly in count and order. Returns an empty array when fewer
    * than k tokens. */
  def compute(text: UTF8String, k: Int): ArrayData = {
    val raw = text.toString.split(" ", -1)
    var nt = 0
    var i = 0
    while (i < raw.length) {
      if (raw(i).nonEmpty) nt += 1
      i += 1
    }
    val n = nt - (k - 1)
    if (n <= 0) return new GenericArrayData(Array.empty[Long])
    val wb = new Array[Array[Byte]](nt)
    var j = 0
    i = 0
    while (i < raw.length) {
      if (raw(i).nonEmpty) {
        wb(j) = raw(i).getBytes(StandardCharsets.UTF_8)
        j += 1
      }
      i += 1
    }
    val out = new Array[Long](n)
    i = 0
    while (i < n) {
      var h = Seed
      var w = 0
      while (w < k) {
        val b = wb(i + w)
        h = XXH64.hashUnsafeBytes(b, Platform.BYTE_ARRAY_OFFSET, b.length, h)
        w += 1
      }
      out(i) = h
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Native Catalyst expression: text → array of stride-1 k-token-window
  * hashes over the RAW (case-sensitive) token stream, order-preserving
  * and duplicate-keeping — the non-distinct sibling of
  * [[ShingleHashes]] for positional window work (substring dedup's
  * coverage map, novelty's per-window first-seen test), where the HOF
  * formulation (`transform` + `slice` + `concat_ws` + explode of the
  * window STRINGS) evaluates interpreted per window and ships k-token
  * strings into every downstream shuffle. One generated call per row;
  * downstream joins/aggregations carry 8-byte longs.
  *
  * Hash values are engine-internal (only equality matters for the
  * duplicate-count / first-seen math), so the chained-XXH64 scheme
  * needs no oracle counterpart; collision odds at n distinct windows
  * are n²/2⁶⁵. */
case class TokenWindowHashes(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, "window size must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case _: StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case dt =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"token_window_hashes requires a string input, got ${dt.catalogString}")
    }

  override def nullSafeEval(s: Any): Any =
    TokenWindowHashUtil.compute(s.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TokenWindowHashUtil.compute($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): TokenWindowHashes =
    copy(child = newChild)
}

object TokenWindowHashes {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Column API: `token_window_hashes(text, k)`. */
  def apply(text: Column, k: Int): Column =
    ColumnBridge.column(TokenWindowHashes(ColumnBridge.expression(text), k))
}
