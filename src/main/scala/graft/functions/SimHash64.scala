package graft.functions

import java.nio.charset.StandardCharsets
import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Static helper for [[SimHash64]] — top-level object so
  * Janino-generated code can call the static forwarder directly. */
object SimHashUtil {
  private val Spaces = Pattern.compile(" +")
  /** Spark's default xxhash64 seed — keeps the per-token hashes
    * identical to `functions.xxhash64(token)`. */
  private val Seed = 42L

  private val Md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private def vote(tokenHash: Long, counts: Array[Int]): Unit = {
    var j = 0
    while (j < 64) {
      if (((tokenHash >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
      j += 1
    }
  }

  private def collapse(counts: Array[Int]): Long = {
    var sig = 0L
    var j = 0
    while (j < 64) {
      if (counts(j) > 0) sig |= (1L << j)
      j += 1
    }
    sig
  }

  /** 64-bit SimHash of the whitespace tokens of lower(trim(text)):
    * bit j of the result is set iff Σ over token OCCURRENCES of
    * (bit j of xxhash64(token) ? +1 : −1) is > 0 (tie → clear).
    * Exactly the semantics of the exploded-aggregation formulation
    * (explode(words) → 64 conditional sums), including multiplicity
    * (duplicate tokens vote once per occurrence) and the `[""]`
    * token an empty text yields under split-with-trailing-empties. */
  def compute(text: UTF8String): Long = {
    val words = Spaces.split(text.toLowerCase.trim().toString, -1)
    val counts = new Array[Int](64)
    var i = 0
    while (i < words.length) {
      val b = words(i).getBytes(StandardCharsets.UTF_8)
      vote(XXH64.hashUnsafeBytes(b, Platform.BYTE_ARRAY_OFFSET, b.length, Seed), counts)
      i += 1
    }
    collapse(counts)
  }

  /** Same SimHash vote, but the per-token 64-bit hash is the FIRST 8
    * BYTES of md5(token) read big-endian (== the first 16 hex chars
    * of the md5 string). xxhash64 stays the production default (3-4×
    * cheaper per token); this variant exists because md5 is the one
    * high-quality hash DuckDB and Spark both expose bit-identically,
    * making the whole SimHash pipeline ORACLE-CHECKABLE (q21): bit j
    * of the token hash is bit (j mod 4) of hex digit 16 − ⌊j/4⌋ —
    * recomputable in portable SQL. */
  def computeMd5(text: UTF8String): Long = {
    val words = Spaces.split(text.toLowerCase.trim().toString, -1)
    val counts = new Array[Int](64)
    val md = Md5.get()
    var i = 0
    while (i < words.length) {
      md.reset()
      val d = md.digest(words(i).getBytes(StandardCharsets.UTF_8))
      var h = 0L
      var k = 0
      while (k < 8) { h = (h << 8) | (d(k) & 0xffL); k += 1 }
      vote(h, counts)
      i += 1
    }
    collapse(counts)
  }
}

/** Native Catalyst expression: text → 64-bit SimHash (SURVEY.md §7.3
  * layer (b), same rationale as [[VectorDot]]/[[ShingleHashes]]).
  *
  * Why not built-ins: SimHash is a pure per-row map, but the built-in
  * formulation needs explode(tokens) → groupBy(doc) with 64
  * conditional-sum aggregates — a shuffle of every token row plus 64
  * aggregation buffers per group, for what is one tight loop per
  * document. This expression keeps the whole computation inside the
  * scan's projection: no explode, no shuffle, no aggregation state.
  * Equivalence with the aggregation form is asserted in PipelineSpec.
  */
case class SimHash64(child: Expression, md5Based: Boolean = false)
    extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case _: StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case dt =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash64 requires a string input, got ${dt.catalogString}")
    }

  private def fn: String = if (md5Based) "computeMd5" else "compute"

  override def nullSafeEval(s: Any): Any =
    if (md5Based) SimHashUtil.computeMd5(s.asInstanceOf[UTF8String])
    else SimHashUtil.compute(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHashUtil.$fn($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Column API: `simhash64(text)` — xxhash64-based production hash. */
  def apply(text: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(text)))

  /** md5-token-hash variant: same vote, oracle-checkable in portable
    * SQL (see [[SimHashUtil.computeMd5]]). */
  def md5(text: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(text), md5Based = true))
}
