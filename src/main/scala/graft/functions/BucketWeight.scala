package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Static helper for [[BucketWeight]] — top-level object so
  * Janino-generated code can call the static forwarder directly. */
object BucketWeightUtil {
  /** Σ ratios(bucket) over the text's hashed uni+bigram bag — the
    * whole [[graft.operators.ImportanceResampling]] scoring fold as
    * one per-row call: grams never materialize as rows, no explode, no
    * join. `ratios` must have exactly `numBuckets` entries. */
  def compute(text: UTF8String, numBuckets: Int, salt: UTF8String,
      ratios: Array[Long]): Long = {
    val buckets = GramBucketsUtil.compute(text, numBuckets, salt)
    var s = 0L
    var i = 0
    val n = buckets.numElements()
    while (i < n) { s += ratios(buckets.getInt(i)); i += 1 }
    s
  }
}

/** Native Catalyst expression: text → Σ ratio(bucket) over the hashed
  * uni+bigram bag — the SERVING face of DSIR importance scoring. The
  * training face ([[graft.operators.ImportanceResampling.weights]])
  * aggregates the corpus through an explode + broadcast join; scoring
  * a LIVE stream against a frozen ratio table needs neither: one
  * generated call per row, stateless, so the same scorer runs
  * unchanged under structured streaming (no watermark, no state
  * store). The ratio array (≤ numBuckets longs — KBs) rides the
  * expression as a reference object, the IVF-centroid broadcast-small
  * contract. Spec-pinned equal to the training-face fold. */
case class BucketWeight(child: Expression, numBuckets: Int, salt: String,
    ratios: Array[Long]) extends UnaryExpression {
  require(numBuckets >= 1 && ratios.length == numBuckets,
    "ratios must have exactly numBuckets entries")

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case _: StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case dt =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bucket_weight requires a string input, got ${dt.catalogString}")
    }

  override def nullSafeEval(s: Any): Any =
    BucketWeightUtil.compute(s.asInstanceOf[UTF8String], numBuckets,
      UTF8String.fromString(salt), ratios)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val saltRef = ctx.addReferenceObj("salt",
      UTF8String.fromString(salt), classOf[UTF8String].getName)
    val ratiosRef = ctx.addReferenceObj("ratios", ratios, "long[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.BucketWeightUtil.compute($c, $numBuckets, $saltRef, $ratiosRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): BucketWeight =
    copy(child = newChild)
}

object BucketWeight {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Column API: `bucket_weight(text, numBuckets, salt, ratios)`. */
  def apply(text: Column, numBuckets: Int, salt: String,
      ratios: Array[Long]): Column =
    ColumnBridge.column(
      BucketWeight(ColumnBridge.expression(text), numBuckets, salt, ratios))
}
