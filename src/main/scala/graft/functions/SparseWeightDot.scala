package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Static helper for [[SparseWeightDot]] — own top-level object so
  * Janino-generated code can call the static forwarder directly (the
  * [[ShingleHashUtil]] pattern). */
object SparseWeightDotUtil {
  /** Left-to-right fold of vs(i) · w(bs(i)) with out-of-range buckets
    * reading as weight 0 — null on length mismatch or null element
    * (the zip_with null-padding / sum-poisoning corner). Returned
    * boxed so null survives the codegen boundary. */
  def compute(bs: ArrayData, vs: ArrayData, w: ArrayData): java.lang.Double = {
    val n = bs.numElements()
    if (n != vs.numElements()) return null
    val wn = w.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (bs.isNullAt(i) || vs.isNullAt(i)) return null
      val b = bs.getInt(i)
      val wv = if (b >= 0 && b < wn) w.getDouble(b) else 0.0
      acc += vs.getDouble(i) * wv
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }
}

/** Native sparse-features × dense-weights dot product with EXACT
  * `aggregate(zip_with(bs, vs, (b, v) -> v * coalesce(get(w, b), 0d)),
  * 0d, (acc, x) -> acc + x)` semantics — the margin projection of
  * [[graft.operators.QualityClassifier.train]]'s gradient-descent
  * loop, which evaluated that lambda chain INTERPRETED once per
  * (doc, feature) per iteration (the loop's dominant per-task cost;
  * guide §4: eliminate non-codegen expressions in the hot path).
  * Accumulation is left-to-right in index order — bit-identical to the
  * interpreted fold, so the spec-pinned parity against the sequential
  * in-JVM reference is unchanged. Corner cases preserved from the HOF
  * form: length mismatch → null (zip_with pads with null → the fold
  * poisons), null element → null, out-of-range bucket → weight 0
  * (null-safe `get` + coalesce). */
case class SparseWeightDot(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (a, b, c) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"sparse_weight_dot requires (array<int>, array<double>, array<double>), " +
            s"got (${a.catalogString}, ${b.catalogString}, ${c.catalogString})")
    }
  }

  override def nullSafeEval(bs: Any, vs: Any, w: Any): Any =
    SparseWeightDotUtil.compute(bs.asInstanceOf[ArrayData],
      vs.asInstanceOf[ArrayData], w.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val f = "graft.functions.SparseWeightDotUtil.compute"
    nullSafeCodeGen(ctx, ev, (bs, vs, w) => s"""
      java.lang.Double ${ev.value}Boxed = $f($bs, $vs, $w);
      if (${ev.value}Boxed == null) {
        ${ev.isNull} = true;
      } else {
        ${ev.value} = ${ev.value}Boxed.doubleValue();
      }
    """)
  }

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): SparseWeightDot =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object SparseWeightDot {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Column API: `sparse_weight_dot(bs, vs, weights)`. */
  def apply(bs: Column, vs: Column, weights: Column): Column =
    ColumnBridge.column(SparseWeightDot(ColumnBridge.expression(bs),
      ColumnBridge.expression(vs), ColumnBridge.expression(weights)))
}
