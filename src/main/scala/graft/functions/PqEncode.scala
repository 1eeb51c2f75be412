package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native product-quantization encoder: the full code array (one
  * nearest-codeword id per subspace) in ONE Catalyst expression.
  *
  * Why not the built-in formulation ([[graft.operators.Pq]] keeps it as
  * `codeColBuiltin` for the parity spec): `array_min` over a literal
  * struct array of per-codeword distances builds an expression tree of
  * nSub·k dot products — at 8 subspaces × 16 codewords that is 128
  * unrolled literal dots whose janino compilation dominates fixture-
  * scale runs (BASELINE.md q59 diagnosis) and grows with k. This
  * expression is a single tree node with the codebooks attached as a
  * referenced object: constant plan size, constant compile cost, one
  * tight JIT'd loop per row at any (nSub, k, dim).
  *
  * Numeric contract (bit-identical to the built-in form, spec-pinned):
  * for subspace m the encoder minimizes ‖cw‖² − 2·⟨sub, cw⟩ — the
  * codeword-independent ‖sub‖² dropped — where ‖cw‖² is the Scala
  * left-to-right sum of squares (exactly the literal the built-in form
  * embeds), the dot widens elements to double and accumulates left to
  * right (the [[VectorDot]] contract), null/missing elements read as 0,
  * and ties pick the lower codeword id under `Double.compare` (the
  * same total order Spark's struct min uses on non-NaN doubles; NaN
  * cannot arise — codebook entries are finite means of finite inputs).
  */
case class PqEncode(child: Expression, books: Array[Array[Array[Double]]])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"pq_encode requires an array<float>/array<double> input, got ${other.catalogString}")
    }

  @transient private lazy val elemIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  @transient private lazy val nSub: Int = books.length
  @transient private lazy val subDim: Int =
    if (books.isEmpty || books(0).isEmpty) 0 else books(0)(0).length
  /** ‖cw‖² per (subspace, codeword), summed left-to-right exactly like
    * the literal `cw.map(x => x*x).sum` of the built-in form. */
  @transient private lazy val cwNorm2: Array[Array[Double]] =
    books.map(_.map(_.map(x => x * x).sum))

  /** Row kernel — shared by interpreted eval and codegen (the generated
    * code calls it through a referenced object: the loop is compiled
    * JVM code either way, and the plan stays constant-size). */
  def encodeRow(x: ArrayData): ArrayData = {
    val n = x.numElements()
    val out = new Array[Int](nSub)
    var m = 0
    while (m < nSub) {
      val book = books(m)
      val n2 = cwNorm2(m)
      val off = m * subDim
      var bestJ = 0
      var bestD2 = Double.NaN
      var j = 0
      while (j < book.length) {
        val cw = book(j)
        var dot = 0.0
        var i = 0
        // slice semantics of the built-in form: elements past the end
        // of the vector simply don't contribute (embeddings are dense,
        // this is the same min-length contract VectorDot uses)
        val lim = math.min(subDim, math.max(0, n - off))
        while (i < lim) {
          val xv = if (x.isNullAt(off + i)) 0.0
            else if (elemIsFloat) x.getFloat(off + i).toDouble
            else x.getDouble(off + i)
          dot += xv * cw(i)
          i += 1
        }
        val d2 = n2(j) - 2.0 * dot
        if (j == 0 || java.lang.Double.compare(d2, bestD2) < 0) {
          bestD2 = d2
          bestJ = j
        }
        j += 1
      }
      out(m) = bestJ
      m += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(a: Any): Any = encodeRow(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqEncoder", this, classOf[PqEncode].getName)
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = $ref.encodeRow($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

object PqEncode {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Column API: `pq_encode(vec)` against fixed codebooks. */
  def apply(vec: Column, books: Array[Array[Array[Double]]]): Column =
    ColumnBridge.column(PqEncode(ColumnBridge.expression(vec), books))
}
