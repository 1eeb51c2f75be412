package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native nearest-centroid assignment: the cid of the centroid
  * minimizing squared L2 distance, in ONE Catalyst expression — the
  * scan-side form of [[graft.operators.Ivf]]'s Lloyd/assign step.
  *
  * Why not the declarative formulation (kept in `Ivf.nearest` for the
  * multi-probe n > 1 path and pinned equal in OptimizedExprSpec): the
  * crossJoin-with-broadcast-centroids + min-over-struct groupBy ships
  * nCentroids copies of every row into a hash aggregate and then
  * SHUFFLES the whole corpus (id, vec, n2, d2 struct) once per call —
  * per Lloyd round and again at assign time. Assignment is a per-row
  * decision against driver-small state; this expression makes it a
  * pure projection: no row explosion, no exchange, constant plan size
  * at any nCentroids (the centroid matrix rides along as a referenced
  * object, exactly like [[PqEncode]]'s codebooks).
  *
  * Numeric contract (bit-identical to the declarative form):
  *  - n2 = Σ v_i² and dot_j = Σ v_i·c_ji are [[VectorDot]]'s fold —
  *    left-to-right double accumulation over min(len) elements,
  *    elements widened to double, nulls read as 0;
  *  - d2_j = (n2 − 2.0·dot_j) + cn2_j with exactly the declarative
  *    form's association, cn2_j passed in by the caller (train
  *    computes it with VectorDot's fold; assign passes the STORED
  *    c_n2 through unchanged);
  *  - the argmin compares d2 with SQLOrderingUtil.compareDoubles
  *    semantics (IEEE equality first — −0.0 ties 0.0 — then
  *    Double.compare), ties broken toward the lower cid: exactly the
  *    `min(struct(d2, cid, …))` ordering. NaN cannot arise for finite
  *    inputs but orders greatest, as in the struct min.
  */
case class NearestCentroid(child: Expression, cents: Array[Array[Double]],
    cids: Array[Int], cn2: Array[Double]) extends UnaryExpression {

  require(cents.length == cids.length && cents.length == cn2.length,
    "cents/cids/cn2 must align")
  require(cents.nonEmpty, "need at least one centroid")

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"nearest_centroid requires an array<float>/array<double> input, got ${other.catalogString}")
    }

  @transient private lazy val elemIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  /** SQLOrderingUtil.compareDoubles: IEEE == first (so −0.0 equals
    * 0.0), then Double.compare (so NaN sorts greatest). */
  private def cmp(a: Double, b: Double): Int =
    if (a == b) 0 else java.lang.Double.compare(a, b)

  /** Row kernel — shared by interpreted eval and codegen. */
  def nearestRow(x: ArrayData): Int = {
    val n = x.numElements()
    def elem(i: Int): Double =
      if (x.isNullAt(i)) 0.0
      else if (elemIsFloat) x.getFloat(i).toDouble
      else x.getDouble(i)
    // n2 with VectorDot(vec, vec)'s exact fold
    var n2 = 0.0
    var i = 0
    while (i < n) { val v = elem(i); n2 += v * v; i += 1 }
    var bestCid = 0
    var bestD2 = 0.0
    var j = 0
    while (j < cents.length) {
      val c = cents(j)
      val lim = math.min(n, c.length)
      var dot = 0.0
      var k = 0
      while (k < lim) { dot += elem(k) * c(k); k += 1 }
      val d2 = (n2 - 2.0 * dot) + cn2(j)
      val rel = if (j == 0) -1 else cmp(d2, bestD2)
      if (rel < 0 || (rel == 0 && cids(j) < bestCid)) {
        bestD2 = d2
        bestCid = cids(j)
      }
      j += 1
    }
    bestCid
  }

  override def nullSafeEval(a: Any): Any = nearestRow(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("nearestCentroid", this, classOf[NearestCentroid].getName)
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = $ref.nearestRow($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroid =
    copy(child = newChild)
}

object NearestCentroid {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Column API over a local centroid table: rows (cid, vector, ‖c‖²),
    * any cid order (the argmin tie-breaks by cid explicitly). */
  def apply(vec: Column, cents: Array[Array[Double]], cids: Array[Int],
      cn2: Array[Double]): Column =
    ColumnBridge.column(NearestCentroid(
      ColumnBridge.expression(vec), cents, cids, cn2))
}
