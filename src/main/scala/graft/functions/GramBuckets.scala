package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest
import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Static helper for [[GramBuckets]] — top-level object so
  * Janino-generated code can call the static forwarder directly. */
object GramBucketsUtil {
  private val Spaces = Pattern.compile(" +")
  private val Digest = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))

  /** Bucket ids of the uni+bigram hashed bag of lower(trim(text))
    * split on space runs, in unigrams-then-bigrams order — semantics
    * identical to exploding [[graft.operators.QualityClassifier]]'s
    * HOF gram column through [[graft.operators.Sampling.hashValue]]
    * (spec-asserted): each gram's bucket is the first 32 bits of
    * md5(salt || gram) mod numBuckets. */
  def compute(text: UTF8String, numBuckets: Int, salt: UTF8String): ArrayData = {
    val words0 = Spaces.split(text.toLowerCase.trim().toString, -1)
    var n = 0
    var i = 0
    while (i < words0.length) { if (!words0(i).isEmpty) n += 1; i += 1 }
    val toks = new Array[Array[Byte]](n)
    i = 0
    var j = 0
    while (i < words0.length) {
      if (!words0(i).isEmpty) {
        toks(j) = words0(i).getBytes(StandardCharsets.UTF_8)
        j += 1
      }
      i += 1
    }
    val saltBytes = salt.getBytes
    val md = Digest.get()
    val out = new Array[Int](if (n >= 2) 2 * n - 1 else n)
    i = 0
    while (i < n) { // unigrams
      md.reset()
      md.update(saltBytes)
      md.update(toks(i))
      out(i) = fold(md.digest(), numBuckets)
      i += 1
    }
    i = 0
    while (i < n - 1) { // bigrams: "tok[i] tok[i+1]"
      md.reset()
      md.update(saltBytes)
      md.update(toks(i))
      md.update(' '.toByte)
      md.update(toks(i + 1))
      out(n + i) = fold(md.digest(), numBuckets)
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** First 4 digest bytes as a big-endian unsigned int, mod buckets —
    * exactly `conv(substring(md5(x),1,8),16,10) % numBuckets`. */
  private def fold(d: Array[Byte], numBuckets: Int): Int = {
    val hv = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
    (hv % numBuckets).toInt
  }
}

/** Native Catalyst expression: text → array<int> of hashed-bag bucket
  * ids (uni+bigrams, salted md5 fold). Why not built-ins: the bigram
  * construction (`transform` + `sequence` + `slice` + `concat_ws`)
  * evaluates its lambdas INTERPRETED per element — measured 4.4 s of
  * q78's 6.3 s featurization at sf0.1 before the hash even runs (the
  * q61 RepetitionStats lesson). One generated call per row replaces
  * the whole gram pipeline, and downstream explode carries ints, not
  * gram strings. The md5 fold is bit-identical to
  * [[graft.operators.Sampling.hashValue]] so q77's DuckDB oracle is
  * untouched. */
case class GramBuckets(child: Expression, numBuckets: Int, salt: String)
    extends UnaryExpression {
  require(numBuckets >= 1, "numBuckets must be >= 1")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case _: StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case dt =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"gram_buckets requires a string input, got ${dt.catalogString}")
    }

  override def nullSafeEval(s: Any): Any =
    GramBucketsUtil.compute(s.asInstanceOf[UTF8String], numBuckets,
      UTF8String.fromString(salt))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val saltRef = ctx.addReferenceObj("salt",
      UTF8String.fromString(salt), classOf[UTF8String].getName)
    defineCodeGen(ctx, ev,
      c => s"graft.functions.GramBucketsUtil.compute($c, $numBuckets, $saltRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): GramBuckets =
    copy(child = newChild)
}

object GramBuckets {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Column API: `gram_buckets(text, numBuckets, salt)`. */
  def apply(text: Column, numBuckets: Int, salt: String): Column =
    ColumnBridge.column(GramBuckets(ColumnBridge.expression(text), numBuckets, salt))
}
