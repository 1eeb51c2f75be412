package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Static helpers for [[IcebergBucket]] — the Apache Iceberg table
  * spec's bucket-transform hash (spec "Appendix B: 32-bit Hash
  * Requirements"): standard murmur3_x86_32 (seed 0) over the value's
  * canonical byte form — int/long/date widened to an 8-byte
  * little-endian long, strings as UTF-8 bytes. Spark's own
  * `Murmur3_x86_32.hashUnsafeBytes` deviates from reference murmur3
  * on non-4-byte-aligned tails (each tail byte mixed separately), so
  * the block+tail algorithm is implemented here verbatim; the spec
  * test vectors — hash(34L) = 2017239379, hash("iceberg") =
  * 1210000089 — and Guava's reference `murmur3_32_fixed` pin it in
  * MappingSpec. */
object IcebergBucketUtil {

  /** Reference murmur3_x86_32. */
  def murmur3(data: Array[Byte], seed: Int): Int = {
    val c1 = 0xcc9e2d51
    val c2 = 0x1b873593
    var h1 = seed
    val nblocks = data.length / 4
    var i = 0
    while (i < nblocks) {
      val o = i * 4
      var k1 = (data(o) & 0xff) | ((data(o + 1) & 0xff) << 8) |
        ((data(o + 2) & 0xff) << 16) | ((data(o + 3) & 0xff) << 24)
      k1 *= c1; k1 = Integer.rotateLeft(k1, 15); k1 *= c2
      h1 ^= k1; h1 = Integer.rotateLeft(h1, 13); h1 = h1 * 5 + 0xe6546b64
      i += 1
    }
    var k1 = 0
    val tail = nblocks * 4
    val rem = data.length & 3
    if (rem == 3) k1 ^= (data(tail + 2) & 0xff) << 16
    if (rem >= 2) k1 ^= (data(tail + 1) & 0xff) << 8
    if (rem >= 1) {
      k1 ^= (data(tail) & 0xff)
      k1 *= c1; k1 = Integer.rotateLeft(k1, 15); k1 *= c2; h1 ^= k1
    }
    h1 ^= data.length
    h1 ^= (h1 >>> 16); h1 *= 0x85ebca6b; h1 ^= (h1 >>> 13)
    h1 *= 0xc2b2ae35; h1 ^= (h1 >>> 16)
    h1
  }

  /** Iceberg hash of an int/long/date value: murmur3 over the 8-byte
    * little-endian widened long (ints hash identically to longs per
    * the spec, so bucketing survives type promotion). */
  def hashLong(v: Long): Int = {
    val b = new Array[Byte](8)
    var i = 0
    while (i < 8) { b(i) = ((v >>> (8 * i)) & 0xff).toByte; i += 1 }
    murmur3(b, 0)
  }

  /** Iceberg hash of a string: murmur3 over its UTF-8 bytes.
    * `UTF8String.getBytes` IS the UTF-8 encoding — no String
    * round-trip on the per-row path. */
  def hashString(s: UTF8String): Int = murmur3(s.getBytes, 0)

  /** Iceberg hash of a decimal: murmur3 over the unscaled value's
    * minimum-length two's-complement big-endian bytes — which is
    * exactly `BigInteger.toByteArray` (spec vector: 14.20 →
    * −500754589, pinned in MappingSpec). Scale rides in the type, not
    * the bytes, per the spec. */
  def hashDecimal(d: org.apache.spark.sql.types.Decimal): Int =
    murmur3(d.toJavaBigDecimal.unscaledValue.toByteArray, 0)

  /** Spec bucket partition value: (hash & Int.MaxValue) % n. */
  def bucketLong(v: Long, n: Int): Int = (hashLong(v) & Int.MaxValue) % n

  def bucketString(s: UTF8String, n: Int): Int = (hashString(s) & Int.MaxValue) % n

  def bucketDecimal(d: org.apache.spark.sql.types.Decimal, n: Int): Int =
    (hashDecimal(d) & Int.MaxValue) % n
}

/** Native Catalyst expression: the Iceberg `bucket[N]` partition
  * transform, byte-compatible with real Iceberg writers/readers (the
  * point: a bucket value this engine writes into a manifest must be
  * the value an Iceberg runtime would compute for the same row, or
  * bucket pruning on the migrated table silently reads wrong files).
  * Codegen'd scan-side projection — bucketing a 100 TB write adds no
  * shuffle and no interpreted hot path. */
case class IcebergBucket(child: Expression, numBuckets: Int)
    extends UnaryExpression {

  require(numBuckets > 0, "numBuckets must be positive")

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case IntegerType | LongType | DateType | TimestampType | TimestampNTZType |
        _: DecimalType | _: StringType =>
      TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      "iceberg_bucket supports int/long/date/timestamp/decimal/string " +
        s"(the spec's valid bucket sources), got ${dt.catalogString}")
  }

  override def nullSafeEval(v: Any): Any = child.dataType match {
    case IntegerType | DateType =>
      IcebergBucketUtil.bucketLong(v.asInstanceOf[Int].toLong, numBuckets)
    // timestamps are catalyst micros-from-epoch longs — exactly what
    // the spec hashes
    case LongType | TimestampType | TimestampNTZType =>
      IcebergBucketUtil.bucketLong(v.asInstanceOf[Long], numBuckets)
    case _: DecimalType => IcebergBucketUtil.bucketDecimal(
      v.asInstanceOf[org.apache.spark.sql.types.Decimal], numBuckets)
    case _ => IcebergBucketUtil.bucketString(v.asInstanceOf[UTF8String], numBuckets)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    child.dataType match {
      case IntegerType | DateType => defineCodeGen(ctx, ev,
        c => s"graft.functions.IcebergBucketUtil.bucketLong((long) $c, $numBuckets)")
      case LongType | TimestampType | TimestampNTZType => defineCodeGen(ctx, ev,
        c => s"graft.functions.IcebergBucketUtil.bucketLong($c, $numBuckets)")
      case _: DecimalType => defineCodeGen(ctx, ev,
        c => s"graft.functions.IcebergBucketUtil.bucketDecimal($c, $numBuckets)")
      case _ => defineCodeGen(ctx, ev,
        c => s"graft.functions.IcebergBucketUtil.bucketString($c, $numBuckets)")
    }

  override protected def withNewChildInternal(newChild: Expression): IcebergBucket =
    copy(child = newChild)
}

object IcebergBucket {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  def apply(col: Column, numBuckets: Int): Column =
    ColumnBridge.column(IcebergBucket(ColumnBridge.expression(col), numBuckets))
}
