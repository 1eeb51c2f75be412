package graft.sources.v2

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types._

import graft.functions.IcebergBucketUtil

/** The catalog's FUNCTION face — what storage-partitioned joins
  * resolve partition transforms against: when a scan reports
  * `KeyGroupedPartitioning(bucket(16, k))`, Spark loads `bucket` from
  * the table's catalog and compares both join sides' bound functions
  * by [[BoundFunction.canonicalName]]. The bound semantics ARE the
  * writer's transform ([[graft.functions.IcebergBucketUtil]] — the
  * Iceberg spec's murmur3), so `SELECT bucket(16, k)` also lets a
  * user audit which bucket a key lands in. */
private[v2] object GraftFunctions {

  val names: Array[String] = Array("bucket")

  def load(name: String): Option[UnboundFunction] = name.toLowerCase match {
    case "bucket" => Some(new GraftBucketUnbound)
    case _ => None
  }
}

private[v2] class GraftBucketUnbound extends UnboundFunction {
  override def name(): String = "bucket"
  override def description(): String =
    "bucket(numBuckets, col): the Iceberg spec's murmur3 bucket transform"

  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.size == 2,
      s"bucket takes (numBuckets, col), got ${inputType.size} arguments")
    require(inputType.fields(0).dataType == IntegerType,
      s"bucket numBuckets must be INT, got ${inputType.fields(0).dataType}")
    val keyType = inputType.fields(1).dataType
    keyType match {
      case IntegerType | LongType | DateType | TimestampType |
          TimestampNTZType | _: DecimalType | StringType =>
        GraftBucketBound(keyType)
      case other => throw new UnsupportedOperationException(
        s"bucket source type ${other.catalogString} is not a legal " +
          "Iceberg bucket source (int/long/date/timestamp/decimal/string)")
    }
  }
}

private[v2] case class GraftBucketBound(keyType: DataType)
    extends ScalarFunction[Integer] {
  override def inputTypes(): Array[DataType] = Array(IntegerType, keyType)
  override def resultType(): DataType = IntegerType
  override def name(): String = "bucket"
  // the SPJ compatibility key: both sides of a bucket-aligned join
  // bind to the same canonical name iff the key types agree
  override def canonicalName(): String =
    s"graft.bucket(${keyType.catalogString})"

  override def produceResult(input: InternalRow): Integer = {
    if (input.isNullAt(0) || input.isNullAt(1)) return null
    val n = input.getInt(0)
    keyType match {
      case IntegerType | DateType =>
        IcebergBucketUtil.bucketLong(input.getInt(1).toLong, n)
      case LongType | TimestampType | TimestampNTZType =>
        IcebergBucketUtil.bucketLong(input.getLong(1), n)
      case d: DecimalType => IcebergBucketUtil.bucketDecimal(
        input.getDecimal(1, d.precision, d.scale), n)
      case _ => IcebergBucketUtil.bucketString(input.getUTF8String(1), n)
    }
  }
}
