package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Static helpers for [[IcebergTransform]] — the Apache Iceberg table
  * spec's HIDDEN-PARTITIONING transforms beyond bucket (spec
  * "Partition Transforms"): `year`/`month`/`day`/`hour` on date and
  * timestamp sources, and `truncate[W]` on int/long/string sources.
  * The temporal transforms are ordinal counts FROM THE UNIX EPOCH
  * (floored, so pre-1970 values go negative: day of
  * 1969-12-31T23:30 is −1, not 0) — spec examples pinned in
  * MappingSpec: day(2017-11-16) = 17486, month = 574, year = 47.
  * Truncate is the spec's floored modulus (truncate[10](−1) = −10)
  * and, for strings, the first W UNICODE CODE POINTS (a 4-byte
  * supplementary character counts once).
  *
  * Everything here must agree bit-for-bit with what
  * [[graft.sources.IcebergPruning]] computes when it maps a source-
  * column predicate through the transform to prune files, and with
  * the Hive-directory values [[graft.api.SchemaTranslator.writeMigrated]]
  * encodes — the writer, the manifest and the pruner share these
  * functions so the three can never drift. */
object IcebergTransformUtil {

  private final val MicrosPerDay = 86400000000L
  private final val MicrosPerHour = 3600000000L

  /** Days from epoch of a timestamp in Catalyst micros (floored). */
  def daysOfMicros(micros: Long): Int =
    Math.floorDiv(micros, MicrosPerDay).toInt

  /** Hours from epoch of a timestamp in Catalyst micros (floored). */
  def hoursOfMicros(micros: Long): Int =
    Math.floorDiv(micros, MicrosPerHour).toInt

  /** Months from epoch (1970-01 = 0) of an epoch-day count. Calendar
    * months, not 30-day buckets — 2017-11 is month 574 because
    * 47 × 12 + 10 = 574. */
  def monthsOfDays(days: Int): Int = {
    val d = java.time.LocalDate.ofEpochDay(days.toLong)
    (d.getYear - 1970) * 12 + (d.getMonthValue - 1)
  }

  /** Years from epoch (1970 = 0) of an epoch-day count. */
  def yearsOfDays(days: Int): Int =
    java.time.LocalDate.ofEpochDay(days.toLong).getYear - 1970

  def monthsOfMicros(micros: Long): Int = monthsOfDays(daysOfMicros(micros))

  def yearsOfMicros(micros: Long): Int = yearsOfDays(daysOfMicros(micros))

  /** Spec truncate for integral values: `v − (v mod W)` with the
    * POSITIVE (floored) modulus, so negatives round away from zero:
    * truncate[10](−1) = −10, truncate[10](−10) = −10. */
  def truncateLong(v: Long, w: Long): Long = v - Math.floorMod(v, w)

  def truncateInt(v: Int, w: Int): Int = v - Math.floorMod(v, w)

  /** Spec truncate for strings: the first `w` Unicode code points.
    * `UTF8String.substring` counts one per UTF-8 sequence (4-byte
    * supplementary characters included), which is exactly the spec's
    * "valid UTF-8 character boundary" rule. */
  def truncateString(s: UTF8String, w: Int): UTF8String = s.substring(0, w)
}

/** Native Catalyst expression: one Iceberg partition transform applied
  * to a source column — the scan-side projection the migration writer
  * materializes so `PARTITIONED BY (day(ts))` lays 100 TB of events
  * into date directories without a physical date column, and readers
  * prune by timestamp range against manifest partition values alone.
  * Codegen'd (static util calls) so the write path stays inside
  * whole-stage codegen.
  *
  * `transform` ∈ {year, month, day, hour, truncate[W]}; `bucket[N]`
  * stays [[IcebergBucket]]. Sources: year/month/day accept date or
  * timestamp (NTZ/TZ); hour accepts timestamps only (the spec: hour of
  * a date is meaningless); truncate accepts int/long/string — the
  * sources whose Hive-directory round trip through
  * [[graft.sources.IcebergSnapshot.parsePartitionValue]] is exact
  * (decimal directory values would re-parse as strings and compare
  * lexically, so they are refused here rather than mis-pruned later). */
case class IcebergTransform(child: Expression, transform: String)
    extends UnaryExpression {

  import IcebergTransform.TruncateW

  private val truncateWidth: Option[Long] = transform match {
    case TruncateW(w) => Some(w.toLong)
    case _ => None
  }

  require(transform == "year" || transform == "month" ||
    transform == "day" || transform == "hour" || truncateWidth.isDefined,
    s"unknown transform $transform (year/month/day/hour/truncate[W])")
  require(truncateWidth.forall(_ > 0), s"$transform: width must be positive")

  override def dataType: DataType =
    if (truncateWidth.isDefined) child.dataType else IntegerType

  override def checkInputDataTypes(): TypeCheckResult =
    (transform, child.dataType) match {
      case ("year" | "month" | "day", DateType | TimestampType |
          TimestampNTZType) => TypeCheckResult.TypeCheckSuccess
      case ("hour", TimestampType | TimestampNTZType) =>
        TypeCheckResult.TypeCheckSuccess
      case ("hour", DateType) => TypeCheckResult.TypeCheckFailure(
        "hour of a date is not defined by the Iceberg spec — " +
          "partition by day instead")
      case (_, IntegerType | LongType | _: StringType)
          if truncateWidth.isDefined => TypeCheckResult.TypeCheckSuccess
      case (t, dt) => TypeCheckResult.TypeCheckFailure(
        s"iceberg transform $t does not apply to ${dt.catalogString} " +
          "(year/month/day: date or timestamp; hour: timestamp; " +
          "truncate: int/long/string)")
    }

  override def nullSafeEval(v: Any): Any = (transform, child.dataType) match {
    case ("day", DateType) => v.asInstanceOf[Int]
    case ("month", DateType) =>
      IcebergTransformUtil.monthsOfDays(v.asInstanceOf[Int])
    case ("year", DateType) =>
      IcebergTransformUtil.yearsOfDays(v.asInstanceOf[Int])
    case ("day", _) => IcebergTransformUtil.daysOfMicros(v.asInstanceOf[Long])
    case ("month", _) =>
      IcebergTransformUtil.monthsOfMicros(v.asInstanceOf[Long])
    case ("year", _) => IcebergTransformUtil.yearsOfMicros(v.asInstanceOf[Long])
    case ("hour", _) => IcebergTransformUtil.hoursOfMicros(v.asInstanceOf[Long])
    case (_, IntegerType) =>
      IcebergTransformUtil.truncateInt(v.asInstanceOf[Int],
        truncateWidth.get.toInt)
    case (_, LongType) =>
      IcebergTransformUtil.truncateLong(v.asInstanceOf[Long],
        truncateWidth.get)
    case _ => IcebergTransformUtil.truncateString(v.asInstanceOf[UTF8String],
      truncateWidth.get.toInt)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val u = "graft.functions.IcebergTransformUtil"
    (transform, child.dataType) match {
      case ("day", DateType) => defineCodeGen(ctx, ev, c => c)
      case ("month", DateType) =>
        defineCodeGen(ctx, ev, c => s"$u.monthsOfDays($c)")
      case ("year", DateType) =>
        defineCodeGen(ctx, ev, c => s"$u.yearsOfDays($c)")
      case ("day", _) => defineCodeGen(ctx, ev, c => s"$u.daysOfMicros($c)")
      case ("month", _) => defineCodeGen(ctx, ev, c => s"$u.monthsOfMicros($c)")
      case ("year", _) => defineCodeGen(ctx, ev, c => s"$u.yearsOfMicros($c)")
      case ("hour", _) => defineCodeGen(ctx, ev, c => s"$u.hoursOfMicros($c)")
      case (_, IntegerType) => defineCodeGen(ctx, ev,
        c => s"$u.truncateInt($c, ${truncateWidth.get.toInt})")
      case (_, LongType) => defineCodeGen(ctx, ev,
        c => s"$u.truncateLong($c, ${truncateWidth.get}L)")
      case _ => defineCodeGen(ctx, ev,
        c => s"$u.truncateString($c, ${truncateWidth.get.toInt})")
    }
  }

  override protected def withNewChildInternal(newChild: Expression): IcebergTransform =
    copy(child = newChild)
}

object IcebergTransform {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  private[graft] val TruncateW = """truncate\[(\d+)\]""".r
  private[graft] val BucketN = """bucket\[(\d+)\]""".r

  def apply(col: Column, transform: String): Column =
    ColumnBridge.column(IcebergTransform(ColumnBridge.expression(col), transform))

  /** The column computing `transform(src)` for ANY spec transform
    * string — identity, bucket[N], year/month/day/hour, truncate[W].
    * Every writer that materializes partition tuples from data (the
    * migration writer, spec-migrating compaction) MUST route through
    * this so a transform added later cannot silently fall through an
    * identity default and stamp raw source values into manifests. */
  def specColumn(transform: String, src: Column): Column = transform match {
    case "identity" => src
    case BucketN(n) => IcebergBucket(src, n.toInt)
    case t => IcebergTransform(src, t)
  }
}
