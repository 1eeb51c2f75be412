package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout: Morton (Z-order) interleaving and
  * the range-partitioned write layout built on it.
  *
  * At 100 TB the point is data skipping. A single-column sort gives
  * tight per-file min/max for that column only; interleaving the bits
  * of two filter columns and range-partitioning by the interleave
  * keeps BOTH columns' per-file ranges tight (each z-range is a small
  * 2-D tile), so scans with predicates on either or both columns
  * prune files the single-column layout cannot. This is the same
  * technique behind Iceberg/Delta Z-ORDER clustering, expressed here
  * as plain integer arithmetic inside whole-stage codegen.
  */
object Layout {

  /** Spreads the low 16 bits of `v` to even bit positions (classic
    * magic-number bit spread: 4 shift/mask rounds, no loops). */
  private def spread16(v: Column): Column = {
    val m = Seq(0x00FF00FFL, 0x0F0F0F0FL, 0x33333333L, 0x55555555L)
    val s = Seq(8, 4, 2, 1)
    m.zip(s).foldLeft(v.bitwiseAND(lit(0xFFFFL))) { case (x, (mask, sh)) =>
      x.bitwiseOR(shiftleft(x, sh)).bitwiseAND(lit(mask))
    }
  }

  /** 32-bit Morton code of two columns' low 16 bits: bit j of `a` →
    * bit 2j, bit j of `b` → bit 2j+1. Pure long arithmetic — the
    * identical shift/mask rounds run in any engine, so layouts are
    * reproducible and oracle-checkable. */
  def morton2(a: Column, b: Column): Column =
    spread16(a.cast("bigint"))
      .bitwiseOR(shiftleft(spread16(b.cast("bigint")), 1))

  /** Re-lays `df` for a 2-D-skippable write: range-partition into
    * `nFiles` splits of the Morton code of (`aCol`, `bCol`) (low 16
    * bits each — pre-scale wider domains), sorted within each split so
    * row-group stats stay tight too. One range exchange; every
    * downstream file carries tight min/max on BOTH columns. */
  def zorderLayout(df: DataFrame, aCol: String, bCol: String,
      nFiles: Int): DataFrame = {
    val z = morton2(col(aCol), col(bCol)).as("__z")
    df.withColumn("__z", z)
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
  }
}
