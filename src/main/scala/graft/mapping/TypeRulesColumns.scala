package graft.mapping

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The M1-M20 type-mapping ruleset as a pure Catalyst `when`-chain
  * (SURVEY.md §2.5): the same semantics as [[TypeMapper.mapType]], but
  * expressed as Column expressions so the whole ruleset is one CASE
  * projection — Catalyst-optimizable, whole-stage-codegen'd, pushdown-
  * transparent, and directly expressible as ANSI SQL CASE for the
  * DuckDB oracle. This is the form a 100 TB schema-translation job
  * uses: one projection over a (type, length, precision, scale,
  * for_bit_data) column set, no UDF in the hot path.
  *
  * Parity with the Scala form is asserted in tests over the full rule
  * domain.
  */
object TypeRulesColumns {

  import TypeMapper.{MaxBinarySize, MaxLobSize, MaxVarcharSize}

  /** Python-truthiness default: NULL *or zero* falls back (the
    * reference's `x if x else default`). */
  private def truthyOr(c: Column, default: Int): Column =
    coalesce(when(c === 0, lit(null)).otherwise(c), lit(default))

  /** Target Iceberg type column. Arguments are columns over the
    * normalized inputs (upper-cased type name; nullable ints). */
  def targetType(t: Column, len: Column, prec: Column, scale: Column,
      forBit: Column): Column = {
    val p = truthyOr(prec, 5)
    val s = coalesce(scale, lit(0))
    when(forBit, lit("BINARY"))
      .when(t === "SMALLINT" || t === "INTEGER" || t === "INT", lit("INTEGER"))
      .when(t === "BIGINT", lit("BIGINT"))
      .when(t === "REAL", lit("FLOAT"))
      .when(t === "DOUBLE", lit("DOUBLE"))
      .when(t === "DATE", lit("DATE"))
      .when(t === "BOOLEAN", lit("BOOLEAN"))
      .when(t === "CHAR" || t === "CHARACTER" || t === "VARCHAR" ||
        t === "CHAR VARYING" || t === "CHARACTER VARYING" ||
        t === "LONG VARCHAR" || t === "CLOB", lit("STRING"))
      .when(t === "DECIMAL" || t === "DEC" || t === "NUMERIC",
        when(p > 38, concat(lit("NUMBER(38,"), least(s, lit(37)).cast("string"), lit(")")))
          .otherwise(concat(lit("NUMBER("), p.cast("string"), lit(","), s.cast("string"), lit(")"))))
      .when(t === "FLOAT",
        when(prec.isNotNull && prec > 24, lit("DOUBLE")).otherwise(lit("FLOAT")))
      .when(t === "DECFLOAT", lit("DOUBLE"))
      .when(t === "TIME", lit("TIME(6)"))
      .when(t === "TIMESTAMP", lit("TIMESTAMP_NTZ(6)"))
      .when(t === "BINARY" || t === "VARBINARY" || t === "BINARY VARYING" ||
        t === "BLOB", lit("BINARY"))
      .when(t === "GRAPHIC" || t === "VARGRAPHIC" || t === "LONG VARGRAPHIC" ||
        t === "DBCLOB", lit("STRING"))
      .when(t === "XML" || t === "ROWID", lit("STRING"))
      .otherwise(lit("STRING"))
  }

  /** Conversion status column (direct/compatible/lossy/unsupported). */
  def status(t: Column, len: Column, prec: Column, scale: Column,
      forBit: Column): Column = {
    val p = truthyOr(prec, 5)
    when(forBit, lit("compatible"))
      .when(t.isin("SMALLINT", "INTEGER", "INT", "BIGINT", "REAL", "DOUBLE",
        "DATE", "BOOLEAN", "FLOAT"), lit("direct"))
      .when(t === "CHAR" || t === "CHARACTER", lit("compatible"))
      .when(t.isin("VARCHAR", "CHAR VARYING", "CHARACTER VARYING"),
        when(len.isNotNull && len > MaxVarcharSize, lit("lossy")).otherwise(lit("direct")))
      .when(t === "LONG VARCHAR", lit("compatible"))
      .when(t === "CLOB" || t === "DBCLOB",
        when(len.isNotNull && len > MaxLobSize, lit("lossy")).otherwise(lit("compatible")))
      .when(t.isin("DECIMAL", "DEC", "NUMERIC"),
        when(p > 38, lit("lossy")).otherwise(lit("direct")))
      .when(t === "DECFLOAT" || t === "ROWID", lit("lossy"))
      .when(t === "TIME",
        when(coalesce(prec, lit(0)) === 6, lit("direct")).otherwise(lit("compatible")))
      .when(t === "TIMESTAMP",
        when(truthyOr(prec, 6) === 6, lit("direct")).otherwise(lit("compatible")))
      .when(t.isin("BINARY", "VARBINARY", "BINARY VARYING"),
        when(len.isNotNull && len > MaxBinarySize, lit("lossy")).otherwise(lit("direct")))
      .when(t === "BLOB",
        when(len.isNotNull && len > MaxLobSize, lit("lossy")).otherwise(lit("compatible")))
      .when(t.isin("GRAPHIC", "VARGRAPHIC", "LONG VARGRAPHIC"), lit("compatible"))
      .when(t === "XML", lit("unsupported"))
      .otherwise(lit("lossy"))
  }

  /** EWI code column (null when no EWI applies). */
  def ewiCode(t: Column, len: Column, prec: Column, scale: Column,
      forBit: Column): Column = {
    val p = truthyOr(prec, 5)
    when(forBit, lit("SSC-EWI-DB2ICE-0010"))
      .when(t.isin("SMALLINT", "INTEGER", "INT", "BIGINT", "REAL", "DOUBLE",
        "DATE", "BOOLEAN", "FLOAT"), lit(null).cast("string"))
      .when(t === "CHAR" || t === "CHARACTER", lit("SSC-EWI-DB2ICE-0001"))
      .when(t.isin("VARCHAR", "CHAR VARYING", "CHARACTER VARYING"),
        when(len.isNotNull && len > MaxVarcharSize, lit("SSC-EWI-DB2ICE-0008"))
          .otherwise(lit(null).cast("string")))
      .when(t === "LONG VARCHAR", lit("SSC-EWI-DB2ICE-0019"))
      .when(t === "CLOB",
        when(len.isNotNull && len > MaxLobSize, lit("SSC-EWI-DB2ICE-0008"))
          .otherwise(lit(null).cast("string")))
      .when(t === "DBCLOB",
        when(len.isNotNull && len > MaxLobSize, lit("SSC-EWI-DB2ICE-0008"))
          .otherwise(lit("SSC-EWI-DB2ICE-0006")))
      .when(t.isin("DECIMAL", "DEC", "NUMERIC"),
        when(p > 38, lit("SSC-EWI-DB2ICE-0002")).otherwise(lit(null).cast("string")))
      .when(t === "DECFLOAT", lit("SSC-EWI-DB2ICE-0007"))
      .when(t === "TIME",
        when(coalesce(prec, lit(0)) === 6, lit(null).cast("string"))
          .otherwise(lit("SSC-EWI-DB2ICE-0003")))
      .when(t === "TIMESTAMP",
        when(truthyOr(prec, 6) === 6, lit(null).cast("string"))
          .otherwise(lit("SSC-EWI-DB2ICE-0004")))
      .when(t.isin("BINARY", "VARBINARY", "BINARY VARYING"),
        when(len.isNotNull && len > MaxBinarySize, lit("SSC-EWI-DB2ICE-0008"))
          .otherwise(lit(null).cast("string")))
      .when(t === "BLOB",
        when(len.isNotNull && len > MaxLobSize, lit("SSC-EWI-DB2ICE-0008"))
          .otherwise(lit("SSC-EWI-DB2ICE-0020")))
      .when(t.isin("GRAPHIC", "VARGRAPHIC", "LONG VARGRAPHIC"), lit("SSC-EWI-DB2ICE-0006"))
      .when(t === "XML", lit("SSC-EWI-DB2ICE-0005"))
      .when(t === "ROWID", lit("SSC-EWI-DB2ICE-0009"))
      .otherwise(lit("SSC-EWI-DB2ICE-0099"))
  }
}
