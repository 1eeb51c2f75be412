package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.api.Engine

/** Driver-facing queries exercising the distributed DDL pipeline
  * (SURVEY.md §3 EP1-EP3 as Spark jobs). Not SQL-expressible in DuckDB
  * (state-machine parsing), so these are registered WITHOUT oracle SQL —
  * the driver records a rows-only check; golden byte-parity is enforced
  * by the ScalaTest suites instead.
  *
  * Each query replicates the embedded reference sample script N times
  * (distinct script ids) so the pipeline actually fans out over
  * partitions: per-script parse/render map-side, one shuffle for the
  * per-script ordered aggregation.
  */
object DdlQueries {

  private def db2Scripts(s: SparkSession, n: Int): DataFrame = {
    val sample = Engine.sampleDdl("sample_db2.sql")
    Engine.scriptsOf(s, (0 until n).map(i => (f"script_$i%03d", sample)))
      .repartition(4)
  }

  private def sfScripts(s: SparkSession, n: Int): DataFrame = {
    val sample = Engine.sampleDdl("sample_snowflake.sql")
    Engine.scriptsOf(s, (0 until n).map(i => (f"sf_$i%03d", sample)))
      .repartition(4)
  }

  /** Parsed table inventory over scripts. */
  def ddlTables(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Engine.parseDb2(db2Scripts(s, 8))
      .map(st => (st.scriptId, st.tablePos, st.table.fullName,
        st.table.columns.length, st.table.constraints.length,
        st.table.volatileTable || st.table.globalTemporary))
      .toDF("script_id", "table_pos", "full_name", "n_columns", "n_constraints", "is_temp")
      .orderBy("script_id", "table_pos")
  }

  /** Per-script conversion results (ordered string agg output). */
  def ddlConvert(s: SparkSession, dir: String): DataFrame =
    Engine.convertDb2(Engine.parseDb2(db2Scripts(s, 8)))
      .withColumn("ddl_sha", sha2(col("iceberg_ddl"), 256))
      .drop("iceberg_ddl")
      .orderBy("script_id")

  /** Per-script assessment reports (A2-A8 rollup). */
  def ddlAssess(s: SparkSession, dir: String): DataFrame =
    Engine.assessReport(Engine.assessRows(Engine.parseDb2(db2Scripts(s, 8))))
      .withColumn("overall_score", round(col("overall_score"), 4))
      .withColumn("datatype_score", round(col("datatype_score"), 4))
      .withColumn("constraint_score", round(col("constraint_score"), 4))
      .withColumn("partition_score", round(col("partition_score"), 4))
      .withColumn("special_features_score", round(col("special_features_score"), 4))
      .orderBy("script_id")

  /** Per-table ∪ per-schema ∪ per-script ∪ grand-total readiness
    * rollup (SURVEY §2.6's generalization of the reference's two-loop
    * per-table + global report) — every level from one aggregation. */
  def ddlRollup(s: SparkSession, dir: String): DataFrame =
    Engine.assessRollup(Engine.assessRows(Engine.parseDb2(db2Scripts(s, 8))))
      .withColumn("overall_score", round(col("overall_score"), 4))
      .withColumn("datatype_score", round(col("datatype_score"), 4))
      .withColumn("constraint_score", round(col("constraint_score"), 4))
      .withColumn("partition_score", round(col("partition_score"), 4))
      .withColumn("special_features_score", round(col("special_features_score"), 4))
      .orderBy(col("agg_level"), col("script_id").asc_nulls_first,
        col("schema").asc_nulls_first, col("table_name").asc_nulls_first)

  /** A1 type-distribution rollup. */
  def ddlTypeDistribution(s: SparkSession, dir: String): DataFrame =
    Engine.typeDistribution(Engine.assessRows(Engine.parseDb2(db2Scripts(s, 8))))
      .orderBy("script_id", "base_type")

  /** A9 feature-usage rollup. */
  def ddlFeatures(s: SparkSession, dir: String): DataFrame =
    Engine.featureUsage(Engine.parseDb2(db2Scripts(s, 8)))
      .orderBy("script_id")

  /** Snowflake-path conversion over scripts. */
  def sfConvert(s: SparkSession, dir: String): DataFrame =
    Engine.convertSnowflake(sfScripts(s, 8))
      .withColumn("ddl_sha", sha2(col("iceberg_ddl"), 256))
      .drop("iceberg_ddl")
      .orderBy("script_id")

  /** S8 report sink: the assessment PDF's paginated text per script
    * (one row per report line; golden-pinned byte-identically to the
    * reference's generate_assessment_pdf via
    * `tools/gen_report_golden.py`; fixed timestamp for determinism). */
  def ddlReport(s: SparkSession, dir: String): DataFrame =
    Engine.reportLines(db2Scripts(s, 8), generatedAt = "2026-01-01 00:00:00")
      .orderBy("script_id", "line_no")

  /** Conversion-report sink (app.py:266-411 parity, same golden
    * machinery as ddl_report). */
  def ddlConversionReport(s: SparkSession, dir: String): DataFrame =
    Engine.conversionReportLines(db2Scripts(s, 8), generatedAt = "2026-01-01 00:00:00")
      .orderBy("script_id", "line_no")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ddl_tables" -> (ddlTables _),
    "ddl_convert" -> (ddlConvert _),
    "ddl_assess" -> (ddlAssess _),
    "ddl_rollup" -> (ddlRollup _),
    "ddl_type_distribution" -> (ddlTypeDistribution _),
    "ddl_features" -> (ddlFeatures _),
    "sf_convert" -> (sfConvert _),
    "ddl_report" -> (ddlReport _),
    "ddl_conversion_report" -> (ddlConversionReport _),
  )
}
