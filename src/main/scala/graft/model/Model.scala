package graft.model

/** Core data model for the DDL-conversion engine.
  *
  * Mirrors the record types of the reference implementation
  * (`/root/reference/db2ice/parser.py:57-117`, `mapper.py:18-26`,
  * `assessor.py:29-57`, `snowflake_converter.py:20-62`) as Scala case
  * classes so they encode directly into Spark `Dataset[T]` rows
  * (nested structs + arrays; no custom Catalyst types needed).
  */

/** A DB2 column definition (reference: parser.py:57-71).
  * `fieldId` is the Iceberg field id once the table has been through
  * schema evolution — None means "positional" (index + 1), the state
  * every freshly-parsed table is in. */
final case class Db2Column(
    name: String,
    dataType: String,
    length: Option[Int] = None,
    precision: Option[Int] = None,
    scale: Option[Int] = None,
    nullable: Boolean = true,
    defaultValue: Option[String] = None,
    generated: Option[String] = None, // ALWAYS | BY DEFAULT
    ccsid: Option[String] = None,
    forBitData: Boolean = false,
    fieldproc: Option[String] = None,
    rawDefinition: String = "",
    fieldId: Option[Int] = None)

/** A table constraint (reference: parser.py:74-82). */
final case class ConstraintDef(
    ctype: String, // PRIMARY KEY | FOREIGN KEY | UNIQUE | CHECK
    name: Option[String] = None,
    columns: Seq[String] = Nil,
    referenceTable: Option[String] = None,
    referenceColumns: Seq[String] = Nil,
    checkCondition: Option[String] = None)

/** Partition specification (reference: parser.py:85-91). */
final case class PartitionSpecDef(
    ptype: String, // RANGE | HASH
    columns: Seq[String] = Nil,
    rawDefinition: String = "")

/** One field of an Iceberg partition spec in the v2 table-spec's
  * explicit form (name, transform, source column id, partition field
  * id) — the representation partition-spec EVOLUTION works on. Before
  * any spec evolution the single spec is derived from
  * [[PartitionSpecDef]]; the first evolution op materializes it. */
final case class IcebergPartitionField(
    name: String,
    transform: String, // "identity" | "bucket[16]"
    sourceId: Int,
    fieldId: Int)

/** A complete DB2 table definition (reference: parser.py:94-117). */
final case class TableDef(
    schema: Option[String] = None,
    name: String = "",
    columns: Seq[Db2Column] = Nil,
    constraints: Seq[ConstraintDef] = Nil,
    partition: Option[PartitionSpecDef] = None,
    distributeByHash: Option[String] = None,
    tablespace: Option[String] = None,
    editproc: Option[String] = None,
    validproc: Option[String] = None,
    audit: Option[String] = None,
    dataCapture: Option[String] = None,
    ccsid: Option[String] = None,
    volatileTable: Boolean = false,
    globalTemporary: Boolean = false,
    rawDdl: String = "",
    // Iceberg schema-evolution state (all defaults = the un-evolved
    // table every parser/converter path produces): the current
    // schema id, the highest field id ever assigned, and the retained
    // prior schema versions (schemaId → columns) the metadata
    // document must keep listing.
    schemaId: Int = 0,
    lastColumnId: Option[Int] = None,
    priorSchemas: Seq[(Int, Seq[Db2Column])] = Nil,
    // Iceberg partition-spec-evolution state (defaults = the
    // never-evolved table): once an evolution op runs, partitionSpecs
    // holds EVERY spec the table has ever had (specId → fields,
    // including the original spec 0; the reserved unpartitioned
    // delete spec 1 is implicit), defaultSpecId names the spec new
    // data files are written under, and lastPartitionId is the
    // monotonically-increasing partition field id high-water mark.
    partitionSpecs: Seq[(Int, Seq[IcebergPartitionField])] = Nil,
    defaultSpecId: Int = 0,
    lastPartitionId: Option[Int] = None) {
  def fullName: String = schema.map(s => s"$s.$name").getOrElse(name)

  /** Effective Iceberg field id of each current column: explicit
    * after evolution, positional (i+1) before. */
  def fieldIds: Seq[Int] =
    columns.zipWithIndex.map { case (c, i) => c.fieldId.getOrElse(i + 1) }

  /** name → effective field id for the current schema. */
  def fieldIdOf: Map[String, Int] =
    columns.zipWithIndex.map { case (c, i) =>
      c.name -> c.fieldId.getOrElse(i + 1)
    }.toMap
}

/** Conversion status domain (reference: mapper.py:10-15). */
object ConversionStatus {
  val Direct = "direct"
  val Compatible = "compatible"
  val Lossy = "lossy"
  val Unsupported = "unsupported"
}

/** Result of a data type mapping (reference: mapper.py:18-26). */
final case class TypeMapping(
    sourceType: String,
    targetType: String,
    status: String,
    ewiCode: Option[String] = None,
    ewiMessage: Option[String] = None,
    notes: Option[String] = None)

/** Issue severity domain (reference: assessor.py:22-26). */
object IssueSeverity {
  val Critical = "critical"
  val Warning = "warning"
  val Info = "info"
}

/** Readiness traffic-light levels (reference: assessor.py:15-19). */
object ReadinessLevel {
  val Green = "green"
  val Yellow = "yellow"
  val Red = "red"
}

/** An assessment issue (reference: assessor.py:29-37). */
final case class Issue(
    code: String,
    severity: String,
    message: Option[String],
    tableName: Option[String] = None,
    columnName: Option[String] = None,
    suggestion: Option[String] = None)

/** Per-table assessment result (reference: assessor.py:40-57). */
final case class TableAssessment(
    tableName: String,
    schema: Option[String] = None,
    columnCount: Int = 0,
    constraintCount: Int = 0,
    readinessScore: Double = 100.0,
    readinessLevel: String = ReadinessLevel.Green,
    canAutoConvert: Boolean = true,
    issues: Seq[Issue] = Nil,
    typeDistribution: Map[String, Int] = Map.empty) {
  def fullName: String = schema.map(s => s"$s.$tableName").getOrElse(tableName)
}

/** Complete assessment report (reference: assessor.py:60-93). */
final case class AssessmentReport(
    tablesTotal: Int = 0,
    tablesAuto: Int = 0,
    tablesManual: Int = 0,
    tablesBlocked: Int = 0,
    overallScore: Double = 0.0,
    overallLevel: String = ReadinessLevel.Green,
    datatypeScore: Double = 0.0,
    constraintScore: Double = 0.0,
    partitionScore: Double = 0.0,
    specialFeaturesScore: Double = 0.0,
    totalColumns: Int = 0,
    totalConstraints: Int = 0,
    criticalIssues: Seq[Issue] = Nil,
    warnings: Seq[Issue] = Nil,
    infoItems: Seq[Issue] = Nil,
    tableAssessments: Seq[TableAssessment] = Nil,
    typeDistribution: Map[String, Int] = Map.empty,
    featuresUsed: Map[String, Int] = Map.empty)

/** Final conversion result (reference: converter.py:14-22). */
final case class ConversionResult(
    icebergDdl: String,
    ewiCount: Int = 0,
    tablesConverted: Int = 0,
    success: Boolean = true,
    errorMessage: Option[String] = None)

// ------------------------------------------------------------------
// Snowflake-side model (reference: snowflake_converter.py)
// ------------------------------------------------------------------

/** A Snowflake column definition (reference: snowflake_converter.py:20-30). */
final case class SnowflakeColumn(
    name: String,
    dataType: String,
    nullable: Boolean = true,
    defaultValue: Option[String] = None,
    identity: Option[String] = None,
    comment: Option[String] = None,
    collate: Option[String] = None,
    maskingPolicy: Option[String] = None)

/** A foreign-key entry (reference: snowflake_converter.py:42 dict). */
final case class ForeignKeyDef(
    columns: Seq[String],
    refTable: String,
    refColumns: Seq[String])

/** A Snowflake table definition (reference: snowflake_converter.py:34-62).
  * The reference's five boolean table-kind flags are kept as booleans for
  * behavioral parity (exactly one is ever set by the parser). */
final case class SnowflakeTable(
    name: String,
    schema: Option[String] = None,
    database: Option[String] = None,
    columns: Seq[SnowflakeColumn] = Nil,
    clusterBy: Seq[String] = Nil,
    primaryKey: Seq[String] = Nil,
    foreignKeys: Seq[ForeignKeyDef] = Nil,
    uniqueKeys: Seq[Seq[String]] = Nil,
    comment: Option[String] = None,
    transient: Boolean = false,
    temporary: Boolean = false,
    dynamic: Boolean = false,
    external: Boolean = false,
    hybrid: Boolean = false,
    dataRetentionDays: Option[Int] = None,
    changeTracking: Boolean = false) {
  def fullName: String =
    (database.toSeq ++ schema.toSeq :+ name).mkString(".")
}

/** Result of the Snowflake→Iceberg conversion
  * (reference: snowflake_converter.py:77-84). */
final case class SnowflakeConversionResult(
    icebergDdl: String,
    tablesConverted: Int = 0,
    ewiCount: Int = 0,
    success: Boolean = true,
    errorMessage: Option[String] = None,
    issues: Seq[Issue] = Nil)
