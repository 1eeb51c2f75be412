package graft.mapping

import graft.model.{ConversionStatus => CS, TypeMapping}

/** DB2 → Snowflake-Iceberg type-mapping ruleset (SURVEY.md §2.5 M1-M17).
  *
  * Semantics mirror `/root/reference/db2ice/mapper.py:29-449`: ~20
  * conditional rewrite rules with parameter arithmetic (size limits,
  * precision clamps, forced microsecond precision). Implemented as a pure
  * total function so it can run as a broadcast-free map-side projection;
  * [[graft.api.EngineOps]] also exposes the same ruleset as a Catalyst
  * `when`-chain for DataFrame flows (DuckDB-oracle expressible).
  */
object TypeMapper {

  // mapper.py:55-76
  val EwiCodes: Map[String, String] = Map(
    "CHAR_TO_VARCHAR" -> "SSC-EWI-DB2ICE-0001",
    "PRECISION_ADJUST" -> "SSC-EWI-DB2ICE-0002",
    "TIME_PRECISION" -> "SSC-EWI-DB2ICE-0003",
    "TIMESTAMP_PRECISION" -> "SSC-EWI-DB2ICE-0004",
    "XML_UNSUPPORTED" -> "SSC-EWI-DB2ICE-0005",
    "GRAPHIC_CONVERT" -> "SSC-EWI-DB2ICE-0006",
    "DECFLOAT_CONVERT" -> "SSC-EWI-DB2ICE-0007",
    "LOB_SIZE_LIMIT" -> "SSC-EWI-DB2ICE-0008",
    "ROWID_CONVERT" -> "SSC-EWI-DB2ICE-0009",
    "FOR_BIT_DATA" -> "SSC-EWI-DB2ICE-0010",
    "FIELDPROC" -> "SSC-EWI-DB2ICE-0011",
    "EDITPROC" -> "SSC-EWI-DB2ICE-0012",
    "VALIDPROC" -> "SSC-EWI-DB2ICE-0013",
    "GENERATED_COL" -> "SSC-EWI-DB2ICE-0014",
    "CHECK_CONSTRAINT" -> "SSC-EWI-DB2ICE-0015",
    "FOREIGN_KEY" -> "SSC-EWI-DB2ICE-0016",
    "PARTITION_COMPLEX" -> "SSC-EWI-DB2ICE-0017",
    "CCSID_ENCODING" -> "SSC-EWI-DB2ICE-0018",
    "LONG_VARCHAR" -> "SSC-EWI-DB2ICE-0019",
    "BINARY_CONVERT" -> "SSC-EWI-DB2ICE-0020")

  // mapper.py:79-81
  val MaxVarcharSize: Int = 16 * 1024 * 1024
  val MaxBinarySize: Int = 8 * 1024 * 1024
  val MaxLobSize: Int = 128 * 1024 * 1024

  // mapper.py:43-52
  val DirectMappings: Map[String, String] = Map(
    "SMALLINT" -> "INTEGER", // Iceberg has no SMALLINT
    "INTEGER" -> "INTEGER",
    "INT" -> "INTEGER",
    "BIGINT" -> "BIGINT",
    "REAL" -> "FLOAT",
    "DOUBLE" -> "DOUBLE",
    "DATE" -> "DATE",
    "BOOLEAN" -> "BOOLEAN")

  /** Map one DB2 type occurrence. Mirrors mapper.py:87-185 dispatch:
    * FOR BIT DATA wins over everything; then direct map; then the
    * per-family rules; unknown types fall through to lossy STRING. */
  def mapType(db2Type0: String, length: Option[Int] = None,
      precision: Option[Int] = None, scale: Option[Int] = None,
      forBitData: Boolean = false, ccsid: Option[String] = None): TypeMapping = {
    val t = db2Type0.toUpperCase.trim

    if (forBitData) return mapForBitData(t, length)

    DirectMappings.get(t).foreach { target =>
      return TypeMapping(t, target, CS.Direct)
    }

    t match {
      case "CHAR" | "CHARACTER" => mapChar(length)
      case "VARCHAR" | "CHAR VARYING" | "CHARACTER VARYING" => mapVarchar(length)
      case "LONG VARCHAR" =>
        TypeMapping("LONG VARCHAR", "STRING", CS.Compatible,
          Some(EwiCodes("LONG_VARCHAR")), Some("LONG VARCHAR converted to STRING"))
      case "CLOB" => mapClob(length)
      case "DECIMAL" | "DEC" | "NUMERIC" => mapDecimal(precision, scale)
      case "FLOAT" => mapFloat(precision)
      case "DECFLOAT" =>
        TypeMapping(withLen("DECFLOAT", precision), "DOUBLE", CS.Lossy,
          Some(EwiCodes("DECFLOAT_CONVERT")),
          Some("DECFLOAT converted to DOUBLE - decimal floating point precision may be lost"))
      case "TIME" => mapTime(precision)
      case "TIMESTAMP" => mapTimestamp(precision)
      case "BINARY" => mapBinary("BINARY", length)
      case "VARBINARY" | "BINARY VARYING" => mapBinary("VARBINARY", length)
      case "BLOB" => mapBlob(length)
      case "GRAPHIC" | "VARGRAPHIC" =>
        TypeMapping(withLen(t, length), "STRING", CS.Compatible,
          Some(EwiCodes("GRAPHIC_CONVERT")),
          Some(s"$t (DBCS) converted to STRING - verify character encoding"))
      case "LONG VARGRAPHIC" =>
        TypeMapping("LONG VARGRAPHIC", "STRING", CS.Compatible,
          Some(EwiCodes("GRAPHIC_CONVERT")),
          Some("LONG VARGRAPHIC converted to STRING - verify character encoding"))
      case "DBCLOB" => mapDbclob(length)
      case "XML" =>
        TypeMapping("XML", "STRING", CS.Unsupported,
          Some(EwiCodes("XML_UNSUPPORTED")),
          Some("XML type not supported in Iceberg tables - manual conversion required"))
      case "ROWID" =>
        TypeMapping("ROWID", "STRING", CS.Lossy,
          Some(EwiCodes("ROWID_CONVERT")),
          Some("ROWID converted to STRING - values will not be preserved during migration"))
      case other =>
        TypeMapping(other, "STRING", CS.Lossy,
          Some("SSC-EWI-DB2ICE-0099"),
          Some(s"Unknown DB2 type $other converted to STRING"))
    }
  }

  // Python-truthiness parity: the reference's `if length` / `x if x else
  // default` treats 0 like absent. Zero-valued params behave as missing.
  private def truthy(o: Option[Int]): Option[Int] = o.filter(_ != 0)

  private def withLen(t: String, len: Option[Int]): String =
    truthy(len).map(l => s"$t($l)").getOrElse(t)

  private def mapChar(length: Option[Int]): TypeMapping =
    TypeMapping(withLen("CHAR", length), "STRING", CS.Compatible,
      Some(EwiCodes("CHAR_TO_VARCHAR")),
      Some("CHAR converted to STRING - Iceberg does not support fixed-length CHAR"),
      Some("Padding behavior may differ"))

  private def mapVarchar(length: Option[Int]): TypeMapping =
    length match {
      case Some(l) if l > MaxVarcharSize =>
        TypeMapping(s"VARCHAR($l)", "STRING", CS.Lossy,
          Some(EwiCodes("LOB_SIZE_LIMIT")),
          Some(s"VARCHAR($l) exceeds Iceberg limit, using STRING"))
      case _ => TypeMapping(withLen("VARCHAR", length), "STRING", CS.Direct)
    }

  private def mapClob(length: Option[Int]): TypeMapping =
    length match {
      case Some(l) if l > MaxLobSize =>
        TypeMapping(s"CLOB($l)", "STRING", CS.Lossy,
          Some(EwiCodes("LOB_SIZE_LIMIT")),
          Some(s"CLOB size $l exceeds Snowflake 128MB limit - data truncation may occur"))
      case _ =>
        TypeMapping(withLen("CLOB", length), "STRING", CS.Compatible,
          notes = Some("CLOB converted to STRING"))
    }

  private def mapDecimal(precision: Option[Int], scale: Option[Int]): TypeMapping = {
    val p = truthy(precision).getOrElse(5) // DECIMAL(0,_) defaults like absent
    val s = scale.getOrElse(0)
    // p > 38 implies precision was given; scale may be absent — the
    // reference renders Python's None verbatim in that case.
    def orNone(o: Option[Int]): String = o.map(_.toString).getOrElse("None")
    if (p > 38)
      TypeMapping(s"DECIMAL(${orNone(precision)},${orNone(scale)})",
        s"NUMBER(38,${math.min(s, 37)})", CS.Lossy,
        Some(EwiCodes("PRECISION_ADJUST")),
        Some(s"Precision ${orNone(precision)} exceeds maximum 38, adjusted to 38"))
    else
      TypeMapping(s"DECIMAL($p,$s)", s"NUMBER($p,$s)", CS.Direct)
  }

  private def mapFloat(precision: Option[Int]): TypeMapping =
    truthy(precision) match {
      case Some(p) if p > 24 => TypeMapping(s"FLOAT($p)", "DOUBLE", CS.Direct)
      case _ => TypeMapping(withLen("FLOAT", precision), "FLOAT", CS.Direct)
    }

  private def mapTime(precision: Option[Int]): TypeMapping = {
    val sp = truthy(precision).getOrElse(0)
    if (sp != 6)
      TypeMapping(truthy(precision).map(p => s"TIME($p)").getOrElse("TIME"), "TIME(6)",
        CS.Compatible, Some(EwiCodes("TIME_PRECISION")),
        Some("TIME precision adjusted to 6 (microseconds) for Iceberg compatibility"))
    else TypeMapping("TIME(6)", "TIME(6)", CS.Direct)
  }

  private def mapTimestamp(precision: Option[Int]): TypeMapping = {
    val sp = truthy(precision).getOrElse(6) // TIMESTAMP(0) → default 6 (no EWI)
    if (sp != 6)
      TypeMapping(s"TIMESTAMP($sp)", "TIMESTAMP_NTZ(6)", CS.Compatible,
        Some(EwiCodes("TIMESTAMP_PRECISION")),
        Some("TIMESTAMP precision adjusted to 6 (microseconds) for Iceberg compatibility"))
    else TypeMapping(s"TIMESTAMP($sp)", "TIMESTAMP_NTZ(6)", CS.Direct)
  }

  private def mapBinary(srcName: String, length: Option[Int]): TypeMapping =
    length match {
      case Some(l) if l > MaxBinarySize =>
        TypeMapping(s"$srcName($l)", "BINARY", CS.Lossy,
          Some(EwiCodes("LOB_SIZE_LIMIT")),
          Some(s"$srcName($l) exceeds Iceberg limit"))
      case _ => TypeMapping(withLen(srcName, length), "BINARY", CS.Direct)
    }

  private def mapBlob(length: Option[Int]): TypeMapping =
    length match {
      case Some(l) if l > MaxLobSize =>
        TypeMapping(s"BLOB($l)", "BINARY", CS.Lossy,
          Some(EwiCodes("LOB_SIZE_LIMIT")),
          Some(s"BLOB size $l exceeds Snowflake limit - data truncation may occur"))
      case _ =>
        TypeMapping(withLen("BLOB", length), "BINARY", CS.Compatible,
          Some(EwiCodes("BINARY_CONVERT")), Some("BLOB converted to BINARY"))
    }

  private def mapDbclob(length: Option[Int]): TypeMapping =
    length match {
      case Some(l) if l > MaxLobSize =>
        TypeMapping(s"DBCLOB($l)", "STRING", CS.Lossy,
          Some(EwiCodes("LOB_SIZE_LIMIT")),
          Some(s"DBCLOB size $l exceeds Snowflake limit - data truncation may occur"))
      case _ =>
        TypeMapping(withLen("DBCLOB", length), "STRING", CS.Compatible,
          Some(EwiCodes("GRAPHIC_CONVERT")),
          Some("DBCLOB converted to STRING - verify character encoding"))
    }

  private def mapForBitData(t: String, length: Option[Int]): TypeMapping = {
    val src = length.map(l => s"$t($l) FOR BIT DATA").getOrElse(s"$t FOR BIT DATA")
    TypeMapping(src, "BINARY", CS.Compatible,
      Some(EwiCodes("FOR_BIT_DATA")), Some("FOR BIT DATA converted to BINARY type"))
  }
}
