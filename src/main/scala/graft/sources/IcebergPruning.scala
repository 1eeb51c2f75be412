package graft.sources

import java.nio.charset.StandardCharsets

import graft.mapping.TypeMapper
import graft.model.TableDef

/** Stats-based FILE PRUNING for [[IcebergSnapshot.readSnapshot]] — the
  * read-side consumer of the per-file column bounds, value/null counts
  * and partition values the commit path already records in every
  * manifest ([[IcebergSnapshot.columnStats]]). This is what makes the
  * Iceberg layout pay off at 100 TB: a selective read (one day of a
  * partitioned table, one id range) opens only the files whose
  * recorded [lower, upper] interval can overlap the predicate instead
  * of scanning every live data file. Reference analogue: the entire
  * point of the Iceberg target the converter renders
  * (`/root/reference/db2ice/converter.py:166-183`) is pruned scans.
  *
  * Predicates are conjunctions of per-column inclusive ranges
  * ([[ColumnBound]]); equality is `lower == upper`. Three pruning
  * signals, all spec-sanctioned, all CONSERVATIVE (a file is only
  * skipped when no row in it can match):
  *
  *   1. '''identity partition values''' — every row of the file shares
  *      the recorded value, so an out-of-range (or null) value prunes
  *      the whole file;
  *   2. '''bucket partition values''' — for an EQUALITY bound on a
  *      bucket-transform source column, the file survives only when
  *      its bucket ordinal equals `bucketN(value)` (the same murmur3
  *      transform the writer used, [[graft.functions.IcebergBucketUtil]]);
  *   3. '''column lower/upper bounds + null counts''' — interval
  *      overlap on the decoded single-value serializations, keyed by
  *      FIELD ID so bounds survive column renames; a file whose value
  *      count equals its null count for the column has no matching row.
  *
  * Files with no usable signal (missing bounds, undecodable type) are
  * always KEPT — pruning never changes results, only work. The read
  * additionally applies the same predicate row-level (residual
  * filter), so `readSnapshot(..., pruning = p)` returns exactly
  * `readSnapshot(...)` filtered by `p` — pinned by IcebergPruningSpec
  * on the file list AND the rows, across deletes and schema/spec
  * evolution, and by the randomized lifecycle harness with a fresh
  * bound after every commit.
  */
object IcebergPruning {

  /** Per-column pruning predicate — an inclusive RANGE
    * `lower ≤ col ≤ upper` (None = unbounded on that side; both set
    * and equal = equality), an IN-SET `col ∈ values` (the id-lookup
    * shape; prunes on bucket ordinals per value and on range overlap
    * against [min(values), max(values)]), or a NULLNESS test
    * (`Some(true)` = IS NULL, `Some(false)` = IS NOT NULL — prunable
    * from value/null counts and identity partition values alone).
    * Values accept the natural Scala/Java surface for the column's
    * Iceberg type: Int/Long for int/long, Float/Double for
    * float/double, String for string, Boolean for boolean,
    * java.time.LocalDate / ISO "yyyy-MM-dd" String / epoch-day Int
    * for date, BigDecimal / String for decimal, and LocalDateTime /
    * Instant / `Z`-or-offset-suffixed ISO String / epoch-micros Long
    * for timestamps. SQL three-valued logic: a NULL cell never
    * matches a range/set bound. */
  final case class ColumnBound(column: String,
      lower: Option[Any] = None, upper: Option[Any] = None,
      values: Option[Seq[Any]] = None,
      nullness: Option[Boolean] = None,
      // strict inequalities (`>` / `<`): the canonical day-range query
      // `ts >= d AND ts < d+1` must NOT keep the d+1 boundary's whole
      // partition — at 100 TB that is one spurious day of data per
      // scan, residual-filtered away after being read
      lowerExclusive: Boolean = false,
      upperExclusive: Boolean = false) {
    require(lower.isDefined || upper.isDefined || values.isDefined ||
      nullness.isDefined,
      s"ColumnBound($column) needs a range side, a value set, or a nullness test")
    require(values.isEmpty || (lower.isEmpty && upper.isEmpty),
      s"ColumnBound($column): a value set excludes range sides")
    require(nullness.isEmpty ||
      (lower.isEmpty && upper.isEmpty && values.isEmpty),
      s"ColumnBound($column): a nullness test excludes ranges and value sets")
    require(values.forall(_.nonEmpty),
      s"ColumnBound($column): empty IN set matches nothing")
    require(!lowerExclusive || lower.isDefined,
      s"ColumnBound($column): lowerExclusive without a lower bound")
    require(!upperExclusive || upper.isDefined,
      s"ColumnBound($column): upperExclusive without an upper bound")
    def isEquality: Boolean =
      (lower.isDefined && upper.isDefined && lower == upper &&
        !lowerExclusive && !upperExclusive) ||
        values.exists(_.size == 1)
  }

  object ColumnBound {
    /** Equality shorthand: `col == v`. */
    def eq(column: String, v: Any): ColumnBound =
      ColumnBound(column, Some(v), Some(v))

    /** IN-set shorthand: `col ∈ vs` — the multi-id point-lookup. */
    def in(column: String, vs: Seq[Any]): ColumnBound =
      ColumnBound(column, values = Some(vs))

    /** `col IS NULL` — prunes files whose counts prove no null rows. */
    def isNull(column: String): ColumnBound =
      ColumnBound(column, nullness = Some(true))

    /** `col IS NOT NULL` — prunes all-null files/partitions. */
    def notNull(column: String): ColumnBound =
      ColumnBound(column, nullness = Some(false))

    /** Strict `col > v`. */
    def gt(column: String, v: Any): ColumnBound =
      ColumnBound(column, lower = Some(v), lowerExclusive = true)

    /** Strict `col < v`. */
    def lt(column: String, v: Any): ColumnBound =
      ColumnBound(column, upper = Some(v), upperExclusive = true)
  }

  /** Iceberg types with a defined comparison surface in this module —
    * everything pruning is allowed to compare. Anything else (binary,
    * uuid, fixed, …) REJECTS the bound loudly at evaluation: silently
    * degrading to lexicographic `toString` comparison is exactly how
    * a decimal range bound wrongly prunes a file ("9.50" > "20.00" as
    * strings — silent missing rows). */
  private[sources] def isComparableType(icebergType: String): Boolean =
    icebergType match {
      case "int" | "long" | "date" | "timestamp" | "timestamptz" |
          "float" | "double" | "boolean" | "string" => true
      case t => t.startsWith("decimal(")
    }

  private val DecimalTypePat = """decimal\(\s*\d+\s*,\s*(\d+)\s*\)""".r

  /** Declared scale of a `decimal(p,s)` Iceberg type string. */
  private def scaleOf(icebergType: String): Int = icebergType match {
    case DecimalTypePat(s) => s.toInt
    case t => throw new IllegalArgumentException(s"not a decimal type: $t")
  }

  /** Iceberg primitive type name of a table column (the bounds'
    * serialization key). Loud on unknown columns — a typo'd pruning
    * column must not silently keep every file. */
  private[sources] def icebergTypeOf(table: TableDef, column: String): String = {
    val c = table.columns.find(_.name == column).getOrElse(
      throw new IllegalArgumentException(
        s"pruning column $column not in schema of ${table.fullName}"))
    IcebergMetadata.icebergType(TypeMapper.mapType(c.dataType, c.length,
      c.precision, c.scale, c.forBitData, c.ccsid).targetType)
  }

  /** Normalize a user-supplied bound value to the comparison domain of
    * the Iceberg type: Long for int/long/date (dates as epoch days),
    * Double for float/double, String, Boolean. */
  private[sources] def normalize(icebergType: String, v: Any): Any =
    icebergType match {
      case "int" | "long" => v match {
        case n: Number => n.longValue
        case s: String => s.toLong
        case other => throw new IllegalArgumentException(
          s"cannot compare $other to an $icebergType column")
      }
      case "date" => v match {
        case d: java.time.LocalDate => d.toEpochDay
        case d: java.sql.Date => d.toLocalDate.toEpochDay
        case s: String => java.time.LocalDate.parse(s).toEpochDay
        case n: Number => n.longValue // already epoch days
        case other => throw new IllegalArgumentException(
          s"cannot compare $other to a date column")
      }
      // timestamps compare as epoch MICROS (the spec's serialization
      // unit); timestamptz instants are UTC by definition, NTZ local
      // datetimes are taken at face value (same convention the writer
      // used for the stored micros). String surfaces: a timestamptz
      // bound additionally accepts `Z`/offset-suffixed ISO instants
      // ("2024-01-02T03:04:05Z", "…+02:00") — an instant is exactly
      // what the column stores; an NTZ column REFUSES them (which
      // local datetime an instant means is genuinely ambiguous).
      case "timestamp" | "timestamptz" => v match {
        case t: java.time.LocalDateTime =>
          t.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L +
            t.getNano / 1000L
        case i: java.time.Instant =>
          i.getEpochSecond * 1000000L + i.getNano / 1000L
        case t: java.sql.Timestamp =>
          t.toInstant.getEpochSecond * 1000000L +
            t.toInstant.getNano / 1000L
        case s: String =>
          val iso = s.replace(' ', 'T')
          val zoned = try Some(java.time.OffsetDateTime.parse(iso))
          catch { case _: java.time.format.DateTimeParseException => None }
          zoned match {
            case Some(odt) =>
              if (icebergType == "timestamp")
                throw new IllegalArgumentException(
                  s"'$s' carries a zone offset — ambiguous for a " +
                    "timestamp (NTZ) column; pass a local datetime")
              val i = odt.toInstant
              i.getEpochSecond * 1000000L + i.getNano / 1000L
            case None =>
              val ldt = java.time.LocalDateTime.parse(iso)
              ldt.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L +
                ldt.getNano / 1000L
          }
        case n: Number => n.longValue // already epoch micros
        case other => throw new IllegalArgumentException(
          s"cannot compare $other to a $icebergType column")
      }
      case "float" | "double" => v match {
        case n: Number => n.doubleValue
        case s: String => s.toDouble
        case other => throw new IllegalArgumentException(
          s"cannot compare $other to a $icebergType column")
      }
      case "boolean" => v match {
        case b: Boolean => b
        case b: java.lang.Boolean => b.booleanValue
        case other => throw new IllegalArgumentException(
          s"cannot compare $other to a boolean column")
      }
      // decimals compare as BigDecimal (compareTo is scale-insensitive,
      // so "9.50" vs "20.00" orders numerically, never lexically)
      case d if d.startsWith("decimal(") => v match {
        case b: java.math.BigDecimal => b
        case b: scala.math.BigDecimal => b.bigDecimal
        case b: org.apache.spark.sql.types.Decimal => b.toJavaBigDecimal
        case i: java.lang.Integer => java.math.BigDecimal.valueOf(i.longValue)
        case l: java.lang.Long => java.math.BigDecimal.valueOf(l.longValue)
        case s: String => new java.math.BigDecimal(s)
        case n: Number => new java.math.BigDecimal(n.toString)
        case other => throw new IllegalArgumentException(
          s"cannot compare $other to a $d column")
      }
      case "string" => v.toString
      case t => throw new IllegalArgumentException(
        s"Iceberg type $t has no comparison surface — pruning bounds " +
          "support int/long/date/timestamp/float/double/boolean/" +
          "string/decimal columns only")
    }

  /** Compare two normalized values of the same Iceberg type. */
  private def cmp(icebergType: String, a: Any, b: Any): Int =
    icebergType match {
      case "int" | "long" | "date" | "timestamp" | "timestamptz" =>
        java.lang.Long.compare(a.asInstanceOf[Long], b.asInstanceOf[Long])
      case "float" | "double" =>
        java.lang.Double.compare(a.asInstanceOf[Double], b.asInstanceOf[Double])
      case "boolean" => java.lang.Boolean.compare(
        a.asInstanceOf[Boolean], b.asInstanceOf[Boolean])
      case d if d.startsWith("decimal(") =>
        a.asInstanceOf[java.math.BigDecimal]
          .compareTo(b.asInstanceOf[java.math.BigDecimal])
      // strings order by UNSIGNED UTF-8 BYTES — the order the parquet
      // stat writer used for min/max. UTF-16 String.compareTo disagrees
      // for supplementary code points (surrogates 0xD800-0xDFFF sort
      // below [U+E000,U+FFFF] in UTF-16 but their UTF-8 bytes sort
      // above), so a file mixing both would be wrongly pruned.
      case _ => org.apache.spark.unsafe.types.UTF8String
        .fromString(a.asInstanceOf[String])
        .compareTo(org.apache.spark.unsafe.types.UTF8String
          .fromString(b.asInstanceOf[String]))
    }

  /** Decode a manifest bound (the spec's single-value serialization:
    * little-endian numerics, raw UTF-8 strings, one-byte booleans)
    * into the comparison domain. None = type has no decodable bounds
    * (the writer never records them for those types either). */
  private[sources] def decodeBound(icebergType: String,
      bytes: Array[Byte]): Option[Any] = {
    def leLong(n: Int): Long = {
      var v = 0L
      var i = 0
      while (i < n && i < bytes.length) {
        v |= (bytes(i).toLong & 0xffL) << (8 * i); i += 1
      }
      // sign-extend 4-byte ints
      if (n == 4) v.toInt.toLong else v
    }
    icebergType match {
      case "int" | "date" if bytes.length >= 4 => Some(leLong(4))
      case "long" | "timestamp" | "timestamptz" if bytes.length >= 8 =>
        Some(leLong(8))
      case "float" if bytes.length >= 4 =>
        Some(java.lang.Float.intBitsToFloat(leLong(4).toInt).toDouble)
      case "double" if bytes.length >= 8 =>
        Some(java.lang.Double.longBitsToDouble(leLong(8)))
      case "boolean" if bytes.length >= 1 => Some(bytes(0) != 0)
      case "string" => Some(new String(bytes, StandardCharsets.UTF_8))
      // spec decimal serialization: the UNSCALED value as two's-
      // complement big-endian bytes (minimum length); scale rides in
      // the type — the writer emits exactly this from parquet footers
      case d if d.startsWith("decimal(") && bytes.nonEmpty =>
        Some(new java.math.BigDecimal(
          new java.math.BigInteger(bytes), scaleOf(d)))
      case _ => None
    }
  }

  /** Normalize an Avro-decoded PARTITION value (manifest partition
    * record) into the comparison domain. Identity date partitions ride
    * as epoch-day ints; Avro strings arrive as Utf8. Timestamp and
    * decimal identity partitions are STRING-surfaced in the manifests
    * (their Avro partition type degrades to string — the Hive dir
    * value), so they normalize through the string parser, never a
    * Number cast. */
  private def normalizePartition(icebergType: String, v: Any): Any =
    icebergType match {
      case "int" | "long" | "date" => v.asInstanceOf[Number].longValue
      case "timestamp" | "timestamptz" => v match {
        case n: Number => n.longValue // epoch micros
        case s => normalize(icebergType, s.toString)
      }
      case "float" | "double" => v.asInstanceOf[Number].doubleValue
      case "boolean" => v.asInstanceOf[java.lang.Boolean].booleanValue
      case d if d.startsWith("decimal(") =>
        new java.math.BigDecimal(v.toString)
      case "string" => v.toString
      case t => throw new IllegalArgumentException(
        s"Iceberg type $t has no comparison surface for identity-" +
          "partition pruning")
    }

  /** The murmur3 bucket ordinal of a normalized value — must match
    * what [[graft.functions.IcebergBucket]] wrote into the directory
    * layout: the writer's full bucketable set (int/long/date/
    * timestamp/decimal/string). Timestamps hash their epoch-micros
    * long; decimals hash the unscaled value AT THE COLUMN'S DECLARED
    * SCALE as big-endian two's-complement bytes (spec Appendix B —
    * vector 14.20 → −500754589 pinned in MappingSpec), so the user
    * value is rescaled first and a value needing rounding refuses
    * loudly (it could never equal a stored value anyway). */
  private def bucketOf(icebergType: String, v: Any, n: Int,
      declaredScale: => Int): Option[Int] = {
    import graft.functions.IcebergBucketUtil
    val h = icebergType match {
      case "int" | "long" | "date" | "timestamp" | "timestamptz" =>
        Some(IcebergBucketUtil.hashLong(v.asInstanceOf[Long]))
      case "string" => Some(IcebergBucketUtil.hashString(
        org.apache.spark.unsafe.types.UTF8String.fromString(
          v.asInstanceOf[String])))
      case d if d.startsWith("decimal(") =>
        val bd = v.asInstanceOf[java.math.BigDecimal].setScale(declaredScale)
        Some(IcebergBucketUtil.murmur3(bd.unscaledValue.toByteArray, 0))
      case _ => None
    }
    h.map(hv => (hv & Integer.MAX_VALUE) % n)
  }

  private val BucketN = """bucket\[(\d+)\]""".r
  private val TruncateW = """truncate\[(\d+)\]""".r

  /** Is `transform` ORDER-PRESERVING on its source domain? The spec's
    * temporal transforms and truncate are monotonic non-decreasing
    * (v1 ≤ v2 ⇒ T(v1) ≤ T(v2) — for string truncate, in unsigned
    * UTF-8 byte order, the same order [[cmp]] uses), which is what
    * lets a source-column RANGE predicate prune through them; bucket
    * is not (equality only, signal 2). */
  private def isMonotonicTransform(t: String): Boolean = t match {
    case "year" | "month" | "day" | "hour" => true
    case TruncateW(_) => true
    case _ => false
  }

  /** Apply a monotonic transform to a NORMALIZED predicate value
    * ([[normalize]] domain: Long days for date, Long micros for
    * timestamps, Long for int/long, String for string) — must agree
    * bit-for-bit with the [[graft.functions.IcebergTransform]] values
    * the writer directory-encoded, or range pruning silently drops
    * files. Returns the transformed value in the partition-value
    * comparison domain (Long for numerics, String for truncated
    * strings). */
  private def transformOf(transform: String, itype: String, v: Any): Any = {
    import graft.functions.IcebergTransformUtil._
    val isDate = itype == "date"
    transform match {
      case "day" =>
        if (isDate) v.asInstanceOf[Long]
        else daysOfMicros(v.asInstanceOf[Long]).toLong
      case "month" =>
        if (isDate) monthsOfDays(v.asInstanceOf[Long].toInt).toLong
        else monthsOfMicros(v.asInstanceOf[Long]).toLong
      case "year" =>
        if (isDate) yearsOfDays(v.asInstanceOf[Long].toInt).toLong
        else yearsOfMicros(v.asInstanceOf[Long]).toLong
      case "hour" => hoursOfMicros(v.asInstanceOf[Long]).toLong
      case TruncateW(w) => itype match {
        case "int" | "long" => truncateLong(v.asInstanceOf[Long], w.toLong)
        case _ => truncateString(org.apache.spark.unsafe.types.UTF8String
          .fromString(v.asInstanceOf[String]), w.toInt).toString
      }
      case other => throw new IllegalStateException(
        s"transformOf: $other is not a monotonic transform")
    }
  }

  /** Compare a transformed predicate value against a manifest
    * partition value in the transformed domain (ints ride as Number
    * through Avro; truncated strings compare in UTF-8 byte order like
    * every other string comparison here). */
  private def cmpTransformed(t: Any, pv: Any): Int = (t, pv) match {
    case (l: Long, n: Number) => java.lang.Long.compare(l, n.longValue)
    case (s: String, p) =>
      org.apache.spark.unsafe.types.UTF8String.fromString(s)
        .compareTo(org.apache.spark.unsafe.types.UTF8String
          .fromString(p.toString))
    case other => throw new IllegalStateException(
      s"unexpected transformed-domain pair $other")
  }

  /** Can any row of `file` match `bound`? Conservative: true unless a
    * recorded signal PROVES no row can. */
  private[sources] def fileMayMatch(table: TableDef,
      file: IcebergSnapshot.DataFileInfo, bound: ColumnBound): Boolean = {
    val itype = icebergTypeOf(table, bound.column)
    // loud, not lexicographic: a bound on a type with no comparison
    // surface (binary, uuid, …) must refuse, never silently compare
    // toString forms and wrongly prune rows away
    if (!isComparableType(itype))
      throw new IllegalArgumentException(
        s"ColumnBound(${bound.column}): Iceberg type $itype has no " +
          "defined comparison surface — pruning supports int/long/" +
          "date/timestamp/float/double/boolean/string/decimal columns")
    val fid = table.fieldIdOf(bound.column)

    // nullness tests prune from counts + partition values alone — no
    // value comparison ever happens. EVERY spec transform is null-
    // preserving (null source → null partition value; non-null source
    // → non-null value), so any partition field on this source column
    // — identity, bucket, temporal, truncate — is an exact signal.
    bound.nullness.foreach { wantNull =>
      val specFields0 = IcebergMetadata.specFieldDefs(table, file.specId)
      val idIdx = specFields0.indexWhere(_.sourceId == fid)
      if (idIdx >= 0 && idIdx < file.partitionValues.length) {
        val pv = file.partitionValues(idIdx)
        // STRING-typed partition values lose '' in the Hive-dir round
        // trip ('' encodes as __HIVE_DEFAULT_PARTITION__, the null
        // marker) — a recorded None could be all-null OR all-'' rows,
        // so it proves nothing; fall through to the count signals.
        // A recorded Some is always genuinely non-null.
        if (pv.nonEmpty || itype != "string")
          // exact signal: every row shares the partition value
          return pv.isEmpty == wantNull
      }
      val vc = file.valueCounts.get(fid)
      val nc = file.nullCounts.get(fid)
      (vc, nc) match {
        case (Some(values), Some(nulls)) if values > 0 =>
          return if (wantNull) nulls > 0 else nulls < values
        case _ => return true // no count signal — keep
      }
    }

    val setVals = bound.values.map(_.map(normalize(itype, _)))
    // IN-sets prune range-wise against [min, max] (signal 3) and
    // value-wise on the partition signals below
    val lo = bound.lower.map(normalize(itype, _))
      .orElse(setVals.map(_.reduce((a, b) => if (cmp(itype, a, b) <= 0) a else b)))
    val hi = bound.upper.map(normalize(itype, _))
      .orElse(setVals.map(_.reduce((a, b) => if (cmp(itype, a, b) >= 0) a else b)))
    require(bound.values.isDefined ||
      lo.zip(hi).forall { case (a, b) => cmp(itype, a, b) <= 0 },
      s"ColumnBound(${bound.column}): lower > upper matches nothing")
    val specFields = IcebergMetadata.specFieldDefs(table, file.specId)

    // signal 1: identity partition value — every row shares it
    val identityIdx = specFields.indexWhere(f =>
      f.transform == "identity" && f.sourceId == fid)
    if (identityIdx >= 0 && identityIdx < file.partitionValues.length) {
      file.partitionValues(identityIdx) match {
        case None if itype == "string" =>
          // ambiguous: the Hive-dir round trip maps '' to the null
          // marker, and '' CAN match a point/range predicate — fall
          // through to the stats signal instead of pruning
        case None => return false // all rows null → no row matches
        case Some(raw) =>
          val v = normalizePartition(itype, raw)
          setVals match {
            case Some(vs) => return vs.exists(x => cmp(itype, v, x) == 0)
            case None =>
              if (lo.exists { l =>
                val c = cmp(itype, v, l)
                c < 0 || (bound.lowerExclusive && c == 0)
              }) return false
              if (hi.exists { h =>
                val c = cmp(itype, v, h)
                c > 0 || (bound.upperExclusive && c == 0)
              }) return false
              return true // exact signal: every row matches the range
          }
      }
    }

    // signal 1b: monotonic-transform partition value (year/month/day/
    // hour, truncate) — hidden partitioning's pruning half. The
    // predicate's bounds map through the order-preserving transform,
    // so a file whose transformed value lies outside [T(lo), T(hi)]
    // (or matches no T(candidate) for a point set) can hold no
    // matching row. NOT exact — many source values share one
    // transformed value — so a surviving file falls THROUGH to the
    // stats signal instead of returning true early.
    specFields.zipWithIndex.foreach { case (f, i) =>
      if (f.sourceId == fid && i < file.partitionValues.length &&
          isMonotonicTransform(f.transform)) {
        file.partitionValues(i) match {
          case None if itype == "string" =>
            // truncate[W] over a string source: '' truncates to '',
            // which dir-encodes as the null marker — a recorded None
            // is ambiguous, fall through to stats (temporal transforms
            // never have string sources, so only truncate reaches here)
          case None =>
            // all-null source column (null-preserving transform):
            // point/range predicates never match null
            return false
          case Some(pv) =>
            setVals match {
              case Some(vs) =>
                if (!vs.exists(x =>
                  cmpTransformed(transformOf(f.transform, itype, x), pv) == 0))
                  return false
              case None =>
                // strict bounds tighten by one unit in the integral
                // source domain BEFORE transforming (`ts < day d+1`
                // ⇔ `ts ≤ last micro of day d` → T drops to d); the
                // string domain has no previous/next value, so strict
                // stays conservative-inclusive there
                def oneTighter(v: Any, towardLower: Boolean): Any = v match {
                  case l: Long =>
                    if (towardLower)
                      (if (l == Long.MaxValue) l else l + 1)
                    else (if (l == Long.MinValue) l else l - 1)
                  case other => other
                }
                if (lo.exists { l =>
                  val eff = if (bound.lowerExclusive) oneTighter(l, towardLower = true) else l
                  cmpTransformed(transformOf(f.transform, itype, eff), pv) > 0
                }) return false // T(pred lo) > file's value → file below range
                if (hi.exists { h =>
                  val eff = if (bound.upperExclusive) oneTighter(h, towardLower = false) else h
                  cmpTransformed(transformOf(f.transform, itype, eff), pv) < 0
                }) return false // T(pred hi) < file's value → file above range
            }
        }
      }
    }

    // signal 2: bucket partition value — point candidates (equality or
    // IN-set) map through the writer's murmur3 transform
    val pointCands: Seq[Any] = setVals.getOrElse(
      if (bound.isEquality) Seq(lo.get) else Nil)
    if (pointCands.nonEmpty) {
      val bIdx = specFields.indexWhere(f =>
        f.transform.startsWith("bucket") && f.sourceId == fid)
      if (bIdx >= 0 && bIdx < file.partitionValues.length) {
        specFields(bIdx).transform match {
          case BucketN(n) =>
            val candBuckets =
              pointCands.map(bucketOf(itype, _, n.toInt, scaleOf(itype)))
            file.partitionValues(bIdx) match {
              case Some(fb: Number) if candBuckets.forall(_.isDefined) &&
                  !candBuckets.flatten.contains(fb.intValue) =>
                return false
              case None =>
                // null-bucket dir: only null keys live here, and a
                // point predicate never matches null
                return false
              case _ => // fall through to bounds
            }
          case _ =>
        }
      }
    }

    // signal 3: column bounds + null counts, keyed by field id
    val allNull = file.valueCounts.get(fid).exists(vc =>
      vc > 0 && file.nullCounts.get(fid).contains(vc))
    if (allNull) return false
    val fLo = file.lowerBounds.get(fid).flatMap(decodeBound(itype, _))
    val fHi = file.upperBounds.get(fid).flatMap(decodeBound(itype, _))
    val belowRange = (hi, fLo) match {
      case (Some(h), Some(l)) => // file min > pred max (≥ when strict)
        val c = cmp(itype, l, h)
        c > 0 || (bound.upperExclusive && c == 0)
      case _ => false
    }
    val aboveRange = (lo, fHi) match {
      case (Some(l), Some(h)) => // file max < pred min (≤ when strict)
        val c = cmp(itype, h, l)
        c < 0 || (bound.lowerExclusive && c == 0)
      case _ => false
    }
    !(belowRange || aboveRange)
  }

  /** Partition a snapshot's live data files by the pruning predicate:
    * (kept, skipped) paths — the observable plan the spec asserts on
    * and `readSnapshot` executes. */
  def pruneFiles(table: TableDef,
      files: Seq[(IcebergSnapshot.DataFileInfo, Long)],
      pruning: Seq[ColumnBound]): (Seq[String], Seq[String]) = {
    val (kept, skipped) = files.partition { case (f, _) =>
      pruning.forall(b => fileMayMatch(table, f, b))
    }
    (kept.map(_._1.path), skipped.map(_._1.path))
  }

  /** The file-level plan of a pruned snapshot read without executing
    * it: (kept paths, skipped paths) for the given snapshot (current
    * when None). What an operator dashboard surfaces as "files
    * scanned / files skipped". */
  def planScan(conf: org.apache.hadoop.conf.Configuration,
      tablePath: String, table: TableDef, pruning: Seq[ColumnBound],
      snapshotId: Option[Long] = None): (Seq[String], Seq[String]) = {
    val (_, listRows) =
      IcebergSnapshot.resolveSnapshot(tablePath, table, snapshotId, conf)
    pruneFiles(table, IcebergSnapshot.liveFilesWithSeq(listRows, table, conf),
      pruning)
  }

  /** The row-level RESIDUAL filter of a pruning predicate — applied on
    * top of the pruned scan so the pruned read equals the unpruned
    * read filtered by the same predicate (file granularity alone would
    * return every row of each kept file). Columns that are
    * string-surfaced in the frame (dir-encoded identity restores on
    * never-evolved tables) are cast to the declared type first so the
    * comparison is value-typed, not lexicographic. */
  private[sources] def residualFilter(
      df: org.apache.spark.sql.DataFrame, table: TableDef,
      pruning: Seq[ColumnBound]): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{col, lit}
    val actual = df.schema.fields.map(f => f.name -> f.dataType).toMap
    pruning.map { b =>
      val itype = icebergTypeOf(table, b.column)
      val declared = graft.api.SchemaTranslator.toSparkSchema(table)
        .fields.find(_.name == b.column).map(_.dataType)
      val c0 = col(b.column)
      val c = (actual.get(b.column), declared) match {
        case (Some(org.apache.spark.sql.types.StringType), Some(d))
            if d != org.apache.spark.sql.types.StringType => c0.cast(d)
        case _ => c0
      }
      def litOf(v: Any): org.apache.spark.sql.Column = itype match {
        case "date" => lit(java.time.LocalDate.ofEpochDay(
          normalize("date", v).asInstanceOf[Long]))
        case "timestamp" | "timestamptz" =>
          val us = normalize(itype, v).asInstanceOf[Long]
          val instant = java.time.Instant.ofEpochSecond(
            Math.floorDiv(us, 1000000L),
            Math.floorMod(us, 1000000L) * 1000L)
          if (itype == "timestamptz") lit(instant)
          else lit(java.time.LocalDateTime.ofInstant(instant,
            java.time.ZoneOffset.UTC))
        case "int" | "long" => lit(normalize(itype, v).asInstanceOf[Long])
        case "float" | "double" => lit(normalize(itype, v).asInstanceOf[Double])
        case "boolean" => lit(normalize(itype, v).asInstanceOf[Boolean])
        case d if d.startsWith("decimal(") =>
          lit(normalize(itype, v).asInstanceOf[java.math.BigDecimal])
        case _ => lit(v.toString)
      }
      (b.nullness, b.values) match {
        case (Some(true), _) => c.isNull
        case (Some(false), _) => c.isNotNull
        // one flat In expression, not a reduced || chain: a nested OR
        // tree overflows the analyzer's recursion at a few hundred
        // values (an O(changes) CDC batch's key set gets there easily)
        case (None, Some(vs)) => c.isin(vs.map(litOf): _*)
        case (None, None) =>
          val conds =
            b.lower.map(v =>
              if (b.lowerExclusive) c > litOf(v) else c >= litOf(v)).toSeq ++
              b.upper.map(v =>
                if (b.upperExclusive) c < litOf(v) else c <= litOf(v)).toSeq
          conds.reduce(_ && _)
      }
    }.reduce(_ && _)
  }
}
