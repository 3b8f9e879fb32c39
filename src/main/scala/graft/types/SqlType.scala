package graft.types

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.errors

/** A SQL-surface data type (the strings a user of the reference writes,
  * e.g. "VARCHAR(10)", "TINYINT", "DECIMAL(12,2)"), mapped onto Spark
  * Catalyst types plus the validation bounds the reference enforces.
  *
  * Mirrors the conversion-rule table of the reference
  * (mssql_dataframe/core/conversion_rules.py:8-165) without copying its
  * mechanism: rules here are compile-time Scala, validation happens as
  * distributed Column expressions, never per-row driver code.
  *
  * Notes:
  *  - SQL TINYINT is unsigned 0..255; Spark ByteType is signed, so
  *    TINYINT maps to ShortType with a [0, 255] range check.
  *  - TIME maps to LongType microseconds-of-day (Spark has no time-of-day
  *    type); DATETIME/DATETIME2/SMALLDATETIME map to TimestampType.
  */
final case class SqlType(
    name: String,                 // canonical lowercase sql type name
    spark: DataType,
    maxLength: Option[Int] = None,      // char/varchar/binary length, None = max
    intRange: Option[(Long, Long)] = None) {

  def render: String = {
    val size = maxLength.map(n => s"($n)").getOrElse {
      name match {
        case "varchar" | "nvarchar" | "varbinary" | "binary" | "char" | "nchar" => "(max)"
        case _ => ""
      }
    }
    spark match {
      case d: DecimalType => s"$name(${d.precision},${d.scale})"
      case _              => s"$name$size"
    }
  }

  /** Predicate matching values that VIOLATE this type's bounds — the
    * distributed analog of the reference's pre-insert check
    * (mssql_dataframe/core/conversion.py precheck_dataframe). Evaluated
    * as one Column inside the insert scan: no driver-side row loops.
    * None = type has no bounds to enforce. */
  def violation(c: org.apache.spark.sql.Column): Option[org.apache.spark.sql.Column] = {
    import org.apache.spark.sql.functions.{abs, length, octet_length}
    if (name == "datetimeoffset")
      // canonical render + the SQL offset limit of -14:00..+14:00
      // (conversion_rules.py:98's TODO enforced here)
      return Some(c.isNotNull && (
        !c.rlike(SqlType.DtoPattern) ||
          abs(SqlType.dtoOffsetMinutes(c)) > 14L * 60L))
    spark match {
      case d: DecimalType =>
        // value magnitude must fit precision-scale integer digits
        return Some(c.isNotNull &&
          abs(c.cast(DoubleType)) >= math.pow(10.0, (d.precision - d.scale).toDouble))
      case _ =>
    }
    val range = intRange.map { case (lo, hi) =>
      c.isNotNull && (c.cast(LongType) < lo || c.cast(LongType) > hi)
    }
    val len = maxLength.map { n =>
      spark match {
        case BinaryType => c.isNotNull && octet_length(c) > n
        case _          => c.isNotNull && length(c) > n
      }
    }
    (range, len) match {
      case (Some(r), Some(l)) => Some(r || l)
      case (r, l)             => r.orElse(l)
    }
  }

  /** Unicode values in a non-unicode char/varchar column (the
    * reference's check_unicode, conversion.py:349: ascii-encoding must
    * not drop characters). None for n-prefixed and non-string types. */
  def unicodeViolation(c: org.apache.spark.sql.Column): Option[org.apache.spark.sql.Column] =
    if (name == "char" || name == "varchar")
      Some(c.isNotNull && c.rlike("[^\\x00-\\x7F]"))
    else None
}

object SqlType {

  private val Sized = """^(char|nchar|varchar|nvarchar|varbinary|binary)\s*\(\s*(\d+|max)\s*\)$""".r
  private val Dec = """^(decimal|numeric)\s*\(\s*(\d+)\s*(?:,\s*(\d+)\s*)?\)$""".r

  /** Parse a SQL type declaration string into an [[SqlType]].
    * Accepts the surface the reference accepts via `dynamic.column_spec`
    * (mssql_dataframe/core/dynamic.py:139-166).
    */
  def parse(declaration: String): SqlType = {
    val s = declaration.trim.toLowerCase
    s match {
      case "bit"           => SqlType("bit", BooleanType)
      case "tinyint"       => SqlType("tinyint", ShortType, intRange = Some((0L, 255L)))
      case "smallint"      => SqlType("smallint", ShortType, intRange = Some((Short.MinValue.toLong, Short.MaxValue.toLong)))
      case "int" | "integer" => SqlType("int", IntegerType, intRange = Some((Int.MinValue.toLong, Int.MaxValue.toLong)))
      case "bigint"        => SqlType("bigint", LongType, intRange = Some((Long.MinValue, Long.MaxValue)))
      case "real"          => SqlType("real", FloatType)
      case "float"         => SqlType("float", DoubleType)
      case "date"          => SqlType("date", DateType)
      // DATETIME2 has no timezone — Spark's TimestampNTZType is the
      // faithful mapping (naive wall-clock, environment-independent).
      case "datetime" | "datetime2" | "smalldatetime" => SqlType("datetime2", TimestampNTZType)
      case "time"          => SqlType("time", LongType)
      // DATETIMEOFFSET preserves a per-row timezone offset — a fact no
      // Spark temporal type carries (TimestampType normalizes to one
      // session zone). Storage is the canonical lossless render
      // 'yyyy-MM-dd HH:mm:ss.ffffff ±HH:MM' (SQL Server's own wire
      // form, micro precision to match parquet), with ingest/extract
      // conversions alongside TIME's micros-of-day pair: a timestamp
      // inserted into a datetimeoffset column localizes as UTC +00:00
      // (the reference's rule, conversion.py:528 prepare_datetimeoffset),
      // and dtoInstant/dtoOffsetMinutes recover both halves exactly.
      case "datetimeoffset" => SqlType("datetimeoffset", StringType)
      case "text" => SqlType("varchar", StringType)
      // SQL Server defaults unsized [n]varchar/[var]binary in DDL to length 1
      // (same as char/nchar); "varchar(max)" is the explicit unbounded form.
      case "varchar" | "nvarchar" => SqlType(s, StringType, maxLength = Some(1))
      case "char" | "nchar" => SqlType(s, StringType, maxLength = Some(1))
      case "varbinary" | "binary" => SqlType(s, BinaryType, maxLength = Some(1))
      case Dec(n, p, sc) =>
        val prec = p.toInt
        val scale = if (sc == null) 0 else sc.toInt
        if (prec < 1 || prec > 38 || scale > prec)
          throw errors.UndefinedConversionRule(s"bad decimal spec: $declaration")
        SqlType(n, DecimalType(prec, scale))
      case Sized(n, len) =>
        val ml = if (len == "max") None else Some(len.toInt)
        val base = n match {
          case "varbinary" | "binary" => BinaryType
          case _                      => StringType
        }
        SqlType(n, base, maxLength = ml)
      case other =>
        throw errors.UndefinedConversionRule(s"unrecognized sql type: $other")
    }
  }

  /** TIME ingest: a timestamp's time-of-day as microseconds-of-day.
    * The reference round-trips TIME through pandas timedelta
    * (conversion_rules.py); graft's storage type for TIME is BIGINT
    * micros-of-day, and this is the conversion applied when a
    * timestamp column is inserted into a TIME column. */
  def timeFromTimestamp(c: Column): Column =
    (hour(c).cast("long") * 3600000000L
      + minute(c).cast("long") * 60000000L
      + second(c).cast("long") * 1000000L
      + date_format(c, "SSSSSS").cast("long"))

  /** TIME render: micros-of-day → 'HH:MM:SS' (the reverse surface of
    * timeFromTimestamp; fractional seconds are truncated, matching
    * strftime('%H:%M:%S')). */
  def renderTime(c: Column): Column =
    concat_ws(":",
      lpad(floor(c / 3600000000L).cast("long").cast("string"), 2, "0"),
      lpad((floor(c / 60000000L) % 60).cast("long").cast("string"), 2, "0"),
      lpad((floor(c / 1000000L) % 60).cast("long").cast("string"), 2, "0"))

  /** Canonical DATETIMEOFFSET render: `yyyy-MM-dd HH:mm:ss.ffffff ±HH:MM`
    * (26-char wall clock, space, 6-char signed offset). */
  val DtoPattern: String =
    "^\\d{4}-\\d{2}-\\d{2} \\d{2}:\\d{2}:\\d{2}\\.\\d{6} [+-]\\d{2}:\\d{2}$"

  /** DATETIMEOFFSET ingest: render a UTC instant at a per-row offset.
    * The wall-clock half is the instant shifted by the offset, built
    * with ZONE-FREE micros arithmetic (days via date_from_unix_date,
    * time-of-day via pmod) — date_format/to_timestamp would render in
    * the SESSION time zone, and TableStore/Graft are public entry
    * points usable with an arbitrary SparkSession, where a non-UTC
    * zone would silently store shifted wall clocks. The offset half is
    * formatted ±HH:MM. Inverse of [[dtoInstant]] +
    * [[dtoOffsetMinutes]] (round-trip spec-pinned like TIME's). */
  def dtoFromTimestamp(ts: Column, offsetMinutes: Column): Column = {
    val om = offsetMinutes.cast("long")
    val us = unix_micros(ts) + om * 60000000L
    val dayUs = 86400000000L
    val tod = pmod(us, lit(dayUs)).cast("long")
    // (us - tod) is an exact multiple of dayUs but can exceed 2^53, so
    // the division must not go through doubles — decimal division is
    // exact BigDecimal arithmetic and the integral quotient survives
    // the int cast unchanged
    val days = ((us - tod).cast(DecimalType(38, 0)) / lit(dayUs)).cast("int")
    val absm = abs(om)
    concat(
      date_from_unix_date(days).cast("string"), lit(" "),
      lpad(floor(tod / 3600000000L).cast("long").cast("string"), 2, "0"), lit(":"),
      lpad((floor(tod / 60000000L) % 60).cast("long").cast("string"), 2, "0"), lit(":"),
      lpad((floor(tod / 1000000L) % 60).cast("long").cast("string"), 2, "0"), lit("."),
      lpad((tod % 1000000L).cast("string"), 6, "0"),
      when(om < 0, " -").otherwise(" +"),
      lpad(floor(absm / 60).cast("long").cast("string"), 2, "0"),
      lit(":"),
      lpad((absm % 60).cast("string"), 2, "0"))
  }

  /** DATETIMEOFFSET → its UTC instant epoch micros — SQL Server's
    * comparison semantics for the type (the stored render orders by
    * WALL CLOCK; comparisons, ORDER BY and zone maps must use this
    * instead). Native codegen'd decode, zone-free by construction;
    * see [[graft.plans.DtoInstant]]. */
  def dtoInstantMicros(c: Column): Column = {
    import org.apache.spark.sql.graftx.bridge
    bridge.column(graft.plans.DtoInstant(bridge.expression(c)))
  }

  /** DATETIMEOFFSET → its UTC instant (offset subtracted from the
    * stored wall clock; SQL Server compares datetimeoffsets this way).
    * Zone-free like [[dtoFromTimestamp]]: decoded by the native
    * [[graft.plans.DtoInstant]], never through the session zone. */
  def dtoInstant(c: Column): Column = timestamp_micros(dtoInstantMicros(c))

  private val DtoLitRe =
    "^(\\d{4}-\\d{2}-\\d{2} \\d{2}:\\d{2}:\\d{2})(?:\\.(\\d{1,6}))?( [+-]\\d{2}:\\d{2})?$".r

  /** Normalize a user-written datetimeoffset literal to the canonical
    * render: short/missing fractions pad to 6 digits, a missing offset
    * localizes as UTC (the reference's naive-means-UTC rule,
    * conversion.py prepare_datetimeoffset). Unrecognized text passes
    * through (it decodes to NULL downstream, matching the engine's
    * cast-failure convention). */
  def dtoNormalizeLiteral(raw: String): String = raw.trim match {
    case DtoLitRe(base, frac, off) =>
      base + "." + Option(frac).getOrElse("").padTo(6, '0') +
        Option(off).getOrElse(" +00:00")
    case other => other
  }

  /** DATETIMEOFFSET → its preserved offset in signed minutes. */
  def dtoOffsetMinutes(c: Column): Column = {
    val mag = substring(c, 29, 2).cast("long") * 60L + substring(c, 32, 2).cast("long")
    when(substring(c, 28, 1) === "-", -mag).otherwise(mag)
  }

  /** Default SQL type for a Spark type (used when persisting inferred
    * schemas; inverse of the widest parse mapping). */
  def forSpark(dt: DataType): SqlType = dt match {
    case BooleanType    => parse("bit")
    // Spark ByteType is signed (-128..127); SQL tinyint is unsigned
    // (0..255), so the narrowest SQL type that always holds a ByteType
    // is smallint (ADVICE r1).
    case ByteType       => parse("smallint")
    case ShortType      => parse("smallint")
    case IntegerType    => parse("int")
    case LongType       => parse("bigint")
    case FloatType      => parse("real")
    case DoubleType     => parse("float")
    case d: DecimalType => parse(s"decimal(${d.precision},${d.scale})")
    case DateType       => parse("date")
    case TimestampType  => parse("datetime2")
    case TimestampNTZType => parse("datetime2")
    case StringType     => parse("varchar(max)")
    case BinaryType     => parse("varbinary(max)")
    case other          => throw errors.UndefinedConversionRule(s"no sql type for spark type $other")
  }
}
