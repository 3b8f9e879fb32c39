package graft.types

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Smallest-SQL-type schema inference, the Spark-native analog of the
  * reference's dataframe→SQL inference during
  * `create.table_from_dataframe` (mssql_dataframe/core/conversion.py:
  * sql_spec / precheck_dataframe: pick the smallest SQL type whose
  * [min,max]/length bounds the observed data).
  *
  * All statistics come from ONE distributed aggregation pass over the
  * data (a single job, map-side combined), so inference cost at 100 TB
  * is one scan — no per-column jobs, no collect of data rows (only the
  * 1-row stats aggregate comes back to the driver).
  */
object Infer {

  /** Infer the narrowest SqlType per column. Column order preserved. */
  def narrowSchema(df: DataFrame): Seq[(String, SqlType)] = {
    val fields = df.schema.fields

    // One wide aggregation; aliases are positional (__c<i>__stat) so
    // they cannot collide with data column names, and columns are
    // referenced via df.col-safe backtick quoting (ADVICE r1).
    def c(f: StructField) = col(s"`${f.name}`")
    val aggs = fields.zipWithIndex.flatMap { case (f, i) =>
      f.dataType match {
        case ByteType | ShortType | IntegerType | LongType =>
          Seq(min(c(f).cast(LongType)).as(s"__c${i}__min"),
              max(c(f).cast(LongType)).as(s"__c${i}__max"))
        case FloatType | DoubleType =>
          Seq(min(c(f).cast(DoubleType)).as(s"__c${i}__min"),
              max(c(f).cast(DoubleType)).as(s"__c${i}__max"),
              min(c(f) === floor(c(f))).as(s"__c${i}__whole"))
        case StringType =>
          Seq(max(length(c(f))).as(s"__c${i}__len"))
        case TimestampType | TimestampNTZType =>
          // "no time-of-day component" must not depend on the session
          // timezone (ADVICE r1): test true UTC midnight via epoch micros
          // (sessions pin UTC, so the NTZ→TZ cast is identity on values).
          Seq(min(unix_micros(c(f).cast(TimestampType)) % (86400L * 1000000L) === 0L)
            .as(s"__c${i}__mid"))
        case _ => Seq.empty
      }
    }

    val row = if (aggs.nonEmpty) df.agg(aggs.head, aggs.tail.toIndexedSeq: _*).collect()(0) else null

    def longAt(n: String): Option[Long] =
      if (row.schema.fieldNames.contains(n) && !row.isNullAt(row.fieldIndex(n)))
        Some(row.getAs[Any](n) match {
          case l: Long => l
          case d: Double => d.toLong
          case i: Int => i.toLong
        })
      else None
    def boolAt(n: String): Boolean =
      row.schema.fieldNames.contains(n) && !row.isNullAt(row.fieldIndex(n)) && row.getAs[Boolean](n)
    def dblAt(n: String): Option[Double] =
      if (row.schema.fieldNames.contains(n) && !row.isNullAt(row.fieldIndex(n)))
        Some(row.getAs[Double](n)) else None

    fields.zipWithIndex.map { case (f, i) =>
      val t = f.dataType match {
        case BooleanType => SqlType.parse("bit")
        case ByteType | ShortType | IntegerType | LongType =>
          // all-null → keep the source dtype's own width (the reference
          // keeps the pandas dtype's category for all-null columns)
          longAt(s"__c${i}__min") match {
            case None => SqlType.forSpark(f.dataType)
            case mn   => narrowestIntegral(mn, longAt(s"__c${i}__max"))
          }
        case FloatType | DoubleType =>
          val whole = boolAt(s"__c${i}__whole")
          val mn = dblAt(s"__c${i}__min")
          val mx = dblAt(s"__c${i}__max")
          if (mn.isEmpty) SqlType.forSpark(f.dataType) // all-null: keep float category
          else if (whole &&
              mn.get >= Long.MinValue.toDouble && mx.get <= Long.MaxValue.toDouble)
            narrowestIntegral(mn.map(_.toLong), mx.map(_.toLong))
          else SqlType.parse("float")
        case StringType =>
          val len = longAt(s"__c${i}__len").map(_.toInt).getOrElse(0).max(1)
          SqlType.parse(s"varchar($len)")
        case TimestampType | TimestampNTZType =>
          if (boolAt(s"__c${i}__mid")) SqlType.parse("date") else SqlType.parse("datetime2")
        case DateType => SqlType.parse("date")
        case d: DecimalType => SqlType.parse(s"decimal(${d.precision},${d.scale})")
        case BinaryType => SqlType.parse("varbinary(max)")
        case other => SqlType.forSpark(other)
      }
      f.name -> t
    }.toSeq
  }

  /** Same integral-narrowing ladder as the reference's rules table:
    * tinyint [0,255] → smallint → int → bigint
    * (mssql_dataframe/core/conversion_rules.py:18-55). */
  def narrowestIntegral(minV: Option[Long], maxV: Option[Long]): SqlType = (minV, maxV) match {
    case (Some(mn), Some(mx)) =>
      if (mn >= 0 && mx <= 255) SqlType.parse("tinyint")
      else if (mn >= Short.MinValue && mx <= Short.MaxValue) SqlType.parse("smallint")
      else if (mn >= Int.MinValue && mx <= Int.MaxValue) SqlType.parse("int")
      else SqlType.parse("bigint")
    case _ => SqlType.parse("bigint")
  }
}
