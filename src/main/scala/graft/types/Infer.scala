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

  final case class ColumnStats(
      minL: Option[Long], maxL: Option[Long],      // integral range (or integral-valued doubles)
      allWhole: Boolean,                            // doubles: every value is a whole number
      maxLen: Option[Int],                          // strings: max length
      allMidnight: Boolean)                         // timestamps: no time-of-day component

  /** Infer the narrowest SqlType per column. Column order preserved. */
  def narrowSchema(df: DataFrame): Seq[(String, SqlType)] = {
    val fields = df.schema.fields

    // build one wide aggregation: few stats per column
    val aggs = fields.flatMap { f =>
      val c = col(f.name)
      f.dataType match {
        case ByteType | ShortType | IntegerType | LongType =>
          Seq(min(c.cast(LongType)).as(s"${f.name}__min"),
              max(c.cast(LongType)).as(s"${f.name}__max"))
        case FloatType | DoubleType =>
          Seq(min(c.cast(DoubleType)).as(s"${f.name}__min"),
              max(c.cast(DoubleType)).as(s"${f.name}__max"),
              min(c === floor(c)).as(s"${f.name}__whole"))
        case StringType =>
          Seq(max(length(c)).as(s"${f.name}__len"))
        case TimestampType =>
          Seq(min(c === date_trunc("DAY", c)).as(s"${f.name}__mid"))
        case _ => Seq.empty
      }
    }

    val row = if (aggs.nonEmpty) df.agg(aggs.head, aggs.tail: _*).collect()(0) else null

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

    fields.map { f =>
      val t = f.dataType match {
        case BooleanType => SqlType.parse("bit")
        case ByteType | ShortType | IntegerType | LongType =>
          narrowestIntegral(longAt(s"${f.name}__min"), longAt(s"${f.name}__max"))
        case FloatType | DoubleType =>
          val whole = boolAt(s"${f.name}__whole")
          val mn = dblAt(s"${f.name}__min")
          val mx = dblAt(s"${f.name}__max")
          if (whole && mn.nonEmpty && mx.nonEmpty &&
              mn.get >= Long.MinValue.toDouble && mx.get <= Long.MaxValue.toDouble)
            narrowestIntegral(mn.map(_.toLong), mx.map(_.toLong))
          else SqlType.parse("float")
        case StringType =>
          val len = longAt(s"${f.name}__len").map(_.toInt).getOrElse(0).max(1)
          SqlType.parse(s"varchar($len)")
        case TimestampType =>
          if (boolAt(s"${f.name}__mid")) SqlType.parse("date") else SqlType.parse("datetime2")
        case DateType => SqlType.parse("date")
        case d: DecimalType => SqlType.parse(s"decimal(${d.precision},${d.scale})")
        case BinaryType => SqlType.parse("varbinary")
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
    case _ => SqlType.parse("bigint") // all-null column: widest integral
  }
}
