package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native decode of the canonical DATETIMEOFFSET render
  * (`yyyy-MM-dd HH:mm:ss.ffffff ±HH:MM`, 33 ASCII chars — see
  * graft.types.SqlType.DtoPattern) into its UTC INSTANT as epoch
  * micros. This is SQL Server's comparison semantics for the type
  * (the reference round-trips datetimeoffset through UTC,
  * conversion.py prepare_datetimeoffset — the instant IS how two
  * values compare), while the stored string orders by WALL CLOCK; the
  * engine routes datetimeoffset comparisons, ORDER BY sort keys and
  * zone-map stats through this expression so the two orders never get
  * conflated.
  *
  * Zone-free by construction: fixed-offset civil arithmetic (Hinnant
  * days-from-civil), no session time zone, no zone-db lookup, so the
  * same bytes decode to the same instant on any SparkSession. A
  * malformed string decodes to NULL (stored values are kept canonical
  * by the type's insert-time violation gate; the null keeps ad-hoc
  * frames safe). Fixed-offset byte arithmetic in whole-stage codegen —
  * the per-row cost is ~30 byte loads, no parsing machinery. */
case class DtoInstant(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string datetimeoffset render, got ${other.simpleString(10)}")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_dto_instant"

  override def nullSafeEval(input: Any): Any =
    DtoInstant.micros(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val boxed = ctx.freshName("us")
      s"""
         |java.lang.Long $boxed = graft.plans.DtoInstant.micros($c);
         |if ($boxed == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $boxed.longValue(); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): DtoInstant =
    copy(child = newChild)
}

object DtoInstant {

  /** Days since 1970-01-01 of a proleptic-Gregorian civil date —
    * Hinnant's days_from_civil, exact over the full date range. */
  private def daysFromCivil(y: Int, m: Int, d: Int): Long = {
    val yy = if (m <= 2) y - 1 else y
    val era = (if (yy >= 0) yy else yy - 399) / 400
    val yoe = yy - era * 400
    val doy = (153 * (if (m > 2) m - 3 else m + 9) + 2) / 5 + d - 1
    val doe = yoe * 365L + yoe / 4 - yoe / 100 + doy
    era * 146097L + doe - 719468L
  }

  /** UTC instant micros of a canonical datetimeoffset render; null when
    * the bytes are not the canonical 33-char shape. Shared by the
    * interpreted eval and the generated code (static forwarder). */
  def micros(s: UTF8String): java.lang.Long = {
    if (s == null || s.numBytes() != 33) return null
    def dig(i: Int): Int = {
      val b = s.getByte(i)
      if (b < '0' || b > '9') -1 else b - '0'
    }
    def num(from: Int, len: Int): Int = {
      var v = 0
      var i = from
      while (i < from + len) {
        val d = dig(i)
        if (d < 0) return -1
        v = v * 10 + d
        i += 1
      }
      v
    }
    def sep(i: Int, ch: Char): Boolean = s.getByte(i) == ch.toByte
    if (!(sep(4, '-') && sep(7, '-') && sep(10, ' ') && sep(13, ':') &&
        sep(16, ':') && sep(19, '.') && sep(26, ' ') && sep(30, ':'))) return null
    val sign = s.getByte(27)
    if (sign != '+'.toByte && sign != '-'.toByte) return null
    val y = num(0, 4); val mo = num(5, 2); val d = num(8, 2)
    val hh = num(11, 2); val mm = num(14, 2); val ss = num(17, 2)
    val frac = num(20, 6); val oh = num(28, 2); val om = num(31, 2)
    if (y < 0 || mo < 1 || mo > 12 || d < 1 || hh > 23 || hh < 0 ||
        mm < 0 || mm > 59 || ss < 0 || ss > 59 || frac < 0 ||
        oh < 0 || om < 0 || om > 59) return null
    // calendar validity: '2024-02-31' is not a later February day, it's
    // garbage — decode to null, not a wrong instant
    val leap = (y % 4 == 0 && y % 100 != 0) || y % 400 == 0
    val maxDay = mo match {
      case 2 => if (leap) 29 else 28
      case 4 | 6 | 9 | 11 => 30
      case _ => 31
    }
    if (d > maxDay) return null
    // SQL Server's datetimeoffset offset bound is ±14:00 inclusive
    if (oh > 14 || (oh == 14 && om > 0)) return null
    val wallUs = daysFromCivil(y, mo, d) * 86400000000L +
      hh * 3600000000L + mm * 60000000L + ss * 1000000L + frac
    val offMin = (oh * 60 + om) * (if (sign == '-'.toByte) -1 else 1)
    java.lang.Long.valueOf(wallUs - offMin * 60000000L)
  }
}
