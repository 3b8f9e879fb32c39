package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.types.{Infer, SqlType}

class TypesSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  test("parse maps SQL declarations to Spark types with bounds") {
    assert(SqlType.parse("TINYINT").spark == ShortType)
    assert(SqlType.parse("TINYINT").intRange.contains((0L, 255L)))
    assert(SqlType.parse("smallint").spark == ShortType)
    assert(SqlType.parse("INT").spark == IntegerType)
    assert(SqlType.parse("bigint").spark == LongType)
    assert(SqlType.parse("DECIMAL(12,2)").spark == DecimalType(12, 2))
    assert(SqlType.parse("numeric(6)").spark == DecimalType(6, 0))
    assert(SqlType.parse("VARCHAR(10)").maxLength.contains(10))
    assert(SqlType.parse("varchar(max)").maxLength.isEmpty)
    assert(SqlType.parse("varchar").maxLength.contains(1)) // SQL Server DDL default
    assert(SqlType.parse("datetime2").spark == TimestampNTZType)
    assert(SqlType.parse("binary(4)").name == "binary") // distinction preserved
  }

  test("parse rejects malformed declarations") {
    assertThrows[errors.UndefinedConversionRule](SqlType.parse("decimal(40,2)"))
    assertThrows[errors.UndefinedConversionRule](SqlType.parse("decimal(5,9)"))
    assertThrows[errors.UndefinedConversionRule](SqlType.parse("wibble"))
  }

  test("forSpark maps signed ByteType to smallint, not unsigned tinyint") {
    assert(SqlType.forSpark(ByteType).name == "smallint")
  }

  test("violation predicates catch out-of-bounds values") {
    def violations(t: String, df: org.apache.spark.sql.DataFrame, c: String): Long =
      SqlType.parse(t).violation(col(c)).map(v => df.filter(v).count()).getOrElse(0L)
    val ints = Seq(-5L, 0L, 255L, 256L).toDF("v")
    assert(violations("tinyint", ints, "v") == 2) // -5 and 256
    assert(violations("smallint", Seq(32768L, 100L).toDF("v"), "v") == 1)
    val strs = Seq("ab", "abcd", null).toDF("s")
    assert(violations("varchar(3)", strs, "s") == 1) // null passes, abcd fails
    val decs = Seq(99.99, 100.0).toDF("d")
    assert(violations("decimal(4,2)", decs, "d") == 1)
  }

  test("narrowSchema picks smallest integral, date vs datetime2, varchar(n)") {
    val df = Seq(
      (1L, 200L, 40000L, 1.5, 25.0, "abc", "2024-01-01 00:00:00", "2024-01-01 10:30:00"),
      (2L, 100L, -40000L, 2.5, 50.0, "abcdef", "2024-02-01 00:00:00", "2024-02-01 00:00:00"))
      .toDF("k", "small", "wide", "frac", "whole", "s", "mid", "notmid")
      .withColumn("mid", col("mid").cast(TimestampType))
      .withColumn("notmid", col("notmid").cast(TimestampType))
    val m = Infer.narrowSchema(df).toMap
    assert(m("k").name == "tinyint")
    assert(m("small").name == "tinyint")
    assert(m("wide").name == "int")
    assert(m("frac").name == "float")
    assert(m("whole").name == "tinyint") // whole-valued doubles narrow
    assert(m("s").render == "varchar(6)")
    assert(m("mid").name == "date")
    assert(m("notmid").name == "datetime2")
  }

  test("narrowSchema all-null columns keep the source dtype category") {
    val df = Seq((None: Option[Long], None: Option[Double]))
      .toDF("l", "d")
    val m = Infer.narrowSchema(df).toMap
    assert(m("l").name == "bigint")
    assert(m("d").name == "float")
  }
}
