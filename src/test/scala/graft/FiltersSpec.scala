package graft

import org.scalatest.funsuite.AnyFunSuite

/** Mirrors the reference's dynamic.where behavior
  * (reference tests/test_core/test_dynamic.py) plus graft extensions. */
class FiltersSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  private lazy val df = Seq(
    (1L, Some(5.0), Some("abc"), Some("2021-06-22")),
    (2L, Some(50.0), None, Some("2023-01-01")),
    (3L, None, Some("xyz"), None))
    .toDF("pk", "ColumnA", "ColumnB", "ColumnD")
    .withColumn("ColumnD", org.apache.spark.sql.functions.col("ColumnD").cast("date"))

  private def keys(where: String): Seq[Long] =
    df.filter(Filters.parseWhere(df, where)).select("pk").as[Long].collect().sorted.toSeq

  test("simple comparison") { assert(keys("ColumnA > 10") == Seq(2L)) }
  test("equality with string") { assert(keys("ColumnB = 'abc'") == Seq(1L)) }
  test("IS NULL / IS NOT NULL") {
    assert(keys("ColumnB IS NULL") == Seq(2L))
    assert(keys("ColumnB IS NOT NULL") == Seq(1L, 3L))
  }
  test("AND / OR with parentheses") {
    assert(keys("(ColumnA > 10 OR ColumnB = 'abc') AND pk < 3") == Seq(1L, 2L))
    assert(keys("ColumnA > 1 AND ColumnA < 10 OR ColumnB = 'xyz'") == Seq(1L, 3L))
  }
  test("date literal casts to column type") {
    assert(keys("ColumnD >= '2022-01-01'") == Seq(2L))
  }
  test("T-SQL negated comparisons !> and !<") {
    assert(keys("ColumnA !> 5") == Seq(1L)) // not greater than = <=
    assert(keys("ColumnA !< 50") == Seq(2L))
    assert(keys("ColumnA <> 5") == Seq(2L))
  }
  test("IN list and LIKE") {
    assert(keys("ColumnB IN ('abc', 'xyz')") == Seq(1L, 3L))
    assert(keys("ColumnB NOT IN ('abc')") == Seq(3L))
    assert(keys("ColumnB LIKE 'a%'") == Seq(1L))
    assert(keys("ColumnB NOT LIKE 'a%'") == Seq(3L))
  }
  test("IN / LIKE keywords inside quoted literals do not mis-parse") {
    val q = Seq((1L, "we like it"), (2L, "a in b"), (3L, "plain")).toDF("pk", "name")
    def k(w: String): Seq[Long] =
      q.filter(Filters.parseWhere(q, w)).select("pk").as[Long].collect().sorted.toSeq
    assert(k("name = 'we like it'") == Seq(1L))
    assert(k("name = 'a in b'") == Seq(2L))
    assert(k("name IN ('a in b', 'plain')") == Seq(2L, 3L))
    assert(k("name LIKE '%like%'") == Seq(1L))
  }
  test("quoted identifiers and quoted literals with escapes") {
    assert(keys("[ColumnB] = 'abc'") == Seq(1L))
    assert(keys("`ColumnA` > 10") == Seq(2L))
    val q = Seq((1L, "O'Brien"), (2L, "Smith")).toDF("pk", "name")
    val got = q.filter(Filters.parseWhere(q, "name = 'O''Brien'")).select("pk").as[Long].collect()
    assert(got.toSeq == Seq(1L))
  }
  test("values containing AND/OR words are not split") {
    val q = Seq((1L, "salt AND pepper"), (2L, "plain")).toDF("pk", "s")
    val got = q.filter(Filters.parseWhere(q, "s = 'salt AND pepper'")).select("pk").as[Long].collect()
    assert(got.toSeq == Seq(1L))
  }
  test("unknown column raises ColumnDoesNotExist") {
    assertThrows[errors.ColumnDoesNotExist](Filters.parseWhere(df, "nope > 5"))
  }
  test("missing operator raises InvalidSyntax") {
    assertThrows[errors.InvalidSyntax](Filters.parseWhere(df, "ColumnA"))
    assertThrows[errors.InvalidSyntax](Filters.parseWhere(df, "ColumnA 5"))
  }
  test("unbalanced parentheses raise InvalidSyntax") {
    assertThrows[errors.InvalidSyntax](Filters.parseWhere(df, "(ColumnA > 5"))
    assertThrows[errors.InvalidSyntax](Filters.parseWhere(df, "ColumnA > 5)"))
  }
  test("identifier over 128 chars raises InvalidLengthObjectName") {
    assertThrows[errors.InvalidLengthObjectName](Identifiers.quote("x" * 129))
  }
  test("unquoted rhs naming a column is a column reference; quoted stays literal") {
    // SQL identifier resolution (the shape CHECK constraints live on)
    val d2 = Seq((1L, 1, 10), (2L, 20, 2), (3L, 5, 5))
      .toDF("pk", "lo", "hi")
    def k(w: String): Seq[Long] =
      d2.filter(Filters.parseWhere(d2, w)).select("pk").as[Long].collect().sorted.toSeq
    assert(k("lo <= hi") == Seq(1L, 3L))
    assert(k("lo = hi") == Seq(3L))
    assert(k("lo > hi") == Seq(2L))
    // quoted text is ALWAYS a literal, even when it names a column
    val d3 = Seq((1L, "status"), (2L, "other")).toDF("pk", "status")
    assert(d3.filter(Filters.parseWhere(d3, "status = 'status'"))
      .select("pk").as[Long].collect().toSeq == Seq(1L))
  }
}
