package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Differential property test for the where-parser (C7): random
  * predicate trees are rendered to filter strings and parsed back;
  * the parsed Column must select exactly the rows the directly-built
  * Column selects, across AND/OR precedence, nested parens, NOT
  * variants, quoted literals with embedded quotes/keywords, and NULL
  * semantics. A seeded RNG keeps failures reproducible. */
class FiltersPropertySpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  private val df = {
    val rows = (0 until 200).map { i =>
      val s = i % 7 match {
        case 0 => "alpha"
        case 1 => "it's"            // embedded quote
        case 2 => "we like it"      // embedded keyword LIKE
        case 3 => "in and or"       // embedded keywords
        case 4 => "Beta"
        case 5 => null
        case _ => s"v$i"
      }
      (i, if (i % 11 == 0) None else Some(i * 3 % 97), s)
    }
    rows.toDF("k", "m", "s")
  }

  // leaf pool: (rendered fragment, equivalent Column)
  private val leaves: Seq[(String, Column)] = Seq(
    ("k > 100", col("k") > 100),
    ("k <= 42", col("k") <= 42),
    ("k <> 7", col("k") =!= 7),
    ("k != 13", col("k") =!= 13),
    ("k !> 150", col("k") <= 150),
    ("k !< 50", col("k") >= 50),
    ("m IS NULL", col("m").isNull),
    ("m IS NOT NULL", col("m").isNotNull),
    ("m >= 48", col("m") >= 48),
    ("s = 'it''s'", col("s") === "it's"),
    ("s = 'we like it'", col("s") === "we like it"),
    ("s = 'in and or'", col("s") === "in and or"),
    ("s LIKE 'a%'", col("s").like("a%")),
    ("s NOT LIKE 'v%'", !col("s").like("v%")),
    ("s IN ('alpha', 'Beta', 'it''s')", col("s").isin("alpha", "Beta", "it's")),
    ("k IN (1, 2, 3, 50, 51)", col("k").isin(1, 2, 3, 50, 51)),
    ("k NOT IN (10, 20)", !col("k").isin(10, 20)))

  private def keys(c: Column): Seq[Int] =
    df.filter(c).select("k").as[Int].collect().sorted.toSeq

  test("random predicate trees parse to the same row set as direct Columns") {
    val rnd = new scala.util.Random(42)
    def gen(depth: Int): (String, Column) = {
      if (depth == 0 || rnd.nextInt(3) == 0) leaves(rnd.nextInt(leaves.length))
      else {
        val (ls, lc) = gen(depth - 1)
        val (rs, rc) = gen(depth - 1)
        val (op, oc) = if (rnd.nextBoolean()) ("AND", lc && rc) else ("OR", lc || rc)
        // compound children are always parenthesized so the rendered
        // string's structure matches the built tree exactly; the
        // flat-string precedence rule has its own dedicated test below
        (s"($ls $op $rs)", oc)
      }
    }
    (1 to 200).foreach { i =>
      val (str, expect) = gen(3)
      val got = Filters.parseWhere(df, str)
      // string-rendered trees without parens bind AND tighter than OR,
      // exactly like the Column operators — so the row sets must agree
      assert(keys(got) == keys(expect), s"iteration $i diverged for: $str")
    }
  }

  test("operator precedence: AND binds tighter than OR in flat strings") {
    val c = Filters.parseWhere(df, "k <= 42 OR k > 100 AND s LIKE 'v%'")
    val expect = col("k") <= 42 || (col("k") > 100 && col("s").like("v%"))
    assert(keys(c) == keys(expect))
  }
}
