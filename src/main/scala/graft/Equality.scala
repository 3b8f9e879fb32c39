package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dataframe equality with failure reasons — the Spark-native
  * re-expression of the reference's test helper
  * (mssql_dataframe/__equality__.py:4 compare_dfs).
  *
  * Pandas compares positionally; distributed DataFrames have no stable
  * row order, so equality here is MULTISET equality: same schema (names
  * in order; types must agree), and every row occurs the same number of
  * times on both sides. Computed as two aggregations and one join —
  * fully distributed, nothing collected but the assertion outcome.
  */
object Equality {

  /** Rows present a different number of times on each side:
    * (row columns..., n_left, n_right). Empty ⇔ multiset-equal. */
  def diff(a: DataFrame, b: DataFrame): DataFrame = {
    require(a.columns.toSeq == b.columns.toSeq,
      s"column mismatch: ${a.columns.toSeq} vs ${b.columns.toSeq}")
    val cols = a.columns.toIndexedSeq.map(c => col(Identifiers.quote(c)))
    val ac = a.groupBy(cols: _*).agg(count(lit(1)).as("n_left"))
    val bc = b.groupBy(cols: _*).agg(count(lit(1)).as("n_right"))
    ac.join(bc, a.columns.toIndexedSeq, "full_outer")
      .withColumn("n_left", coalesce(col("n_left"), lit(0L)))
      .withColumn("n_right", coalesce(col("n_right"), lit(0L)))
      .filter(col("n_left") =!= col("n_right"))
  }

  /** True if multiset-equal; throws AssertionError naming the first
    * point of divergence otherwise (schema, then data). */
  def compareDfs(a: DataFrame, b: DataFrame): Boolean = {
    assert(a.columns.toSeq == b.columns.toSeq,
      s"columns are not equal: ${a.columns.toSeq} vs ${b.columns.toSeq}")
    assert(a.schema.map(_.dataType) == b.schema.map(_.dataType),
      s"column types are not equal: ${a.schema} vs ${b.schema}")
    val d = diff(a, b).limit(5).collect()
    assert(d.isEmpty,
      s"rows are not equal; first differing rows (n_left vs n_right):\n" +
        d.map(_.toString).mkString("\n"))
    true
  }
}
