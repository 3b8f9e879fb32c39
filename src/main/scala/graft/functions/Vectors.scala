package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float|double>` columns, built from Spark's
  * higher-order functions so the whole computation stays inside
  * Catalyst (no UDF serialization boundary) and runs identically on
  * every partition.
  *
  * Determinism note (SURVEY §6): `aggregate` folds left-to-right, so a
  * dot product is a fixed-order IEEE-double sum — bit-identical across
  * partitionings and equal to any engine that folds sequentially
  * (DuckDB's list_inner_product), which keeps cosine scores
  * oracle-comparable after rounding.
  */
object Vectors {

  /** Elementwise cast to double (float32 embeddings → exact double) —
    * as an ARRAY cast, not `transform(v, _.cast(double))`: Cast
    * handles arrays inside whole-stage codegen and a same-type cast
    * optimizes away entirely, where the HOF form is CodegenFallback
    * and rebuilds the array even when the input is already double.
    * Identical values either way (float→double widening is exact). */
  def toDouble(v: Column): Column = v.cast("array<double>")

  /** Dot product via the native codegen'd expression (interpreted HOF
    * fold below kept as the spec's equivalence reference). */
  def dot(a: Column, b: Column): Column = graft.plans.GraftFunctions.dot(a, b)

  private[graft] def dotComposed(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, p) => acc + p)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine via the native one-pass codegen'd expression — the HOF
    * composition below runs interpreted (ArrayAggregate/ZipWith are
    * CodegenFallback) with two intermediate arrays per row, and this
    * sits in every ANN scoring loop. Bit-identical by construction
    * (same fold order, same null semantics); VectorsSpec pins it. */
  def cosine(a: Column, b: Column): Column = graft.plans.GraftFunctions.cosine(a, b)

  /** The composed higher-order form, kept as the equivalence reference
    * for the native expression's spec (built on dotComposed so the
    * reference stays fully interpreted). */
  private[graft] def cosineComposed(a: Column, b: Column): Column =
    dotComposed(a, b) / (sqrt(dotComposed(a, a)) * sqrt(dotComposed(b, b)))

  /** Cosine rounded to 6 dp — the canonical comparison/ranking score
    * (stable under engine-level last-bit differences). */
  def cosine6(a: Column, b: Column): Column = round(cosine(a, b), 6)
}
