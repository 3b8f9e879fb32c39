package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted two-phase aggregation for pathologically skewed group keys
  * (SURVEY §5). AQE's skew handling covers joins; a groupBy whose key
  * has a handful of giant groups (e.g. 3 return-flags over 100 TB of
  * lineitem) still funnels each key through one reducer. Salting splits
  * every group across `salt` reducers, then a cheap second aggregation
  * over `keys × salt` partial rows merges them.
  *
  * Correct only for algebraic aggregates (sum/count/min/max — anything
  * with a merge step); the caller supplies both the partial and the
  * merge expression per output column.
  */
object Skew {

  final case class SaltedAgg(partial: Column, merge: String => Column)

  def sum2(c: Column): SaltedAgg =
    SaltedAgg(sum(c), n => sum(col(n)))
  def count2(): SaltedAgg =
    SaltedAgg(count(lit(1)), n => sum(col(n)))
  def min2(c: Column): SaltedAgg =
    SaltedAgg(min(c), n => min(col(n)))
  def max2(c: Column): SaltedAgg =
    SaltedAgg(max(c), n => max(col(n)))

  /** Salted shuffle join for pathologically hot join keys: the fact
    * side gets a deterministic salt in [0, salt), the dim side (too big
    * to broadcast, small enough to replicate) is exploded `salt` ways,
    * and the join runs on (key, salt) — one hot key spreads across
    * `salt` reducers instead of funneling through one. AQE's skew-join
    * split handles this adaptively when runtime stats catch it; the
    * explicit form is the guaranteed shape for known-hot keys.
    * Result = the plain join (oracle-verified). */
  def saltedJoin(
      fact: DataFrame,
      dim: DataFrame,
      factKey: String,
      dimKey: String,
      saltBy: Column,
      salt: Int = 32): DataFrame = {
    val f = fact.withColumn("__salt", pmod(xxhash64(saltBy), lit(salt)).cast("int"))
    val d = dim.withColumn("__salt", explode(sequence(lit(0), lit(salt - 1))))
    f.join(d, f(factKey) === d(dimKey) && f("__salt") === d("__salt"))
      .drop("__salt")
  }

  /** groupBy(keys).agg(...) in two salted phases. Output column names
    * are the keys ++ agg names. Deterministic: the salt is a hash of a
    * uniqueness column, not a random number. */
  def saltedAggregate(
      df: DataFrame,
      keys: Seq[String],
      saltBy: Column,
      aggs: Seq[(String, SaltedAgg)],
      salt: Int = 32): DataFrame = {
    val salted = df.withColumn("__salt", pmod(xxhash64(saltBy), lit(salt)))
    val phase1 = salted
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(aggs.head._2.partial.as(aggs.head._1),
        aggs.tail.map { case (n, a) => a.partial.as(n) }: _*)
    phase1
      .groupBy(keys.map(col): _*)
      .agg(aggs.head._2.merge(aggs.head._1).as(aggs.head._1),
        aggs.tail.map { case (n, a) => a.merge(n).as(n) }: _*)
  }
}
