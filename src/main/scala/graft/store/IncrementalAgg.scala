package graft.store

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** C41: incremental maintenance of a grouped COUNT/SUM summary table
  * from the base table's change-data-feed (C25) — the materialized-view
  * upkeep every warehouse runs ("keep the per-segment totals current")
  * without ever re-scanning the base.
  *
  * Scale design: each [[maintain]] call costs O(changes), never
  * O(base) — `readChanges` already reads only the symmetric-difference
  * files of the two generations, the per-group delta REDUCES from that
  * change-sized relation (map-side combine), and the write path is a
  * keyed upsert + keyed delete, which on a bucketed summary rewrites
  * only the buckets the touched groups hash into. A 100-row upsert
  * into a 100 TB base touches a handful of files end-to-end. COUNT and
  * SUM are the self-maintainable aggregates (a delta is ±1 / ±value
  * regardless of history); MIN/MAX are deliberately out — a deleted
  * extremum needs a base rescan, which is a different operator.
  *
  * Exactness: sums are DECIMAL(18,2) (order-independent under any
  * partitioning), and the maintained table is bit-identical to a full
  * recompute of [[summarize]] over the final base state — the driver
  * oracle and IncrementalAggSpec both state exactly that. Group
  * columns are summary PRIMARY KEY columns and therefore non-null by
  * contract; an in-plan assert_true fires on a NULL group value rather
  * than silently diverging from the recompute.
  */
object IncrementalAgg {

  /** The summary this module maintains: one row per group with the
    * row count and the exact DECIMAL(18,2) sum of `valueCol`. Used
    * once at bootstrap (the only full base scan) and by the
    * reconciliation spec. */
  def summarize(base: DataFrame, groupCols: Seq[String], valueCol: String): DataFrame =
    base.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_rows"),
        sum(col(valueCol).cast(DecimalType(18, 2))).as("sum_val"))

  /** Fold the change feed of `base` between two committed generations
    * into the `summary` store table (schema = [[summarize]]'s, PK =
    * `groupCols`). Inserts and update-postimages count +1/+value,
    * deletes and update-preimages −1/−value; groups whose count
    * reaches zero are deleted from the summary. A feed with no rows
    * (e.g. a pure rewrite: compaction, Z-order) commits nothing. */
  def maintain(store: TableStore, base: String, summary: String,
      groupCols: Seq[String], valueCol: String, fromGen: Int, toGen: Int): Unit = {
    val ch = store.readChanges(base, fromGen, toGen)
    val sign = when(col("_change_type").isin("insert", "update_postimage"), lit(1L))
      .otherwise(lit(-1L))
    // the null-group guard rides the count delta (null on success → +0)
    // so column pruning cannot drop it
    val guard = coalesce(assert_true(
      groupCols.map(col(_).isNotNull).reduce(_ && _),
      lit(s"incremental aggregate: NULL group value in change feed of '$base' — " +
        "group columns are summary PK columns and must be non-null")).cast("long"), lit(0L))
    val delta = ch
      .groupBy(groupCols.map(col): _*)
      .agg((sum(sign) + first(guard)).as("__dn"),
        sum(sign * col(valueCol).cast(DecimalType(18, 2))).as("__dsum"))
    val cur = store.readTable(summary)
    // MATERIALIZE before mutating: the plan reads the summary's live
    // data directory, and the upsert below retires files out of it —
    // a lazy re-evaluation between the two commits would read the
    // half-updated table. The eager checkpoint pins the change-sized
    // result and severs the lineage (the L16 checkpoint idiom).
    val merged = delta.join(cur,
        groupCols.map(c => delta(c) <=> cur(c)).reduce(_ && _), "left")
      .select(groupCols.map(delta(_)) :+
        (coalesce(cur("n_rows"), lit(0L)) + col("__dn")).as("n_rows") :+
        (coalesce(cur("sum_val"), lit(0).cast(DecimalType(18, 2))) + col("__dsum"))
          .cast(DecimalType(18, 2)).as("sum_val"): _*)
      .localCheckpoint(true)
    val live = merged.filter(col("n_rows") > 0)
    val dead = merged.filter(col("n_rows") === 0).select(groupCols.map(col): _*)
    if (!live.isEmpty) store.upsert(summary, live, groupCols)
    if (!dead.isEmpty) store.delete(summary, dead, groupCols)
  }
}
