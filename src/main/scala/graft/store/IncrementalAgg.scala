package graft.store

import org.apache.spark.sql.{Column, DataFrame}
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

  /** C47: derived group columns — `derive` maps a NEW column name to a
    * deterministic SQL expression over the base's columns (e.g.
    * `"day" -> "to_date(ts)"`). Applied identically to the bootstrap
    * relation, the change feed and the rescan reads, so a summary can
    * group by an expression the base does not store (the daily-rollup
    * MV shape). The maintenance algebra is unchanged: a derived column
    * is just another group column once projected. */
  def derivedView(df: DataFrame, derive: Seq[(String, String)]): DataFrame =
    derive.foldLeft(df) { case (d, (n, e)) => d.withColumn(n, expr(e)) }

  /** The summary this module maintains: one row per group with the
    * row count and the exact DECIMAL(18,2) sum of `valueCol`. Used
    * once at bootstrap (the only full base scan) and by the
    * reconciliation spec. */
  def summarize(base: DataFrame, groupCols: Seq[String], valueCol: String): DataFrame =
    base.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_rows"),
        // the NON-NULL count: what Average divides by and what count(v)
        // means — n_rows alone cannot serve either when v has NULLs
        count(col(valueCol)).as("nn_val"),
        sum(col(valueCol).cast(DecimalType(18, 2))).as("sum_val"))

  /** Post-maintenance rows for every group the feed touched, with the
    * zero-count groups flagged `__dead` — the source relation of ONE
    * [[TableStore.applyChanges]] commit. Eagerly checkpointed: the
    * plan reads the summary's live data directory and the mutation
    * retires files out of it, so a lazy re-evaluation mid-commit would
    * read the half-updated table (the L16 checkpoint idiom). */
  private def mergedDelta(store: TableStore, base: String, summary: String,
      groupCols: Seq[String], valueCol: String, fromGen: Int, toGen: Int,
      derive: Seq[(String, String)] = Nil): DataFrame = {
    val ch = derivedView(store.readChanges(base, fromGen, toGen), derive)
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
        sum(when(col(valueCol).isNotNull, sign).otherwise(0L)).as("__dnn"),
        sum(sign * col(valueCol).cast(DecimalType(18, 2))).as("__dsum"))
    val cur = store.readTable(summary)
    val nRows = coalesce(cur("n_rows"), lit(0L)) + col("__dn")
    // a negative post-count means the feed and the summary disagree
    // (corrupt feed, or a writer bypassed maintenance) — fail loudly
    // instead of silently dropping the group; the guard rides n_rows
    // (null on success → +0) so pruning cannot elide it
    val negGuard = coalesce(assert_true(nRows >= 0,
      lit(s"incremental aggregate: negative row count maintaining '$summary' from " +
        s"the change feed of '$base' — feed and summary are inconsistent")).cast("long"),
      lit(0L))
    delta.join(cur,
        groupCols.map(c => delta(c) <=> cur(c)).reduce(_ && _), "left")
      .select(groupCols.map(delta(_)) :+
        (nRows + negGuard).as("n_rows") :+
        (coalesce(cur("nn_val"), lit(0L)) + col("__dnn")).as("nn_val") :+
        (coalesce(cur("sum_val"), lit(0).cast(DecimalType(18, 2))) + col("__dsum"))
          .cast(DecimalType(18, 2)).as("sum_val"): _*)
      .withColumn("__dead", col("n_rows") === 0L)
      .localCheckpoint(true)
  }

  /** Fold the change feed of `base` between two committed generations
    * into the `summary` store table (schema = [[summarize]]'s, PK =
    * `groupCols`). Inserts and update-postimages count +1/+value,
    * deletes and update-preimages −1/−value; groups whose count
    * reaches zero are deleted from the summary. The whole fold is ONE
    * [[TableStore.applyChanges]] commit (upsert live + delete dead
    * atomically — two commits would expose dead groups with stale
    * counts to a reader landing between them, permanently so on a
    * crash). A feed with no rows (e.g. a pure rewrite: compaction,
    * Z-order) commits nothing. */
  def maintain(store: TableStore, base: String, summary: String,
      groupCols: Seq[String], valueCol: String, fromGen: Int, toGen: Int,
      derive: Seq[(String, String)] = Nil): Unit = {
    val merged = mergedDelta(store, base, summary, groupCols, valueCol, fromGen, toGen, derive)
    if (!merged.isEmpty) store.applyChanges(summary, merged, "__dead", groupCols)
  }

  private def appliedKey(base: String) = s"graft.maint.$base.applied"
  private def pendingKey(base: String) = s"graft.maint.$base.pending"
  private def sgenKey(base: String) = s"graft.maint.$base.sgen"

  /** Record that `summary` currently reflects `base` at generation
    * `gen` — call once after bootstrapping the summary from
    * [[summarize]]. Seeds the durable watermark [[maintainToCurrent]]
    * advances. */
  def markMaintained(store: TableStore, base: String, summary: String, gen: Int): Unit =
    store.setProperties(summary, Map(appliedKey(base) -> gen.toString),
      remove = Seq(pendingKey(base), sgenKey(base)))

  /** The base generation `summary` durably reflects (None before
    * [[markMaintained]] has seeded it). */
  def maintainedGen(store: TableStore, base: String, summary: String): Option[Int] = {
    recover(store, base, summary)
    store.properties(summary).get(appliedKey(base)).map(_.toInt)
  }

  /** READ-ONLY twin of [[maintainedGen]] for the optimizer path
    * (graft.plans.SummaryRewrite): never heals an interrupted attempt
    * — a pending write-ahead intent is undecided, so it answers None
    * (not fresh, rewrite stands down) and leaves recovery to the
    * maintenance path. An optimizer probe that wrote store state would
    * race a concurrent maintainer's properties update (setProperties
    * is a read-modify-write serialized only by the single-writer
    * contract, which a query compile is not part of). */
  private[graft] def maintainedGenReadOnly(
      store: TableStore, base: String, summary: String): Option[Int] = {
    val props = store.properties(summary)
    if (props.contains(pendingKey(base))) None
    else props.get(appliedKey(base)).map(_.toInt)
  }

  /** Finish or roll back an interrupted [[maintainToCurrent]]: the
    * intent record {pending, sgen} plus the summary's current
    * generation decide whether the single maintenance commit landed —
    * if the summary advanced past `sgen` it did (advance the
    * watermark), otherwise it never committed (drop the intent and the
    * next call refolds from the old watermark). Decidable both ways
    * BECAUSE maintenance is one commit; this is why [[maintain]] must
    * never be split back into upsert+delete. */
  private def recover(store: TableStore, base: String, summary: String): Unit = {
    val props = store.properties(summary)
    props.get(pendingKey(base)).foreach { p =>
      val committed = props.get(sgenKey(base)).map(_.toInt) match {
        case Some(sAtStart) => store.snapshots(summary).last._1 > sAtStart
        case None           => false
      }
      if (committed) markMaintained(store, base, summary, p.toInt)
      else store.setProperties(summary, Map.empty,
        remove = Seq(pendingKey(base), sgenKey(base)))
    }
  }

  /** S36's crash-safe driver: fold everything committed to `base`
    * since the durable watermark into `summary`, idempotently across
    * failures and Structured-Streaming batch replays. Protocol per
    * call: recover any interrupted attempt, compute the delta for the
    * pinned range (watermark → current base generation), write a
    * write-ahead intent {pending, summary-generation}, apply the delta
    * as ONE commit, then advance the watermark. A crash at any point
    * either left the intent undecided-but-uncommitted (next call
    * refolds the same range — same result) or committed (next call's
    * recovery advances the watermark without re-applying). Replayed
    * upserts of the same rows produce self-cancelling feed diffs, so
    * folding a range that spans them stays exact. Single-writer: the
    * summary must be written only through this path (the standard
    * materialized-view ownership contract). */
  def maintainToCurrent(store: TableStore, base: String, summary: String,
      groupCols: Seq[String], valueCol: String,
      derive: Seq[(String, String)] = Nil): Unit =
    maintainProtocol(store, base, summary) { (applied, cur) =>
      val merged = mergedDelta(store, base, summary, groupCols, valueCol, applied, cur, derive)
      if (merged.isEmpty) None
      else Some(() => store.applyChanges(summary, merged, "__dead", groupCols))
    }

  /** The reusable crash-safety half of [[maintainToCurrent]]: `fold`
    * inspects the pinned range and returns None (nothing to commit —
    * the watermark just advances) or the ONE summary commit to run
    * between the write-ahead intent and the watermark advance. */
  private def maintainProtocol(store: TableStore, base: String, summary: String)(
      fold: (Int, Int) => Option[() => Unit]): Unit = {
    recover(store, base, summary)
    val applied = store.properties(summary).get(appliedKey(base)).map(_.toInt)
      .getOrElse(throw new IllegalStateException(
        s"no maintenance watermark for '$base' on '$summary' — seed it with " +
          "markMaintained at the generation the summary was bootstrapped from"))
    val cur = store.snapshots(base).last._1
    if (cur <= applied) return
    fold(applied, cur) match {
      case None => markMaintained(store, base, summary, cur)
      case Some(commit) =>
        store.setProperties(summary, Map(pendingKey(base) -> cur.toString,
          sgenKey(base) -> store.snapshots(summary).last._1.toString))
        commit()
        markMaintained(store, base, summary, cur)
    }
  }

  // ── C41c: multi-measure summaries ───────────────────────────────────

  /** One summary maintaining SEVERAL measures: n_rows plus an exact
    * DECIMAL(18,2) `sum_<c>` per value column — one maintenance fold
    * and one table where N single-measure summaries would cost N folds
    * and N change-feed reads per commit. The TPC-H-Q1 shape ("per
    * flag: row count, sum of quantity, sum of price, averages") is one
    * of these. */
  def summarizeMulti(base: DataFrame, groupCols: Seq[String],
      valueCols: Seq[String]): DataFrame = {
    require(valueCols.nonEmpty, "summarizeMulti: need at least one value column")
    base.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_rows"),
        valueCols.flatMap(c => Seq(
          count(col(c)).as("nn_" + c),
          sum(col(c).cast(DecimalType(18, 2))).as("sum_" + c))): _*)
  }

  /** [[mergedDelta]] generalized over the measure list — the same
    * change-feed algebra, one signed decimal delta per measure. */
  private def mergedMultiDelta(store: TableStore, base: String, summary: String,
      groupCols: Seq[String], valueCols: Seq[String],
      fromGen: Int, toGen: Int, derive: Seq[(String, String)] = Nil): DataFrame = {
    val ch = derivedView(store.readChanges(base, fromGen, toGen), derive)
    val sign = when(col("_change_type").isin("insert", "update_postimage"), lit(1L))
      .otherwise(lit(-1L))
    val guard = coalesce(assert_true(
      groupCols.map(col(_).isNotNull).reduce(_ && _),
      lit(s"incremental aggregate: NULL group value in change feed of '$base' — " +
        "group columns are summary PK columns and must be non-null")).cast("long"), lit(0L))
    val dec = DecimalType(18, 2)
    val delta = ch.groupBy(groupCols.map(col): _*)
      .agg((sum(sign) + first(guard)).as("__dn"),
        valueCols.flatMap(c => Seq(
          sum(when(col(c).isNotNull, sign).otherwise(0L)).as("__dnn_" + c),
          sum(sign * col(c).cast(dec)).as("__d_" + c))): _*)
    val cur = store.readTable(summary)
    val nRows = coalesce(cur("n_rows"), lit(0L)) + col("__dn")
    val negGuard = coalesce(assert_true(nRows >= 0,
      lit(s"incremental aggregate: negative row count maintaining '$summary' from " +
        s"the change feed of '$base' — feed and summary are inconsistent")).cast("long"),
      lit(0L))
    delta.join(cur,
        groupCols.map(c => delta(c) <=> cur(c)).reduce(_ && _), "left")
      .select(groupCols.map(delta(_)) :+
        (nRows + negGuard).as("n_rows") :++
        valueCols.flatMap(c => Seq(
          (coalesce(cur("nn_" + c), lit(0L)) + col("__dnn_" + c)).as("nn_" + c),
          (coalesce(cur("sum_" + c), lit(0).cast(dec)) + col("__d_" + c))
            .cast(dec).as("sum_" + c))): _*)
      .withColumn("__dead", col("n_rows") === 0L)
      .localCheckpoint(true)
  }

  /** [[maintainToCurrent]] for a [[summarizeMulti]] summary — same
    * durable watermark/intent protocol, one fold for all measures. */
  def maintainMultiToCurrent(store: TableStore, base: String, summary: String,
      groupCols: Seq[String], valueCols: Seq[String],
      derive: Seq[(String, String)] = Nil): Unit =
    maintainProtocol(store, base, summary) { (applied, cur) =>
      val merged = mergedMultiDelta(store, base, summary, groupCols, valueCols, applied, cur, derive)
      if (merged.isEmpty) None
      else Some(() => store.applyChanges(summary, merged, "__dead", groupCols))
    }

  // ── C41d: distinct-count (KMV sketch) summaries ─────────────────────

  /** Sketch registers persist as a comma-joined ascending decimal
    * string — store tables are SQL-typed (no arrays), and the CSV form
    * is itself oracle-derivable (DuckDB string_agg over the same
    * ordered hashes). Empty sketch (a group of all-NULL values) is the
    * empty string. */
  private def kmvToStr(a: Column): Column = array_join(a.cast("array<string>"), ",")
  private def kmvFromStr(s: Column): Column =
    when(length(s) === 0, array().cast("array<bigint>"))
      .otherwise(split(s, ",").cast("array<bigint>"))

  /** The C41d summary: one row per group with the row count and the
    * portable KMV distinct-count registers of `valueCol` (the k
    * smallest distinct md5-derived 32-bit hashes of its string
    * rendering — [[graft.plans.KmvCore]]). COUNT is self-maintainable;
    * the sketch only GROWS under inserts (exact set union), so
    * [[maintainDistinctToCurrent]] merges insert-only groups from the
    * feed and rescans just the groups a delete touched — the C41b
    * protocol applied to cardinality. */
  def summarizeDistinct(base: DataFrame, groupCols: Seq[String], valueCol: String,
      k: Int = 64): DataFrame =
    base.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_rows"),
        kmvToStr(graft.plans.GraftFunctions.kmvSketch(col(valueCol), k)).as("kmv_val"))

  /** Post-maintenance rows for every group the feed touched. Insert-
    * only groups: count delta + register union (sorted distinct merge
    * truncated to k — EXACT, the union's k smallest distinct hashes of
    * any row split are the whole's). Groups any delete touched:
    * re-derive from the base pinned at the fold's target generation,
    * restricted to exactly those groups. */
  private def mergedDistinctDelta(store: TableStore, base: String, summary: String,
      groupCols: Seq[String], valueCol: String, k: Int,
      fromGen: Int, toGen: Int, derive: Seq[(String, String)] = Nil): DataFrame = {
    val ch = derivedView(store.readChanges(base, fromGen, toGen), derive)
    val sign = when(col("_change_type").isin("insert", "update_postimage"), lit(1L))
      .otherwise(lit(-1L))
    val guard = coalesce(assert_true(
      groupCols.map(col(_).isNotNull).reduce(_ && _),
      lit(s"incremental aggregate: NULL group value in change feed of '$base' — " +
        "group columns are summary PK columns and must be non-null")).cast("long"), lit(0L))
    // r16 (guide §1.2/§2.2 — profiled: the rescan families re-ran the
    // change-feed aggregate and the base rescan once per CONSUMING
    // branch; AQE's stage reuse does not span the grown/touched/dead
    // DAG here): materialize the O(changes) delta ONCE, eagerly — the
    // three branches then read memory instead of re-scanning the feed
    val delta = ch.groupBy(groupCols.map(col): _*)
      .agg((sum(sign) + first(guard)).as("__dn"),
        graft.plans.GraftFunctions.kmvSketch(
          when(sign === 1L, col(valueCol)), k).as("__ins"),
        sum(when(sign === -1L, 1L).otherwise(0L)).as("__dels"))
      .localCheckpoint(true)
    val cur = store.readTable(summary)
    val grown = delta.filter(col("__dels") === 0L)
    val nRows = coalesce(cur("n_rows"), lit(0L)) + col("__dn")
    val negGuard = coalesce(assert_true(nRows >= 0,
      lit(s"incremental aggregate: negative row count maintaining '$summary' from " +
        s"the change feed of '$base' — feed and summary are inconsistent")).cast("long"),
      lit(0L))
    val curArr = coalesce(kmvFromStr(cur("kmv_val")), array().cast("array<bigint>"))
    val grownRows = grown.join(cur,
        groupCols.map(c => grown(c) <=> cur(c)).reduce(_ && _), "left")
      .select(groupCols.map(grown(_)) :+
        (nRows + negGuard).as("n_rows") :+
        kmvToStr(slice(array_sort(array_distinct(
          concat(curArr, col("__ins")))), 1, k)).as("kmv_val"): _*)
    val touched = delta.filter(col("__dels") > 0L).select(groupCols.map(col): _*)
    // r16: the rescan feeds BOTH the union and the dead anti-join —
    // materialized once so the pinned base is scanned once per fold
    val rescan = summarizeDistinct(
      derivedView(store.readTableAt(base, toGen), derive)
        .join(touched, groupCols, "left_semi"),
      groupCols, valueCol, k)
      .localCheckpoint(true)
    val dead = touched.join(rescan.select(groupCols.map(col): _*), groupCols, "left_anti")
      .select(groupCols.map(col) :+ lit(0L).as("n_rows") :+
        lit(null).cast("string").as("kmv_val"): _*)
    grownRows.unionByName(rescan).unionByName(dead)
      .withColumn("__dead", col("n_rows") === 0L)
      .localCheckpoint(true)
  }

  /** [[maintainToCurrent]] for a [[summarizeDistinct]] summary — same
    * durable watermark/intent protocol; `k` must match the bootstrap's. */
  def maintainDistinctToCurrent(store: TableStore, base: String, summary: String,
      groupCols: Seq[String], valueCol: String, k: Int = 64,
      derive: Seq[(String, String)] = Nil): Unit =
    maintainProtocol(store, base, summary) { (applied, cur) =>
      val merged = mergedDistinctDelta(
        store, base, summary, groupCols, valueCol, k, applied, cur, derive)
      if (merged.isEmpty) None
      else Some(() => store.applyChanges(summary, merged, "__dead", groupCols))
    }

  // ── C41g: quantile-sketch summaries ─────────────────────────────────

  /** The C41g summary: the A46 integer log-histogram
    * ([[graft.operators.Analytics.valueSketch]]'s bucket definition,
    * shared code — the two histograms are counter-identical by
    * construction) maintained as one COUNTER row per
    * (group, bin_id, bin_upper). Bucket counts are pure counters, so
    * unlike min/max/distinct this family maintains under ANY feed by
    * addition/subtraction alone — deletes need NO base rescan: a
    * deleted observation just decrements its bucket, and a bucket
    * reaching zero dies. The "p99 latency per segment, maintained" MV.
    *
    * NULL values are no observation (the sketchUnits discipline): the
    * bootstrap, the fold and the served query shape all filter them
    * before bucketing, which is what [[graft.plans.SummaryRewrite
    * .registerQuantile]] registers as the summary's BASE FILTER. */
  def summarizeQuantile(base: DataFrame, groupCols: Seq[String], valueCol: String): DataFrame =
    graft.operators.Analytics.withSketchBuckets(
        base.select(groupCols.map(col) :+
          graft.operators.Analytics.sketchUnits(valueCol).as("__x"): _*)
          .filter(col("__x").isNotNull))
      .groupBy(groupCols.map(col) :+ col("bin_id") :+ col("bin_upper"): _*)
      .agg(count(lit(1)).as("n_rows"))

  /** Post-maintenance rows for every (group, bucket) the feed touched
    * — the C41 counter fold with the bucket as a derived group column:
    * inserts +1, deletes −1 on the observation's bucket, dead buckets
    * (count 0) deleted. O(changes), never a rescan. `derive` (C47)
    * projects user-derived group columns (e.g. day → to_date(ts))
    * before bucketing — the "p99 per day, maintained" MV. */
  private def mergedQuantileDelta(store: TableStore, base: String, summary: String,
      groupCols: Seq[String], valueCol: String, fromGen: Int, toGen: Int,
      derive: Seq[(String, String)] = Nil): DataFrame = {
    val allGroups = groupCols ++ Seq("bin_id", "bin_upper")
    val ch = graft.operators.Analytics.withSketchBuckets(
      derivedView(store.readChanges(base, fromGen, toGen), derive)
        .select(groupCols.map(col) :+ col("_change_type") :+
          graft.operators.Analytics.sketchUnits(valueCol).as("__x"): _*)
        .filter(col("__x").isNotNull))
    val sign = when(col("_change_type").isin("insert", "update_postimage"), lit(1L))
      .otherwise(lit(-1L))
    val guard = coalesce(assert_true(
      groupCols.map(col(_).isNotNull).reduce(_ && _),
      lit(s"incremental aggregate: NULL group value in change feed of '$base' — " +
        "group columns are summary PK columns and must be non-null")).cast("long"), lit(0L))
    val delta = ch.groupBy(allGroups.map(col): _*)
      .agg((sum(sign) + first(guard)).as("__dn"))
    val cur = store.readTable(summary)
    val nRows = coalesce(cur("n_rows"), lit(0L)) + col("__dn")
    val negGuard = coalesce(assert_true(nRows >= 0,
      lit(s"incremental aggregate: negative bucket count maintaining '$summary' from " +
        s"the change feed of '$base' — feed and summary are inconsistent")).cast("long"),
      lit(0L))
    delta.join(cur,
        allGroups.map(c => delta(c) <=> cur(c)).reduce(_ && _), "left")
      .select(allGroups.map(delta(_)) :+
        (nRows + negGuard).as("n_rows"): _*)
      .withColumn("__dead", col("n_rows") === 0L)
      .localCheckpoint(true)
  }

  /** [[maintainToCurrent]] for a [[summarizeQuantile]] summary — same
    * durable watermark/intent protocol; the summary's PK must be
    * groupCols ++ (bin_id, bin_upper). */
  def maintainQuantileToCurrent(store: TableStore, base: String, summary: String,
      groupCols: Seq[String], valueCol: String,
      derive: Seq[(String, String)] = Nil): Unit =
    maintainProtocol(store, base, summary) { (applied, cur) =>
      val merged = mergedQuantileDelta(
        store, base, summary, groupCols, valueCol, applied, cur, derive)
      if (merged.isEmpty) None
      else Some(() => store.applyChanges(summary, merged, "__dead",
        groupCols ++ Seq("bin_id", "bin_upper")))
    }

  // ── C41d × C41c: multi-measure distinct-count (KMV) summaries ───────

  /** [[summarizeDistinct]] over SEVERAL measures: n_rows plus a
    * `kmv_<c>` register column per value column — one maintenance fold
    * and one table where N single-measure distinct summaries would
    * cost N change-feed reads per commit. */
  def summarizeDistinctMulti(base: DataFrame, groupCols: Seq[String],
      valueCols: Seq[String], k: Int = 64): DataFrame = {
    require(valueCols.nonEmpty, "summarizeDistinctMulti: need at least one value column")
    base.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_rows"),
        valueCols.map(c => kmvToStr(
          graft.plans.GraftFunctions.kmvSketch(col(c), k)).as("kmv_" + c)): _*)
  }

  /** [[mergedDistinctDelta]] generalized over the measure list: groups
    * with only inserts union registers PER measure (exact set
    * algebra), groups any delete touched re-derive from the base
    * pinned at the fold's target generation. `derive` (C47) projects
    * user-derived group columns over the feed AND the rescan reads,
    * exactly like the single-measure path. */
  private def mergedDistinctMultiDelta(store: TableStore, base: String, summary: String,
      groupCols: Seq[String], valueCols: Seq[String], k: Int,
      fromGen: Int, toGen: Int, derive: Seq[(String, String)] = Nil): DataFrame = {
    val ch = derivedView(store.readChanges(base, fromGen, toGen), derive)
    val sign = when(col("_change_type").isin("insert", "update_postimage"), lit(1L))
      .otherwise(lit(-1L))
    val guard = coalesce(assert_true(
      groupCols.map(col(_).isNotNull).reduce(_ && _),
      lit(s"incremental aggregate: NULL group value in change feed of '$base' — " +
        "group columns are summary PK columns and must be non-null")).cast("long"), lit(0L))
    // r16: one eager delta materialization for the three branches (see
    // mergedDistinctDelta)
    val delta = ch.groupBy(groupCols.map(col): _*)
      .agg((sum(sign) + first(guard)).as("__dn"),
        valueCols.map(c => graft.plans.GraftFunctions.kmvSketch(
          when(sign === 1L, col(c)), k).as("__ins_" + c)) :+
          sum(when(sign === -1L, 1L).otherwise(0L)).as("__dels"): _*)
      .localCheckpoint(true)
    val cur = store.readTable(summary)
    val grown = delta.filter(col("__dels") === 0L)
    val nRows = coalesce(cur("n_rows"), lit(0L)) + col("__dn")
    val negGuard = coalesce(assert_true(nRows >= 0,
      lit(s"incremental aggregate: negative row count maintaining '$summary' from " +
        s"the change feed of '$base' — feed and summary are inconsistent")).cast("long"),
      lit(0L))
    val grownRows = grown.join(cur,
        groupCols.map(c => grown(c) <=> cur(c)).reduce(_ && _), "left")
      .select(groupCols.map(grown(_)) :+
        (nRows + negGuard).as("n_rows") :++
        valueCols.map { c =>
          val curArr = coalesce(kmvFromStr(cur("kmv_" + c)), array().cast("array<bigint>"))
          kmvToStr(slice(array_sort(array_distinct(
            concat(curArr, col("__ins_" + c)))), 1, k)).as("kmv_" + c)
        }: _*)
    val touched = delta.filter(col("__dels") > 0L).select(groupCols.map(col): _*)
    // r16: materialized once — union + dead anti-join share one base scan
    val rescan = summarizeDistinctMulti(
      derivedView(store.readTableAt(base, toGen), derive)
        .join(touched, groupCols, "left_semi"),
      groupCols, valueCols, k)
      .localCheckpoint(true)
    val dead = touched.join(rescan.select(groupCols.map(col): _*), groupCols, "left_anti")
      .select(groupCols.map(col) :+ lit(0L).as("n_rows") :++
        valueCols.map(c => lit(null).cast("string").as("kmv_" + c)): _*)
    grownRows.unionByName(rescan).unionByName(dead)
      .withColumn("__dead", col("n_rows") === 0L)
      .localCheckpoint(true)
  }

  /** [[maintainToCurrent]] for a [[summarizeDistinctMulti]] summary. */
  def maintainDistinctMultiToCurrent(store: TableStore, base: String, summary: String,
      groupCols: Seq[String], valueCols: Seq[String], k: Int = 64,
      derive: Seq[(String, String)] = Nil): Unit =
    maintainProtocol(store, base, summary) { (applied, cur) =>
      val merged = mergedDistinctMultiDelta(
        store, base, summary, groupCols, valueCols, k, applied, cur, derive)
      if (merged.isEmpty) None
      else Some(() => store.applyChanges(summary, merged, "__dead", groupCols))
    }

  // ── C41c × C41b: multi-measure min/max summaries ────────────────────

  /** [[summarizeMulti]] extended with per-measure extrema: n_rows plus
    * `sum_<c>`, `min_<c>`, `max_<c>` for every value column — ONE
    * summary (and one maintenance fold) serving the full TPC-H-Q1
    * aggregate menu (count/sum/avg/min/max over several measures). */
  def summarizeMultiMinMax(base: DataFrame, groupCols: Seq[String],
      valueCols: Seq[String]): DataFrame = {
    require(valueCols.nonEmpty, "summarizeMultiMinMax: need at least one value column")
    val dec = DecimalType(18, 2)
    base.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_rows"),
        valueCols.flatMap(c => Seq(
          count(col(c)).as("nn_" + c),
          sum(col(c).cast(dec)).as("sum_" + c),
          min(col(c).cast(dec)).as("min_" + c),
          max(col(c).cast(dec)).as("max_" + c))): _*)
  }

  /** [[mergedMinMaxDelta]] generalized over the measure list: groups
    * with only inserts fold incrementally (sums add, extrema tighten
    * via least/greatest PER measure), groups any delete touched
    * re-derive from the base pinned at the fold's target generation —
    * the C41b rescan protocol, one fold for all measures. */
  private def mergedMultiMinMaxDelta(store: TableStore, base: String, summary: String,
      groupCols: Seq[String], valueCols: Seq[String],
      fromGen: Int, toGen: Int, derive: Seq[(String, String)] = Nil): DataFrame = {
    val ch = derivedView(store.readChanges(base, fromGen, toGen), derive)
    val sign = when(col("_change_type").isin("insert", "update_postimage"), lit(1L))
      .otherwise(lit(-1L))
    val guard = coalesce(assert_true(
      groupCols.map(col(_).isNotNull).reduce(_ && _),
      lit(s"incremental aggregate: NULL group value in change feed of '$base' — " +
        "group columns are summary PK columns and must be non-null")).cast("long"), lit(0L))
    val dec = DecimalType(18, 2)
    def v(c: String) = col(c).cast(dec)
    // r16: one eager delta materialization for the three branches (see
    // mergedDistinctDelta)
    val delta = ch.groupBy(groupCols.map(col): _*)
      .agg((sum(sign) + first(guard)).as("__dn"),
        valueCols.flatMap(c => Seq(
          sum(when(col(c).isNotNull, sign).otherwise(0L)).as("__dnn_" + c),
          sum(sign * v(c)).as("__d_" + c),
          min(when(sign === 1L, v(c))).as("__imin_" + c),
          max(when(sign === 1L, v(c))).as("__imax_" + c))) :+
          sum(when(sign === -1L, 1L).otherwise(0L)).as("__dels"): _*)
      .localCheckpoint(true)
    val cur = store.readTable(summary)
    val grown = delta.filter(col("__dels") === 0L)
    val nRows = coalesce(cur("n_rows"), lit(0L)) + col("__dn")
    val negGuard = coalesce(assert_true(nRows >= 0,
      lit(s"incremental aggregate: negative row count maintaining '$summary' from " +
        s"the change feed of '$base' — feed and summary are inconsistent")).cast("long"),
      lit(0L))
    val grownRows = grown.join(cur,
        groupCols.map(c => grown(c) <=> cur(c)).reduce(_ && _), "left")
      .select(groupCols.map(grown(_)) :+
        (nRows + negGuard).as("n_rows") :++
        valueCols.flatMap(c => Seq(
          (coalesce(cur("nn_" + c), lit(0L)) + col("__dnn_" + c)).as("nn_" + c),
          (coalesce(cur("sum_" + c), lit(0).cast(dec)) + col("__d_" + c))
            .cast(dec).as("sum_" + c),
          least(cur("min_" + c), col("__imin_" + c)).cast(dec).as("min_" + c),
          greatest(cur("max_" + c), col("__imax_" + c)).cast(dec).as("max_" + c))): _*)
    val touched = delta.filter(col("__dels") > 0L).select(groupCols.map(col): _*)
    // r16: materialized once — union + dead anti-join share one base scan
    val rescan = summarizeMultiMinMax(
      derivedView(store.readTableAt(base, toGen), derive)
        .join(touched, groupCols, "left_semi"),
      groupCols, valueCols)
      .localCheckpoint(true)
    val dead = touched.join(rescan.select(groupCols.map(col): _*), groupCols, "left_anti")
      .select(groupCols.map(col) :+ lit(0L).as("n_rows") :++
        valueCols.flatMap(c => Seq(
          lit(0L).as("nn_" + c),
          lit(null).cast(dec).as("sum_" + c),
          lit(null).cast(dec).as("min_" + c),
          lit(null).cast(dec).as("max_" + c))): _*)
    grownRows.unionByName(rescan).unionByName(dead)
      .withColumn("__dead", col("n_rows") === 0L)
      .localCheckpoint(true)
  }

  /** [[maintainToCurrent]] for a [[summarizeMultiMinMax]] summary. */
  def maintainMultiMinMaxToCurrent(store: TableStore, base: String, summary: String,
      groupCols: Seq[String], valueCols: Seq[String],
      derive: Seq[(String, String)] = Nil): Unit =
    maintainProtocol(store, base, summary) { (applied, cur) =>
      val merged = mergedMultiMinMaxDelta(
        store, base, summary, groupCols, valueCols, applied, cur, derive)
      if (merged.isEmpty) None
      else Some(() => store.applyChanges(summary, merged, "__dead", groupCols))
    }

  // ── C41b: min/max summaries ─────────────────────────────────────────

  /** The extended summary: [[summarize]]'s count/sum plus the exact
    * DECIMAL(18,2) min and max of `valueCol` per group. COUNT/SUM are
    * self-maintainable under ANY feed; MIN/MAX are self-maintainable
    * only under growth (an insert can only tighten an extremum), so
    * [[maintainMinMaxToCurrent]] folds insert-only groups from the
    * change feed and RESCANS just the groups the feed deleted from —
    * bounded by the affected groups' rows, never the base. */
  def summarizeMinMax(base: DataFrame, groupCols: Seq[String], valueCol: String): DataFrame =
    base.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_rows"),
        count(col(valueCol)).as("nn_val"),
        sum(col(valueCol).cast(DecimalType(18, 2))).as("sum_val"),
        min(col(valueCol).cast(DecimalType(18, 2))).as("min_val"),
        max(col(valueCol).cast(DecimalType(18, 2))).as("max_val"))

  /** Post-maintenance rows for every group the feed touched, min/max
    * included. Groups with ONLY inserts fold incrementally (count/sum
    * deltas; min/max tighten via least/greatest). Groups with any
    * delete or update-preimage row re-derive from the CURRENT base
    * restricted to exactly those groups (a deleted extremum cannot be
    * maintained from the summary — the next-best value lives only in
    * the base). Eagerly checkpointed like [[mergedDelta]]: the plan
    * reads both the summary's and the base's live directories and the
    * mutation rewrites the summary out from under a lazy plan. */
  private def mergedMinMaxDelta(store: TableStore, base: String, summary: String,
      groupCols: Seq[String], valueCol: String, fromGen: Int, toGen: Int,
      derive: Seq[(String, String)] = Nil): DataFrame = {
    val ch = derivedView(store.readChanges(base, fromGen, toGen), derive)
    val sign = when(col("_change_type").isin("insert", "update_postimage"), lit(1L))
      .otherwise(lit(-1L))
    val guard = coalesce(assert_true(
      groupCols.map(col(_).isNotNull).reduce(_ && _),
      lit(s"incremental aggregate: NULL group value in change feed of '$base' — " +
        "group columns are summary PK columns and must be non-null")).cast("long"), lit(0L))
    val v = col(valueCol).cast(DecimalType(18, 2))
    // r16: one eager delta materialization for the three branches (see
    // mergedDistinctDelta)
    val delta = ch.groupBy(groupCols.map(col): _*)
      .agg((sum(sign) + first(guard)).as("__dn"),
        sum(when(col(valueCol).isNotNull, sign).otherwise(0L)).as("__dnn"),
        sum(sign * v).as("__dsum"),
        min(when(sign === 1L, v)).as("__imin"),
        max(when(sign === 1L, v)).as("__imax"),
        sum(when(sign === -1L, 1L).otherwise(0L)).as("__dels"))
      .localCheckpoint(true)
    val cur = store.readTable(summary)
    val grown = delta.filter(col("__dels") === 0L)
    val nRows = coalesce(cur("n_rows"), lit(0L)) + col("__dn")
    val negGuard = coalesce(assert_true(nRows >= 0,
      lit(s"incremental aggregate: negative row count maintaining '$summary' from " +
        s"the change feed of '$base' — feed and summary are inconsistent")).cast("long"),
      lit(0L))
    val dec = DecimalType(18, 2)
    val grownRows = grown.join(cur,
        groupCols.map(c => grown(c) <=> cur(c)).reduce(_ && _), "left")
      .select(groupCols.map(grown(_)) :+
        (nRows + negGuard).as("n_rows") :+
        (coalesce(cur("nn_val"), lit(0L)) + col("__dnn")).as("nn_val") :+
        (coalesce(cur("sum_val"), lit(0).cast(dec)) + col("__dsum")).cast(dec).as("sum_val") :+
        // least/greatest skip nulls (null only when BOTH sides are) —
        // exactly the tighten-or-keep semantics growth needs
        least(cur("min_val"), col("__imin")).cast(dec).as("min_val") :+
        greatest(cur("max_val"), col("__imax")).cast(dec).as("max_val"): _*)
    // groups the feed deleted from: re-derive from the base PINNED AT
    // toGen (the fold's watermark target — reading the live table would
    // leak a concurrent base writer's newer rows past the watermark and
    // double-apply them on the next fold), restricted to exactly those
    // groups (semi-join — prunes on a bucketed/clustered base); a group
    // with no surviving rows emits NO rescan row and must die — recover
    // it from the delta side
    val touched = delta.filter(col("__dels") > 0L).select(groupCols.map(col): _*)
    // r16: materialized once — union + dead anti-join share one base scan
    val rescan = summarizeMinMax(
      derivedView(store.readTableAt(base, toGen), derive)
        .join(touched, groupCols, "left_semi"),
      groupCols, valueCol)
      .localCheckpoint(true)
    val dead = touched.join(rescan.select(groupCols.map(col): _*), groupCols, "left_anti")
      .select(groupCols.map(col) :+ lit(0L).as("n_rows") :+ lit(0L).as("nn_val") :+
        lit(null).cast(dec).as("sum_val") :+ lit(null).cast(dec).as("min_val") :+
        lit(null).cast(dec).as("max_val"): _*)
    grownRows.unionByName(rescan).unionByName(dead)
      .withColumn("__dead", col("n_rows") === 0L)
      .localCheckpoint(true)
  }

  /** [[maintainToCurrent]] for a [[summarizeMinMax]] summary — same
    * durable watermark/intent protocol, min/max-aware fold. */
  def maintainMinMaxToCurrent(store: TableStore, base: String, summary: String,
      groupCols: Seq[String], valueCol: String,
      derive: Seq[(String, String)] = Nil): Unit =
    maintainProtocol(store, base, summary) { (applied, cur) =>
      val merged = mergedMinMaxDelta(store, base, summary, groupCols, valueCol, applied, cur, derive)
      if (merged.isEmpty) None
      else Some(() => store.applyChanges(summary, merged, "__dead", groupCols))
    }
}
