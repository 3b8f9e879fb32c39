package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, TimestampNTZType}

import graft.errors

/** Keyed mutation of a target relation from a source relation — the
  * Spark-native re-expression of the reference's write surface:
  * `write.update` (mssql_dataframe/core/write/update.py:14),
  * `write.merge` incl. `upsert` and `delete_requires`
  * (mssql_dataframe/core/write/merge.py:13, :27-39, :46).
  *
  * The reference issues a T-SQL MERGE against a server; here every
  * mutation is ONE keyed join producing the new target relation:
  *
  *  - `update`:  left join target ← source; matched rows take source
  *    values for the source's non-key columns.
  *  - `merge`:   full-outer join; matched → update, source-only →
  *    insert, target-only → delete (guarded by `deleteRequires`,
  *    suppressed entirely by `upsert`).
  *
  * Scale design (SURVEY §5): the source is typically ≪ target — AQE
  * broadcasts it at runtime (no hard hint, so a huge source is still
  * free to shuffle); merge needs full-outer, which Spark executes as a
  * shuffle join — with AQE handling skew. No collect(), no driver
  * loops: the output is a plan,
  * and the caller (TableStore) controls materialization, where a
  * lakehouse-style store would rewrite only the files whose key range
  * intersects the source keys.
  *
  * Metadata timestamps mirror `include_metadata_timestamps`
  * (package.py:68-118): `_time_update` set on updated rows,
  * `_time_insert` on inserted rows, both from an injected clock column
  * for determinism (the reference uses GETDATE()).
  */
object Mutations {

  val TimeInsert = "_time_insert"
  val TimeUpdate = "_time_update"
  val ValidFrom = "_valid_from"
  val ValidTo = "_valid_to"

  private def srcAlias(c: String) = s"__src_$c"

  /** Marker carried by the in-plan duplicate-source-key assert —
    * [[graft.store.TableStore]] translates any failure whose cause
    * chain contains it into the named [[errors.DuplicateSourceKey]]. */
  val DupKeyMsg = "duplicate key in mutation source"

  /** Marker for the NULL-key collision case: GROUP BY treats NULLs as
    * equal, so several all-null-key source rows land in ONE group —
    * but they are not duplicates under the `===` match contract (a
    * null key matches nothing), they are a null-PK contract violation.
    * [[graft.store.TableStore]] translates this marker into the same
    * NOT-NULL error the insert path raises, not DuplicateSourceKey. */
  val NullKeyMsg = "NULL match key in mutation source"
  private val DupGuardCol = "__dup_guard"

  /** The reference's T-SQL MERGE raises when several source rows match
    * one target row ("attempted to UPDATE or DELETE the same row more
    * than once"); the full-outer-join algebra here would instead emit
    * one output row per source duplicate — the table GROWS and the PK
    * uniqueness the store promises is silently gone. So every keyed
    * mutation GROUPS the renamed source by its match key with an
    * in-plan count assert riding ([[rideGuard]] folds it into an
    * output column so pruning cannot elide it): a duplicate key throws
    * before any row lands; a clean source passes through one row per
    * key (`first` over a group the assert proves is a singleton).
    * Shape chosen for scale: a hash aggregate, not a window — no sort,
    * map-side partial combine, and the aggregate's key exchange is the
    * SAME partitioning the keyed join needs, so EnsureRequirements
    * reuses it instead of shuffling the source twice. */
  /** NULL-key policy alongside the dup guard. `nullKeys = "raise"` for
    * the INSERT-CAPABLE mutations (merge/upsert/applyChanges/scd2): a
    * null-key source row can never match, so it would become an insert
    * with a NULL key — a PK-contract violation reported as
    * [[NullKeyMsg]] whether or not the row is duplicated. `"ignore"`
    * for update: SQL UPDATE ... FROM semantics — a null key matches
    * nothing and the row is a no-op, DROPPED EXPLICITLY here because
    * relying on the guard for the collision case is plan-dependent
    * (the left join lets the optimizer infer isnotnull on the source
    * key and prune the rows below the aggregate, so the assert may
    * never see them). */
  private def withDupGuard(s: DataFrame, matchCols: Seq[String], op: String,
      nullKeys: String): DataFrame = {
    val keyCols = matchCols.map(c => col(srcAlias(c)))
    val payload = s.columns.filterNot(matchCols.map(srcAlias).contains)
    val anyNullKey = keyCols.map(_.isNull).reduce(_ || _)
    val s0 = if (nullKeys == "ignore") s.filter(!anyNullKey) else s
    // key columns are GROUPING columns, so they are directly
    // referencable inside the aggregate list (anyNullKey below)
    val cond =
      if (nullKeys == "raise") !anyNullKey && count(lit(1)) <= 1L
      else count(lit(1)) <= 1L
    val guard = assert_true(cond,
      when(anyNullKey,
        lit(s"$op: $NullKeyMsg — a source row carries a NULL " +
          s"(${matchCols.mkString(", ")}) key; a null key can never match a " +
          "target row, so it would insert a NULL key — match-key columns are " +
          "non-null by the PK contract."))
        .otherwise(
          lit(s"$op: $DupKeyMsg — several source rows carry the same " +
            s"(${matchCols.mkString(", ")}) key; the reference MERGE raises when " +
            "multiple source rows match one target row. Pre-aggregate the source " +
            "to one row per key.")))
    s0.groupBy(keyCols: _*).agg(guard.as(DupGuardCol),
      payload.map(c => first(col(graft.Identifiers.quote(c))).as(c)): _*)
  }

  /** Fold the dup guard into an output expression: the guard is null on
    * success, so `coalesce(guard, e)` ≡ `e` — but the guard column now
    * rides a REAL output column and pruning cannot drop the assert. */
  private def rideGuard(e: Column, dt: DataType): Column =
    coalesce(col(DupGuardCol).cast(dt), e)

  private def requireCols(df: DataFrame, cols: Seq[String], what: String): Unit = {
    val missing = cols.filterNot(df.columns.contains)
    if (missing.nonEmpty) throw errors.DataFrameColumnDoesNotExist(missing.map(c => s"$what.$c"))
  }

  /** Ensure `df` has a nullable timestamp column `name` (the reference
    * auto-creates metadata-timestamp columns on first use,
    * core/write/_exceptions.py:16-50). */
  // Time columns are always TIMESTAMP_NTZ (datetime2): one consistent
  // parquet physical type across insert/update/merge paths — a mixed
  // LTZ/NTZ footer set makes mergeSchema reads fail on tables whose
  // pruned rewrites leave older files in place.
  private def ensureTimeCol(df: DataFrame, name: String): DataFrame =
    if (df.columns.contains(name)) df
    else df.withColumn(name, lit(null).cast(TimestampNTZType))

  /** Update matched rows of `target` from `source`.
    *
    * Updated columns = source columns minus `matchCols`. Unmatched
    * target rows are unchanged; source rows with no match are ignored
    * (same as SQL UPDATE ... FROM) — EXCEPT that duplicate source keys
    * raise [[DupKeyMsg]] regardless of whether they match any target
    * row (the guard is a contract check on the source relation itself,
    * stricter than the reference MERGE's multi-MATCH error by design:
    * a source carrying duplicate keys is malformed whether or not the
    * duplicates happen to match today). NULL-key source rows are
    * dropped (a null key matches nothing — the "no match" case above),
    * unlike the insert-capable mutations, where a null-key row would
    * become a NULL-PK insert and raises [[NullKeyMsg]]. Result schema
    * = target schema (+ `_time_update` when `timeUpdate` is set).
    */
  def update(
      target: DataFrame,
      source: DataFrame,
      matchCols: Seq[String],
      timeUpdate: Option[Column] = None): DataFrame = {
    requireCols(target, matchCols, "target")
    requireCols(source, matchCols, "source")
    val updateCols = source.columns.filterNot(matchCols.contains).toSeq
    requireCols(target, updateCols, "target")

    val t0 = if (timeUpdate.isDefined) ensureTimeCol(target, TimeUpdate) else target
    val s = withDupGuard(
      source.columns.foldLeft(source)((d, c) => d.withColumnRenamed(c, srcAlias(c))),
      matchCols, "update", nullKeys = "ignore").withColumn("__matched", lit(true))
    // no broadcast hint: the source is USUALLY small (AQE broadcasts it
    // then), but an update fed by another 100 TB relation must be free
    // to shuffle — a forced broadcast would OOM the driver
    val joined = t0.join(
      s,
      matchCols.map(c => t0(c) === s(srcAlias(c))).reduce(_ && _),
      "left")

    val outCols = t0.columns.map { c =>
      val dt = t0.schema(c).dataType
      val base =
        if (updateCols.contains(c))
          when(col("__matched"), col(srcAlias(c)).cast(dt)).otherwise(t0(c))
        else if (c == TimeUpdate && timeUpdate.isDefined)
          when(col("__matched"), timeUpdate.get.cast(dt)).otherwise(t0(c))
        else t0(c)
      (if (c == matchCols.head) rideGuard(base, dt) else base).as(c)
    }
    val result = joined.select(outCols.toIndexedSeq: _*)
    // an EMPTY target lets empty-relation propagation delete the whole
    // left join — source side, dup guard and all — so duplicates in
    // the source would silently pass exactly once (found by the r13
    // MutationsProps run: shrunk to target = Map()). Append a branch
    // that is provably empty ON SUCCESS but forces the guard aggregate
    // to evaluate in every plan: the guard column is null unless the
    // assert throws, and the filter's predicate is non-foldable, so
    // the optimizer can neither drop the aggregate nor prove the
    // branch empty. The branch projects the SOURCE columns (its rows
    // are never observed — empty on success, thrown past on failure)
    // so column pruning leaves the aggregate subtree IDENTICAL to the
    // join's source side and exchange/stage reuse keeps it ONE source
    // shuffle (plan-audited); null-projecting here pruned the payload
    // and broke the reuse.
    val srcCols = s.columns.toSet
    val keeper = s.filter(col(DupGuardCol).isNotNull)
      .select(t0.columns.map { c =>
        val dt = t0.schema(c).dataType
        (if (srcCols.contains(srcAlias(c))) col(srcAlias(c)).cast(dt)
         else lit(null).cast(dt)).as(c)
      }.toIndexedSeq: _*)
    result.unionByName(keeper)
  }

  /** Keyed delete: drop target rows whose match-key values appear in
    * `source` — the CDC-apply primitive. The reference expresses
    * deletes only through full MERGE (WHEN NOT MATCHED BY SOURCE,
    * merge.py:27), which scans the whole target; a standalone keyed
    * delete is the shape a bucketed store can prune. One anti join;
    * null keys never match (same `===` semantics as update/merge), so
    * null-key rows are never deleted. */
  def delete(target: DataFrame, source: DataFrame, matchCols: Seq[String]): DataFrame = {
    requireCols(target, matchCols, "target")
    requireCols(source, matchCols, "source")
    val s = matchCols.foldLeft(source.select(matchCols.map(source(_)).toIndexedSeq: _*))(
      (d, c) => d.withColumnRenamed(c, srcAlias(c)))
    target.join(s,
      matchCols.map(c => target(c) === s(srcAlias(c))).reduce(_ && _),
      "left_anti")
  }

  /** Upsert: update matched, insert unmatched — merge with deletes off
    * (reference merge.py:46 `upsert=True`). */
  def upsert(
      target: DataFrame,
      source: DataFrame,
      matchCols: Seq[String],
      timeInsert: Option[Column] = None,
      timeUpdate: Option[Column] = None): DataFrame =
    merge(target, source, matchCols, upsertOnly = true, Seq.empty, timeInsert, timeUpdate)

  /** Full merge: update matched, insert source-only, delete target-only
    * (unless `upsertOnly`), with `deleteRequires` restricting deletes to
    * rows whose guard-column values appear in the source
    * (reference merge.py:27-39: `WHEN NOT MATCHED BY SOURCE AND
    * _target.g IN (SELECT g FROM source) THEN DELETE`).
    */
  def merge(
      target: DataFrame,
      source: DataFrame,
      matchCols: Seq[String],
      upsertOnly: Boolean = false,
      deleteRequires: Seq[String] = Seq.empty,
      timeInsert: Option[Column] = None,
      timeUpdate: Option[Column] = None): DataFrame = {
    if (upsertOnly && deleteRequires.nonEmpty)
      throw new IllegalArgumentException("deleteRequires can only be specified if upsertOnly=false")
    requireCols(target, matchCols, "target")
    requireCols(source, matchCols, "source")
    val updateCols = source.columns.filterNot(matchCols.contains).toSeq
    requireCols(target, updateCols, "target")
    requireCols(source, deleteRequires, "source")

    var t0 = target
    if (timeInsert.isDefined) t0 = ensureTimeCol(t0, TimeInsert)
    if (timeUpdate.isDefined) t0 = ensureTimeCol(t0, TimeUpdate)

    val s = withDupGuard(
      source.columns.foldLeft(source)((d, c) => d.withColumnRenamed(c, srcAlias(c))),
      matchCols, if (upsertOnly) "upsert" else "merge",
      nullKeys = "raise").withColumn("__s", lit(true))
    val joinCond = matchCols.map(c => t0(c) === s(srcAlias(c))).reduce(_ && _)
    var j = t0.withColumn("__t", lit(true)).join(s, joinCond, "full_outer")

    // deleteRequires guard: target-only rows are deletable only if every
    // guard column's value occurs in the source. One broadcast semi-ish
    // join per guard column against the source's distinct guard values.
    var guardAll: Column = lit(true)
    deleteRequires.zipWithIndex.foreach { case (g, i) =>
      val flag = s"__guard_$i"
      val vals = source.select(col(g).as(s"__gv_$i")).distinct()
        .withColumn(flag, lit(true))
      j = j.join(broadcast(vals), j(g) === vals(s"__gv_$i"), "left")
      guardAll = guardAll && col(flag).isNotNull
    }

    val matched = col("__t").isNotNull && col("__s").isNotNull
    val insertOnly = col("__t").isNull
    val targetOnly = col("__s").isNull
    val deletable = if (upsertOnly) lit(false) else guardAll

    val kept = j.filter(matched || insertOnly || (targetOnly && !deletable))

    val outCols = t0.columns.map { c =>
      val dt = t0.schema(c).dataType
      val base =
        if (matchCols.contains(c))
          when(insertOnly, col(srcAlias(c)).cast(dt)).otherwise(t0(c))
        else if (updateCols.contains(c))
          when(matched || insertOnly, col(srcAlias(c)).cast(dt)).otherwise(t0(c))
        else if (c == TimeInsert && timeInsert.isDefined)
          when(insertOnly, timeInsert.get.cast(dt)).otherwise(t0(c))
        else if (c == TimeUpdate && timeUpdate.isDefined)
          when(matched, timeUpdate.get.cast(dt)).otherwise(t0(c))
        else t0(c) // target-only column: null for inserted rows
      (if (c == matchCols.head) rideGuard(base, dt) else base).as(c)
    }
    kept.select(outCols.toIndexedSeq: _*)
  }

  /** CDC-apply: upsert and delete in ONE keyed join — the primitive a
    * change-feed consumer needs to fold a batch of per-key verdicts
    * ("new value" vs "gone") into a table as a single relation. Source
    * rows whose boolean `deleteCol` is false upsert (update matched,
    * insert unmatched); rows with it true delete their matched target
    * row (an absent key is a no-op). This is merge()'s full-outer
    * algebra with the delete verdict carried PER ROW by the source
    * instead of inferred from target-side absence — so a row the
    * source does not mention is always kept, which is what makes it a
    * keyed (bucket-prunable) mutation rather than a full-table merge. */
  def applyChanges(
      target: DataFrame,
      source: DataFrame,
      matchCols: Seq[String],
      deleteCol: String,
      timeInsert: Option[Column] = None,
      timeUpdate: Option[Column] = None): DataFrame = {
    requireCols(target, matchCols, "target")
    requireCols(source, matchCols :+ deleteCol, "source")
    val updateCols =
      source.columns.filterNot(c => matchCols.contains(c) || c == deleteCol).toSeq
    requireCols(target, updateCols, "target")

    var t0 = target
    if (timeInsert.isDefined) t0 = ensureTimeCol(t0, TimeInsert)
    if (timeUpdate.isDefined) t0 = ensureTimeCol(t0, TimeUpdate)

    val s = withDupGuard(
      source.columns.foldLeft(source)((d, c) => d.withColumnRenamed(c, srcAlias(c))),
      matchCols, "applyChanges", nullKeys = "raise").withColumn("__s", lit(true))
    val joinCond = matchCols.map(c => t0(c) === s(srcAlias(c))).reduce(_ && _)
    val j = t0.withColumn("__t", lit(true)).join(s, joinCond, "full_outer")

    val del = coalesce(col(srcAlias(deleteCol)).cast("boolean"), lit(false))
    val matched = col("__t").isNotNull && col("__s").isNotNull
    val insertOnly = col("__t").isNull
    val targetOnly = col("__s").isNull
    val kept = j.filter(targetOnly || ((matched || insertOnly) && !del))

    val outCols = t0.columns.map { c =>
      val dt = t0.schema(c).dataType
      val base =
        if (matchCols.contains(c))
          when(insertOnly, col(srcAlias(c)).cast(dt)).otherwise(t0(c))
        else if (updateCols.contains(c))
          when(matched || insertOnly, col(srcAlias(c)).cast(dt)).otherwise(t0(c))
        else if (c == TimeInsert && timeInsert.isDefined)
          when(insertOnly, timeInsert.get.cast(dt)).otherwise(t0(c))
        else if (c == TimeUpdate && timeUpdate.isDefined)
          when(matched, timeUpdate.get.cast(dt)).otherwise(t0(c))
        else t0(c)
      (if (c == matchCols.head) rideGuard(base, dt) else base).as(c)
    }
    kept.select(outCols.toIndexedSeq: _*)
  }

  /** Type-2 slowly-changing-dimension upsert — the warehouse history
    * merge a reference user hand-writes as a multi-statement T-SQL
    * transaction. The target carries `_valid_from`/`_valid_to`; rows
    * with null `_valid_to` are CURRENT. Per source row:
    *
    *  - matched current row, tracked values DIFFER → close the old
    *    version (`_valid_to` = clock) AND insert the new one
    *    (`_valid_from` = clock, `_valid_to` null)
    *  - matched current row, values identical → no-op (idempotent:
    *    replaying a source never grows history)
    *  - no current match → insert a new current version
    *
    * History rows pass through untouched. ONE full-outer keyed join
    * against the current slice decides everything; the 1→2 row emission
    * for changed keys happens in the SAME pass via an
    * explode(array_compact(...)) of conditional whole-row structs — no
    * second join, no second shuffle, so the operator costs exactly what
    * the plain merge costs. Null-safe (<=>) change detection. */
  def scd2Upsert(
      target: DataFrame,
      source: DataFrame,
      matchCols: Seq[String],
      clock: Column): DataFrame = {
    requireCols(target, matchCols ++ Seq(ValidFrom, ValidTo), "target")
    requireCols(source, matchCols, "source")
    // validity columns are ENGINE-owned: a source carrying them would be
    // silently compared as "tracked" values and corrupt the chains
    Seq(ValidFrom, ValidTo).filter(source.columns.contains).foreach(c =>
      throw new IllegalArgumentException(
        s"scd2: source must not carry the engine-managed column $c"))
    val tracked = source.columns.filterNot(matchCols.contains).toSeq
    requireCols(target, tracked, "target")

    val history = target.filter(col(ValidTo).isNotNull)
    val current = target.filter(col(ValidTo).isNull)
    val s = withDupGuard(
      source.columns.foldLeft(source)((d, c) => d.withColumnRenamed(c, srcAlias(c))),
      matchCols, "scd2", nullKeys = "raise").withColumn("__s", lit(true))
    val j = current.withColumn("__t", lit(true))
      .join(s, matchCols.map(c => current(c) === s(srcAlias(c))).reduce(_ && _), "full_outer")

    val matched = col("__t").isNotNull && col("__s").isNotNull
    val insertOnly = col("__t").isNull
    val targetOnly = col("__s").isNull
    val changed = matched && tracked
      .map(c => !(col(srcAlias(c)).cast(current.schema(c).dataType) <=> current(c)))
      .foldLeft(lit(false))(_ || _)

    def dt(c: String) = current.schema(c).dataType
    def asRow(value: String => Column): Column =
      struct(target.columns.toIndexedSeq.map(c => value(c).as(c)): _*)
    val keepRow = asRow(c => current(c))
    val closedRow = asRow {
      case ValidTo => clock.cast(dt(ValidTo))
      case c       => current(c)
    }
    val newRow = asRow {
      case ValidFrom                      => clock.cast(dt(ValidFrom))
      case ValidTo                        => lit(null).cast(dt(ValidTo))
      case c if matchCols.contains(c)     => coalesce(col(srcAlias(c)).cast(dt(c)), current(c))
      case c if tracked.contains(c)       => col(srcAlias(c)).cast(dt(c))
      case c                              => current(c) // untracked extras: carried, null on insert
    }
    val emitted = j.select(col(DupGuardCol), explode(array_compact(array(
        when(matched && !changed || targetOnly, keepRow),
        when(changed, closedRow),
        when(changed || insertOnly, newRow)))).as("__r"))
      .select(target.columns.toIndexedSeq.map { c =>
        val e = col("__r." + graft.Identifiers.quote(c))
        (if (c == matchCols.head) rideGuard(e, dt(c)) else e).as(c)
      }: _*)
    history.unionByName(emitted)
  }

  /** Insert-all append algebra (reference write.insert, insert.py:38):
    * source columns aligned to the target schema by name, missing
    * columns null-filled, `_time_insert` stamped when requested. */
  def insertAll(
      target: DataFrame,
      source: DataFrame,
      timeInsert: Option[Column] = None): DataFrame = {
    val t0 = if (timeInsert.isDefined) ensureTimeCol(target, TimeInsert) else target
    val aligned = t0.columns.map { c =>
      val dt = t0.schema(c).dataType
      if (source.columns.contains(c)) source(c).cast(dt).as(c)
      else if (c == TimeInsert && timeInsert.isDefined) timeInsert.get.cast(dt).as(c)
      else lit(null).cast(dt).as(c)
    }
    t0.unionByName(source.select(aligned.toIndexedSeq: _*))
  }
}
