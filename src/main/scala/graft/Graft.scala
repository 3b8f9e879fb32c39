package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.current_timestamp

import graft.store.TableStore

/** The user-facing entry point, shaped like the reference's `SQLServer`
  * object (mssql_dataframe/package.py:20-118): one session value with
  * `create` / `modify` / `read` / `write` accessors and a session-level
  * `includeMetadataTimestamps` default, so a user of the reference maps
  * their workflow 1:1:
  *
  * {{{
  * val sql = Graft(spark, "/data/warehouse", includeMetadataTimestamps = true)
  * sql.create.table("t", Seq("k" -> "bigint", "v" -> "varchar(10)"), primaryKey = Seq("k"))
  * sql.write.insert("t", df)
  * sql.write.merge("t", changes, upsert = true)
  * val out = sql.read.table("t", columns = Seq("v"), where = Some("k > 5"))
  * }}}
  *
  * The "connection" is a SparkSession + a storage root; the "server
  * clock" the reference reads via GETDATE() is `current_timestamp()`
  * unless a deterministic clock is injected (tests, reproducible runs).
  */
final case class Graft(
    spark: SparkSession,
    root: String,
    includeMetadataTimestamps: Boolean = false,
    clock: () => Column = () => current_timestamp(),
    audit: String => Unit = TableStore.defaultAudit) {

  private val store = new TableStore(spark, root, audit)

  private def ti: Option[Column] = if (includeMetadataTimestamps) Some(clock()) else None
  private def tu: Option[Column] = if (includeMetadataTimestamps) Some(clock()) else None

  /** Reference `create` namespace (core/create.py). */
  object create {
    def table(
        name: String,
        columns: Seq[(String, String)],
        primaryKey: Seq[String] = Seq.empty,
        buckets: Int = 0,
        sqlPrimaryKey: Boolean = false): Unit =
      store.createTable(name, columns, primaryKey, buckets, sqlPrimaryKey)

    def tableFromDataFrame(
        name: String,
        df: DataFrame,
        primaryKey: Seq[String] = Seq.empty,
        infer: Boolean = true): Unit =
      store.createTableFromDataFrame(name, df, primaryKey, infer)
  }

  /** Reference `modify` namespace (core/modify.py). */
  object modify {
    def addColumn(name: String, column: String, dataType: String): Unit =
      store.addColumn(name, column, dataType)
    def alterColumn(name: String, column: String, dataType: String,
        isNullable: Boolean = true): Unit =
      store.alterColumn(name, column, dataType, isNullable)
    def dropColumn(name: String, column: String): Unit =
      store.dropColumn(name, column)
    def primaryKey(name: String, columns: Seq[String]): Unit =
      store.setPrimaryKey(name, columns)

    /** CHECK constraints (C30) — the remaining server-side constraint
      * class (PK/NOT NULL/types are C5/C4/C14). The predicate uses the
      * `dynamic.where` grammar; existing data is validated on add. */
    def checkConstraint(name: String, constraint: String, expression: String): Unit =
      store.addCheckConstraint(name, constraint, expression)
    def dropCheckConstraint(name: String, constraint: String): Unit =
      store.dropCheckConstraint(name, constraint)
  }

  /** Reference `read` namespace (core/read.py). */
  object read {
    def table(
        name: String,
        columns: Seq[String] = Seq.empty,
        where: Option[String] = None,
        limit: Option[Int] = None,
        orderBy: Seq[String] = Seq.empty,
        orderDesc: Boolean = false,
        asOf: Option[Int] = None): DataFrame =
      store.readTable(name, columns, where, limit, orderBy, orderDesc, asOf)

    /** Snapshot (time-travel) reads — the table as of a committed
      * generation or wall-clock instant; see TableStore's snapshot
      * section. Beyond the reference (a server table has no history),
      * closing the mutation story's concurrent-reader gap. */
    def tableAt(name: String, gen: Int): DataFrame = store.readTableAt(name, gen)
    def tableAsOf(name: String, tsMillis: Long): DataFrame = store.readTableAsOf(name, tsMillis)
    def snapshots(name: String): Seq[(Int, Long)] = store.snapshots(name)

    /** Generation history as a relation (C38) — metadata-only audit of
      * the table's write traffic; see TableStore.history. */
    def history(name: String): DataFrame = store.history(name)

    /** Change-data-feed between two committed generations (`insert` /
      * `delete` / `update_preimage` / `update_postimage` rows in a
      * `_change_type` column) — computed on demand from the manifests'
      * file diff, O(changed files); see TableStore.readChanges. */
    def changes(name: String, fromGen: Int, toGen: Int): DataFrame =
      store.readChanges(name, fromGen, toGen)

    /** Metadata-only `COUNT(*)` from the stats sidecar (analyzed files
      * cost zero I/O; un-analyzed appends are counted with one scan over
      * just those files) — see TableStore.countRows. */
    def count(name: String): Long = store.countRows(name)
  }

  object export {
    /** C37: hand a managed table off as a hive-partitioned parquet tree
      * (C36's layout) through the GOVERNED read path — the committed
      * manifest file set and rendered schema, optionally pinned to a
      * snapshot generation, so the export is a point-in-time artifact
      * (a mutation racing the export cannot produce a mixed tree) and
      * reproducible: re-exporting the same generation yields the same
      * rows. The store's PK-hash buckets serve keyed mutation; this
      * re-lays the same data out for downstream scan-with-predicate
      * consumers — the two layouts each doing the job the other can't. */
    def partitioned(name: String, path: String, partitionBy: Seq[String],
        asOf: Option[Int] = None): Unit =
      graft.sources.ParquetLayout.exportPartitioned(
        asOf.map(g => store.readTableAt(name, g)).getOrElse(store.readTable(name)),
        path, partitionBy)
  }

  /** Run arbitrary Spark SQL over managed tables (C34) — the declarative
    * half of the reference workflow: its users write T-SQL against
    * server tables and pull frames back; here the named tables resolve
    * through the SAME governed read path as `read.table` (schema
    * rendering, file manifests, pruning inputs), registered as session
    * views, and the full Spark SQL surface (joins, windows, CTEs) runs
    * distributed over them. Views are snapshots of the CURRENT
    * generation at call time — a concurrent mutation doesn't shift an
    * in-flight query (the C23 reader contract). */
  def sql(query: String, tables: Seq[String] = Seq.empty,
      asOf: Map[String, Int] = Map.empty): DataFrame = {
    val names = if (tables.nonEmpty) tables else store.tableNames()
    names.foreach { n =>
      // asOf pins a table to a committed generation — SQL over history
      // (C23 × C34): audit queries, before/after diffs, reproducible
      // reports against a fixed snapshot
      val df = asOf.get(n).map(store.readTableAt(n, _)).getOrElse(store.readTable(n))
      df.createOrReplaceTempView(n)
    }
    spark.sql(query)
  }

  /** Reference `write` namespace (core/write). */
  object write {
    def insert(name: String, df: DataFrame, autoAdjust: Boolean = false): Unit =
      store.insert(name, df, autoAdjust, ti)

    def update(name: String, df: DataFrame, matchColumns: Seq[String] = Seq.empty): Unit =
      store.update(name, df, matchColumns, tu)

    def merge(
        name: String,
        df: DataFrame,
        matchColumns: Seq[String] = Seq.empty,
        upsert: Boolean = false,
        deleteRequires: Seq[String] = Seq.empty): Unit =
      if (upsert) {
        require(deleteRequires.isEmpty, "delete_requires can only be specified if upsert=false")
        store.upsert(name, df, matchColumns, ti, tu)
      } else store.merge(name, df, matchColumns, deleteRequires, ti, tu)

    /** Keyed delete — the CDC-apply primitive (beyond the reference,
      * which deletes only through full MERGE); bucket-pruned like
      * update/upsert. */
    def delete(name: String, df: DataFrame, matchColumns: Seq[String] = Seq.empty): Unit =
      store.delete(name, df, matchColumns)

    /** Type-2 SCD history merge (beyond the reference's MERGE — the
      * hand-written history transaction, as one operator). */
    def scd2(name: String, df: DataFrame, matchColumns: Seq[String] = Seq.empty): Unit =
      store.scd2(name, df, matchColumns, clock())
  }

  /** Table maintenance (beyond the reference; the DBA-side jobs its
    * users run as server tasks): compaction, statistics, clustering. */
  object maintenance {
    def compact(name: String, rowsPerFile: Long = 1000000L): Unit =
      store.compact(name, rowsPerFile)
    def analyze(name: String, columns: Seq[String] = Seq.empty,
        incremental: Boolean = false, bloomBits: Int = 0,
        bloomHashes: Int = 6): Unit =
      store.analyze(name, columns, incremental, bloomBits, bloomHashes)
    def cluster(name: String, columns: Seq[String], filesTarget: Int = 0): Unit =
      store.cluster(name, columns, filesTarget)
    /** Drop snapshot history older than the last `keepLast` generations. */
    /** Vacuum dry-run (C40) — what a vacuum at this retention would
      * free, per retired generation tree; see TableStore.vacuumDryRun. */
    def vacuumDryRun(name: String, keepLast: Int = 1): DataFrame =
      store.vacuumDryRun(name, keepLast)

    def vacuum(name: String, keepLast: Int = 1): Unit =
      store.vacuum(name, keepLast)
    /** Roll the table back to snapshot `gen` (data + schema) as a NEW
      * generation — metadata-only renames, no data copied. */
    def restore(name: String, gen: Int): Unit = store.restore(name, gen)
    /** Post-crash recovery: re-list and commit a fresh manifest (run
      * after clearing a dead APPEND writer's commit lock). */
    def repair(name: String): Unit = store.repair(name)
    /** Change the PK-hash bucket count (0 = flat) — one staged rewrite;
      * older snapshots keep pruning under their own layout. */
    def rebucket(name: String, buckets: Int): Unit = store.rebucket(name, buckets)
    /** File counts each skip layer leaves for a WHERE (metadata-only) —
      * the "will this read be fast" probe; see TableStore.explainPruning. */
    /** CDF-driven incremental mirror sync (C39) — rewrite only the
      * partitions the change feed touched; see ParquetLayout.syncMirror. */
    def syncMirror(name: String, mirrorPath: String, partitionBy: String,
        fromGen: Int, toGen: Int): Seq[String] =
      graft.sources.ParquetLayout.syncMirror(store, name, mirrorPath,
        partitionBy, fromGen, toGen)

    def explainPruning(name: String, where: String): Map[String, Long] =
      store.explainPruning(name, where)
  }

  /** Reference `get_schema` (package.py:105). */
  def getSchema(name: String): DataFrame = store.describe(name)

  /** Reference `log_init` (package.py:85): engine/runtime versions for
    * debugging, emitted through the same audit channel as DDL — the
    * "what was I even running" line every support thread starts with. */
  def logInit(): Map[String, String] = {
    val info = Map(
      "spark" -> spark.version,
      "scala" -> scala.util.Properties.versionNumberString,
      "java" -> sys.props("java.version"))
    audit("version info: " +
      info.toSeq.sortBy(_._1).map { case (k, v) => s"$k=$v" }.mkString(", "))
    info
  }

  /** PK-duplicate diagnostics (enforced by the server in the reference). */
  def primaryKeyViolations(name: String): DataFrame = store.primaryKeyViolations(name)

  /** Pre-flight audit for a PROPOSED check constraint: the rows that
    * would refuse `modify.checkConstraint` (C30). */
  def checkViolations(name: String, expression: String): DataFrame =
    store.checkViolations(name, expression)

  /** See [[Graft.clearOperatorCaches]]; instance alias for discoverability. */
  def clearOperatorCaches(): Unit = Graft.clearOperatorCaches()
}

object Graft {
  /** Release every intermediate the graft OPERATORS persisted (dedup
    * shingle relations, clustering edge sets, contamination indexes…)
    * without touching caches the user created in the same session —
    * unlike `spark.catalog.clearCache()`, which drops both. Operators
    * return lazy plans and so cannot unpersist their own intermediates;
    * the driver surfaces (Bench, Verify) call this between queries, and
    * a long-lived session calls it at batch boundaries instead of
    * relying on LRU eviction. See [[OperatorCache]]. */
  def clearOperatorCaches(): Unit = OperatorCache.clear()
}
