package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Hive-style partitioned parquet layout (SURVEY §2 C36) — the handoff
  * surface between the engine and everything downstream of it
  * (trainers, other query engines, the next pipeline): data laid out as
  * `col=value/` directory trees, the one layout every parquet reader
  * prunes natively.
  *
  * The managed store (TableStore) deliberately buckets by PK hash —
  * that layout serves keyed mutation. This one serves SCAN-WITH-
  * PREDICATE consumers: a reader filtering on the partition column
  * touches only the matching directories — directory-level pruning
  * BEFORE file listing even happens on the pruned-out values, the
  * cheapest skip layer there is (cheaper than the store's zone maps,
  * which must at least list and consult per-file stats). At 100 TB the
  * difference is walking 1/N of the tree vs consulting metadata for
  * all of it.
  *
  * Partition-column choice is the caller's scale decision: a good
  * partition column has bounded cardinality (dates, types, languages —
  * directories stay task-sized); a PK would make one directory per row.
  * `exportPartitioned` repartitions by the partition columns first so
  * each output directory is written by as few tasks as possible (no
  * small-file spray: without it every task writes a sliver of every
  * partition — nTasks × nPartitions files).
  */
object ParquetLayout {

  /** Write `df` as a hive-partitioned parquet tree at `path`,
    * `partCols` outermost-first. One shuffle (the repartition by the
    * partition key) — the same exchange the write would otherwise
    * imply task-by-task, taken once, deliberately. */
  def exportPartitioned(df: DataFrame, path: String, partCols: Seq[String]): Unit =
    df.repartition(partCols.map(col): _*)
      .write.mode("overwrite").partitionBy(partCols: _*).parquet(path)

  /** C39: CDF-driven incremental mirror sync — keep a hive-partitioned
    * downstream COPY of a managed table fresh by rewriting ONLY the
    * partitions the change-data-feed touched (C25 × C36): the
    * "downstream mirror" maintenance job every lakehouse runs for
    * consumers that can't read the store's bucketed layout. The cost is
    * proportional to CHANGED partitions, not table size — at 100 TB a
    * nightly sync rewrites a handful of date directories, never the
    * tree.
    *
    *  - touched partition values = distinct partition-column values in
    *    `readChanges(from, to)` (pre- and post-images both count, so a
    *    row MOVING between partitions rewrites both sides);
    *  - rewrite via dynamic partition overwrite (only written
    *    partitions replace; untouched directories keep their exact
    *    files — spec pins file identity);
    *  - a partition whose rows all vanished writes nothing under
    *    dynamic overwrite, so its stale directory is deleted
    *    explicitly.
    *
    * Returns the touched partition values (rendered; a touched NULL
    * partition reports as Spark's `__HIVE_DEFAULT_PARTITION__`), for
    * the sync job's own audit log.
    *
    * The partition-value collect is capped at `maxPartitions` (the
    * maxGroupRows discipline — VERDICT r7 #6): bounded-cardinality
    * partCols are this operator's contract, and the cap turns a
    * silently unbounded driver collect over a high-cardinality column
    * into a named [[graft.errors.TooManyPartitions]]. Stale-directory
    * removal goes through the mirror path's own Hadoop FileSystem —
    * java.io.File would silently no-op on an HDFS/S3 mirror and keep
    * serving deleted data — and renders directory names with Spark's
    * own partition-path escaping so values needing escaping match the
    * directories the writer actually produced. */
  def syncMirror(
      store: graft.store.TableStore,
      table: String,
      mirrorPath: String,
      partCol: String,
      fromGen: Int,
      toGen: Int,
      maxPartitions: Int = 10000): Seq[String] = {
    import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
    val changes = store.readChanges(table, fromGen, toGen)
    // cap applied IN the plan (limit maxPartitions+1): the largest
    // driver transfer this method can ever take is the cap itself
    val touchedRows = changes.select(col(partCol).cast("string"))
      .distinct().limit(maxPartitions + 1).collect()
    if (touchedRows.length > maxPartitions)
      throw graft.errors.TooManyPartitions(s"syncMirror($table -> $mirrorPath)", maxPartitions)
    val touchedNull = touchedRows.exists(_.isNullAt(0))
    val touched = touchedRows.iterator.filterNot(_.isNullAt(0)).map(_.getString(0)).toSeq.sorted
    if (touched.isEmpty && !touchedNull) return Nil
    val pc = col(partCol).cast("string")
    val pred = if (touchedNull) pc.isInCollection(touched) || pc.isNull
               else pc.isInCollection(touched)
    val current = store.readTable(table).filter(pred)
    current
      .repartition(col(partCol))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partCol).parquet(mirrorPath)
    // stale directories of fully-deleted partitions
    val liveRows = current.select(pc).distinct().collect()
    val liveNull = liveRows.exists(_.isNullAt(0))
    val live = liveRows.iterator.filterNot(_.isNullAt(0)).map(_.getString(0)).toSet
    val hadoopConf = changes.sparkSession.sessionState.newHadoopConf()
    def partDir(v: Option[String]): org.apache.hadoop.fs.Path = {
      val rendered = v.fold(ExternalCatalogUtils.DEFAULT_PARTITION_NAME)(
        ExternalCatalogUtils.escapePathName)
      new org.apache.hadoop.fs.Path(mirrorPath,
        s"${ExternalCatalogUtils.escapePathName(partCol)}=$rendered")
    }
    val stale = touched.filterNot(live).map(Option(_)) ++
      (if (touchedNull && !liveNull) Seq(None) else Nil)
    stale.foreach { v =>
      val dir = partDir(v)
      val fs = dir.getFileSystem(hadoopConf)
      if (fs.exists(dir)) fs.delete(dir, true)
    }
    touched ++ (if (touchedNull) Seq(ExternalCatalogUtils.DEFAULT_PARTITION_NAME) else Nil)
  }

  /** Read a partitioned export back. Partition values come from the
    * directory names (strings for string columns; Spark infers
    * numeric/date partition values natively), and predicates on them
    * prune directories at plan time — SourcesSpec pins that a filtered
    * read's input files all live under the matching `col=value/`
    * directories. */
  def readPartitioned(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
