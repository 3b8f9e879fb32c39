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
    * Returns the touched partition values (rendered), for the sync
    * job's own audit log. */
  def syncMirror(
      store: graft.store.TableStore,
      table: String,
      mirrorPath: String,
      partCol: String,
      fromGen: Int,
      toGen: Int): Seq[String] = {
    val changes = store.readChanges(table, fromGen, toGen)
    val touched = changes.select(col(partCol).cast("string"))
      .distinct().collect().map(_.getString(0)).toSeq.sorted
    if (touched.isEmpty) return Nil
    val current = store.readTable(table)
      .filter(col(partCol).cast("string").isInCollection(touched))
    current
      .repartition(col(partCol))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partCol).parquet(mirrorPath)
    // stale directories of fully-deleted partitions
    val live = current.select(col(partCol).cast("string"))
      .distinct().collect().map(_.getString(0)).toSet
    touched.filterNot(live).foreach { v =>
      val dir = new java.io.File(s"$mirrorPath/$partCol=$v")
      if (dir.isDirectory) {
        dir.listFiles().foreach(_.delete())
        dir.delete()
      }
    }
    touched
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
