package graft

/** Error taxonomy mirroring the reference's custom error surface
  * (reference: mssql_dataframe/core/custom_errors.py:1-71), re-expressed
  * for a Spark-native engine.
  */
sealed abstract class GraftException(msg: String) extends RuntimeException(msg)

object errors {
  final case class TableDoesNotExist(table: String)
      extends GraftException(s"table does not exist: $table")

  final case class TableAlreadyExists(table: String)
      extends GraftException(s"table already exists: $table")

  final case class ColumnDoesNotExist(table: String, columns: Seq[String])
      extends GraftException(
        s"column(s) do not exist in table $table: ${columns.mkString(", ")}")

  final case class DataFrameColumnDoesNotExist(columns: Seq[String])
      extends GraftException(
        s"column(s) do not exist in dataframe: ${columns.mkString(", ")}")

  final case class InvalidSyntax(detail: String)
      extends GraftException(s"invalid syntax: $detail")

  final case class UndefinedPrimaryKey(table: String)
      extends GraftException(s"table has no primary key: $table")

  final case class InsufficientColumnSize(column: String, detail: String)
      extends GraftException(s"insufficient column size for $column: $detail")

  final case class UndefinedConversionRule(detail: String)
      extends GraftException(s"undefined conversion rule: $detail")

  final case class InvalidLengthObjectName(name: String)
      extends GraftException(s"object name too long (>128): $name")

  final case class InvalidValue(column: String, detail: String)
      extends GraftException(s"invalid value for column $column: $detail")

  final case class NonUnicodeTypeColumn(column: String)
      extends GraftException(
        s"column $column is a non-unicode char/varchar type but values contain unicode (custom_errors.py:46)")

  final case class RecastColumnUnchanged(column: String, detail: String)
      extends GraftException(
        s"recast of column $column changes nothing: $detail (custom_errors.py:50)")

  /** A second writer attempted to commit to a table whose commit lock is
    * held. Concurrent writers to one table are outside the store's
    * contract (single-writer-per-table); the lock turns the silent
    * lost-manifest race into this loud error. */
  final case class ConcurrentWrite(table: String, detail: String)
      extends GraftException(
        s"commit lock for table $table is held by another writer: $detail")

  /** A batch (or the existing data, at ADD time) violates a CHECK
    * constraint — the engine-enforced twin of the server-side CHECK a
    * reference user gets from SQL Server alongside PK/NOT NULL/types. */
  final case class CheckConstraintViolation(constraint: String, detail: String)
      extends GraftException(s"check constraint $constraint violated: $detail")

  final case class UndefinedCheckConstraint(table: String, constraint: String)
      extends GraftException(s"no check constraint $constraint on table $table")

  /** Several source rows of a keyed mutation carried the same match-key
    * tuple — the reference's T-SQL MERGE raises here ("attempted to
    * UPDATE or DELETE the same row more than once", merge.py builds
    * exactly that statement); the join algebra would instead emit one
    * output row per duplicate and silently break the PK invariant. */
  final case class DuplicateSourceKey(table: String, keys: Seq[String])
      extends GraftException(
        s"duplicate source keys mutating $table: several source rows carry the " +
          s"same (${keys.mkString(", ")}) value — pre-aggregate the source to one " +
          "row per key (the reference MERGE raises on multi-match)")

  /** A driver-side partition-value collect exceeded the caller's bound
    * — the maxGroupRows discipline applied to partition maintenance
    * (syncMirror): bounded-cardinality partition columns are the
    * operator's CONTRACT, and the cap turns a silently unbounded
    * collect over a high-cardinality column into this loud error. */
  final case class TooManyPartitions(op: String, limit: Int)
      extends GraftException(
        s"$op touched more than $limit distinct partition values — " +
          "partition columns must be bounded-cardinality (dates, types, languages); " +
          "raise maxPartitions only if the driver can hold the values")
}
