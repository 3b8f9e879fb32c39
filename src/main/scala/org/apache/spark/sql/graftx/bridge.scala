package org.apache.spark.sql.graftx

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ Expression bridge for graft's custom Catalyst expressions.
  *
  * Spark 4 hides Column construction from raw expressions behind
  * `private[sql] ExpressionUtils` (the Connect refactor); a library
  * shipping native expressions reaches it from an org.apache.spark.sql
  * subpackage — the established pattern for Spark-native extensions.
  */
object bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Block until queued listener events are delivered (`listenerBus` is
    * private[spark]) — Bench reads per-query task metrics from a
    * listener, and task-end events are asynchronous. */
  def drainListenerBus(sc: org.apache.spark.SparkContext, timeoutMs: Long): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMs)

  /** Spark schema of ONE parquet footer, read driver-side — the
    * per-file unit of Spark's own `mergeSchema` path
    * (ParquetFileFormat.readSchemaFromFooter), without the distributed
    * footer job `mergeSchemasInParallel` launches per read: prefer the
    * exact Spark schema the writer embedded in the footer
    * (`org.apache.spark.sql.parquet.row.metadata` — every file a
    * TableStore writes carries it), fall back to converting the
    * parquet message type under the session's conversion flags
    * (binary-as-string, int96, NTZ inference, legacy nanos-as-long).
    * Footers of immutable files never change, so callers may cache the
    * result by path forever. */
  def parquetFooterSchema(
      spark: org.apache.spark.sql.SparkSession,
      conf: org.apache.hadoop.conf.Configuration,
      status: org.apache.hadoop.fs.FileStatus): org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.execution.datasources.parquet.{ParquetFooterReader, ParquetToSparkSchemaConverter}
    val md = ParquetFooterReader.readFooter(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromStatus(status, conf),
      org.apache.parquet.format.converter.ParquetMetadataConverter.SKIP_ROW_GROUPS)
      .getFileMetaData
    Option(md.getKeyValueMetaData.get("org.apache.spark.sql.parquet.row.metadata"))
      .flatMap(s => scala.util.Try(
        org.apache.spark.sql.types.DataType.fromJson(s)
          .asInstanceOf[org.apache.spark.sql.types.StructType]).toOption)
      .getOrElse(
        new ParquetToSparkSchemaConverter(spark.sessionState.conf).convert(md.getSchema))
  }

  /** The same StructType merge Spark's mergeSchema read reduces footers
    * with (`StructType.merge` is private[sql]); throws the same
    * failed-to-merge error on incompatible footers. */
  def mergeSchemas(
      spark: org.apache.spark.sql.SparkSession,
      a: org.apache.spark.sql.types.StructType,
      b: org.apache.spark.sql.types.StructType): org.apache.spark.sql.types.StructType =
    a.merge(b, spark.sessionState.conf.caseSensitiveAnalysis)
}
