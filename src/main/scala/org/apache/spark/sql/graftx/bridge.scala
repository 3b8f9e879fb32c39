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
}
