package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge. Spark 4 made the direct constructors
  * `private[sql]`; extensions that define custom Catalyst expressions use an
  * in-package bridge like this (same approach as third-party Spark connector
  * libraries).
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** The RDD a `localCheckpoint()`ed Dataset ACTUALLY persisted — the one
    * inside its LogicalRDD leaf. `Dataset.rdd` would build a fresh
    * (never-persisted) deserializing RDD over it, so
    * `df.rdd.unpersist()` is a silent no-op; unpersisting THIS RDD releases
    * the checkpoint blocks eagerly instead of waiting for the
    * ContextCleaner to notice the snapshot is garbage.
    */
  def checkpointedRdd(df: org.apache.spark.sql.DataFrame): Option[org.apache.spark.rdd.RDD[_]] =
    df.queryExecution.analyzed.collectFirst {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd
    }
}
