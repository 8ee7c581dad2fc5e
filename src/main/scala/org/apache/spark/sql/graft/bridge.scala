package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ Expression bridge. Spark 4 made these conversions
  * `private[sql]` (columnNodeSupport.scala); third-party expression
  * libraries bridge from inside the package — the same pattern used by
  * frameless / deequ. This is the only file outside the `graft` package.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** EAGER Column → catalyst conversion (expression() returns a lazy
    * ColumnNode wrapper that only the Dataset API paths unwrap; a custom
    * logical node needs the real expression tree — e.g. a catalyst
    * SortOrder from `col.desc` — up front). */
  def toCatalyst(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter.apply(c.node)

  /** Register a function builder into a LIVE session's registry (the
    * extensions path only applies at session build time). */
  def registerTempFunction(spark: org.apache.spark.sql.SparkSession,
      name: String, builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, builder, "scala_udf")

  /** Unpersist the RDD blocks behind a `localCheckpoint`ed Dataset.
    * `Dataset.unpersist` only talks to the CacheManager, which has no
    * entry for a LogicalRDD-backed checkpoint — without this, every
    * round of an iterative algorithm leaks a full checkpointed copy
    * until driver GC. */
  def unpersistCheckpoint(df: org.apache.spark.sql.DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
      case _ =>
    }

  /** True iff the session's CacheManager holds no cached plan — the
    * no-leak assertion operators that once persisted internally are
    * spec-pinned against (sharedState is `private[sql]`). */
  def cacheIsEmpty(spark: org.apache.spark.sql.SparkSession): Boolean =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sharedState.cacheManager.isEmpty

  /** Wrap a custom logical plan in a DataFrame (Dataset.ofRows is
    * `private[sql]`) — the entry point for library-defined operators that
    * plan through a custom SparkStrategy. */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
