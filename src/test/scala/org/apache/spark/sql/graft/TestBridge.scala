package org.apache.spark.sql.graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}

/** Test-only bridge: SparkSessionExtensions' build* accessors are
  * `private[sql]`, so verifying what an extensions object INJECTS (the
  * build-time path, which can't be exercised on a shared test
  * SparkContext) happens from inside the package. */
object TestBridge {
  def plannerStrategies(ext: SparkSessionExtensions, spark: SparkSession) =
    ext.buildPlannerStrategies(spark)
  def optimizerRules(ext: SparkSessionExtensions, spark: SparkSession) =
    ext.buildOptimizerRules(spark)
}
