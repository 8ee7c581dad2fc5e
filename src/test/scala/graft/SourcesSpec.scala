package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Source/sink format breadth: the engine's tables round-trip through
  * csv and json (schema'd reads — no inference jobs at scale) and
  * partitioned parquet writes prune directories on read.
  */
class SourcesSpec extends SparkSpec {
  import spark.implicits._

  private lazy val base = Tables.events(spark, "/root/testdata/sf0.001")
    .filter($"user_id" < 10)
    .select($"event_id", $"user_id", $"event_type", $"value")

  test("csv round-trip with explicit schema") {
    val dir = Files.createTempDirectory("graft-csv").toString
    base.write.mode("overwrite").option("header", "true").csv(dir)
    val back = spark.read
      .schema("event_id LONG, user_id LONG, event_type STRING, value DOUBLE")
      .option("header", "true").csv(dir)
    assert(back.count() === base.count())
    assert(back.agg(sum($"value")).collect()(0).getDouble(0) ===
      base.agg(sum($"value")).collect()(0).getDouble(0))
  }

  test("json-lines round-trip with explicit schema") {
    val dir = Files.createTempDirectory("graft-json").toString
    base.write.mode("overwrite").json(dir)
    val back = spark.read
      .schema("event_id LONG, user_id LONG, event_type STRING, value DOUBLE")
      .json(dir)
    assert(back.count() === base.count())
  }

  test("partitioned parquet write prunes partitions on read") {
    val dir = Files.createTempDirectory("graft-part").toString
    base.write.mode("overwrite").partitionBy("event_type").parquet(dir)
    val one = spark.read.parquet(dir)
      .filter($"event_type" === "click")
    val scan = one.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.head
    // partition pruning: the click predicate is a PartitionFilter, so
    // only that directory's files are listed/scanned
    assert(scan.metadata("PartitionFilters").contains("event_type"),
      scan.metadata("PartitionFilters"))
    assert(one.count() ===
      base.filter($"event_type" === "click").count())
  }
}
