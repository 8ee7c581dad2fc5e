package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-provided star schema (TESTDATA.md).
  *
  * All `SparkEntry.queries` read through here so the scan path is uniform:
  * parquet scans get column pruning + predicate pushdown from Catalyst for
  * free. At cluster scale the same call works on a directory of many files;
  * nothing here assumes single-file inputs.
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  /** events.ts has shipped in two physical layouts across generator
    * versions: TIMESTAMP(NANOS) (which Spark's vectorized reader rejects —
    * read as a long via the legacy conf and convert losslessly; integer
    * `div`, not `/`, so epoch-nanos never round through a double) and
    * TIMESTAMP(MICROS) without UTC adjustment (which Spark reads as
    * TIMESTAMP_NTZ — cast to TimestampType so downstream time arithmetic
    * sees ONE type; sessions run UTC, so the cast is value-identity).
    * Dispatch on the LOADED dtype rather than pinning a layout: the same
    * query code must run against either vintage of the dataset.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = load(s, d, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampType => df
      case org.apache.spark.sql.types.TimestampNTZType =>
        // value-identity under the pinned UTC sessions
        df.withColumn("ts",
          col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case other =>
        // an unknown vintage must fail LOUDLY: a blind cast would turn
        // malformed values into NULLs (or reinterpret integers as epoch
        // seconds) and every downstream time computation would be
        // silently wrong — the exact failure this dispatch exists to
        // prevent
        sys.error(s"events.ts: unsupported parquet vintage $other")
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
