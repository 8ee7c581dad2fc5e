package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Exact per-group median at arbitrary scale via a multi-level histogram.
  *
  * The naive exact median — `row_number()` over a window partitioned by the
  * group key — sorts every group in one task; with a 3-value key that is 3
  * tasks sorting N/3 rows each, the plan that dies at 100 TB. Even the
  * distinct-value compaction (group by (g, v), window over values) only
  * helps when values repeat; over a near-unique measure it IS the row sort.
  *
  * Histogram select instead: every stage is a parallel hash aggregate or a
  * window over a BOUNDED row count, independent of data size:
  *
  *   1. stats:   per group (min, max, n) — one hash agg.
  *   2. × levels: bucket the active value range into `nBuckets` fixed-width
  *      cells → per (group, bucket) count/min/max (hash agg, map-side
  *      combine) → running count over ≤ `nBuckets` rows per group (bounded
  *      window) → the 1–2 buckets holding the median ranks become the next
  *      level's active range. Each level narrows the range ~`nBuckets`×.
  *   3. resolve: rank-select over the distinct values inside the final
  *      range — ~n/nBuckets^levels rows, e.g. 4096² ≈ 1.7e7× reduction at
  *      the default (levels=2), so a 10^12-row group resolves over ~10^5.
  *
  * Bucket boundaries are never trusted for selection — each level's next
  * range is the located buckets' ACTUAL (min, max) values and membership is
  * an inclusive value-range predicate, so IEEE-754 edge rounding in the
  * bucket arithmetic cannot drop or duplicate a rank. (Any non-empty bucket
  * between the two target buckets would itself hold a target rank, so the
  * located buckets are contiguous over the data and the value range selects
  * exactly their rows.)
  *
  * Cost: `levels + 2` scans of (group, value) — at cluster scale each scan
  * is a pruned parquet column read, which is the trade the reference's
  * single-node engines cannot make.
  */
object Percentiles {

  /** Exact median per group. Returns (grpCol, median: double, n_mid) where
    * n_mid is how many rank targets were read (2 for even n, 1 for odd) —
    * median = avg of the values at ranks (n+1)/2 and n/2+1, the classic
    * definition. NULL values are excluded. */
  def exactMedian(df: DataFrame, grpCol: String, valCol: String,
                  nBuckets: Int = 4096, levels: Int = 2): DataFrame = {
    val rows = df.select(col(grpCol).as("__g"),
        col(valCol).cast("double").as("__v"))
      .filter(col("__v").isNotNull)

    val stats = rows.groupBy(col("__g")).agg(
      min(col("__v")).as("__lo"), max(col("__v")).as("__hi"),
      count(lit(1)).as("__n"))
    // global rank targets; __off tracks how many rows sort below the
    // active range as it narrows
    var state = stats.select(col("__g"), col("__lo"), col("__hi"),
      lit(0L).as("__off"),
      expr("(__n + 1) div 2").as("__r1"), expr("__n div 2 + 1").as("__r2"))

    var level = 0
    while (level < levels) {
      val st = broadcast(state)
      val w = (col("__hi") - col("__lo")) / nBuckets
      val bucketed = rows.join(st, Seq("__g"))
        .filter(col("__v") >= col("__lo") && col("__v") <= col("__hi"))
        .withColumn("__b",
          when(w <= 0.0, 0).otherwise(least(
            floor((col("__v") - col("__lo")) / w).cast("int"),
            lit(nBuckets - 1))))
      val hist = bucketed
        .groupBy(col("__g"), col("__b"))
        .agg(count(lit(1)).as("__c"), min(col("__v")).as("__bmin"),
          max(col("__v")).as("__bmax"),
          first(col("__off")).as("__off"), first(col("__r1")).as("__r1"),
          first(col("__r2")).as("__r2"))
      val wb = Window.partitionBy(col("__g")).orderBy(col("__b"))
        .rowsBetween(Window.unboundedPreceding, 0)
      val located = hist
        .withColumn("__ce", sum(col("__c")).over(wb))
        .withColumn("__cs", col("__ce") - col("__c") + 1)
        .filter(
          (col("__r1") - col("__off")).between(col("__cs"), col("__ce")) ||
          (col("__r2") - col("__off")).between(col("__cs"), col("__ce")))
      state = located.groupBy(col("__g")).agg(
        min(col("__bmin")).as("__lo"), max(col("__bmax")).as("__hi"),
        (first(col("__off")) + min(col("__cs")) - 1).as("__off"),
        first(col("__r1")).as("__r1"), first(col("__r2")).as("__r2"))
      level += 1
    }

    // resolve: distinct-value rank select inside the final narrow range
    val st = broadcast(state)
    val sel = rows.join(st, Seq("__g"))
      .filter(col("__v") >= col("__lo") && col("__v") <= col("__hi"))
    val vals = sel.groupBy(col("__g"), col("__v")).agg(
      count(lit(1)).as("__c"), first(col("__off")).as("__off"),
      first(col("__r1")).as("__r1"), first(col("__r2")).as("__r2"))
    val wv = Window.partitionBy(col("__g")).orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val ranked = vals
      .withColumn("__ce", sum(col("__c")).over(wv) + col("__off"))
      .withColumn("__cs", col("__ce") - col("__c") + 1)
    ranked
      .select(col("__g"), col("__v"),
        explode(array_distinct(array(col("__r1"), col("__r2"))))
          .as("__r"), col("__cs"), col("__ce"))
      .filter(col("__r").between(col("__cs"), col("__ce")))
      .groupBy(col("__g"))
      .agg(avg(col("__v")).as("median"), count(lit(1)).as("n_mid"))
      .withColumnRenamed("__g", grpCol)
  }

  /** Exact discrete quantiles (type-1 / nearest-rank: the value at rank
    * ⌈q·n⌉, min 1) per group, same multi-level histogram machinery as
    * [[exactMedian]] but keyed by (group × quantile): every quantile
    * narrows its own active range independently, so far-apart quantiles
    * (p25 vs p99) don't force one wide range. Returns
    * (grpCol, q: double, value: double), one row per group × quantile.
    * Cost: rows replicate × |qs| through the histogram aggregates — the
    * quantile count is a constant, the data size is not.
    */
  def exactQuantiles(df: DataFrame, grpCol: String, valCol: String,
                     qs: Seq[Double], nBuckets: Int = 4096,
                     levels: Int = 2): DataFrame = {
    require(qs.nonEmpty && qs.forall(x => x > 0 && x <= 1))
    val rows = df.select(col(grpCol).as("__g"),
        col(valCol).cast("double").as("__v"))
      .filter(col("__v").isNotNull)

    val stats = rows.groupBy(col("__g")).agg(
      min(col("__v")).as("__lo"), max(col("__v")).as("__hi"),
      count(lit(1)).as("__n"))
    var state = stats
      .select(col("__g"), col("__lo"), col("__hi"), col("__n"),
        explode(lit(qs.toArray)).as("__q"))
      .withColumn("__r", greatest(lit(1L),
        ceil(col("__q") * col("__n")).cast("long")))
      .select(col("__g"), col("__q"), col("__lo"), col("__hi"),
        lit(0L).as("__off"), col("__r"))

    var level = 0
    while (level < levels) {
      val st = broadcast(state)
      val w = (col("__hi") - col("__lo")) / nBuckets
      val bucketed = rows.join(st, Seq("__g"))
        .filter(col("__v") >= col("__lo") && col("__v") <= col("__hi"))
        .withColumn("__b",
          when(w <= 0.0, 0).otherwise(least(
            floor((col("__v") - col("__lo")) / w).cast("int"),
            lit(nBuckets - 1))))
      val hist = bucketed
        .groupBy(col("__g"), col("__q"), col("__b"))
        .agg(count(lit(1)).as("__c"), min(col("__v")).as("__bmin"),
          max(col("__v")).as("__bmax"),
          first(col("__off")).as("__off"), first(col("__r")).as("__r"))
      val wb = Window.partitionBy(col("__g"), col("__q"))
        .orderBy(col("__b")).rowsBetween(Window.unboundedPreceding, 0)
      state = hist
        .withColumn("__ce", sum(col("__c")).over(wb))
        .withColumn("__cs", col("__ce") - col("__c") + 1)
        .filter((col("__r") - col("__off"))
          .between(col("__cs"), col("__ce")))
        .select(col("__g"), col("__q"), col("__bmin").as("__lo"),
          col("__bmax").as("__hi"),
          (col("__off") + col("__cs") - 1).as("__off"), col("__r"))
      level += 1
    }

    val st = broadcast(state)
    val sel = rows.join(st, Seq("__g"))
      .filter(col("__v") >= col("__lo") && col("__v") <= col("__hi"))
    val vals = sel.groupBy(col("__g"), col("__q"), col("__v")).agg(
      count(lit(1)).as("__c"), first(col("__off")).as("__off"),
      first(col("__r")).as("__r"))
    val wv = Window.partitionBy(col("__g"), col("__q")).orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, 0)
    vals
      .withColumn("__ce", sum(col("__c")).over(wv) + col("__off"))
      .withColumn("__cs", col("__ce") - col("__c") + 1)
      .filter(col("__r").between(col("__cs"), col("__ce")))
      .select(col("__g").as(grpCol), col("__q").as("q"),
        col("__v").as("value"))
  }
}
