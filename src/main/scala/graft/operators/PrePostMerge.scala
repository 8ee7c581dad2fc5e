package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** The reference's pre/post token-balance pivot: a FULL OUTER merge of two
  * keyed record sets with last-write-wins on duplicate keys (cf. reference
  * RECEIVER/stage2_processing.cpp:149-174 — map assignment semantics), then
  * dropping rows where both sides are absent.
  *
  * Two equivalent Spark formulations are provided; both are one shuffle on
  * the merge key:
  *  - [[merge]]: window rank per side + genuine full_outer join. Reads like
  *    the semantics; two window passes + one join, all on the same key so
  *    the exchange is reused.
  *  - [[mergeAgg]]: single hash aggregate with conditional `max_by` — fewer
  *    operators, map-side partial aggregation, best at scale.
  */
object PrePostMerge {

  /** Last row per key from `df`, ordered by `orderCols` (last-write-wins). */
  private def lastPerKey(df: DataFrame, keys: Seq[String],
                         orderCols: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(orderCols.map(_.desc): _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** Full-outer merge of `pre` and `post` on `keys`; each side first reduced
    * to its last record per key by `orderCols` (descending = latest wins).
    * Output: keys..., preOut, postOut. Rows where both sides are NULL cannot
    * occur (full outer join of non-empty sides).
    */
  def merge(pre: DataFrame, post: DataFrame, keys: Seq[String],
            valueCol: String, orderCols: Seq[Column],
            preOut: String = "pre_value", postOut: String = "post_value")
      : DataFrame = {
    val p1 = lastPerKey(pre, keys, orderCols)
      .select(keys.map(col) :+ col(valueCol).as(preOut): _*)
    val p2 = lastPerKey(post, keys, orderCols)
      .select(keys.map(col) :+ col(valueCol).as(postOut): _*)
    p1.join(p2, keys, "full_outer")
  }

  /** Aggregate formulation: one pass over a side-tagged union. `sideCol`
    * must be 'pre' or 'post'; latest row per (keys, side) wins by `orderBy`
    * (a struct column or any orderable column). Emits NULL for a missing
    * side. This is the shape to prefer at 100 TB: a single hash aggregate
    * with partial (map-side) combine, no window sort, no join.
    */
  def mergeAgg(tagged: DataFrame, keys: Seq[String], sideCol: String,
               valueCol: String, orderBy: Column,
               preOut: String = "pre_value", postOut: String = "post_value")
      : DataFrame =
    tagged.groupBy(keys.map(col): _*).agg(
      max_by(when(col(sideCol) === "pre", col(valueCol)),
             when(col(sideCol) === "pre", orderBy)).as(preOut),
      max_by(when(col(sideCol) === "post", col(valueCol)),
             when(col(sideCol) === "post", orderBy)).as(postOut))

  /** Row-emit filter: keep rows where at least one side is present. */
  def eitherPresent(df: DataFrame, preOut: String = "pre_value",
                    postOut: String = "post_value"): DataFrame =
    df.filter(col(preOut).isNotNull || col(postOut).isNotNull)
}
