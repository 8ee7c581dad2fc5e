package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Change-suppression CDC: emit a record only when its value moved by more
  * than `threshold` relative to the previously EMITTED value for the same
  * key (reference semantics: SERVER/ingest_prices.py:42-62 keeps the
  * last-published price per pair and republishes on >10% moves).
  *
  * Two variants with subtly different semantics, both provided:
  *  - [[lagFilter]]: compares to the previous OBSERVED value (`lag`) — a
  *    single window pass, fully parallel, and SQL-oracle-able. This is the
  *    right batch analytic for "big moves".
  *  - [[suppress]]: exact reference semantics — compares to the previous
  *    EMITTED value, which is inherently sequential per key. Implemented
  *    with a per-key sorted scan inside `flatMapGroups`; keys process in
  *    parallel, rows within a key stream in ts order. The streaming twin
  *    lives in graft.streaming (flatMapGroupsWithState).
  */
object ChangeSuppression {

  /** Keep rows that are a key's first observation or moved > threshold vs
    * the immediately preceding observation. */
  def lagFilter(df: DataFrame, keyCol: String, orderCol: Column,
                valueCol: String, threshold: Double): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(orderCol)
    val prev = lag(col(valueCol), 1).over(w)
    df.withColumn("__prev", prev)
      .filter(col("__prev").isNull ||
        (abs(col(valueCol) - col("__prev")) > abs(col("__prev")) * threshold))
      .drop("__prev")
  }

  /** Exact reference semantics: previous-EMITTED comparison. Emits the first
    * row per key and every row whose value moved > threshold relative to the
    * last emitted one.
    *
    * Secondary-sort formulation: one shuffle on the key, then a
    * WITHIN-PARTITION sort on (key, ts, id) and a streaming group-scan in
    * `mapPartitions`. A key's history is never materialized — Spark's
    * external sorter spills the partition sort to disk if needed, and the
    * scan holds O(1) state (current key + last emitted value). This is the
    * form that survives an unbounded-history key; for unbounded STREAMS use
    * the flatMapGroupsWithState twin in graft.streaming.
    */
  def suppress(df: DataFrame, keyCol: String, tsCol: String, idCol: String,
               valueCol: String, threshold: Double): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(
        col(keyCol).cast("string").as("__k"), col(tsCol).cast("long").as("__t"),
        col(idCol).cast("long").as("__i"), col(valueCol).cast("double").as("__v"))
      .repartition(col("__k"))
      .sortWithinPartitions(col("__k"), col("__t"), col("__i"))
      .as[(String, Long, Long, Double)]
      .mapPartitions { rows =>
        // rows arrive clustered by key and ts-ordered within a key
        var curKey: String = null
        var lastEmitted = Double.NaN
        rows.filter { r =>
          if (r._1 != curKey) { curKey = r._1; lastEmitted = Double.NaN }
          val emit = lastEmitted.isNaN ||
            math.abs(r._4 - lastEmitted) > math.abs(lastEmitted) * threshold
          if (emit) lastEmitted = r._4
          emit
        }
      }
      .toDF(keyCol, tsCol, idCol, valueCol)
  }
}
