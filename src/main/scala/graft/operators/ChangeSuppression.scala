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
    * last emitted one. One shuffle (groupByKey) + per-key in-memory sort —
    * fine when a single key's history fits an executor; for unbounded keys
    * use the streaming variant with state timeouts.
    */
  def suppress(df: DataFrame, keyCol: String, tsCol: String, idCol: String,
               valueCol: String, threshold: Double): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val projected = df.select(
      col(keyCol).cast("string"), col(tsCol).cast("long"),
      col(idCol).cast("long"), col(valueCol).cast("double"))
      .as[(String, Long, Long, Double)]
    projected.groupByKey(_._1)
      .flatMapGroups { (key, rows) =>
        val sorted = rows.toVector.sortBy(r => (r._2, r._3))
        var lastEmitted = Double.NaN
        sorted.iterator.filter { r =>
          val emit = lastEmitted.isNaN ||
            math.abs(r._4 - lastEmitted) > math.abs(lastEmitted) * threshold
          if (emit) lastEmitted = r._4
          emit
        }
      }
      .toDF(keyCol, tsCol, idCol, valueCol)
  }
}
