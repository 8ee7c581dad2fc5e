package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Delta/Hudi-style MERGE (CDC apply) over plain DataFrames: fold a batch
  * of keyed change records (upserts + deletes) into a target snapshot in
  * one pass.
  *
  * Scale shape: the winning change per key is a HASH AGGREGATE
  * (max_by over the ordering column — map-side combine, no window sort),
  * then ONE full-outer join against the target on the key. No driver
  * state, no per-key iteration; at cluster scale this is the standard
  * copy-on-write merge step of a lakehouse table format, minus the format.
  */
object Merge {

  /** Apply `changes` to `target`. Both must share the `keys` columns and
    * the same value schema for the non-key columns being carried
    * (`valueCols`). `opCol` in changes is 'U' (upsert) or 'D' (delete);
    * `ord` orders changes within a key — the greatest wins (last-writer-
    * wins, deletes included).
    *
    * Result: target rows with no change pass through; keys whose winning
    * change is 'U' take the change's values (insert if absent from
    * target); keys whose winning change is 'D' are dropped.
    */
  def applyChanges(target: DataFrame, changes: DataFrame,
                   keys: Seq[String], valueCols: Seq[String],
                   opCol: String, ord: String): DataFrame = {
    // winning change per key: one hash aggregate, no window
    val keyCols = keys.map(col)
    val winner = changes.groupBy(keyCols: _*).agg(
      max_by(struct((valueCols.map(col) :+ col(opCol).as("__op")): _*),
        col(ord)).as("__w"))
    val w = winner.select(
      (keys.map(k => col(k).as(s"__ck_$k")) :+
        col("__w.__op").as("__op") :+
        struct(valueCols.map(c => col(s"__w.$c").as(c)): _*)
          .as("__cvals")): _*)
    val joinCond = keys.map(k => target(k) === w(s"__ck_$k"))
      .reduce(_ && _)
    target.join(w, joinCond, "full_outer")
      .filter(coalesce(col("__op"), lit("U")) =!= "D")
      .select(
        (keys.map(k => coalesce(target(k), w(s"__ck_$k")).as(k)) ++
          valueCols.map(c =>
            when(col("__op") === "U", col(s"__cvals.$c"))
              .otherwise(target(c)).as(c))): _*)
  }
}
