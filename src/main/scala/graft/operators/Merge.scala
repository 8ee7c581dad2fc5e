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

  /** INCREMENTAL AGGREGATE MAINTENANCE — the materialized-view delta
    * merge (classic self-maintainable-view theory: counts and sums are
    * maintainable under inserts AND deletes without touching the base
    * table). Given a materialized per-key aggregate
    * (`countCol` + the `sums` columns) and a CDC delta batch of raw
    * rows — `opCol` = 'I' (insert) or 'D' (retract) — produce the
    * updated aggregate.
    *
    * Scale shape: the delta batch collapses to per-key signed partials
    * in ONE hash aggregate (map-side combine), then joins the
    * materialized aggregate — whose row count is the GROUP cardinality,
    * not the base table's — with one full-outer hash join. The base
    * table is never read; that is the point. Derived measures (avg =
    * sum/count) recompute from the maintained sufficient statistics.
    *
    * `sums` maps each maintained sum column in `baseAgg` to the raw
    * delta column feeding it. Keys whose count reaches zero drop (the
    * group vanished). A NEGATIVE count means the caller retracted rows
    * never inserted — a data-contract violation; those keys also drop,
    * and the q94/q102 contract layer is where such batches get caught.
    */
  def applyAggDelta(baseAgg: DataFrame, delta: DataFrame,
                    keys: Seq[String], countCol: String,
                    sums: Seq[(String, String)], opCol: String)
      : DataFrame = {
    // unknown ops fail LOUD at execution, not silently drop: a typo'd
    // op silently ignored would desynchronize the view from its base
    val sign = when(col(opCol) === "I", 1L)
      .when(col(opCol) === "D", -1L)
      .otherwise(raise_error(concat(
        lit("applyAggDelta: op must be I or D, got "), col(opCol))))
    // delta keys renamed + joined with <=> (null-safe): groupBy puts
    // null keys in ONE group, so the view join must match them too —
    // a usingColumns join compares with ===, under which the base's
    // null-key group and the delta's never meet and the view splits
    // into two null rows, breaking the from-scratch identity
    val dAgg = delta.groupBy(keys.map(col): _*).agg(
        sum(sign).as("__dn"),
        sums.map { case (aggC, rawC) =>
          sum(sign * col(rawC)).as(s"__d_$aggC") }: _*)
      .select((keys.map(k => col(k).as(s"__dk_$k")) :+ col("__dn")) ++
        sums.map { case (aggC, _) => col(s"__d_$aggC") }: _*)
    val joinCond = keys.map(k => baseAgg(k) <=> dAgg(s"__dk_$k"))
      .reduce(_ && _)
    baseAgg.join(dAgg, joinCond, "full_outer")
      .select((keys.map(k =>
        when(col("__dn").isNotNull, dAgg(s"__dk_$k"))
          .otherwise(baseAgg(k)).as(k)) :+
        (coalesce(col(countCol), lit(0L)) + coalesce(col("__dn"),
          lit(0L))).as(countCol)) ++
        sums.map { case (aggC, _) =>
          (coalesce(col(aggC), lit(0)) + coalesce(col(s"__d_$aggC"),
            lit(0))).as(aggC) }: _*)
      .filter(col(countCol) > 0)
  }

  /** SCD TYPE-2 apply — [[applyChanges]]'s history-keeping sibling (the
    * slowly-changing-dimension staple): instead of overwriting a
    * changed key's row, CLOSE it (set `validToCol` = the change's
    * `tsCol`) and append the new version as the open row. `target` rows
    * carry (`keys`, `valueCols`, `validFromCol`, `validToCol`) with
    * NULL `validToCol` marking the current version; `changes` carry
    * (`keys`, `valueCols`, `tsCol`), at most one change per key per
    * batch (pre-collapse with a LWW aggregate for multi-change
    * batches — the [[applyChanges]] winner step).
    *
    * A change IDENTICAL to the key's open version is a no-op (no
    * empty-interval churn); closed history rows always pass through
    * untouched. Same scale shape as the SCD-1 form: one hash-keyed
    * outer join between the open rows and the batch — history rows
    * never enter the join.
    *
    * Invariants the CALLER owns (violations are amplified, not
    * detected — the join is keyed, so it cannot see them): at most one
    * OPEN row per key in `target` (N open rows for a changed key would
    * close and re-open N times), and non-null `tsCol` on every change
    * (a null ts cannot order an interval).
    */
  def applyScd2(target: DataFrame, changes: DataFrame, keys: Seq[String],
                valueCols: Seq[String], tsCol: String,
                validFromCol: String, validToCol: String): DataFrame = {
    val closed = target.filter(col(validToCol).isNotNull)
    val open = target.filter(col(validToCol).isNull)
    // __hit marks join presence — NOT __ts nullability, which would
    // misroute a (invalid but survivable) null-ts change into `keep`
    // and emit a phantom all-null row
    val ch = changes.select(
      (keys.map(k => col(k).as(s"__ck_$k")) :+
        col(tsCol).as("__ts") :+ lit(true).as("__hit") :+
        struct(valueCols.map(col): _*).as("__cv")): _*)
    val toType = target.schema(validToCol).dataType
    val joinCond = keys.map(k => open(k) === ch(s"__ck_$k"))
      .reduce(_ && _)
    // compare AS-STORED: the change value is cast to the target's type
    // before the comparison, mirroring what insert will store. Comparing
    // pre-cast would route a change that is identical AFTER the cast
    // (e.g. DOUBLE 1.234 into DECIMAL(10,2) holding 1.23) to
    // close+insert — a zero-information version per replay, breaking
    // both no-op suppression and idempotence
    val sameVals = valueCols
      .map(c => col(s"__cv.$c").cast(target.schema(c).dataType)
        <=> open(c)).reduce(_ && _)
    val j = open.join(ch, joinCond, "full_outer")
    val openCols = (keys.map(k => coalesce(open(k), ch(s"__ck_$k")).as(k))
      ++ valueCols.map(c => open(c).as(c))) :+
      col(validFromCol) :+ col(validToCol)
    // unchanged open rows (no matching change, or identical values)
    val keep = j.filter(col("__hit").isNull ||
        (open(keys.head).isNotNull && sameVals))
      .select(openCols: _*)
    // open rows superseded by a REAL change: close at the change ts.
    // valid_to casts to the TARGET's interval type so the union never
    // silently widens the dimension schema
    val close = j.filter(col("__hit").isNotNull &&
        open(keys.head).isNotNull && !sameVals)
      .select((keys.map(k => open(k).as(k)) ++
        valueCols.map(c => open(c).as(c))) :+
        col(validFromCol) :+ col("__ts").cast(toType).as(validToCol): _*)
    // the new open version (changed keys + brand-new keys). Value
    // columns cast to the TARGET's types, same reason as valid_to: a
    // change batch with e.g. DOUBLE where the dimension holds DECIMAL
    // must not silently widen the schema through the union
    val insert = j.filter(col("__hit").isNotNull &&
        (open(keys.head).isNull || !sameVals))
      .select((keys.map(k => col(s"__ck_$k").as(k)) ++
        valueCols.map(c =>
          col(s"__cv.$c").cast(target.schema(c).dataType).as(c))) :+
        col("__ts").cast(target.schema(validFromCol).dataType)
          .as(validFromCol) :+
        lit(null).cast(toType).as(validToCol): _*)
    closed.unionByName(keep).unionByName(close).unionByName(insert)
  }
}
