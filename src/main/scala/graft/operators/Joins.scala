package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Join operators: semi/anti watch-list filtering, broadcast dimension
  * attach, as-of join, range join, and a salt-replicated join for skewed
  * keys.
  *
  * Design for scale: every join here either (a) broadcasts the small side so
  * the fact table never shuffles, or (b) when both sides are big, shuffles
  * once on the join key and lets AQE handle skew. No driver-side collects.
  */
object Joins {

  /** Keep fact rows whose `keyCol` appears in the watch-list dimension.
    * Broadcast LEFT SEMI join — the Spark-native form of the reference's
    * hot-address hash semi-join. The dim is deduped so the semi join's
    * build side stays minimal.
    */
  def semiFilter(fact: DataFrame, keyCol: String, watch: DataFrame,
                 watchCol: String): DataFrame = {
    // rename inside so watch may derive from the same scan as fact
    val w = watch.select(col(watchCol).as("__watch_key")).distinct()
    fact.join(broadcast(w), fact(keyCol) === col("__watch_key"), "left_semi")
  }

  /** Keep fact rows whose `keyCol` does NOT appear in the dimension
    * (NOT EXISTS). */
  def antiFilter(fact: DataFrame, keyCol: String, dim: DataFrame,
                 dimCol: String): DataFrame = {
    val w = dim.select(col(dimCol).as("__watch_key")).distinct()
    fact.join(broadcast(w), fact(keyCol) === col("__watch_key"), "left_anti")
  }

  /** Semi-join over array columns: keep rows where ANY element of any of the
    * given array columns is in the watch set. For a small watch set this is
    * a single codegen'd `arrays_overlap` against a literal array — zero
    * shuffle, matching the reference's short-circuit OR over three address
    * arrays. For big watch sets prefer explode + [[semiFilter]].
    */
  def arraysOverlapFilter(fact: DataFrame, arrayCols: Seq[String],
                          watch: Seq[String]): DataFrame = {
    // concat() is NULL if ANY input array is NULL — a row with one missing
    // array column must still match on the others (per-array OR semantics),
    // so each array is coalesced to empty first.
    val all = concat(arrayCols.map(c =>
      coalesce(col(c), array().cast("array<string>"))): _*)
    fact.filter(arrays_overlap(all, lit(watch.toArray)))
  }

  /** Attach columns from a small dimension by equality key (broadcast LEFT
    * OUTER) — the reference's Redis price-map lookup. `valueCols` are the
    * dim columns to carry over; rows with no match get NULLs.
    */
  def attachDim(fact: DataFrame, factKey: String, dim: DataFrame,
                dimKey: String, valueCols: Seq[String]): DataFrame = {
    val d = dim.select(col(dimKey).as("__dim_key") +: valueCols.map(col): _*)
    fact.join(broadcast(d), fact(factKey) === col("__dim_key"), "left_outer")
      .drop("__dim_key")
  }

  /** As-of join: for each left row, the latest right-side `valueCol` with
    * `rightTs <= leftTs` within the same key. Implemented as a union +
    * single sort-based window pass (one shuffle on the key, no per-row range
    * probe) — this is the plan that survives 100× scale-up, unlike a
    * theta-join which would be O(n·m) per key.
    *
    * Both inputs must share the key column name; `tsCol` must be present in
    * both. Ties (equal ts): the right row sorts BEFORE the left row, so a
    * quote at exactly the fact's timestamp is visible to it.
    */
  def asOfJoin(left: DataFrame, right: DataFrame, keyCol: String,
               tsCol: String, valueCol: String, outCol: String,
               tieBreak: Column): DataFrame = {
    val l = left.withColumn("__side", lit(1))
      .withColumn("__asof_v", lit(null).cast(right.schema(valueCol).dataType))
    val r = right.select(col(keyCol), col(tsCol),
        col(valueCol).as("__asof_v"))
      .withColumn("__side", lit(0))
    val leftCols = left.columns
    val unioned = l.select(
      (leftCols.map(col) :+ col("__side") :+ col("__asof_v")): _*)
      .unionByName(r, allowMissingColumns = true)
    // __asof_v as the final sort key makes ties among right rows sharing
    // (key, ts) deterministic (largest value wins) — tieBreak is NULL on
    // the right side so it only orders left rows, where order is
    // irrelevant to the running last(). The oracle mirrors this.
    val w = Window.partitionBy(keyCol)
      .orderBy(col(tsCol).asc, col("__side").asc, tieBreak.asc,
        col("__asof_v").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn(outCol, last(col("__asof_v"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .drop("__side", "__asof_v")
  }

  /** Range join: pairs where `leftVal` falls in `[lo, hi]` from the right
    * side, pre-filtered by an equi-key so Catalyst plans a hash join with a
    * residual range predicate instead of a cartesian product.
    */
  def rangeJoin(left: DataFrame, right: DataFrame, equi: Column,
                leftVal: Column, lo: Column, hi: Column): DataFrame =
    left.join(right, equi && leftVal >= lo && leftVal <= hi)

  /** Interval lookup WITHOUT an equi-key — the IP-range/tax-bracket/
    * promo-window shape: every left value must find every right
    * interval containing it, and nothing equi-joins naturally, so the
    * naive plan is a cartesian with a residual filter (dead at scale).
    * This is the 1-D sibling of [[Geo]]'s grid-cell join: values map
    * to `floor(v / bucketSize)`, each interval REPLICATES across the
    * buckets it overlaps (sequence(floor(lo/B), floor(hi/B))), and the
    * pair generation becomes an EQUI-join on the bucket id with the
    * exact [lo, hi] containment as a cheap residual. Replication
    * factor = interval span / bucketSize (+1); pick bucketSize near
    * the median interval width so typical intervals copy 1–2×. A
    * pathological interval spanning the whole domain replicates
    * domain/B times — cap spans upstream or route those few to a
    * broadcast branch. Join column names: caller guarantees `left`
    * and `right` share no column names (same contract as rangeJoin).
    */
  def bucketedRangeJoin(left: DataFrame, leftVal: Column,
                        right: DataFrame, lo: Column, hi: Column,
                        bucketSize: Long): DataFrame = {
    require(bucketSize > 0, "positive bucket size")
    val lb = left.withColumn("__lb",
      floor(leftVal / bucketSize).cast("long"))
    val rb = right.withColumn("__rb",
      explode(sequence(floor(lo / bucketSize).cast("long"),
        floor(hi / bucketSize).cast("long"))))
    lb.join(rb, col("__lb") === col("__rb") &&
        leftVal >= lo && leftVal <= hi)
      .drop("__lb", "__rb")
  }

  /** Skew-resistant join of a big fact against a small dim: the dim is
    * replicated `salts` times and the fact picks a deterministic salt, so a
    * single hot key spreads over `salts` reducers. Result set is identical
    * to the plain equi-join. With AQE's skew-join handling this is often
    * unnecessary, but it is the explicit form for when AQE is off or the
    * skew is in a broadcast-ineligible join.
    */
  def saltedJoin(fact: DataFrame, factKey: String, saltSource: Column,
                 dim: DataFrame, dimKey: String, salts: Int): DataFrame = {
    val saltedFact = fact.withColumn("__fsalt",
      pmod(xxhash64(saltSource), lit(salts)).cast("int"))
    val saltedDim = dim
      .withColumnRenamed(dimKey, "__dim_key")
      .withColumn("__dsalt", explode(lit((0 until salts).toArray)))
    saltedFact.join(saltedDim,
        saltedFact(factKey) === col("__dim_key") &&
          col("__fsalt") === col("__dsalt"))
      .drop("__dim_key", "__fsalt", "__dsalt")
  }

  /** Positional lookup: explode `arrayCol` with its index and tag each
    * position that hits the watch-list — the reference's accountIndex →
    * hot-address map build. Returns (original cols..., pos, elem, hit) where
    * hit is the element when watch-listed else NULL.
    */
  def positionalTag(df: DataFrame, arrayCol: String, watch: Seq[String])
      : DataFrame =
    df.select(col("*"), posexplode(col(arrayCol)).as(Seq("pos", "elem")))
      .withColumn("hit", Tagging.isinTag(col("elem"), watch))
}
