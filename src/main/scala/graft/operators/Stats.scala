package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Rank/robust statistics that need a GLOBAL per-group ordering but must
  * not pay for it with a per-group single-task window.
  *
  * Spearman's rho is Pearson over average ranks (ties share the mean of
  * the rank range they occupy — the "fractional ranking" every stats
  * package uses). The textbook plan — `rank() OVER (PARTITION BY g ORDER
  * BY v)` — sorts each group in one task, the plan that dies when a group
  * holds a trillion rows. Ranks only depend on a value's position among
  * DISTINCT values plus tie counts, so compute them compacted:
  *
  *   1. per (group, value) counts — a hash aggregate with map-side
  *      combine; output is bounded by distinct cardinality, and even for
  *      a near-unique measure it is at most one row per input row with
  *      map-side dedup already applied;
  *   2. cumulative count over values ascending within the group —
  *      [[Packing.prefixSum]], the two-phase parallel scan: one
  *      range-repartition sort over the COMPACTED rows, every core busy,
  *      driver state bounded by partition-boundary crossings;
  *   3. avg rank(v) = cum(v) − (cnt(v) − 1) / 2, where cum includes v's
  *      own count — equal to (#rows < v) + (cnt + 1)/2;
  *   4. shuffle-join the rank maps back to the fact rows on (group,
  *      value) and run plain `corr` over the rank pairs per group — one
  *      final hash aggregate.
  *
  * Cost: one compaction agg + one prefix scan per column, one join each,
  * one aggregate — every stage parallel in total row count. At 100 TB the
  * rank-map joins shuffle on (group, value) with no skew beyond value
  * skew itself, which the compaction has already collapsed to one row.
  */
object Stats {

  /** Per-group average-rank map for `valCol`: (grpCol, valCol,
    * rank_<valCol>). Input rows must be pre-filtered of NULLs in
    * `valCol` (ranking a NULL is undefined; callers decide pairwise vs
    * listwise deletion). */
  def avgRanks(df: DataFrame, grpCol: String, valCol: String): DataFrame = {
    val cnts = df.groupBy(col(grpCol), col(valCol))
      .agg(count(lit(1)).as("__cnt"))
    Packing.prefixSum(cnts, Seq(grpCol), Seq(valCol), "__cnt", "__cum")
      .select(col(grpCol), col(valCol),
        (col("__cum") - (col("__cnt") - 1) / 2.0).as(s"__rk_$valCol"))
  }

  /** Spearman rank correlation per group for each (a, b) in `pairs`;
    * columns drawn from `cols`. Rows with a NULL in ANY ranked column
    * are dropped first (listwise deletion) so every pair ranks the same
    * row set — matching a SQL oracle that ranks after the same filter.
    * Output: grpCol, n, rho_<a>_<b> per pair (rounded to 6). */
  def spearman(df: DataFrame, grpCol: String, cols: Seq[String],
               pairs: Seq[(String, String)]): DataFrame = {
    val base = df.select((grpCol +: cols).map(col): _*)
      .filter(cols.map(col(_).isNotNull).reduce(_ && _))
    // modest distinct-cardinality compactions re-scan `base`; persist so
    // the fact scan runs once, released by the caller's clearCache
    base.persist()
    val withRanks = cols.foldLeft(base) { (acc, c) =>
      acc.join(avgRanks(base, grpCol, c), Seq(grpCol, c))
    }
    val aggs = pairs.map { case (a, b) =>
      graft.Fns.roundU(corr(col(s"__rk_$a"), col(s"__rk_$b")), 6)
        .as(s"rho_${a}_$b")
    }
    withRanks.groupBy(col(grpCol))
      .agg(count(lit(1)).as("n"), aggs: _*)
  }
}
