package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic corpus sampling/splitting: the assignment operators a
  * training-data pipeline must be able to REPRODUCE years later, so they
  * hash with plain int64 arithmetic (no engine-specific hash function) —
  * any SQL engine, or a downstream auditor with a calculator, can replay
  * the exact assignment. Everything here is a pure projection or a
  * bounded per-group selection; nothing shuffles more than it keeps.
  *
  * Mirrors the reference's deterministic routing ideas (watch-list hash
  * gates, `RECEIVER/stage2_processing.cpp` hash-keyed dedup) re-expressed
  * as corpus-level assignment.
  */
object Sampling {

  /** Knuth multiplicative hash of a NON-NEGATIVE int64 id into
    * [0, 2^32): `((id % 2147483647) * 2654435761) % 2^32`.
    *
    * The pre-reduction mod 2^31-1 (POSITIVE modulus, so a negative id
    * hashes into the same [0, 2^31-1) domain instead of poisoning every
    * downstream range test with a negative value) keeps the product
    * under 2^63 — no int64 overflow: Spark 4's ANSI mode would throw,
    * other engines would silently wrap, and wrapped values would no
    * longer agree across engines. Injective for 0 ≤ id < 2^31-1; beyond
    * that ids still spread uniformly, which is what split/sample
    * assignment needs. SQL mirror:
    * `(id % 2147483647 + 2147483647) % 2147483647 * 2654435761
    *  % 4294967296`. */
  def consistentHash(id: Column): Column =
    pmod(id, lit(2147483647L)) * lit(2654435761L) % lit(4294967296L)

  /** Stable train/val/test (or any) split: `fractions` are (name, pct)
    * with pcts summing to ≤ 100; a document's bucket = hash mod 100
    * walks the cumulative ranges. Adding documents never reassigns
    * existing ones (the property random `split()` lacks), and the split
    * column is a pure projection — no shuffle, no state. */
  def stratifiedSplit(df: DataFrame, idCol: String,
                      fractions: Seq[(String, Int)]): DataFrame = {
    require(fractions.nonEmpty && fractions.map(_._2).sum <= 100 &&
      fractions.forall(_._2 > 0), "fractions must be positive, sum <= 100")
    val bucket = consistentHash(col(idCol)) % lit(100L)
    val (expr0, _) = fractions.foldLeft(
      (lit(null).cast("string"), 0L)) { case ((e, cum), (name, pct)) =>
        (when(bucket >= cum && bucket < cum + pct, name).otherwise(e),
          cum + pct)
    }
    df.withColumn("split", expr0)
  }

  /** Consistent per-group sample: the `k` rows of each group with the
    * LOWEST id hash — a stable "random" sample (the same ids win no
    * matter how the corpus grows, so reruns are diffable). Runs through
    * the [[graft.plans.TopKPerKey]] bounded-heap plan: only k candidates
    * per group per partition reach the shuffle, no sort anywhere. Output
    * gains an `__h` column (the hash) so callers can audit the draw. */
  def consistentSamplePerGroup(df: DataFrame, grpCols: Seq[String],
                               idCol: String, k: Int): DataFrame = {
    val hashed = df.withColumn("__h", consistentHash(col(idCol)))
    graft.plans.TopKPerKey(hashed, grpCols,
      Seq(col("__h").asc, col(idCol).asc), k)
  }

  /** WEIGHTED sample without replacement, k per group — the
    * Efraimidis–Spirakis A-ES scheme: each row draws u ∈ (0,1] from
    * the consistent hash and competes on key = u^(1/w); the k largest
    * keys win, giving inclusion probability proportional to weight
    * with NO replacement and no sequential scan. Ordered here by the
    * monotone-equivalent ln(u)/w (avoids pow's tiny-exponent underflow
    * for large weights). Deterministic and engine-replayable like
    * every draw in this file: u is integer arithmetic, the only float
    * op is one log. Runs through the [[graft.plans.TopKPerKey]]
    * bounded-heap plan — k candidates per group per partition reach
    * the shuffle. Output gains `__esk` (the selection key) for audit.
    * Weights must be strictly positive; enforce upstream (a zero
    * weight would divide to -Infinity and simply never win, but NaN
    * poisons the heap ordering). */
  def weightedSamplePerGroup(df: DataFrame, grpCols: Seq[String],
                             idCol: String, weightCol: String, k: Int)
      : DataFrame = {
    // +1: hash range [0, 2^32) → u in (0, 1] — ln(0) is the NaN/-Inf
    // trap this dodges
    val u = (consistentHash(col(idCol)) + 1).cast("double") /
      lit(4294967296.0)
    val keyed = df.withColumn("__esk", log(u) / col(weightCol))
    graft.plans.TopKPerKey(keyed, grpCols,
      Seq(col("__esk").desc, col(idCol).asc), k)
  }
}
