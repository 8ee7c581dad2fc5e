package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Space-Saving heavy-hitter sketch as a BATCH mergeable aggregation —
  * the candidate-generation half of the "find items above a frequency
  * threshold" pattern at 100 TB:
  *
  *   1. sketch pass: this Aggregator keeps AT MOST `m` counters per
  *      aggregation buffer, however many distinct keys stream through —
  *      the map-side partial is O(m), not O(distinct), so the shuffle
  *      never carries the key domain;
  *   2. exact pass: the ≤ m emitted candidates broadcast back onto the
  *      fact and are re-counted EXACTLY; the threshold gate runs on the
  *      exact counts (cross-multiplied integers, no float boundary).
  *
  * The guarantee that makes step 2 sound (Metwally et al. 2005;
  * mergeable form Agarwal et al. 2012): after any sequence of reduces
  * and merges with capacity m, every item with true count > N/m is
  * present in the summary. So with threshold φ·N and m ≥ 2/φ the
  * candidate set has NO false negatives; false positives are exactly
  * filtered by the recount. The intermediate truncation order makes the
  * candidate SET run-dependent, but the final exact-gated output is
  * deterministic — which is why the sketch can sit under a SQL oracle
  * (q214) while CountMin/HLL estimates cannot.
  *
  * Buffer is a mutable map (kryo-serialized only at partial-output
  * boundaries); the absent-key-on-full-buffer path scans for the min
  * counter — O(m), hit only when the buffer is saturated by a key
  * OUTSIDE the current top-m (rare under the skew that makes heavy
  * hitters exist). A production stream-summary (linked count buckets)
  * drops that to O(1); at m ≤ 4096 the scan is not the bottleneck.
  */
class SpaceSavingAgg(m: Int)
    extends Aggregator[String, mutable.HashMap[String, (Long, Long)],
      Array[String]] {
  require(m >= 8 && m <= 65536, "capacity in [8, 65536]")

  override def zero: mutable.HashMap[String, (Long, Long)] =
    mutable.HashMap.empty

  override def reduce(b: mutable.HashMap[String, (Long, Long)],
      key: String): mutable.HashMap[String, (Long, Long)] = {
    if (key != null) {
      b.get(key) match {
        case Some((c, e)) => b.update(key, (c + 1, e))
        case None if b.size < m => b.update(key, (1L, 0L))
        case None =>
          // evict the min-count entry; the newcomer inherits its count
          // as the overestimate bound (the classic Space-Saving step)
          var minK: String = null
          var minC = Long.MaxValue
          for ((k, (c, _)) <- b) if (c < minC || (c == minC &&
              (minK == null || k < minK))) { minK = k; minC = c }
          b.remove(minK)
          b.update(key, (minC + 1, minC))
      }
    }
    b
  }

  override def merge(x: mutable.HashMap[String, (Long, Long)],
      y: mutable.HashMap[String, (Long, Long)])
      : mutable.HashMap[String, (Long, Long)] = {
    for ((k, (c, e)) <- y) x.get(k) match {
      case Some((c0, e0)) => x.update(k, (c0 + c, e0 + e))
      case None => x.update(k, (c, e))
    }
    if (x.size > m) {
      // truncate to the top m by count — (count desc, key asc) so the
      // cut is deterministic GIVEN the merge tree; the exact-recount
      // pass is what makes the final answer tree-independent
      val keep = x.toSeq.sortBy { case (k, (c, _)) => (-c, k) }.take(m)
      x.clear()
      keep.foreach { case (k, v) => x.update(k, v) }
    }
    x
  }

  override def finish(b: mutable.HashMap[String, (Long, Long)])
      : Array[String] = b.keys.toArray.sorted

  override def bufferEncoder
      : Encoder[mutable.HashMap[String, (Long, Long)]] =
    Encoders.kryo[mutable.HashMap[String, (Long, Long)]]
  override def outputEncoder: Encoder[Array[String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[String]]()
}

object SpaceSavingAgg {
  /** Untyped-agg entry: `df.agg(SpaceSavingAgg(512)(col("key")))` →
    * sorted candidate array (≥ every item with true count > N/512). */
  def apply(m: Int)(c: Column): Column = udaf(new SpaceSavingAgg(m)).apply(c)
}
