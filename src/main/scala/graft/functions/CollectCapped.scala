package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Collect a group's values ONLY if the group has at most `cap` of them;
  * groups beyond the cap finish as NULL (callers filter them out).
  *
  * This is the one-shuffle form of the "rare key → member list" step in
  * document-frequency gating (near-dup candidate generation): the naive
  * plan is count-per-key, filter rare, then join the keys back and
  * self-join — three extra shuffles of the full key table. A plain
  * `collect_list` + size filter is one aggregation but unbounded: a
  * stop-shingle appearing in a billion documents would buffer a billion
  * ids in one aggregation buffer. This aggregator's state is AT MOST
  * `cap` elements plus an exact running count, for every group, however
  * hot the key — the count keeps growing, the element buffer stops.
  *
  * Correctness of the cap: the buffer truncates only once its size
  * exceeds `cap`, which implies the group's total count exceeds `cap`,
  * which means finish() returns NULL anyway — so every non-NULL result
  * carries the COMPLETE, untruncated member list. Merge order does not
  * affect which groups survive (the count is exact), only the element
  * order within a surviving list, which callers must not rely on.
  *
  * Runs as a typed-imperative aggregate (object buffer, map-side partial
  * combine; serialized only on spill/shuffle).
  */
class CollectCapped(cap: Int)
    extends Aggregator[Long, (Long, Array[Long]), Array[Long]] {
  require(cap >= 1, s"cap must be >= 1, got $cap")

  override def zero: (Long, Array[Long]) = (0L, Array.empty[Long])

  override def reduce(b: (Long, Array[Long]), a: Long)
      : (Long, Array[Long]) =
    (b._1 + 1, if (b._2.length > cap) b._2 else b._2 :+ a)

  override def merge(x: (Long, Array[Long]), y: (Long, Array[Long]))
      : (Long, Array[Long]) = {
    val n = x._1 + y._1
    val kept =
      if (x._2.length > cap) x._2
      else if (y._2.length > cap) y._2
      else (x._2 ++ y._2).take(cap + 1)
    (n, kept)
  }

  override def finish(b: (Long, Array[Long])): Array[Long] =
    if (b._1 > cap) null else b._2

  override def bufferEncoder: Encoder[(Long, Array[Long])] =
    ExpressionEncoder()
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder()
}

object CollectCapped {
  /** Untyped-agg entry: `df.groupBy(k).agg(CollectCapped(cap)(col))`.
    * NULL inputs must be filtered upstream (a typed Long input cannot
    * represent them). */
  def apply(cap: Int)(c: Column): Column = {
    implicit val enc: Encoder[Long] = ExpressionEncoder()
    udaf(new CollectCapped(cap)).apply(c)
  }
}
