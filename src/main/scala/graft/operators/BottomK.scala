package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Deterministic per-group bottom-k sampler: keeps the k records with the
  * smallest sort keys (e.g. a content digest), giving a uniform,
  * reproducible sample per group WITHOUT sorting the group — the
  * map-side-combining alternative to `row_number() ≤ k` that matters when
  * a group holds billions of rows. Buffer is O(k); merge is O(k).
  */
class BottomK(k: Int)
    extends Aggregator[(String, Long), List[(String, Long)], Seq[Long]] {

  override def zero: List[(String, Long)] = Nil

  private def trim(xs: List[(String, Long)]): List[(String, Long)] =
    xs.sortBy(x => (x._1, x._2)).take(k)

  // Lazy trim: let the buffer grow to 2k and compact in one sort, so the
  // per-row cost is amortized O(1) allocations instead of a sort per row.
  // Correctness is unchanged — any element outside the smallest k can
  // never re-enter, and finish() always trims.
  override def reduce(b: List[(String, Long)], a: (String, Long))
      : List[(String, Long)] = {
    val nb = a :: b
    if (nb.lengthCompare(2 * k) > 0) trim(nb) else nb
  }

  override def merge(x: List[(String, Long)], y: List[(String, Long)])
      : List[(String, Long)] = {
    val m = x ::: y
    if (m.lengthCompare(2 * k) > 0) trim(m) else m
  }

  override def finish(b: List[(String, Long)]): Seq[Long] = trim(b).map(_._2)

  override def bufferEncoder: Encoder[List[(String, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()

  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}
