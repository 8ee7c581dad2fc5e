package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf
import org.apache.spark.unsafe.hash.Murmur3_x86_32
import org.apache.spark.unsafe.types.UTF8String

/** Count-Min sketch over a string key column as a GROUPED aggregation —
  * the frequency-estimation sibling of [[BloomAgg]]: fixed
  * `depth × width` counter matrix per group, merged cell-wise like any
  * aggregation buffer (map-side partials combine), serialized as the
  * flat long array. Point queries ([[CountMinAgg.estimate]]) return
  * min over rows — an OVERESTIMATE, never an under (each row only adds;
  * collisions inflate), with error ≤ 2n/width at 1−(1/2)^depth
  * probability per the standard CM bound.
  *
  * Versus the exact (key, count) aggregate: a CM sketch's shuffle is
  * O(depth·width) per group regardless of key cardinality — the shape
  * that survives a 100 TB key space where exact per-key counts would
  * shuffle the whole domain. Versus `Streams.runningHeavyHitters`
  * (Space-Saving): CM answers frequency for ANY key after the fact;
  * Space-Saving tracks only the current top-m.
  *
  * Hashing uses Spark's Murmur3 with row-indexed seeds — deterministic
  * across runs and partitionings (spec-gated; engine-specific by
  * construction, so CM results never ride a SQL oracle).
  */
class CountMinAgg(depth: Int, width: Int)
    extends Aggregator[String, Array[Long], Array[Long]] {
  require(depth >= 1 && depth <= 16 && width >= 8,
    "depth in [1,16], width >= 8")

  override def zero: Array[Long] = new Array[Long](depth * width)

  override def reduce(b: Array[Long], key: String): Array[Long] = {
    if (key != null) {
      // encode the key to UTF-8 ONCE per row, not once per depth row —
      // reduce is the per-input hot path
      val u = UTF8String.fromString(key)
      var r = 0
      while (r < depth) {
        b(r * width + CountMinAgg.cellU(u, r, width)) += 1L
        r += 1
      }
    }
    b
  }

  override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
    var i = 0
    while (i < x.length) { x(i) += y(i); i += 1 }
    x
  }

  override def finish(b: Array[Long]): Array[Long] = b

  override def bufferEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
}

object CountMinAgg {
  /** Row `r`'s cell index for an already-encoded key (Murmur3,
    * seed = r). Callers hoist the UTF-8 encode out of the depth loop. */
  private[functions] def cellU(u: UTF8String, r: Int, width: Int): Int = {
    val h = Murmur3_x86_32.hashUnsafeBytes(
      u.getBaseObject, u.getBaseOffset, u.numBytes(), r)
    math.floorMod(h, width)
  }

  /** Row `r`'s cell index for `key` (Murmur3, seed = r). */
  private[functions] def cell(key: String, r: Int, width: Int): Int =
    cellU(UTF8String.fromString(key), r, width)

  /** Untyped-agg entry:
    * `df.groupBy(g).agg(CountMinAgg(d, w)(col("key")))`. */
  def apply(depth: Int, width: Int)(c: Column): Column = {
    implicit val enc: Encoder[String] = Encoders.STRING
    udaf(new CountMinAgg(depth, width)).apply(c)
  }

  /** Point query against a finished sketch: min over the key's cells. */
  def estimate(sketch: Array[Long], key: String, depth: Int,
               width: Int): Long = {
    require(sketch.length == depth * width, "sketch shape mismatch")
    val u = UTF8String.fromString(key)
    var best = Long.MaxValue
    var r = 0
    while (r < depth) {
      val v = sketch(r * width + cellU(u, r, width))
      if (v < best) best = v
      r += 1
    }
    best
  }
}
