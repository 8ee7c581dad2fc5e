package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf
import org.apache.spark.util.sketch.BloomFilter

/** Bloom filter as a GROUPED aggregation: each group's filter is built
  * like any aggregation buffer — map-side partials merged at the
  * reducer — so a sharded build ([[graft.operators.Dedup
  * .containmentApproxSharded]]) constructs every shard's filter in
  * parallel with per-task memory of ONE shard, where the all-in-one
  * `df.stat.bloomFilter` funnels the full-size filter through a single
  * treeAggregate chain. Emits the serialized filter bytes
  * (`BloomFilter.readFrom` restores it).
  *
  * All partials for a group must be created with the same
  * (expectedItems, fpp) — guaranteed here since the parameters are
  * constructor-fixed — or mergeInPlace would reject them. */
class BloomAgg(expectedItems: Long, fpp: Double)
    extends Aggregator[Long, BloomFilter, Array[Byte]] {
  require(expectedItems > 0 && fpp > 0 && fpp < 1)

  override def zero: BloomFilter = BloomFilter.create(expectedItems, fpp)

  override def reduce(b: BloomFilter, a: Long): BloomFilter = {
    b.putLong(a); b
  }

  override def merge(x: BloomFilter, y: BloomFilter): BloomFilter = {
    x.mergeInPlace(y); x
  }

  override def finish(b: BloomFilter): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    b.writeTo(bos)
    bos.toByteArray
  }

  // the filter is an opaque JVM object mid-aggregation (serialized only
  // on spill/shuffle, where kryo handles the Serializable impl)
  override def bufferEncoder: Encoder[BloomFilter] =
    Encoders.kryo[BloomFilter]
  override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}

object BloomAgg {
  /** Untyped-agg entry: `df.groupBy(shard).agg(BloomAgg(n, fpp)(col))`.
    * NULL inputs must be filtered upstream. */
  def apply(expectedItems: Long, fpp: Double)(c: Column): Column = {
    implicit val enc: Encoder[Long] = ExpressionEncoder()
    udaf(new BloomAgg(expectedItems, fpp)).apply(c)
  }
}
