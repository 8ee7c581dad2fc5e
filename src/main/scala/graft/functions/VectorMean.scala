package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Elementwise mean of float-vector columns as ONE hash aggregate.
  *
  * The composable alternative (posexplode → avg per (key, position) →
  * collect/sort/reassemble) shuffles |rows|·dim narrow rows per pass —
  * for k-means at 100 TB that is the dominant cost of every Lloyd
  * iteration. This Aggregator keeps a dim-length double buffer per group
  * with map-side partial combine, so only |partitions|·|groups| buffers
  * cross the wire. Buffer lives as an object inside Spark's typed-
  * imperative aggregation; it is serialized only on spill/shuffle.
  */
class VectorMean extends Aggregator[Seq[Float], (Array[Double], Array[Long]),
    Seq[Float]] {

  override def zero: (Array[Double], Array[Long]) =
    (Array.empty[Double], Array.empty[Long])

  // Per-POSITION contributor counts, so ragged inputs average each
  // position over exactly the vectors that have it (the posexplode/avg
  // semantics) and the result is independent of partition merge order.
  private def grow(b: (Array[Double], Array[Long]), n: Int)
      : (Array[Double], Array[Long]) =
    if (b._1.length >= n) b
    else (java.util.Arrays.copyOf(b._1, n), java.util.Arrays.copyOf(b._2, n))

  override def reduce(b: (Array[Double], Array[Long]), a: Seq[Float])
      : (Array[Double], Array[Long]) = {
    if (a == null) b
    else {
      val g = grow(b, a.length)
      var i = 0
      while (i < a.length) { g._1(i) += a(i); g._2(i) += 1; i += 1 }
      g
    }
  }

  override def merge(x: (Array[Double], Array[Long]),
                     y: (Array[Double], Array[Long]))
      : (Array[Double], Array[Long]) = {
    val g = grow(x, y._1.length)
    var i = 0
    while (i < y._1.length) { g._1(i) += y._1(i); g._2(i) += y._2(i); i += 1 }
    g
  }

  override def finish(b: (Array[Double], Array[Long])): Seq[Float] =
    if (b._1.length == 0) null
    else b._1.indices.map(i =>
      if (b._2(i) == 0) 0f else (b._1(i) / b._2(i)).toFloat)

  override def bufferEncoder: Encoder[(Array[Double], Array[Long])] =
    ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[Float]] = ExpressionEncoder()
}

object VectorMean {
  /** Untyped-agg entry point: `df.groupBy(...).agg(VectorMean(col))`. */
  def apply(c: Column): Column = {
    implicit val enc: Encoder[Seq[Float]] = ExpressionEncoder()
    udaf(new VectorMean).apply(c)
  }
}
