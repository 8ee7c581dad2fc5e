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
class VectorMean extends Aggregator[Seq[Float], (Array[Double], Long),
    Seq[Float]] {

  override def zero: (Array[Double], Long) = (Array.empty[Double], 0L)

  override def reduce(b: (Array[Double], Long), a: Seq[Float])
      : (Array[Double], Long) = {
    if (a == null) b
    else {
      val acc = if (b._1.length > 0) b._1 else new Array[Double](a.length)
      val m = math.min(acc.length, a.length)
      var i = 0
      while (i < m) { acc(i) += a(i); i += 1 }
      (acc, b._2 + 1)
    }
  }

  override def merge(x: (Array[Double], Long), y: (Array[Double], Long))
      : (Array[Double], Long) = {
    if (x._2 == 0) y
    else if (y._2 == 0) x
    else {
      val m = math.min(x._1.length, y._1.length)
      var i = 0
      while (i < m) { x._1(i) += y._1(i); i += 1 }
      (x._1, x._2 + y._2)
    }
  }

  override def finish(b: (Array[Double], Long)): Seq[Float] =
    if (b._2 == 0L) null
    else b._1.map(v => (v / b._2).toFloat).toSeq

  override def bufferEncoder: Encoder[(Array[Double], Long)] =
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
