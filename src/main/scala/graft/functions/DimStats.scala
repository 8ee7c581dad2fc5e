package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Per-dimension stat row of [[DimStatsAgg]]: population variance
  * (G_ii/n − mean², matching the oracle's avg(v²) − avg(v)² form) and
  * the exact-zero fraction — the dead/collapsed-dimension signals. */
case class DimStat(i: Int, mean: Double, variance: Double,
                   zero_frac: Double)

/** One upper-triangle correlation cell of [[DimStatsAgg]]. */
case class DimPair(i: Int, j: Int, corr: Double)

case class DimProfile(dims: Seq[DimStat], pairs: Seq[DimPair])

/** Embedding-dimension QA profile as ONE hash aggregate: per-dim
  * mean/variance/zero-fraction plus the full upper-triangle Pearson
  * correlation between dimensions.
  *
  * The composable alternative is a double posexplode self-join —
  * |rows|·d² narrow rows through a shuffle, the N·d² plan that dies
  * first at scale. This Aggregator keeps (sums[d], Gram upper
  * triangle[d(d+1)/2], zero counts[d], n) — ~18 KB at d=64 —
  * per partition with map-side combine, so only |partitions| buffers
  * cross the wire regardless of row count; every downstream consumer
  * works off the single reduced row (≤ d + d(d+1)/2 output cells).
  *
  * Contract: all non-null vectors must share one length — the triangle
  * layout is d-dependent, so a ragged corpus fails LOUDLY here rather
  * than profiling garbage (VectorMean's grow-on-demand is the right
  * call for means; for a Gram it would silently mis-index).
  */
class DimStatsAgg extends Aggregator[Seq[Float],
    (Long, Array[Double], Array[Double], Array[Long]), DimProfile] {

  private def idx(i: Int, j: Int, d: Int): Int =
    i * d - i * (i - 1) / 2 + (j - i)

  override def zero: (Long, Array[Double], Array[Double], Array[Long]) =
    (0L, Array.empty, Array.empty, Array.empty)

  override def reduce(b: (Long, Array[Double], Array[Double], Array[Long]),
                      a: Seq[Float])
      : (Long, Array[Double], Array[Double], Array[Long]) = {
    // null AND empty both skip WITHOUT counting: an empty vector that
    // incremented n would deflate every mean/variance by a factor that
    // depends on which partition it landed in (count kept, moments
    // dropped) — the partition-order-dependent output the determinism
    // gate exists to catch
    if (a == null || a.isEmpty) b
    else {
      val d = a.length
      val g = if (b._2.length == 0)
        (b._1, new Array[Double](d), new Array[Double](d * (d + 1) / 2),
          new Array[Long](d))
      else {
        require(b._2.length == d,
          s"DimStatsAgg: ragged vectors (${b._2.length} vs $d)")
        b
      }
      val v = a.toArray
      var i = 0
      while (i < d) {
        g._2(i) += v(i)
        if (v(i) == 0f) g._4(i) += 1
        var j = i
        while (j < d) {
          g._3(idx(i, j, d)) += v(i).toDouble * v(j)
          j += 1
        }
        i += 1
      }
      (g._1 + 1, g._2, g._3, g._4)
    }
  }

  override def merge(x: (Long, Array[Double], Array[Double], Array[Long]),
                     y: (Long, Array[Double], Array[Double], Array[Long]))
      : (Long, Array[Double], Array[Double], Array[Long]) = {
    // an array-less buffer always carries n = 0 (empty vectors never
    // count), but sum the counts anyway so no branch can drop one
    if (y._2.length == 0) (x._1 + y._1, x._2, x._3, x._4)
    else if (x._2.length == 0) (x._1 + y._1, y._2, y._3, y._4)
    else {
      require(x._2.length == y._2.length,
        s"DimStatsAgg: ragged vectors (${x._2.length} vs ${y._2.length})")
      var i = 0
      while (i < y._2.length) { x._2(i) += y._2(i); x._4(i) += y._4(i)
        i += 1 }
      i = 0
      while (i < y._3.length) { x._3(i) += y._3(i); i += 1 }
      (x._1 + y._1, x._2, x._3, x._4)
    }
  }

  override def finish(b: (Long, Array[Double], Array[Double], Array[Long]))
      : DimProfile = {
    val d = b._2.length
    if (d == 0 || b._1 == 0) DimProfile(Nil, Nil)
    else {
      val n = b._1.toDouble
      val mean = b._2.map(_ / n)
      val vr = (0 until d).map(i =>
        b._3(idx(i, i, d)) / n - mean(i) * mean(i))
      val dims = (0 until d).map(i =>
        DimStat(i, mean(i), vr(i), b._4(i) / n))
      // degenerate (zero-variance) dimensions have no defined
      // correlation — they surface in `dims` (variance 0, the q186
      // signal) and are EXCLUDED from the pair tier rather than
      // flooding it with NaN, which Spark sorts above every real
      // value in q187's |corr| cut. The gate is a RELATIVE epsilon
      // against the second moment, not `> 0`: the variance is the
      // cancellation-prone G_ii/n − mean², and a near-constant dim
      // can land a few ulps positive on one engine and non-positive
      // on another (different summation paths), flipping inclusion
      // at the boundary. Emitted corr is clamped to [−1, 1] so a
      // tiny surviving variance can't push it outside the domain.
      val msq = (0 until d).map(i => b._3(idx(i, i, d)) / n)
      def live(i: Int) = vr(i) > 1e-12 * msq(i)
      val pairs = for {
        i <- 0 until d
        j <- (i + 1) until d
        if live(i) && live(j)
      } yield DimPair(i, j,
        math.max(-1.0, math.min(1.0,
          (b._3(idx(i, j, d)) / n - mean(i) * mean(j)) /
            math.sqrt(vr(i) * vr(j)))))
      DimProfile(dims, pairs)
    }
  }

  override def bufferEncoder
      : Encoder[(Long, Array[Double], Array[Double], Array[Long])] =
    ExpressionEncoder()
  override def outputEncoder: Encoder[DimProfile] = ExpressionEncoder()
}

object DimStatsAgg {
  /** Untyped-agg entry point: `df.agg(DimStatsAgg(col("embedding")))`. */
  def apply(c: Column): Column = {
    implicit val enc: Encoder[DimProfile] = ExpressionEncoder()
    udaf(new DimStatsAgg).apply(c)
  }
}
