package graft.operators

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** The mathematical identity q236 rides: FIFO allocation between
  * ordered receipts and ordered issues equals the pairwise OVERLAP of
  * their cumulative-quantity intervals. Proven here against a direct
  * queue simulation on random quantity sequences — if the identity
  * held only on friendly data, the query's oracle (which uses the
  * same identity on both engines) could be consistently wrong; this
  * property is the independent check.
  */
object FifoProps extends Properties("graft.fifo") {

  private val qtys: Gen[List[Long]] =
    Gen.choose(0, 12).flatMap(n =>
      Gen.listOfN(n, Gen.choose(1L, 9L)))

  /** Queue-based FIFO: allocate each issue against the earliest
    * not-yet-exhausted receipts. Returns ((rIdx, iIdx) -> qty). */
  private def simulate(rs: List[Long], is: List[Long])
      : Map[(Int, Int), Long] = {
    val remaining = rs.toArray
    var r = 0
    val out = scala.collection.mutable.Map.empty[(Int, Int), Long]
    is.zipWithIndex.foreach { case (need0, i) =>
      var need = need0
      while (need > 0 && r < remaining.length) {
        val take = math.min(need, remaining(r))
        if (take > 0) {
          out((r, i)) = out.getOrElse((r, i), 0L) + take
          remaining(r) -= take
          need -= take
        }
        if (remaining(r) == 0) r += 1
      }
    }
    out.toMap
  }

  /** Interval form: overlap of cumulative ranges. */
  private def intervals(rs: List[Long], is: List[Long])
      : Map[(Int, Int), Long] = {
    def cum(xs: List[Long]): List[(Long, Long)] =
      if (xs.isEmpty) Nil
      else xs.scanLeft(0L)(_ + _).sliding(2).map(p => (p(0), p(1))).toList
    val pairs = for {
      ((rlo, rhi), ri) <- cum(rs).zipWithIndex
      ((ilo, ihi), ii) <- cum(is).zipWithIndex
      ov = math.min(rhi, ihi) - math.max(rlo, ilo)
      if ov > 0
    } yield (ri, ii) -> ov
    pairs.toMap
  }

  property("interval overlap == queue-simulated FIFO allocation") =
    forAll(qtys, qtys) { (rs, is) =>
      simulate(rs, is) == intervals(rs, is)
    }

  property("allocation conserves quantity: matched = min(ΣR, ΣI) " +
      "when one side exhausts") =
    forAll(qtys, qtys) { (rs, is) =>
      val matched = intervals(rs, is).values.sum
      matched == math.min(rs.sum, is.sum)
    }
}
