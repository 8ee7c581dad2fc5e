package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Fixed-point delta-rule trainer (q338/q339's engine). The assertions
  * mirror the exactness contract: integer arithmetic the DuckDB oracle
  * replays, a separable fixture the trainer must actually solve, and
  * loud failure past the proven bounds.
  */
class ClassifySpec extends SparkSpec {
  import Classify.Q

  private lazy val s = spark
  import s.implicits._

  /** Reference Elliott link in pure Long arithmetic (the Python/DuckDB
    * prototype's spelling): floor over non-negative num/den. */
  private def elliottRef(z: Long): Long = {
    val num = Q * (Q + math.abs(z) + z)
    val den = 2 * (Q + math.abs(z))
    num / den
  }

  test("elliottQ matches the integer reference, endpoints and symmetry") {
    val zs = Seq(0L, 1L, -1L, 37L, -37L, Q, -Q, 3 * Q + 17, -(3 * Q + 17),
      (1L << 33) + 12345, -((1L << 33) + 12345))
    val got = zs.toDF("z").select(Classify.elliottQ($"z").as("p"))
      .collect().map(_.getLong(0))
    val want = zs.map(elliottRef)
    assert(got.toSeq == want)
    // z = 0 is exactly 1/2; the link saturates toward [0, Q]
    assert(elliottRef(0) == Q / 2)
    assert(want.forall(p => p >= 0 && p <= Q))
    // Elliott is antisymmetric around Q/2 up to the floor:
    // p(z) + p(-z) ∈ {Q-1, Q}
    zs.foreach { z =>
      val s2 = elliottRef(z) + elliottRef(-z)
      assert(s2 == Q || s2 == Q - 1, s"z=$z -> $s2")
    }
  }

  test("trainDelta recovers a linear separator and pins the trace shape") {
    // y = 1 iff x1 > x2 — separable by w = (0, 1, -1); 40 rows around
    // the boundary. The delta rule must reach 100% training accuracy.
    val rows = (0 until 40).map { i =>
      val x1 = i % 7; val x2 = (i * 3 + 1) % 5
      (x1.toLong, x2.toLong, if (x1 > x2) 1L else 0L)
    }
    val df = rows.toDF("x1", "x2", "y")
    val t = Classify.trainDelta(df, Seq("x1", "x2"), "y",
      iters = 12, etaNum = 2, etaDen = 1)
    assert(t.n == 40)
    assert(t.trace.length == 13)
    assert(t.trace.head == Seq(0L, 0L, 0L))
    assert(t.trace.last == t.weights)
    // learned direction: positive on x1, negative on x2
    assert(t.weights(1) > 0 && t.weights(2) < 0)
    // 100% training accuracy at the Q/2 threshold
    val miss = df.select(
        (Classify.scoreQ(t.weights, Seq($"x1", $"x2")) >= lit(Q / 2))
          .cast("long").as("pred"), $"y")
      .filter($"pred" =!= $"y").count()
    assert(miss == 0L)
  }

  test("driver update matches DuckDB // (truncating) on negative gradients") {
    // A one-row set with y=0 and positive features drives the gradient
    // positive; y=1 drives it negative. Both signs of the update must
    // truncate toward zero (Java Long division — what DuckDB's // does),
    // NOT floor. g0 after round 1 from w=0: p=Q/2, so g = (Q/2 - y·Q)·x.
    val pos = Seq((3L, 0L)).toDF("x1", "y") // g1 = (Q/2)·3, n=1
    val tP = Classify.trainDelta(pos, Seq("x1"), "y", 1, 1L, 7L)
    assert(tP.weights(1) == -((Q / 2) * 3 * 1) / 7) // trunc of negative step
    val neg = Seq((3L, 1L)).toDF("x1", "y") // g1 = (-Q/2)·3
    val tN = Classify.trainDelta(neg, Seq("x1"), "y", 1, 1L, 7L)
    assert(tN.weights(1) == ((Q / 2) * 3 * 1) / 7)
    assert(tP.weights(1) == -tN.weights(1)) // symmetric ⇒ truncation, not floor
  }

  test("fixed-point bound check fails loudly instead of diverging") {
    // absurd eta on large features blows |w| past the 2^53 numerator
    // proof within a few rounds — the require must fire, not wrap
    val big = (0 until 8).map(i => (1000000L + i, i.toLong % 2))
      .toDF("x1", "y")
    val e = intercept[IllegalArgumentException] {
      Classify.trainDelta(big, Seq("x1"), "y",
        iters = 30, etaNum = 1L << 20, etaDen = 1)
    }
    assert(e.getMessage.contains("fixed-point bound"))
  }

  test("empty training set is rejected") {
    val e = intercept[IllegalArgumentException] {
      Classify.trainDelta(Seq.empty[(Long, Long)].toDF("x1", "y"),
        Seq("x1"), "y", 1, 1, 1)
    }
    assert(e.getMessage.contains("empty"))
  }
}
